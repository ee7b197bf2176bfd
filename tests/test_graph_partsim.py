"""Connected-components dedup clustering + part_sim partitioning study."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from l1dbproto_spark.operators.graph import connected_components
from l1dbproto_spark.workload.part_sim import run_partition_study, summarize


def test_connected_components_basic(spark):
    # components: {1,2,3} (chain), {10,11}, {20,21,22,23} (star via 20)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (20, 22), (20, 23)],
        "doc_a long, doc_b long",
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[10] == cc[11] == 10
    assert cc[20] == cc[21] == cc[22] == cc[23] == 20


def test_connected_components_long_chain(spark):
    """Convergence over a diameter-9 chain exercises the iteration loop."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 109)], "doc_a long, doc_b long"
    )
    cc = connected_components(edges)
    comps = cc.select("component").distinct().collect()
    assert len(comps) == 1 and comps[0][0] == 100


def test_connected_components_probe_paths_agree(spark):
    """r14 probe pin: integral ids converge via the monotone label-sum
    probe, non-numeric ids via the join-based change count — the same
    graph expressed with long ids and with string ids must produce the
    identical clustering (string ids chosen so lexicographic order
    matches numeric order, making min-labels comparable)."""
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (20, 22), (3, 1)]
    num = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    txt = spark.createDataFrame(
        [(f"n{a:03d}", f"n{b:03d}") for a, b in pairs],
        "doc_a string, doc_b string",
    )
    cc_num = {
        r["node"]: r["component"]
        for r in connected_components(num).collect()
    }
    cc_txt = {
        r["node"]: r["component"]
        for r in connected_components(txt).collect()
    }
    assert {f"n{k:03d}": f"n{v:03d}" for k, v in cc_num.items()} == cc_txt


def test_dedup_clusters_on_documents(spark, sf_dir):
    """End-to-end: jaccard pairs -> components -> every clustered doc maps to
    the minimum doc id of its cluster."""
    from l1dbproto_spark.operators.dedup import shingle_jaccard_pairs, word_shingles
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_jaccard_pairs(word_shingles(docs), min_jaccard=0.8)
    cc = connected_components(pairs)
    joined = cc.alias("c").join(
        pairs.alias("p"), F.col("c.node") == F.col("p.doc_b")
    )
    # the component label is always <= any member (min-label invariant)
    assert joined.filter(F.col("c.component") > F.col("p.doc_a")).count() == 0
    assert cc.count() > 0


def test_partition_study_stats(spark):
    stats = run_partition_study(n_trials=20, seed=7)
    assert len(stats) == 20
    # envelope must be a sane superset: at least the cap area, at most ~25x
    cap_deg2 = 2 * math.pi * (1 - math.cos(math.radians(1.76))) * (180 / math.pi) ** 2
    for s in stats:
        assert s.envelope_deg2 >= cap_deg2 * 0.9
        assert s.envelope_deg2 <= cap_deg2 * 25
        assert 1 <= s.n_ranges <= 64
    row = summarize(spark, stats).collect()[0]
    assert row["avg_pixels"] > 0


def test_resolve_canonicals_best_and_ties(spark):
    from l1dbproto_spark.operators.graph import resolve_canonicals

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "doc_a long, doc_b long"
    )
    comps = connected_components(edges)
    scores = spark.createDataFrame(
        # cluster {1,2,3}: 2 is best; {10,11}: tie -> min id 10;
        # {20,21}: both unscored -> min id 20
        [(1, 0.1), (2, 0.9), (3, 0.5), (10, 0.7), (11, 0.7)],
        "doc_id long, score double",
    )
    out = {
        r.doc_id: (r.canonical_id, r.is_canonical)
        for r in resolve_canonicals(comps, scores).collect()
    }
    assert out[1] == (2, False) and out[2] == (2, True) and out[3] == (2, False)
    assert out[10] == (10, True) and out[11] == (10, False)
    assert out[20] == (20, True) and out[21] == (20, False)
    # constant score recovers the min-id default everywhere
    const = spark.createDataFrame(
        [(i, 1.0) for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id long, score double"
    )
    cmins = {
        r.doc_id: r.canonical_id
        for r in resolve_canonicals(comps, const).collect()
    }
    assert cmins == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_resolve_canonicals_partial_scores_prefer_scored(spark):
    from l1dbproto_spark.operators.graph import resolve_canonicals

    edges = spark.createDataFrame([(5, 6), (5, 7)], "doc_a long, doc_b long")
    comps = connected_components(edges)
    # only the largest id is scored -> it wins over unscored smaller ids
    scores = spark.createDataFrame([(7, 0.01)], "doc_id long, score double")
    out = {
        r.doc_id: r.canonical_id
        for r in resolve_canonicals(comps, scores).collect()
    }
    assert out == {5: 7, 6: 7, 7: 7}


def test_connected_components_long_chain_converges(spark):
    """A 60-node chain (diameter 59) converges under the default round
    budget — pointer jumping makes convergence O(log diameter); plain
    one-hop propagation silently returned wrong labels here (pinned
    regression)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 159)], "doc_a long, doc_b long"
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(cc.values()) == {100}
    assert len(cc) == 60

"""PageRank: numpy power-iteration parity (same dangling handling), rank-mass
conservation, known-graph sanity, early-exit tolerance, and the dedup-graph
composition (rank the near-dup pair graph)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.graph import pagerank

EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3),  # 4 -> 3, cycle 1-2-3
    (5, 1),                                   # 5 feeds the cycle
    # 6 is a pure sink (dangling) reached from 3
    (3, 6),
]


def _np_pagerank(edges, damping=0.85, iterations=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        new = np.zeros(n)
        for u, v in edges:
            new[idx[v]] += r[idx[u]] / out[idx[u]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (new + dangling / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGES, "src INT, dst INT")


def test_pagerank_matches_numpy(spark, edge_df):
    got = {r.node: r.rank for r in pagerank(edge_df, iterations=10).collect()}
    want = _np_pagerank(EDGES, iterations=10)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_rank_mass_conserved(spark, edge_df):
    ranks = pagerank(edge_df, iterations=8).collect()
    assert abs(sum(r.rank for r in ranks) - 1.0) < 1e-9


def test_hub_ranks_highest(spark, edge_df):
    """Node 3 has the most in-links (from 1, 2, 4) — it must lead."""
    ranks = {r.node: r.rank for r in pagerank(edge_df, iterations=15).collect()}
    assert max(ranks, key=ranks.get) == 3


def test_tol_early_exit_close_to_full_run(spark, edge_df):
    full = {r.node: r.rank for r in pagerank(edge_df, iterations=50).collect()}
    early = {r.node: r.rank for r in pagerank(edge_df, iterations=50, tol=1e-10).collect()}
    for k in full:
        assert abs(full[k] - early[k]) < 1e-6


def test_empty_graph(spark):
    e = spark.createDataFrame([], "src INT, dst INT")
    assert pagerank(e, iterations=3).count() == 0


def test_rank_near_dup_graph(spark):
    """Composition: the MinHash candidate pairs form a graph; PageRank over
    it is the 'most-connected duplicate' centrality. Plan sanity: no
    cartesian products anywhere in the iterated lineage (each round is
    pinned, so the final frame's plan is just the last round)."""
    from l1dbproto_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_candidate_pairs,
        minhash_signatures,
        shingle_rows,
    )
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = minhash_candidate_pairs(
        minhash_band_buckets(minhash_signatures(shingle_rows(docs)))
    )
    ranks = pagerank(pairs, src="doc_a", dst="doc_b", iterations=5)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = ranks.collect()
    assert len(rows) > 0
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-9


def test_multigraph_weights(spark):
    """dedup_edges=False: a parallel edge carries multiplicity — 2x the
    (1,2) edge shifts rank toward 2 vs the deduped walk, and matches a
    numpy reference whose edge list repeats the edge."""
    edges = EDGES + [(1, 2)]
    df = spark.createDataFrame(edges, "src INT, dst INT")
    deduped = {r.node: r.rank for r in pagerank(df, iterations=10).collect()}
    weighted = {
        r.node: r.rank
        for r in pagerank(df, iterations=10, dedup_edges=False).collect()
    }
    want = _np_pagerank(edges, iterations=10)  # numpy weights by repetition
    for k in want:
        assert abs(weighted[k] - want[k]) < 1e-9
    assert weighted[2] > deduped[2]
    # deduped walk equals the simple-graph reference
    want_simple = _np_pagerank(EDGES, iterations=10)
    for k in want_simple:
        assert abs(deduped[k] - want_simple[k]) < 1e-9


def test_personalized_pagerank_matches_numpy(spark):
    """Seeded teleport (Haveliwala PPR): numpy power-iteration reference
    with the same dangling-to-seeds redistribution."""
    import numpy as np

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 0)]  # 4 -> dangling
    seeds = [(0, 3.0), (5, 1.0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    p = spark.createDataFrame(seeds, "node long, weight double")
    got = {
        r.node: r.rank
        for r in pagerank(e, iterations=25, personalization=p).collect()
    }
    n, d = 6, 0.85
    pv = np.zeros(n)
    for s, w in seeds:
        pv[s] = w
    pv /= pv.sum()
    out = {u: [] for u in range(n)}
    for a, b in edges:
        out[a].append(b)
    r = pv.copy()
    for _ in range(25):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in range(n):
            if out[u]:
                for v in out[u]:
                    nxt[v] += r[u] / len(out[u])
            else:
                dangling += r[u]
        r = (1 - d) * pv + d * (nxt + dangling * pv)
    for k in range(n):
        assert abs(got[k] - r[k]) < 1e-9, (k, got[k], r[k])
    # seeds dominate: node 0 carries more rank than the unseeded sink 4
    assert got[0] > got[4]


def test_uniform_personalization_equals_default(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    uni = spark.createDataFrame([(i,) for i in range(4)], "node long")
    base = {r.node: r.rank for r in pagerank(e, iterations=8).collect()}
    pers = {
        r.node: r.rank
        for r in pagerank(e, iterations=8, personalization=uni).collect()
    }
    assert base == pers  # bit-identical: same formula, same p column


def test_personalization_seed_outside_graph(spark):
    edges = [(0, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    p = spark.createDataFrame([(7,)], "node long")  # isolated seed
    got = {r.node: r.rank for r in pagerank(e, iterations=5, personalization=p).collect()}
    assert 7 in got and got[7] > 0  # teleport mass reaches the seed
    assert set(got) == {0, 1, 7}


# --- weighted edges (round 10) ------------------------------------------------

W_EDGES = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 3, 0.5)]


def _np_weighted_pagerank(edges, damping=0.85, iterations=10):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _, w in edges:
        out[idx[u]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        new = np.zeros(n)
        for u, v, w in edges:
            new[idx[v]] += r[idx[u]] * w / out[idx[u]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (new + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_weighted_pagerank_matches_numpy(spark):
    df = spark.createDataFrame(W_EDGES, "src INT, dst INT, w DOUBLE")
    got = {
        r.node: r.rank
        for r in pagerank(df, iterations=10, weight_col="w").collect()
    }
    want = _np_weighted_pagerank(W_EDGES)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_unit_weights_reproduce_unweighted(spark, edge_df):
    unit = edge_df.withColumn("w", F.lit(1.0))
    got_w = {
        r.node: r.rank for r in pagerank(unit, iterations=8, weight_col="w").collect()
    }
    got = {r.node: r.rank for r in pagerank(edge_df, iterations=8).collect()}
    assert got_w == got  # bit-identical


def test_weighted_pagerank_rejects_nonpositive(spark):
    import pytest

    df = spark.createDataFrame([(1, 2, 0.0)], "src INT, dst INT, w DOUBLE")
    with pytest.raises(ValueError, match="positive"):
        pagerank(df, weight_col="w")

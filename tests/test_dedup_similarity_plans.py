"""Executed-plan regression guards for the dedup/similarity families —
locks in the round-2 plan shapes (exchange counts, join strategies, spread
parallelism) the same way test_bucketed_join/test_q1_scale_plan guard the
APDB layout. A refactor that silently re-introduces the count-table joins,
a global distinct, or the 1-split pair join fails here before it shows up
in the bench."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from l1dbproto_spark.operators.dedup import (
    doc_shingle_sets,
    jaccard_pairs_from_sets,
    minhash_band_buckets,
    minhash_candidate_pairs,
    minhash_signatures,
    shingle_rows,
)
from l1dbproto_spark.operators.similarity import brute_force_topk, ivf_topk_with_centroids
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


def test_jaccard_three_exchange_no_join_plan(spark):
    """Count-threaded Jaccard: exactly 3 exchanges (spread doubles as the
    collect_set distribution; postings groupBy; pair groupBy) and NO join
    operator of any kind — the per-doc counts ride inside the postings."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = _executed(jaccard_pairs_from_sets(doc_shingle_sets(docs)))
    assert _exchanges(plan) == 3, plan
    assert "Join" not in plan, plan
    # within-doc dedup is the collect_set aggregate, not a global distinct:
    # both ObjectHashAggregates for the set build share the spread partitioning
    assert "ObjectHashAggregate" in plan


def test_minhash_pipeline_exchange_budget(spark):
    """MinHash LSH candidates: 3 exchanges total (spread; band-bucket
    groupBy; candidate distinct) — the signature aggregation reuses the
    spread partitioning and there is no shingle-dedup pass at all."""
    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_candidate_pairs(
        minhash_band_buckets(minhash_signatures(shingle_rows(docs)))
    )
    plan = _executed(pairs)
    assert _exchanges(plan) == 3, plan
    assert "Join" not in plan, plan


def test_brute_force_ann_spreads_corpus(spark):
    """Brute-force ANN: queries broadcast (BNLJ BuildRight), corpus side
    spread to cluster parallelism (the 1-split pair loop regression)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    plan = _executed(brute_force_topk(emb, emb.filter(F.col("vec_id") < 20), k=5))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "REPARTITION_BY_NUM" in plan, plan  # the corpus spread


def test_ivf_cluster_side_no_cartesian(spark):
    """IVF: centroid table broadcast to both assignment and probe joins; the
    probe-to-corpus join is a broadcast hash join on cluster — never a
    cartesian/sort-merge over the corpus."""
    emb = load_table(spark, SF_DIR, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    plan = _executed(
        ivf_topk_with_centroids(
            emb, emb.filter(F.col("vec_id") < 20), centroids, k=5, n_probe=2
        )
    )
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastExchange") >= 2, plan


def test_contamination_broadcasts_eval_side(spark):
    """ngram_contamination: the eval shingle set and size table ride as
    broadcasts — the corpus side never shuffles for the join (its only
    exchanges are the spread + the two groupBys)."""
    from l1dbproto_spark.operators.contamination import ngram_contamination

    docs = load_table(spark, SF_DIR, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    plan = _executed(ngram_contamination(docs, ev, n=3))
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_semdedup_pair_join_shuffles_on_cluster(spark):
    """semantic_dedup_pairs: centroid assignment collapses map-side (max_by
    argmax behind a broadcast of the tiny centroid table); the pair join
    itself is a shuffle keyed on the cluster id — the unbounded vector
    table is never broadcast."""
    from l1dbproto_spark.operators.semdedup import semantic_dedup_pairs

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = (
        emb.filter(F.col("vec_id") % 100 == 0)
        .select(
            (F.col("vec_id") / 100).cast("int").alias("cluster"),
            F.col("embedding").alias("centroid"),
        )
    )
    plan = _executed(semantic_dedup_pairs(emb, cents, eps=0.05))
    # pair join must be a shuffled join on cluster, not a broadcast of vecs
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_multitable_lsh_plan_shape(spark):
    """multitable_lsh_topk: candidate generation is an equi-join on
    (table, bucket) with the PROBE side broadcast (ids + buckets only, no
    vectors through the explode), candidates are de-duplicated before the
    exact re-rank, and nothing degenerates to a cartesian/nested-loop
    pair scan. The bucket expressions must stay inside whole-stage
    codegen — projected as columns BEFORE the explode (a single generator
    expression with all n_tables*n_bits terms measurably exceeds the JIT
    method limit and drops the stage to interpreted eval)."""
    from l1dbproto_spark.operators.similarity import multitable_lsh_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    df = multitable_lsh_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5, dim=64
    )
    plan = _executed(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # probe side broadcast + query-vector re-rank broadcast
    assert plan.count("BroadcastExchange") >= 2, plan
    # distinct (query, neighbor) dedup between candidates and re-rank
    assert "HashAggregate" in plan, plan
    assert df.count() > 0


def test_multitable_lsh_recall_monotone_in_amplification(spark):
    """OR-amplification only ADDS candidate pairs (more tables / more
    probes = union of more buckets), so mean recall against the exact
    result is non-decreasing in n_tables and in multiprobe — the
    amplification analog of test_ivf_recall_monotonic_in_probes,
    measured fully in-engine."""
    from l1dbproto_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        multitable_lsh_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=5)

    def mean_recall(n_tables, multiprobe):
        approx = multitable_lsh_topk(
            emb, q, k=5, n_bits=8, n_tables=n_tables,
            multiprobe=multiprobe, dim=64,
        )
        return (
            ann_recall(approx, exact)
            .agg(F.avg("recall").alias("m"))
            .collect()[0]["m"]
        )

    r_1t = mean_recall(1, 0)
    r_4t = mean_recall(4, 0)
    r_4t_mp = mean_recall(4, 1)
    assert r_1t <= r_4t <= r_4t_mp, (r_1t, r_4t, r_4t_mp)
    assert r_4t_mp > r_1t  # amplification actually buys recall here


def test_multitable_lsh_query_at_scale_mode(spark):
    """broadcast_queries=False: identical results, and the probe join no
    longer forces a broadcast of the (|Q| x tables x probes) explode —
    the query-at-scale escape hatch for the one data-dependent broadcast
    in the family."""
    from l1dbproto_spark.operators.similarity import multitable_lsh_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    kw = dict(k=5, n_bits=8, n_tables=4, multiprobe=1, dim=64)
    a = multitable_lsh_topk(emb, q, **kw)
    b = multitable_lsh_topk(emb, q, broadcast_queries=False, **kw)
    rows_a = {(r.query_id, r.neighbor_id, r.rank) for r in a.collect()}
    rows_b = {(r.query_id, r.neighbor_id, r.rank) for r in b.collect()}
    assert rows_a == rows_b and rows_a
    plan_b = _executed(b)
    assert "CartesianProduct" not in plan_b, plan_b

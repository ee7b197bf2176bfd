"""SemDeDup (operators/semdedup.py): DuckDB oracle parity for cluster
assignment + within-cluster near-dup pairs, and the keep/drop invariants on
a corpus seeded with exact embedding clones.

Centroids are PINNED to four corpus vectors (the pluggable-quantizer path),
so every step — assignment argmax, pair cosine, drop rule — is pure column
algebra both engines reproduce bit-for-bit."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from l1dbproto_spark.operators.semdedup import (
    assign_clusters,
    semantic_dedup,
    semantic_dedup_pairs,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
_CENTROID_IDS = [0, 123, 251, 377]

# corpus = embeddings ∪ exact clones of vec_id<30 shifted by +1000: clones
# land in their original's cluster (identical score vector) and pair with it
# at cosine 1.0 — deterministic near-dups in an otherwise-random corpus
_E_CTE = f"""
base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM '{SF_DIR}/embeddings.parquet'
),
e AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 1000, v FROM base WHERE vec_id < 30
),
cent AS (
  SELECT CASE vec_id WHEN 0 THEN 0 WHEN 123 THEN 1
                     WHEN 251 THEN 2 WHEN 377 THEN 3 END AS cluster,
         v AS cv
  FROM base WHERE vec_id IN (0, 123, 251, 377)
),
assigned AS (
  SELECT vec_id, v, cluster FROM (
    SELECT e.vec_id, e.v, cent.cluster,
      ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY 2 * list_dot_product(e.v, cent.cv)
                 - list_dot_product(cent.cv, cent.cv) DESC, cent.cluster
      ) AS rn
    FROM e, cent
  ) t WHERE rn = 1
)
"""


def _corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    clones = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    return emb.unionByName(clones)


def _centroids(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    lookup = spark.createDataFrame(
        [(c, v) for c, v in enumerate(_CENTROID_IDS)], "cluster int, vec_id long"
    )
    return (
        emb.join(F.broadcast(lookup), "vec_id")
        .select("cluster", F.col("embedding").alias("centroid"))
    )


def test_assign_clusters_matches_oracle(spark):
    got = {
        r.vec_id: r.cluster
        for r in assign_clusters(_corpus(spark), _centroids(spark)).collect()
    }
    want = dict(
        duckdb.sql(f"WITH {_E_CTE} SELECT vec_id, cluster FROM assigned").fetchall()
    )
    assert got == want
    # centroid vectors sit in their own cluster; clones follow the original
    for cl, vid in enumerate(_CENTROID_IDS):
        assert got[vid] == cl
    for vid in range(30):
        assert got[vid + 1000] == got[vid]


def test_semantic_dedup_pairs_match_oracle(spark):
    got = {
        (r.id_a, r.id_b): (r.cluster, r.cosine_sim)
        for r in semantic_dedup_pairs(
            _corpus(spark), _centroids(spark), eps=0.05
        ).collect()
    }
    want = {
        (row[1], row[2]): (row[0], row[3])
        for row in duckdb.sql(
            f"""
            WITH {_E_CTE}
            SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 9) AS cosine_sim
            FROM assigned a JOIN assigned b
              ON a.cluster = b.cluster AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v))
                           * sqrt(list_dot_product(b.v, b.v))), 9) >= 0.95
            """
        ).fetchall()
    }
    assert got == want
    # each clone pairs with its original at cosine exactly 1.0
    for vid in range(30):
        assert got[(vid, vid + 1000)] == (got[(vid, vid + 1000)][0], 1.0)


def test_semantic_dedup_drops_clones(spark):
    corpus, cents = _corpus(spark), _centroids(spark)
    kept, dropped = semantic_dedup(corpus, cents, eps=0.05)
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    drop_rows = {r.vec_id: (r.canonical_id, r.cosine_sim) for r in dropped.collect()}
    # partition of the corpus
    assert kept_ids.isdisjoint(drop_rows)
    assert len(kept_ids) + len(drop_rows) == corpus.count()
    # every clone (id+1000 > id) is dropped with its original as canonical
    for vid in range(30):
        assert drop_rows[vid + 1000] == (vid, 1.0)
    # originals survive (smaller id is the deterministic canonical)
    assert all(vid in kept_ids for vid in range(30))
    # fixed point: no within-eps pair remains among the kept vectors
    assert semantic_dedup_pairs(kept, cents, eps=0.05).count() == 0
    # kept rows preserve the original schema
    assert kept.columns == corpus.columns


def test_semantic_dedup_anti_join_not_forced_broadcast(spark):
    """The kept-side anti-join must carry NO broadcast hint: the drop set
    is a data-dependent corpus fraction (20-50% at SemDeDup's published
    operating points), so a mandatory broadcast OOMs executors at scale.
    With the broadcast threshold disabled the planner must be free to pick
    a shuffled anti-join — a lingering F.broadcast hint would still show
    BroadcastHashJoin here and fail."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            conf.set(k, "-1")
        kept, _ = semantic_dedup(_corpus(spark), _centroids(spark), eps=0.05)
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        assert "LeftAnti" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_semantic_dedup_trained_drops_clones(spark):
    """The KMeans-trained path: clones are identical vectors, so whatever
    the trained quantizer looks like they share their original's cluster
    and must be dropped against it."""
    from l1dbproto_spark.operators.semdedup import semantic_dedup_trained

    corpus = _corpus(spark)
    kept, dropped = semantic_dedup_trained(corpus, n_clusters=8, eps=0.05)
    drop_rows = {r.vec_id: r.canonical_id for r in dropped.collect()}
    for vid in range(30):
        assert drop_rows[vid + 1000] == vid
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    assert kept_ids.isdisjoint(drop_rows)
    assert len(kept_ids) + len(drop_rows) == corpus.count()


def test_semantic_dedup_high_drop_rate_at_scale(spark):
    """Stress the drop-set path at SemDeDup's published operating points
    (20-50% drops) on sf0.1-scale row counts: a 30k-row corpus built from
    the sf0.1 embeddings where HALF of every base vector's replicas are
    exact clones, so >=40% of the corpus is guaranteed to drop. Guards the
    no-forced-broadcast fix: the cleaned-side plan must stay a plain
    anti-join (no nested-loop/cartesian fallback) and complete in bounded
    time even when the "small" side is a large corpus fraction."""
    import time

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    # 15 replicas per base vector: r in [0,7) exact clones (6 of each 7
    # guaranteed dropped against the min-id), r in [7,15) perturbed with
    # deterministic noise ~1.7x the unit vector norm -> cosine far below
    # the 0.95 keep threshold
    corpus = (
        emb.select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(14))).alias("r"),
        )
        .select(
            (F.col("vec_id") * 15 + F.col("r")).alias("vec_id"),
            F.when(F.col("r") < 7, F.col("embedding"))
            .otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: x
                    + 0.3
                    * F.sin(
                        F.col("vec_id") * 1.7 + F.col("r") * 13.37 + i * 0.61
                    ),
                )
            )
            .alias("embedding"),
        )
    )
    # pinned quantizer: every 8th base vector -> 250 clusters of ~120 rows
    cents = (
        emb.filter(F.col("vec_id") % 8 == 0)
        .select(
            (F.col("vec_id") / 8).cast("int").alias("cluster"),
            F.col("embedding").alias("centroid"),
        )
    )
    t0 = time.monotonic()
    kept, dropped = semantic_dedup(corpus, cents, eps=0.05)
    n_kept, n_dropped = kept.count(), dropped.count()
    elapsed = time.monotonic() - t0
    total = 2000 * 15
    assert n_kept + n_dropped == total
    assert n_dropped / total >= 0.30, (n_kept, n_dropped)
    # every base keeps at most 1 of its 7 exact clones
    assert n_dropped >= 2000 * 6
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # bounded runtime: the whole cycle (assign + pair join + anti-join)
    # on 30k rows x 64 dims must stay interactive on the 8-thread session
    assert elapsed < 240, elapsed

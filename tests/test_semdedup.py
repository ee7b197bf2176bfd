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

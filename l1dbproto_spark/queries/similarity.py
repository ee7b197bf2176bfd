"""Vector-similarity search queries over the embeddings table — the
generalization of the reference's cone cross-match (DIA.py:72-77, SURVEY.md
J1) to arbitrary-dimension embeddings. Builders in operators/similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import brute_force_topk, cosine, lsh_bucketed_topk
from ..sources.catalog import load_table
from . import query

_COS = """round(
      list_dot_product(qv, cv)
      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 9)"""


@query(
    "ann_topk_brute",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 20
    ),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {_COS} AS cosine_sim
      FROM c, q WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
    survey="ext:similarity (brute-force top-k); J1",
    headline=True,
)
def ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors vec_id<20: broadcast
    queries x corpus scan, ordered-fold dot product, per-query window."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return brute_force_topk(emb, queries, k=5)


@query(
    "ann_topk_lsh",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
            + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM e),
    scored AS (
      SELECT query_id, neighbor_id, {_COS} AS cosine_sim
      FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
    survey="ext:similarity (sign-LSH bucketed ANN)",
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: candidates restricted to the query's 4-bit sign-LSH
    bucket — the sub-linear scale path (1/16 of the corpus per query)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return lsh_bucketed_topk(emb, queries, k=5, n_bits=4)


@query(
    "ann_topk_ivf",
    oracle=None,  # k-means centroids are not reproducible in SQL; rows-only
    survey="ext:similarity (IVF-Flat ANN via MLlib KMeans coarse quantizer)",
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 for query vectors vec_id<20 (16 clusters,
    2 probes). Recall vs the exact brute force is pinned by
    tests/test_similarity_ivf.py."""
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return ivf_topk(emb, queries, k=5, n_clusters=16, n_probe=2)


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             a.v AS qv, b.v AS cv
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, {_COS} AS cosine_sim
    FROM pairs
    WHERE {_COS} >= 0.4
    """,
    survey="ext:dedup (embedding-cosine near-dup); J1",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine >= 0.4 — the threshold form of the
    reference's cone cross-match (inner product > cos(theta), DIA.py:72-77)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 9)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.4)
    )

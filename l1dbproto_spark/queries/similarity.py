"""Vector-similarity search queries over the embeddings table — the
generalization of the reference's cone cross-match (DIA.py:72-77, SURVEY.md
J1) to arbitrary-dimension embeddings. Builders in operators/similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import brute_force_topk, dot, l2_norm, lsh_bucketed_topk
from ..sources.catalog import load_table
from . import query

# Embedding width knob (None = ordered-fold dot products). Measured at
# dim=64 the unrolled dot_chain variant is SLOWER than the fold: the
# 64-term generated code exceeds the JIT method limits and the whole
# expression tree falls back to interpreted evaluation (~10x worse on the
# all-pairs join). The fold's per-element lambda stays a tight interpreter
# loop — keep it.
_DIM = None

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
    return brute_force_topk(emb, queries, k=5, dim=_DIM)


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
    return lsh_bucketed_topk(emb, queries, k=5, n_bits=4, dim=_DIM)


_CSCORE = "2 * list_dot_product({v}, cent.cv) - list_dot_product(cent.cv, cent.cv)"


@query(
    "ann_topk_ivf",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT CAST(vec_id AS INT) AS cluster, v AS cv FROM e WHERE vec_id < 16),
    assigned AS (
      SELECT neighbor_id, cvec, cluster FROM (
        SELECT e.vec_id AS neighbor_id, e.v AS cvec, cent.cluster,
               {_CSCORE.format(v='e.v')} AS s,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_CSCORE.format(v='e.v')} DESC, cent.cluster
               ) AS rn
        FROM e CROSS JOIN cent
      ) t WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, cluster FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, cent.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_CSCORE.format(v='q.v')} DESC, cent.cluster
               ) AS rn
        FROM e q CROSS JOIN cent WHERE q.vec_id < 20
      ) t WHERE rn <= 2
    ),
    scored AS (
      SELECT p.query_id, a.neighbor_id,
             {_COS.replace('qv', 'p.qv').replace('cv', 'a.cvec')} AS cosine_sim
      FROM assigned a JOIN probes p USING (cluster)
      WHERE a.neighbor_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
    survey="ext:similarity (IVF-Flat ANN: centroid assignment + n_probe pruning, cluster-side)",
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 with genuine probe pruning (16 centroids,
    n_probe=2 — each query scans ~1/8 of the corpus), fully oracle-checked:
    the coarse quantizer is a deterministic fixed centroid table (the first
    16 corpus vectors) so DuckDB reproduces assignment, probing, and top-k
    bit-for-bit via the shared centroid_score ordering. The KMeans-trained
    variant (operators.similarity.ivf_topk) runs the same cluster-side plan
    with learned centroids; its recall is pinned by
    tests/test_similarity_ivf.py."""
    from ..operators.similarity import ivf_topk_with_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    return ivf_topk_with_centroids(emb, queries, centroids, k=5, n_probe=2, dim=_DIM)


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
    from ..operators.dedup import _spread

    emb = load_table(spark, sf_dir, "embeddings")
    a = _spread(emb, "vec_id").select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("va"),
        l2_norm(F.col("embedding"), _DIM).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding"), _DIM).alias("nb"),
    )
    sim = F.round(dot(F.col("va"), F.col("vb"), _DIM) / (F.col("na") * F.col("nb")), 9)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.4)
    )


@query(
    "quantized_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
               AS amax
      FROM embeddings
    ),
    qz AS (
      SELECT vec_id, v, amax / 127.0 AS scale,
             CASE WHEN amax = 0
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(
                    v, x -> CAST(floor(x / (amax / 127.0) + 0.5) AS BIGINT))
             END AS qvint
      FROM e
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, scale AS qscale, qvint AS qq
          FROM qz WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, scale AS cscale, qvint AS qc
          FROM qz),
    scored AS (
      SELECT query_id, neighbor_id, qv, cv,
             (CAST(list_dot_product(qc, qq) AS DOUBLE) * qscale) * cscale
               AS approx_dot
      FROM c, q WHERE neighbor_id <> query_id
    ),
    cand AS (
      SELECT query_id, neighbor_id, qv, cv FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id
        ) AS prn
        FROM scored
      ) t WHERE prn <= 20
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT query_id, neighbor_id, {_COS} AS cosine_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY {_COS} DESC, neighbor_id
             ) AS rank
      FROM cand
    ) t WHERE rank <= 5
    """,
    survey="ext:similarity (int8 quantized pre-filter + exact re-rank top-k)",
)
def quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors via int8 symmetric quantization: integer-dot
    pre-filter to k*refine=20 candidates per query, exact float cosine
    re-rank. Every stage is closed-form (floor-half-up rounding, exact int64
    dot) so DuckDB reproduces candidates, similarities, and ranks
    bit-for-bit (operators/quantize.py)."""
    from ..operators.quantize import quantized_topk as _qtopk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return _qtopk(emb, queries, k=5, refine=4)

"""Vector-similarity search over embedding columns.

The reference's cone cross-match IS a cosine-similarity threshold scan
(``DIA.py:72-77``: ``numpy.inner(pointing_xyz, vars) > cos(open_angle/2)`` —
SURVEY.md J1); these operators generalize it from 3-d unit vectors to
arbitrary-dimension embeddings:

* brute-force top-k: crossJoin(queries x corpus) with a fold-based dot
  product + per-query window. Exact; the baseline. At scale the queries side
  is broadcast, so the corpus is scanned once with no shuffle until top-k.
* sign-LSH bucketed: coarse quantization by the sign pattern of leading
  dimensions (deterministic axis-aligned hyperplanes) — candidates only
  within the query's bucket; the sub-linear scale path (trade recall for a
  1/2^b scan fraction).

Dot products are computed as an ordered left fold in double precision so the
DuckDB oracle (list_dot_product over DOUBLE[]) produces bit-identical sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_fold(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product in double precision (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected to be small (it is broadcast); the corpus side is
    scanned once per partition with the dot product evaluated in codegen'd
    array expressions — no shuffle until the per-query top-k window."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    sim = F.round(cosine(F.col("qvec"), F.col("cvec")), round_digits)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def sign_lsh_bucket(vec: Column, n_bits: int = 4) -> Column:
    """Deterministic sign-pattern bucket from the leading n_bits dimensions:
    bucket = sum(2^i * (v[i] > 0)). Axis-aligned random-hyperplane LSH."""
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(vec, i + 1).cast("double") > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return bucket


def ivf_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Train an IVF coarse quantizer (k-means on the corpus) and return
    (assigned_corpus, model): the corpus with a ``cluster`` column plus the
    fitted model for assigning queries. MLlib KMeans is the distributed
    trainer; at 100 TB train on a sample and broadcast the centroids."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="_features", predictionCol="cluster"
    ).fit(vecs)
    assigned = model.transform(vecs).drop("_features")
    return assigned, model


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: scan only the ``n_probe`` clusters nearest each
    query (by centroid distance). The cluster equi-join prunes the corpus to
    ~n_probe/n_clusters of its size — the inverted-file ANN pattern
    (IVF-Flat), with recall tunable via n_probe."""
    import numpy as np

    assigned, model = ivf_index(corpus, n_clusters, vec_col, seed)
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])

    # nearest n_probe centroids per query, computed driver-side per query
    # batch (queries are small/broadcast by contract)
    q_rows = queries.select(id_col, vec_col).collect()
    probe_pairs = []
    for r in q_rows:
        v = np.asarray(r[vec_col], dtype=float)
        d = ((centers - v) ** 2).sum(axis=1)
        for c in np.argsort(d)[:n_probe]:
            probe_pairs.append((r[id_col], int(c)))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_pairs, f"query_id long, cluster int")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).join(probes, "query_id")

    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "cluster"
    )
    sim = F.round(cosine(F.col("qvec"), F.col("cvec")), 9)
    scored = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .dropDuplicates(["query_id", "neighbor_id"])  # n_probe overlap safety
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket (expected 1/2^n_bits of the corpus scanned per query). The
    bucket equi-join replaces the cross join — at 100 TB this is the
    difference between a full scan per query and a pruned hash-join."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    sim = F.round(cosine(F.col("qvec"), F.col("cvec")), round_digits)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= k)

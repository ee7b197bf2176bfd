"""Semantic deduplication (SemDeDup, Abbas et al. 2023): drop documents
whose EMBEDDINGS are near-identical, catching paraphrases and template
re-renders that token-level dedup (exact / Jaccard / MinHash) cannot see.

The published algorithm: k-means-cluster the embedding space, then inside
each cluster drop all but one member of every cosine-similarity-above-eps
group. Clustering is what makes it tractable — pair comparison happens
only WITHIN a cluster, so the quadratic term is bounded by the largest
cluster, not the corpus.

Spark shape (all column algebra, reusing the IVF machinery from
operators/similarity.py):

1. assign every vector to its nearest centroid — broadcast centroid table,
   map-side argmax via ``max_by``, ONE uniform shuffle on the vector id;
2. within-cluster pair join keyed on ``cluster`` — pairs materialize only
   inside clusters; per-cluster skew is the knob the centroid count
   controls (more centroids = smaller clusters = fewer pairs);
3. keep rule: a vector is dropped iff SOME same-cluster vector with a
   smaller id is within eps (``cos >= 1 - eps``) — deterministic, one
   aggregation, no iteration. (The paper keeps the member farthest from
   the centroid; min-id is the engine's standard deterministic canonical,
   matching clean_corpus's exact/near stages.)

Like ``ann_topk_ivf``, the quantizer is pluggable: pass a deterministic
centroid table (tests pin it to fixed corpus vectors so a DuckDB oracle
reproduces every step) or train one with ``similarity.ivf_index``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import pin

from .similarity import _nearest_centroids, _spread, dot, l2_norm


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment: (id, vec, cluster). Broadcast
    centroids, map-side ``max_by`` argmax — the n_centroids-fold row
    expansion collapses before any exchange (see similarity._nearest_centroids)."""
    vecs = vectors.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")
    )
    cent = centroids.select("cluster", F.col("centroid").alias("_cvec"))
    assigned = _nearest_centroids(vecs, cent, n=1, id_alias=id_col, dim=dim)
    return assigned.select(
        F.col(id_col), F.col("_v").alias(vec_col), "cluster"
    )


def semantic_dedup_pairs(
    vectors: DataFrame,
    centroids: DataFrame,
    eps: float = 0.05,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    round_digits: int = 9,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (id_a < id_b, cluster,
    cosine_sim) with ``cosine >= 1 - eps``. The pair join is keyed on
    ``cluster`` — Spark shuffles each side once on the cluster id and the
    quadratic expansion is per-cluster only."""
    a = assign_clusters(_spread(vectors, id_col), centroids, vec_col, id_col, dim)
    a = a.select(
        F.col(id_col),
        "cluster",
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col), dim).alias("_n"),
    ).filter((F.col("_n") > 0) & ~F.isnan("_n"))  # degenerate-vector guard: zero-norm/NULL/
    # NaN vectors have no defined cosine and would ANSI-error the pair join
    left = a.select(
        F.col(id_col).alias("id_a"),
        "cluster",
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    right = a.select(
        F.col(id_col).alias("id_b"),
        "cluster",
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    sim = F.round(
        dot(F.col("_va"), F.col("_vb"), dim) / (F.col("_na") * F.col("_nb")),
        round_digits,
    )
    return (
        left.join(right, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("cluster", "id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= F.lit(1.0 - eps))
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    eps: float = 0.05,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup keep/drop split. Returns (kept vectors — original columns,
    drop log (id, canonical_id, cosine_sim) where canonical is the dropped
    vector's most-similar smaller-id NEIGHBOR, ties to the smallest id —
    the neighbor may itself be dropped when eps-chains overlap (a<b<c
    with a~b and b~c but not a~c drops both b and c, c's canonical being
    b): the drop set is exactly "non-minimal in the eps-graph", and a
    survivor-canonical view is one connected_components /
    resolve_canonicals pass over the pair log).

    Drop rule: id_b is dropped iff some same-cluster id_a < id_b has
    ``cos(a, b) >= 1 - eps``. One aggregation over the pair stream + an
    anti-join — no iteration, no driver collect.

    The anti-join deliberately carries NO broadcast hint: the drop set is a
    data-dependent fraction of the corpus (SemDeDup's published operating
    points drop 20-50% of documents), so forcing a broadcast would OOM
    executors at real scale. AQE sizes the join at runtime — it broadcasts
    when the drop set is genuinely small and falls back to a shuffled
    anti-join when it is not (plan-asserted in test_semdedup.py)."""
    pairs = semantic_dedup_pairs(
        vectors, centroids, eps, vec_col, id_col, dim
    )
    # id-sized drop log consumed by both outputs — checkpoint so the
    # within-cluster pair join behind it runs once, not once per output.
    # localCheckpoint blocks are executor-resident (job fails rather than
    # recomputes on executor loss); see clean_corpus's docstring for the
    # trade-off and the reliable-checkpoint alternative
    dropped = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.max_by(
            "id_a", F.struct(F.col("cosine_sim"), (-F.col("id_a")).alias("na"))
        ).alias("canonical_id"),
        F.max("cosine_sim").alias("cosine_sim"),
    ).transform(pin, eager=False)
    kept = vectors.join(dropped.select(id_col), id_col, "left_anti")
    return kept, dropped


def semantic_dedup_trained(
    vectors: DataFrame,
    n_clusters: int = 16,
    eps: float = 0.05,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup with a KMeans-trained quantizer (the paper's actual
    pipeline): train via ``similarity.ivf_index`` (MLlib, distributed),
    lift the fitted centroids into the (cluster, centroid) table, and run
    :func:`semantic_dedup`. The centroid table is n_clusters rows — it
    crosses the driver once and broadcasts, the same shape as the pinned
    path, so everything downstream keeps its plan. At 100 TB: train on a
    sample (KMeans cost is per-iteration linear in rows), pick
    ``n_clusters`` ~ sqrt(corpus) or higher so the within-cluster
    quadratic term stays bounded."""
    from .similarity import ivf_index

    _, model = ivf_index(vectors, n_clusters, vec_col, seed)
    spark = vectors.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    )
    return semantic_dedup(vectors, centroids, eps, vec_col, id_col, dim)

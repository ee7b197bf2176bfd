"""PCA dimensionality reduction for the embedding family — the standard
pre-ANN compression stage (project 768-d encoder outputs to 64-128 d
before IVF/PQ indexing; Jegou et al. 2011 §V evaluate exactly this
composition).

Scale decomposition, matching the engine's other trained operators
(KMeans centroids, PQ codebooks, classifier coefficients):

* FITTING uses MLlib's distributed PCA (covariance accumulation is one
  pass over the corpus, reduce-side eigendecomposition on the d x d
  Gram — d is the embedding width, driver-trivial). The fitted basis is
  a k-row (component_id, component) table — BOUNDED BY CONSTRUCTION,
  the artifact to persist.
* PROJECTION never touches MLlib: the basis folds to a single
  array<array<double>> row, crossJoin-broadcast onto the corpus scan,
  and each output coordinate is an ordered-fold dot product — map-side
  column algebra, zero shuffles, one scan.

Semantics pinned to MLlib's: projection is the raw matrix product
``x @ PC`` (MLlib's PCA derives components from the covariance — i.e.
centered — but transforms WITHOUT subtracting the mean; an orthonormal
basis preserves dot products up to the discarded subspace either way).
Component SIGNS are an eigensolver convention, not a property of the
data — equality tests must compare |values| or fix signs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import dot_fold


def fit_pca(
    vectors: DataFrame,
    k: int,
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Fit a k-component basis on the corpus (MLlib, distributed).
    Returns ((component_id, component array<double>) — k bounded rows in
    descending explained-variance order, explained-variance ratios)."""
    from pyspark.ml.feature import PCA as MLPCA
    from pyspark.ml.functions import array_to_vector

    spark = vectors.sparkSession
    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        )
    )
    model = MLPCA(k=k, inputCol="features", outputCol="_p").fit(feats)
    pc = model.pc.toArray()  # d x k
    comps = [
        (j, [float(pc[i][j]) for i in range(pc.shape[0])])
        for j in range(pc.shape[1])
    ]
    return (
        spark.createDataFrame(
            comps, "component_id int, component array<double>"
        ),
        [float(v) for v in model.explainedVariance],
    )


def pca_project(
    vectors: DataFrame,
    components: DataFrame,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Project every vector onto the basis: ``out[j] = <vec, pc_j>``.
    The k-row basis folds to ONE array<array<double>> row (in
    component_id order) and crossJoin-broadcasts onto the scan; each
    coordinate is an ordered-fold dot product evaluated map-side. The
    projected column replaces ``vec_col`` unless ``out_col`` names a new
    one — frame shape stays pipeline-compatible either way."""
    target = out_col or vec_col
    # array_sort on (id, component) structs — collect_list order is not
    # contractual, the sort inside the row is
    basis = components.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("component_id", "component"))
            ),
            lambda s: s["component"],
        ).alias("_pcs")
    )
    projected = F.transform(
        F.col("_pcs"), lambda c: dot_fold(F.col(vec_col), c)
    )
    return (
        vectors.crossJoin(F.broadcast(basis))
        .withColumn(target, projected)
        .drop("_pcs")
    )

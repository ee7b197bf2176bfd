"""Deterministic corpus sampling — the training-mix construction layer.

A pretraining run consumes a WEIGHTED MIXTURE of sources (upsample the
high-quality slice, downsample the crawl), and evaluation sets are built by
STRATIFIED sampling (k per language/domain/bucket). Both are implemented
here as hash-deterministic column algebra, for the same reasons
``split_corpus`` is (operators/corpus.py): stable across runs and engines,
no shuffle for the Bernoulli form, membership decidable per document
without seeing the corpus, and bit-for-bit reproducible by a DuckDB oracle
(tests/test_sampling.py).

Scale shape: ``sample_mixture`` is a pure per-row filter (zero shuffles,
fully codegen'd — the 100 TB scan is the cost floor); ``stratified_sample``
is one hash-partitioned window per stratum (skew-free when strata are
bounded; a mega-stratum only sorts ITS OWN rows, and only by the 48-bit
hash key). ``with_repeats`` turns >1.0 mixture rates into integer epoch
repeats + a fractional tail draw, the standard upsampling form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Deterministic u in [0, 1): 48-bit md5 prefix of salt+id (exact in a
    double; identical in DuckDB via the same md5/substr/conv formula)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 12),
        16,
        10,
    )
    return h.cast("double") / F.lit(float(1 << 48))


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "lang",
    salt: str = "mix-v1",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Weighted-mixture subsample: keep each document of source s with
    probability ``rates[s]`` (deterministic per id). Sources absent from
    ``rates`` keep ``default_rate``. Rates are clamped to [0, 1] — use
    :func:`with_repeats` for upsampling above 1.0.

    One per-row comparison against the per-source threshold: no shuffle, no
    state, and re-running on a grown corpus keeps every previously-sampled
    document (the hash is per-id, so the sample is append-stable — the
    property that lets a mixture be rebuilt incrementally at 100 TB)."""
    u = _unit_hash(F.col(id_col), salt)
    clamp = lambda r: min(max(float(r), 0.0), 1.0)  # noqa: E731
    thresh = None
    for name, rate in rates.items():
        branch = (F.col(source_col) == name, F.lit(clamp(rate)))
        thresh = (
            F.when(*branch) if thresh is None else thresh.when(*branch)
        )
    default = F.lit(clamp(default_rate))
    thresh = thresh.otherwise(default) if thresh is not None else default
    return docs.filter(u < thresh)


def with_repeats(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "lang",
    salt: str = "mix-v1",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Mixture sampling with upsampling: a rate of 2.3 emits every document
    of that source twice (``repeat`` 0 and 1) plus a 0.3-probability third
    copy. Adds a ``repeat`` index column (the loader's dedup/epoch key).
    Sources absent from ``rates`` get ``default_rate`` (0.0 — dropped —
    unless overridden), mirroring :func:`sample_mixture`; rates are clamped
    below at 0 but NOT above (values > 1 are the point here).
    Implemented as floor(rate) full repeats via a ``sequence`` explode plus
    one fractional-tail hash draw — deterministic like everything else
    here."""
    clamp = lambda r: max(float(r), 0.0)  # noqa: E731
    rate_expr = None
    for name, rate in rates.items():
        branch = (F.col(source_col) == name, F.lit(clamp(rate)))
        rate_expr = (
            F.when(*branch) if rate_expr is None else rate_expr.when(*branch)
        )
    default = F.lit(clamp(default_rate))
    rate_expr = (
        rate_expr.otherwise(default) if rate_expr is not None else default
    )
    u = _unit_hash(F.col(id_col), salt)
    full = F.floor(rate_expr).cast("int")
    frac = rate_expr - full
    n_copies = (full + F.when(u < frac, F.lit(1)).otherwise(F.lit(0))).alias(
        "_n_copies"
    )
    return (
        docs.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            "repeat", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )


def stratified_sample(
    docs: DataFrame,
    k: int,
    strata_cols: list[str] | str = "lang",
    salt: str = "strat-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """k documents per stratum, chosen by hash order (the deterministic
    analogue of a uniform draw): rank documents within each stratum by the
    48-bit id hash (tie-break on id) and keep rank <= k. Adds the rank as
    ``sample_rank``.

    This is a deterministic hash-rank sample — the same marginal coverage a
    reservoir sample gives, with the stronger property that the chosen set
    is a pure function of (ids, salt): stable across runs, engines, and row
    order. One hash-partitioned window per stratum; each task sorts only
    its stratum's rows by a uniform 48-bit key, so the plan is
    skew-tolerant and engine-reproducible (ROW_NUMBER over the same hash in
    DuckDB)."""
    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    u = _unit_hash(F.col(id_col), salt)
    w = Window.partitionBy(*strata_cols).orderBy(F.asc("_u"), F.asc(id_col))
    return (
        docs.withColumn("_u", u)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
        .drop("_u")
    )

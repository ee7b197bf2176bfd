"""Approximate-analytics sketches — the operators that replace exact
distinct/quantile/frequency aggregation when the column is 100 TB wide.

Exact COUNT(DISTINCT) shuffles every distinct value; a quantile sort is a
full exchange of the column. The sketch forms bound both to a fixed-size
state per group that PARTIAL-AGGREGATES map-side and MERGES associatively,
so the shuffle carries kilobytes per group regardless of input size:

* ``approx_distinct_per_group`` — HyperLogLog++ distinct counts
  (``approx_count_distinct``, relative error ``rsd``);
* ``hll_rollup`` / ``hll_estimate`` — persistent Apache DataSketches HLL
  sketches as binary columns (``hll_sketch_agg``): build per-group
  sketches ONCE, then answer any union of groups (`hll_union_agg`)
  without rescanning the data — the re-aggregatable form a metrics layer
  stores;
* ``approx_quantiles_per_group`` — rank-error-bounded quantiles
  (``percentile_approx``, Greenwald-Khanna style, error ``1/accuracy``);
* ``frequent_items_per_group`` — exact heavy hitters above a support
  threshold: ONE uniform-key aggregation plus a window over the already-
  aggregated (group, item) counts (the candidate set is bounded by
  1/support per group).

Sketch estimates are implementation-defined (Spark's HLL++ and DuckDB's
HLL disagree by design), so those are checked in-suite against EXACT
answers with the published error bounds (tests/test_sketches.py), not by
value-hash oracles; ``frequent_items_per_group`` is exact and holds a
driver-registry slot (queries/events.py) with a value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hll_input(df: DataFrame, value_col: str):
    """``value_col`` in an hll_sketch_agg-accepted form. The builtin takes
    int/long/string/binary only; every other type (double, date,
    timestamp, decimal, boolean) is canonicalized to its string form —
    bijective per distinct value, so the distinct count is unchanged (the
    one standard caveat: -0.0 and 0.0 stringify differently, and all NaNs
    stringify identically). Shared by hll_rollup and the continuous
    aggregate (streaming/rollup.py)."""
    # resolve the dtype the way the analyzer resolves F.col: case-
    # insensitively; names it can see but dtypes can't (nested refs,
    # exotic case collisions) fall back to the always-accepted string cast
    vtype = {k.lower(): t for k, t in df.dtypes}.get(value_col.lower())
    if vtype in ("int", "bigint", "smallint", "tinyint", "string", "binary"):
        return F.col(value_col)
    return F.col(value_col).cast("string")


def approx_distinct_per_group(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group approximate distinct count: (group cols, approx_distinct).
    HLL++ with relative standard deviation ``rsd`` — fixed sketch size per
    group, fully partial-aggregatable, so the exchange is O(groups), never
    O(distinct values)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )


def hll_rollup(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Materialize a per-group DataSketches HLL sketch: (group cols,
    ``hll_sketch`` binary, ``approx_distinct``). The sketch column is the
    re-aggregatable artifact: store it per (day, source) and roll up any
    (date range, source set) later via :func:`hll_estimate` without
    touching the raw data — the pattern that turns a 100 TB distinct-user
    question into a kilobyte merge.

    ``hll_sketch_agg`` accepts int/long/string/binary only; other types
    (double, date, timestamp, decimal, boolean) are canonicalized to
    their string form first — bijective per distinct value, so the
    distinct count is unchanged (the one standard caveat: -0.0 and 0.0
    stringify differently, and all NaNs stringify identically)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    val = hll_input(df, value_col)
    sk = F.hll_sketch_agg(val, F.lit(lg_config_k))
    return df.groupBy(*group_cols).agg(
        sk.alias("hll_sketch"),
    ).withColumn(
        "approx_distinct", F.hll_sketch_estimate("hll_sketch").cast("long")
    )


def hll_estimate(
    sketches: DataFrame,
    group_cols: list[str] | str | None = None,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Merge previously-built HLL sketches (optionally re-grouped by a
    coarser key) and estimate: (group cols?, approx_distinct). Union of
    sketches == sketch of unions, so estimates over any group combination
    come from the stored sketches alone."""
    merged = F.hll_union_agg(F.col(sketch_col))
    if group_cols is None:
        agg = sketches.agg(merged.alias("_m"))
    else:
        if isinstance(group_cols, str):
            group_cols = [group_cols]
        agg = sketches.groupBy(*group_cols).agg(merged.alias("_m"))
    return agg.withColumn(
        "approx_distinct", F.hll_sketch_estimate("_m").cast("long")
    ).drop("_m")


def approx_quantiles_per_group(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    probabilities: list[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles: (group cols, ``quantiles`` array,
    one entry per requested probability). Rank error is at most
    ``1/accuracy`` of the group size — the returned value is an ACTUAL
    group element whose rank is within that bound, so tests can verify the
    rank directly. Partial-aggregatable; the exchange carries one bounded
    summary per group."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(value_col, probs, F.lit(accuracy)).alias("quantiles")
    )


def frequent_items_per_group(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    min_support: float = 0.01,
) -> DataFrame:
    """Heavy hitters: values occurring in more than ``min_support`` of a
    group's rows — (group cols, ``item``, ``item_count``, ``group_count``,
    ``support``). One uniform-key (group, value) aggregation with map-side
    partial combine, then a window over the aggregated counts; the output
    is bounded by ``groups / min_support`` rows total, so the result set
    stays small at any input scale (the exact-counting analogue of a
    count-min pass).

    The input is scanned ONCE: group totals come from a window over the
    already-aggregated (group, item) counts — sum(item_count) per group —
    not a second pass over the raw rows, so everything after the first
    aggregation operates on the distinct-item table, never the corpus."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    counts = df.groupBy(*group_cols, F.col(value_col).alias("item")).agg(
        F.count(F.lit(1)).alias("item_count")
    )
    w = Window.partitionBy(*group_cols)
    return (
        counts.withColumn("group_count", F.sum("item_count").over(w))
        .withColumn(
            "support", F.col("item_count").cast("double") / F.col("group_count")
        )
        .filter(F.col("support") > min_support)
    )

"""Time-series regularization: resample-to-grid with gap filling.

Event streams are irregular; models and dashboards want regular grids
("daily value per user, carrying the last observation forward through
silent days"). The reference's metrics pipeline rolls logs up to
fixed-cadence rows for its CSV/Influx sinks (SURVEY §2 A5/A6, W5/W6 —
`log2csv.py`'s per-interval means); this operator generalizes that to
per-key calendar grids with explicit gap semantics, all in native column
algebra:

1. bucket: ``date_trunc`` to the grid unit — a pure map;
2. aggregate: exact-decimal sums per (key, bucket) — ONE uniform shuffle;
3. densify: per-key [min_bucket, max_bucket] bounds (map-side-combined
   agg), then ``explode(sequence(lo, hi, interval))`` — the grid is
   GENERATED, never joined against a calendar table;
4. fill: left join observations onto the grid (same uniform key) and
   carry forward with ``last(value, ignorenulls)`` over the per-key
   bucket order.

Scale: every shuffle keys on (entity, bucket) or entity — uniform,
AQE-splittable; the window partitions by entity (bounded rows per entity =
its bucket span); grid size is sum of per-entity spans, output-bound like
any densification. No UDFs anywhere.

Determinism contract (DuckDB oracle in `queries/events.py`): sums are
exact DECIMAL(12,2) cast to double after aggregation; the carry-forward is
a ROWS-frame window with a total (bucket) order per key; gap flags are
null-checks on the pre-fill column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_UNIT_TO_INTERVAL = {
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 1 week",
}


def gap_fill_resample(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
) -> DataFrame:
    """Per-``key_col`` regular ``unit`` grid from each key's first to last
    observed bucket, with exact-decimal sums, observation counts, a gap
    flag, and last-observation-carried-forward fill.

    Returns (key, bucket_ts, n_events, sum_value, filled_value, is_gap):
    ``sum_value`` is NULL on gap buckets, ``filled_value`` carries the
    previous non-gap sum forward (never NULL — each key's first bucket is
    observed by construction).
    """
    if unit not in _UNIT_TO_INTERVAL:
        raise ValueError(f"gap_fill_resample: unit must be one of {sorted(_UNIT_TO_INTERVAL)}")
    key = F.col(key_col)
    bucket = F.date_trunc(unit.upper(), F.col(ts_col))

    agg = (
        events.select(key.alias("key"), bucket.alias("bucket_ts"), F.col(value_col).alias("v"))
        .groupBy("key", "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("v").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
    )
    bounds = agg.groupBy("key").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    grid = bounds.select(
        "key",
        F.explode(F.sequence("lo", "hi", F.expr(_UNIT_TO_INTERVAL[unit]))).alias("bucket_ts"),
    )
    joined = grid.join(agg, ["key", "bucket_ts"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("key").alias(key_col),
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("sum_value").isNull().alias("is_gap"),
    )

"""The log2csv / log2influx metrics pipeline (SURVEY.md §3.3) — batch and
Structured Streaming forms.

Reference behavior: accumulate per-visit per-metric means
(``log2csv.py:62-96,126-132`` — A5), emit one wide CSV row per visit with a
fixed column list (``:156-217`` — A9), flushing a visit only once >2 newer
visits are buffered (``:334-338`` — W5, the hand-rolled watermark); log2influx
adds a 100-line bounded reorder buffer (``log2influx.py:98-116`` — W6).

Spark-first: the per-visit grouping is a keyed aggregation; the reorder/flush
machinery is deleted in batch (global shuffle handles order) and replaced by
``withWatermark`` in streaming — the engine-native form of the same bounded-
disorder contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the per-table select/insert timers the reference reports (log2csv.py:101-109)
TABLES = ("DiaObject", "DiaObjectLast", "DiaSource", "DiaForcedSource")
TIMER_METRICS = ("select_time", "insert_time", "store_time", "visit_processing_time")
COUNTER_METRICS = ("read_counts", "store_counts")


def per_visit_stats(parsed: DataFrame) -> DataFrame:
    """A5/A6: per (visit, name, table) mean of the 'real' timer value and sum
    of counts — the _Stat accumulation (``log2csv.py:62-96``)."""
    return (
        parsed.select(
            "ts",
            "visit",
            "name",
            "table",
            F.col("values.real").alias("real"),
            F.col("values.count").alias("count"),
        )
        .groupBy("visit", "name", "table")
        .agg(
            F.avg("real").alias("avg_real"),
            F.sum("count").alias("sum_count"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


def visit_wide_row(parsed: DataFrame) -> DataFrame:
    """A9: one wide row per visit — metric x table pivoted to columns, the
    reference's CSV row shape (``log2csv.py:156-217``). Explicit pivot values
    keep the plan single-pass."""
    keyed = parsed.select(
        "visit",
        F.concat_ws(
            "_",
            F.col("name"),
            F.coalesce(F.col("table"), F.lit("all")),
        ).alias("metric"),
        F.col("values.real").alias("real"),
    )
    metric_values = sorted(
        [f"{m}_{t}" for m in ("select_time", "insert_time") for t in TABLES]
        + [f"{m}_all" for m in ("store_time", "visit_processing_time")]
    )
    return (
        keyed.groupBy("visit")
        .pivot("metric", metric_values)
        .agg(F.round(F.avg("real"), 9))
        .orderBy("visit")
    )


def sum_select_real(wide: DataFrame) -> DataFrame:
    """A7: derived aggregate column — sum of the three per-table select
    averages (``log2csv.py:191-203``)."""
    cols = [f"select_time_{t}" for t in ("DiaObject", "DiaSource", "DiaForcedSource")]
    total = None
    for c in cols:
        term = F.coalesce(F.col(c), F.lit(0.0))
        total = term if total is None else total + term
    return wide.withColumn("sum_select_real", total)


def streaming_per_visit_stats(parsed_stream: DataFrame, watermark: str = "2 minutes") -> DataFrame:
    """The W5/W6 bounded-disorder contract in engine-native form: a watermark
    on the log timestamp bounds how late lines may arrive (the reference's
    >2-visit buffer / 100-line sort window), then the same per-visit
    aggregation in append mode."""
    return (
        parsed_stream.withWatermark("ts", watermark)
        .select(
            "ts",
            "visit",
            "name",
            "table",
            F.col("values.real").alias("real"),
            F.col("values.count").alias("count"),
        )
        .groupBy(F.window("ts", "1 minute"), "visit", "name", "table")
        .agg(
            F.avg("real").alias("avg_real"),
            F.sum("count").alias("sum_count"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .drop("window")
    )

"""Event-stream analytics in batch form: tumbling windows, pivot-to-wide,
sessionization, day/night gating, JSON payload extraction.

These are the batch formulations of the reference's streaming metrics pipeline
(SURVEY.md §2.4 A5-A9, §2.8 T1-T2, §2.2 P8, §2.7 F11): the same plans run
under Structured Streaming in l1dbproto_spark.streaming with watermarks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# Unregistered in driver round 10 (50-slot registry cap): slot went to the
# round-9 serving components. The oracle stays here as a constant so the
# in-suite battery test and the SQL-surface test share one definition.
FREQUENT_ITEMS_ORACLE = """
SELECT event_type, item, item_count,
       CAST(group_count AS BIGINT) AS group_count,
       CAST(item_count AS DOUBLE) / group_count AS support
FROM (
  SELECT event_type,
         date_trunc('day', ts) AS item,
         COUNT(*) AS item_count,
         SUM(COUNT(*)) OVER (PARTITION BY event_type) AS group_count
  FROM events
  GROUP BY 1, 2
)
WHERE CAST(item_count AS DOUBLE) / group_count > 0.02
"""


def frequent_items_per_group_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (operators/sketches.frequent_items_per_group):
    per event type, the DAYS holding more than 2% of that type's events —
    the sketch family's one exact, hash-oracle-able member. Single scan:
    one (group, item) aggregation; group totals come from a window over the
    already-aggregated counts, never a second pass over the raw events.
    Support is exact integer-count division — bit-identical across engines.

    Unregistered in driver round 10 (50-slot registry cap): its slot went
    to the round-9 serving components; the SAME oracle
    (FREQUENT_ITEMS_ORACLE) is checked driver-grade in
    tests/test_unregistered_batteries.py, and the sketch family keeps
    test_sketches coverage."""
    from ..operators.sketches import frequent_items_per_group

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("DAY", F.col("ts")).alias("day")
    )
    return frequent_items_per_group(ev, "event_type", "day", min_support=0.02)


@query(
    "visit_window_agg",
    oracle="""
    SELECT
      date_trunc('hour', ts) AS window_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
      COUNT(DISTINCT user_id) AS n_users,
      COUNT(*) FILTER (
        WHERE NOT (EXTRACT(hour FROM ts) >= 6 AND EXTRACT(hour FROM ts) < 20)
      ) AS n_night_events
    FROM events
    GROUP BY 1, 2
    """,
    survey="A5,A6,T1 + P8 (day/night duty-cycle gate as conditional count)",
    headline=True,
)
def visit_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation — the per-visit metric aggregation
    (log2csv.py:96,126-132: count/sum/avg per visit per key), keyed by an
    hour window instead of visit id; n_night_events applies the reference's
    day/night duty-cycle gate (6 <= hour < 20 skipped, ap_proto.py:66-81) as
    a conditional count. Streaming variant: groupBy(window(ts,'1 hour'),
    event_type) with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    sum_dec = F.sum(F.col("value").cast("decimal(12,2)"))
    hour = F.hour("ts")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            n.alias("n_events"),
            sum_dec.cast("double").alias("sum_value"),
            (sum_dec.cast("double") / n).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
            F.count_if(~((hour >= 6) & (hour < 20))).alias("n_night_events"),
        )
    )


# Rotated out of the driver registry in driver round 8 (slot to retrieval_eval);
# the identical oracle runs in-suite: tests/test_unregistered_batteries.py
# test_metrics_pivot_wide_matches_oracle. A9 keeps its streaming/metrics
# pytest coverage (streaming/metrics.py pivot path).
METRICS_PIVOT_WIDE_ORACLE = """
    SELECT
      date_trunc('day', ts) AS day,
      CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click,
      CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS error,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase,
      CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS signup,
      CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS view
    FROM events
    GROUP BY 1
    """


def metrics_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-to-wide-row: the reference emits one wide CSV row per visit with a
    fixed metric column list (log2csv.py:156-217) — groupBy().pivot() with an
    explicit value list (explicit values avoid a pre-pass and keep the plan to
    one shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).cast("double"))
    )


# Rotated out of the 50-cap registry in driver round 8 (slot to data_quality_report);
# the SAME DuckDB oracle (below) runs in-suite in
# tests/test_unregistered_batteries.py and the F11/F12 log-extraction
# surface keeps its sources/logs pytest coverage.
JSON_PAYLOAD_EXTRACT_ORACLE = """
    SELECT
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
    FROM events
    GROUP BY event_type
    """


def json_payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-payload JSON extraction: the reference parses ' apdb_metrics: '
    JSON payloads out of log lines (log2csv.py:321-332) — get_json_object +
    typed cast + per-key aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    n = F.count(F.lit(1))
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            n.alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / n).alias("avg_k"),
        )
    )


# Rotated out of the 50-cap registry in driver round 13 (slot to the
# r12 training-data families — COVERAGE.md "Registry rotation history");
# the SAME DuckDB oracle (below) runs driver-grade in-suite in
# tests/test_unregistered_batteries.py and the timeseries operator keeps
# its full semantics pytest (tests/test_timeseries.py).
GAP_FILL_RESAMPLE_ORACLE = """
    WITH ev AS (
      SELECT user_id, date_trunc('day', ts) AS bucket_ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    agg AS (
      SELECT user_id, bucket_ts, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM ev GROUP BY user_id, bucket_ts
    ),
    bounds AS (
      SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM agg GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 day')) AS bucket_ts
      FROM bounds
    ),
    joined AS (
      SELECT user_id, bucket_ts, n_events, sum_value
      FROM grid LEFT JOIN agg USING (user_id, bucket_ts)
    )
    SELECT user_id, bucket_ts,
      COALESCE(n_events, 0) AS n_events,
      sum_value,
      last_value(sum_value IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY bucket_ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
      sum_value IS NULL AS is_gap
    FROM joined
    """


def gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase totals per user, densified to each user's observed
    span with exact-decimal sums and last-observation-carried-forward fill
    (`operators/timeseries.py` — generated grid, uniform shuffles, no UDFs)."""
    from ..operators.timeseries import gap_fill_resample as _gfr

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return _gfr(ev, "user_id", "ts", "value", unit="day")


# In-suite member (DuckDB oracle in tests/test_unregistered_batteries.py —
# the registry is at its 50-cap; tumbling windows are driver-covered via
# the streaming metrics pipeline and session windows via session_window_agg).
def hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation — 1-hour windows every 15
    minutes, so each event lands in exactly window/slide = 4 buckets.
    Spark's native ``window(ts, len, slide)`` expands the buckets
    JVM-side (no explode round-trip) and the decimal-sum contract keeps
    the per-window floats order-independent."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )

"""Miscellaneous SQL-surface batteries: correlated EXISTS, null-handling
semantics, LIKE/regex pattern filters, and Spark's native session_window
operator (oracled by an independent lag/cumsum session reconstruction)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query


@query(
    "exists_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
    )
    """,
    survey="correlated EXISTS (semi-join with predicate)",
)
def exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS = left-semi join against the filtered inner side."""
    orders = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select("l_orderkey")
    )
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@query(
    "null_handling",
    oracle="""
    WITH v AS (
      SELECT
        o_orderkey,
        LEAD(o_orderdate) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ) AS next_date,
        o_orderdate
      FROM orders
    )
    SELECT
      o_orderkey,
      next_date IS NULL AS is_latest,
      COALESCE(next_date, TIMESTAMP '2199-12-31 00:00:00') AS next_or_max,
      CASE WHEN next_date IS NULL THEN -1
           ELSE date_diff('day', o_orderdate, next_date) END AS gap_days,
      NULLIF(date_diff('day', o_orderdate, COALESCE(next_date, o_orderdate)), 0) AS gap_or_null
    FROM v
    """,
    survey="null semantics battery (coalesce / nullif / case / IS NULL)",
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v = orders.select(
        "o_orderkey",
        F.lead("o_orderdate").over(w).alias("next_date"),
        "o_orderdate",
    )
    gap = F.datediff(F.col("next_date").cast("date"), F.col("o_orderdate").cast("date"))
    gap_self = F.datediff(
        F.coalesce(F.col("next_date"), F.col("o_orderdate")).cast("date"),
        F.col("o_orderdate").cast("date"),
    )
    return v.select(
        "o_orderkey",
        F.col("next_date").isNull().alias("is_latest"),
        F.coalesce(
            F.col("next_date"), F.lit("2199-12-31 00:00:00").cast("timestamp")
        ).alias("next_or_max"),
        F.when(F.col("next_date").isNull(), F.lit(-1))
        .otherwise(gap)
        .cast("long")
        .alias("gap_days"),
        F.nullif(gap_self.cast("long"), F.lit(0)).alias("gap_or_null"),
    )


@query(
    "like_patterns",
    oracle="""
    SELECT
      p_partkey,
      p_name,
      p_name LIKE '%widget%' AS has_widget,
      p_name LIKE 'cold%' AS starts_cold,
      p_brand LIKE 'Brand#1_' AS brand_1x,
      regexp_matches(p_type, '^(ECONOMY|STANDARD)$') AS simple_type
    FROM part
    WHERE p_name LIKE '%o%'
    """,
    survey="pattern predicates (LIKE / regex)",
)
def like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%o%")).select(
        "p_partkey",
        "p_name",
        F.col("p_name").like("%widget%").alias("has_widget"),
        F.col("p_name").like("cold%").alias("starts_cold"),
        F.col("p_brand").like("Brand#1_").alias("brand_1x"),
        F.col("p_type").rlike("^(ECONOMY|STANDARD)$").alias("simple_type"),
    )


@query(
    "session_window_agg",
    oracle="""
    WITH flagged AS (
      SELECT
        user_id, ts, value,
        CASE
          WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
          WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               > INTERVAL 30 MINUTE THEN 1
          ELSE 0
        END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT
      user_id,
      MIN(ts) AS session_start,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    survey="session_window native operator (T2; oracle = lag/cumsum reconstruction)",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30-minute gap) per user — checked
    against an independent SQL reconstruction of session boundaries. The
    session start is the deterministic join key between the two forms."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )

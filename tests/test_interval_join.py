"""Interval-overlap join (operators/interval_join.py): DuckDB range-join
oracle equivalence, canonical-bucket dedup (no duplicate pairs at ANY
bucket width), plan shape (equi-join, not nested-loop), and the loud
inverted-interval failure."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from l1dbproto_spark.operators.interval_join import (
    interval_overlap_join,
    overlapping_order_windows,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         epoch(o_orderdate) AS w_start,
         epoch(o_orderdate) + 14 * 86400.0 AS w_end
  FROM '{SF_DIR}/orders.parquet'
)
SELECT a.o_orderkey AS a_orderkey, b.o_orderkey AS b_orderkey,
       a.o_custkey AS a_custkey, b.o_custkey AS b_custkey,
       a.o_orderpriority AS priority,
       CAST((least(a.w_end, b.w_end) - greatest(a.w_start, b.w_start))
            / 86400.0 AS BIGINT) AS overlap_days
FROM base a JOIN base b
  ON a.o_orderpriority = b.o_orderpriority
 AND a.w_start <= b.w_end AND b.w_start <= a.w_end
 AND a.o_orderkey < b.o_orderkey
 AND a.o_custkey <> b.o_custkey
"""


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["a_orderkey", "b_orderkey"]).reset_index(drop=True)


def test_overlap_join_matches_duckdb(spark):
    orders = load_table(spark, SF_DIR, "orders")
    got = _norm(overlapping_order_windows(orders).toPandas())
    want = _norm(duckdb.sql(ORACLE).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


@pytest.mark.parametrize("bucket_days", [3, 14, 50])
def test_no_duplicate_pairs_any_width(spark, bucket_days):
    """The canonical-bucket rule must emit each pair exactly once whether
    intervals span many buckets (width << length) or share one."""
    orders = load_table(spark, SF_DIR, "orders").limit(300)
    out = overlapping_order_windows(orders, bucket_days=bucket_days)
    n = out.count()
    d = out.select("a_orderkey", "b_orderkey").distinct().count()
    assert n == d


def test_equi_join_plan_not_nested_loop(spark):
    orders = load_table(spark, SF_DIR, "orders")
    plan = (
        overlapping_order_windows(orders)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "HashJoin" in plan


def test_inverted_interval_fails_loudly(spark):
    df = spark.createDataFrame(
        [(1, 100.0, 50.0)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("s", T.DoubleType()),
                T.StructField("e", T.DoubleType()),
            ]
        ),
    )
    other = spark.createDataFrame(
        [(2, 10.0, 20.0)],
        T.StructType(
            [
                T.StructField("id2", T.LongType()),
                T.StructField("s2", T.DoubleType()),
                T.StructField("e2", T.DoubleType()),
            ]
        ),
    )
    out = interval_overlap_join(df, other, "s", "e", "s2", "e2", bucket_width=10.0)
    with pytest.raises(Exception, match="[Ss]equence|SEQUENCE"):
        out.collect()


def test_touching_endpoints_count_as_overlap(spark):
    a = spark.createDataFrame(
        [(1, 0.0, 10.0)],
        "id long, s double, e double",
    )
    b = spark.createDataFrame(
        [(2, 10.0, 20.0), (3, 20.5, 30.0)],
        "id2 long, s2 double, e2 double",
    )
    got = interval_overlap_join(a, b, "s", "e", "s2", "e2", bucket_width=7.0)
    assert [r.id2 for r in got.collect()] == [2]


PIJ_ORACLE = f"""
WITH ev AS (
  SELECT event_id, epoch(ts) AS t FROM '{SF_DIR}/events.parquet'
  WHERE event_type = 'purchase'
),
iv AS (
  SELECT o_orderkey, epoch(o_orderdate) AS s,
         epoch(o_orderdate) + 7 * 86400.0 AS e
  FROM '{SF_DIR}/orders.parquet'
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
)
SELECT ev.event_id, iv.o_orderkey
FROM ev JOIN iv ON iv.s <= ev.t AND ev.t <= iv.e
"""


def test_point_in_interval_matches_duckdb(spark):
    from l1dbproto_spark.operators.interval_join import point_in_interval_join

    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        # cast, not unix_timestamp: the cast keeps fractional seconds,
        # matching DuckDB's epoch()
        .select("event_id", F.col("ts").cast("double").alias("t"))
    )
    iv = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("double").alias("s"),
            (F.unix_timestamp("o_orderdate") + 7 * 86400.0).alias("e"),
        )
    )
    got = point_in_interval_join(
        ev, iv, "t", "s", "e", bucket_width=7 * 86400.0
    ).select("event_id", "o_orderkey")
    want = duckdb.sql(PIJ_ORACLE).df()
    g = got.toPandas().sort_values(["event_id", "o_orderkey"]).reset_index(drop=True)
    w = want.sort_values(["event_id", "o_orderkey"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # no duplicate pairs even though intervals explode to 2 buckets
    assert len(g) == len(g.drop_duplicates())


def test_null_bounds_drop_silently_documented(spark):
    """NULL interval bounds produce no buckets (explode of null sequence):
    the row joins nothing — pinned behavior (undefined interval = no
    match), unlike the LOUD inverted-interval failure."""
    a = spark.createDataFrame(
        [(1, None, 10.0), (2, 0.0, None), (3, 0.0, 10.0)],
        "id long, s double, e double",
    )
    b = spark.createDataFrame([(9, 1.0, 2.0)], "id2 long, s2 double, e2 double")
    got = interval_overlap_join(a, b, "s", "e", "s2", "e2", bucket_width=5.0)
    assert [r.id for r in got.collect()] == [3]

"""Event-analytics operators (operators/analytics.py): ordered-funnel
semantics on hand-built timelines, cohort-retention invariants, and the
rolling z-score against a DuckDB window oracle."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from l1dbproto_spark.operators.analytics import (
    cohort_retention,
    funnel_conversion,
    funnel_times,
    rolling_zscore,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

_EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m)


def test_funnel_ordering_semantics(spark):
    rows = [
        # user 1: full ordered funnel
        (1, _ts(0), 1, "view", 0.0),
        (2, _ts(1), 1, "click", 0.0),
        (3, _ts(2), 1, "purchase", 0.0),
        # user 2: purchase BEFORE the first click -> purchase must not count
        (4, _ts(0), 2, "view", 0.0),
        (5, _ts(1), 2, "purchase", 0.0),
        (6, _ts(2), 2, "click", 0.0),
        # user 3: click with no prior view -> only stage list starts empty
        (7, _ts(0), 3, "click", 0.0),
        (8, _ts(1), 3, "purchase", 0.0),
        # user 4: second click after purchase-less first; late purchase counts
        (9, _ts(0), 4, "view", 0.0),
        (10, _ts(1), 4, "click", 0.0),
        (11, _ts(5), 4, "purchase", 0.0),
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    t = {
        r.user_id: (r.t0, r.t1, r.t2)
        for r in funnel_times(df, ["view", "click", "purchase"]).collect()
    }
    assert t[1] == (_ts(0), _ts(1), _ts(2))
    assert t[2] == (_ts(0), _ts(2), None)  # purchase at minute 1 ignored
    assert t[3] == (None, None, None)  # no view -> nothing counts
    assert t[4] == (_ts(0), _ts(1), _ts(5))
    conv = {r.stage: (r.n_users, r.pct_of_first) for r in
            funnel_conversion(df, ["view", "click", "purchase"]).collect()}
    assert conv["view"] == (3, 1.0)
    assert conv["click"] == (3, 1.0)
    assert conv["purchase"] == (2, round(2 / 3, 6))


def test_funnel_single_exchange_plan(spark):
    """The chained stage windows must share ONE per-user hash exchange."""
    events = load_table(spark, SF_DIR, "events")
    plan = funnel_conversion(
        events, ["view", "click", "purchase"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cohort_retention_invariants(spark):
    orders = load_table(spark, SF_DIR, "orders")
    got = cohort_retention(orders).toPandas()
    zero = got[got.month_offset == 0]
    assert (zero.retention_rate == 1.0).all()
    assert (got.month_offset >= 0).all()
    # no offset row can out-count its cohort
    assert (got.retention_rate <= 1.0).all()
    # cohort of the globally first order month contains every active month
    # count consistency vs a direct DuckDB aggregation
    want = duckdb.sql(
        f"""
        WITH orders AS (SELECT * FROM '{SF_DIR}/orders.parquet'),
        firsts AS (
          SELECT o_custkey, min(o_orderdate) AS first_ts FROM orders GROUP BY 1
        )
        SELECT date_trunc('month', f.first_ts) AS cohort_month,
               datediff('month', date_trunc('month', f.first_ts),
                        date_trunc('month', o.o_orderdate)) AS month_offset,
               count(DISTINCT o.o_custkey) AS n_active
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
        """
    ).df()
    g = got[["cohort_month", "month_offset", "n_active"]].sort_values(
        ["cohort_month", "month_offset"]
    ).reset_index(drop=True)
    w = want.sort_values(["cohort_month", "month_offset"]).reset_index(drop=True)
    g["cohort_month"] = pd.to_datetime(g.cohort_month).astype("datetime64[us]")
    w["cohort_month"] = pd.to_datetime(w.cohort_month).astype("datetime64[us]")
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_rolling_zscore_matches_duckdb(spark):
    events = load_table(spark, SF_DIR, "events")
    got = rolling_zscore(events).toPandas()
    want = duckdb.sql(
        f"""
        WITH events AS (SELECT * FROM '{SF_DIR}/events.parquet'),
        w AS (
          SELECT event_id, user_id, ts, value,
                 count(value) OVER win AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) OVER win AS DOUBLE) AS s1,
                 CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                      OVER win AS DOUBLE) AS s2
          FROM events
          WINDOW win AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING
          )
        )
        SELECT event_id, user_id, ts, value,
               CASE WHEN n >= 5 AND (s2 - s1*s1/n) / (n - 1.0) > 0
                    THEN round((value - s1/n) / sqrt((s2 - s1*s1/n) / (n - 1.0)), 6)
               END AS zscore
        FROM w
        """
    ).df()
    g = got[["event_id", "zscore"]].sort_values("event_id").reset_index(drop=True)
    w = want[["event_id", "zscore"]].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # anomaly flag agrees with the threshold wherever the score exists
    scored = got[got.zscore.notna()]
    assert (scored.is_anomaly == (scored.zscore.abs() > 2.0)).all()


def test_rolling_zscore_constant_history_is_null(spark):
    rows = [(i, _ts(i), 1, "view", 5.0) for i in range(8)] + [
        (8, _ts(8), 1, "view", 50.0)
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    out = {r.event_id: r.zscore for r in rolling_zscore(df).collect()}
    # constant history -> zero variance -> undefined score, even for the
    # genuinely anomalous row (variance gate beats a divide-by-zero)
    assert all(v is None for v in out.values())


def test_funnel_empty_first_stage_yields_null_rates(spark):
    """No 'view' events at all: counts 0, rates NULL — not an ANSI
    divide-by-zero task failure (review find r9)."""
    rows = [(1, _ts(0), 1, "click", 0.0), (2, _ts(1), 1, "purchase", 0.0)]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    got = {r.stage: (r.n_users, r.pct_of_first) for r in
           funnel_conversion(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": (0, None), "click": (0, None), "purchase": (0, None)}


def test_cohort_retention_approx_within_tolerance(spark):
    """HLL form: per-(cohort, offset) counts within 3*rsd of exact, no
    distinct expansion in the plan (the sketch map-side-combines)."""
    orders = load_table(spark, SF_DIR, "orders")
    exact = {
        (r.cohort_month, r.month_offset): r.n_active
        for r in cohort_retention(orders).collect()
    }
    rsd = 0.05
    approx = cohort_retention(orders, approx=True, rsd=rsd)
    rows = approx.collect()
    assert set((r.cohort_month, r.month_offset) for r in rows) == set(exact)
    for r in rows:
        e = exact[(r.cohort_month, r.month_offset)]
        assert abs(r.n_active - e) <= max(3 * rsd * e, 2), (e, r.n_active)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan  # exact distinct would add one


def test_analytics_garbage_resilience(spark):
    """Null user/ts/value rows and empty frames must not crash any of the
    analytics operators (engine-wide garbage-sweep convention)."""
    rows = [
        (1, None, 1, "view", 1.0),            # null ts
        (2, _ts(1), None, "click", 2.0),      # null user
        (3, _ts(2), 1, None, 3.0),            # null type
        (4, _ts(3), 1, "view", None),         # null value
        (5, _ts(4), 1, "purchase", 5.0),
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    # funnel: null ts never becomes a stage min; null type matches nothing
    conv = funnel_conversion(df, ["view", "click", "purchase"]).collect()
    assert len(conv) == 3
    # zscore: null value rows emit null scores, others unaffected
    z = rolling_zscore(df, n_prev=2, min_n=2).collect()
    assert len(z) == 5
    # empty frames
    empty = spark.createDataFrame([], _EV_SCHEMA)
    assert funnel_conversion(empty, ["view", "click"]).collect()[0].n_users == 0
    assert rolling_zscore(empty).count() == 0
    empty_orders = spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    assert cohort_retention(empty_orders).count() == 0

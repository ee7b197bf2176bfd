"""Event-analytics queries — sequential funnel and cohort retention over
the events/orders tables (operators/analytics.py). The generalized form of
the reference's per-visit counting family (SURVEY.md A1-A6) applied to
arbitrary user timelines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.analytics import cohort_retention as _cohort
from ..operators.analytics import funnel_conversion as _funnel
from ..sources.catalog import load_table
# (no driver registrations left in this module since r14 — both oracles
# stay in-suite under tests/test_unregistered_batteries.py)

_FUNNEL_STAGES = ["view", "click", "purchase"]


# Rotated out of the driver registry in round 14 (slot to one of the r13
# training-data components — maxsim_token_topk / avi_video_meta /
# quantile_drift_planted; event analytics keeps visit_window_agg
# driver-checked and cohort_retention in-suite). SAME oracle, driver-grade
# compare in tests/test_unregistered_batteries.py.
FUNNEL_CONVERSION_ORACLE = """
    WITH e1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t0
      FROM events
    ),
    e2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t0 THEN ts END)
                  OVER (PARTITION BY user_id) AS t1
      FROM e1
    ),
    e3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
      FROM e2
    ),
    u AS (SELECT user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2
          FROM e3 GROUP BY 1),
    c AS (SELECT count(t0) AS c0, count(t1) AS c1, count(t2) AS c2 FROM u)
    SELECT 0 AS stage_idx, 'view' AS stage, c0 AS n_users,
           CASE WHEN c0 > 0 THEN round(c0 / c0, 6) END AS pct_of_first FROM c
    UNION ALL
    SELECT 1, 'click', c1, CASE WHEN c0 > 0 THEN round(c1 / c0, 6) END FROM c
    UNION ALL
    SELECT 2, 'purchase', c2, CASE WHEN c0 > 0 THEN round(c2 / c0, 6) END FROM c
    """


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: per-user sequential min
    timestamps (stage i counts only strictly after stage i-1) via chained
    mins over ONE per-user window partition, then a single-row stage
    summary. One hash exchange total regardless of stage count."""
    events = load_table(spark, sf_dir, "events")
    return _funnel(events, _FUNNEL_STAGES)


# Rotated out of the driver registry in round 12 (slot to evolve_cast_loss;
# the event-analytics family keeps the funnel_conversion driver row). SAME
# oracle, driver-grade compare in tests/test_unregistered_batteries.py.
COHORT_RETENTION_ORACLE = """
    WITH firsts AS (
      SELECT o_custkey, min(o_orderdate) AS first_ts FROM orders GROUP BY 1
    ),
    acts AS (
      SELECT date_trunc('month', f.first_ts) AS cohort_month,
             datediff('month', date_trunc('month', f.first_ts),
                      date_trunc('month', o.o_orderdate)) AS month_offset,
             count(DISTINCT o.o_custkey) AS n_active
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ),
    sizes AS (SELECT cohort_month, n_active AS cohort_size
              FROM acts WHERE month_offset = 0)
    SELECT a.cohort_month, a.month_offset, a.n_active,
           round(a.n_active / s.cohort_size, 6) AS retention_rate
    FROM acts a JOIN sizes s ON a.cohort_month = s.cohort_month
    """


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly first-order cohorts x month offset: distinct active
    customers and their share of the cohort. One per-customer window min
    + one (cohort, offset) aggregation; the offset-0 sizes frame is
    months-count tiny and broadcast for the rate join."""
    orders = load_table(spark, sf_dir, "orders")
    return _cohort(orders, "o_custkey", "o_orderdate")

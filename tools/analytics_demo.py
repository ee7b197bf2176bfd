#!/usr/bin/env python
"""End-to-end event-analytics demo — the round-9 analytics family composed
over the synthetic events/orders tables:

  1. ordered funnel (view -> click -> purchase)    (operators/analytics.py)
  2. monthly cohort retention (exact + HLL)        (operators/analytics.py)
  3. rolling z-score anomalies                     (operators/analytics.py)
  4. order-window overlap pairs                    (operators/interval_join.py)
  5. purchases inside order weeks (containment)    (operators/interval_join.py)
  6. streaming funnel == batch check               (streaming/funnel.py)

Usage: python tools/analytics_demo.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from l1dbproto_spark.operators.analytics import (
    cohort_retention,
    funnel_conversion,
    rolling_zscore,
)
from l1dbproto_spark.operators.interval_join import (
    overlapping_order_windows,
    point_in_interval_join,
)
from l1dbproto_spark.session import get_spark
from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.funnel import StreamingFunnel

STAGES = ["view", "click", "purchase"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics-demo")
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    print("== 1. ordered funnel ==")
    funnel_conversion(events, STAGES).show(truncate=False)

    print("== 2. cohort retention (first 8 rows; exact vs HLL) ==")
    exact = cohort_retention(orders)
    exact.orderBy("cohort_month", "month_offset").show(8)
    approx = cohort_retention(orders, approx=True)
    drift = (
        exact.select("cohort_month", "month_offset", F.col("n_active").alias("e"))
        .join(approx.select("cohort_month", "month_offset", F.col("n_active").alias("a")),
              ["cohort_month", "month_offset"])
        .agg(F.max(F.abs(F.col("a") - F.col("e")) / F.col("e")).alias("max_rel_err"))
    )
    drift.show()

    print("== 3. rolling z-score anomalies (top 5 by |z|) ==")
    scored = rolling_zscore(events)
    scored.filter(F.col("is_anomaly")).orderBy(F.abs(F.col("zscore")).desc()).show(5)

    print("== 4. order-window overlap pairs (count + sample) ==")
    pairs = overlapping_order_windows(orders)
    print("pairs:", pairs.count())
    pairs.show(3)

    print("== 5. purchases inside per-user activity windows ==")
    # events (2024) and orders (1992-98) live in different epochs, so the
    # intervals come from the events table itself: each user's first-day
    # activity window, probed with everyone's purchase timestamps.
    ev = events.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").cast("double").alias("t")
    )
    iv = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("double")).alias("s"),
        (F.min(F.col("ts").cast("double")) + 86400.0).alias("e"),
    )
    hits = point_in_interval_join(ev, iv, "t", "s", "e", bucket_width=86400.0)
    print("containment pairs:", hits.count())

    print("== 6. streaming funnel == batch ==")
    with tempfile.TemporaryDirectory() as tmp:
        sfun = StreamingFunnel(spark, os.path.join(tmp, "state"), STAGES)
        mid = events.selectExpr("percentile(cast(ts as double), 0.5) p").collect()[0].p
        sfun.merge(events.filter(F.col("ts").cast("double") <= mid))
        sfun.merge(events.filter(F.col("ts").cast("double") > mid))
        stream_rows = {
            r.stage: r.n_users for r in sfun.summary().collect()
        }
        batch_rows = {
            r.stage: r.n_users for r in funnel_conversion(events, STAGES).collect()
        }
        print("stream:", stream_rows)
        print("batch: ", batch_rows)
        assert stream_rows == batch_rows, "streaming != batch"
        print("streaming funnel matches batch ✓")


if __name__ == "__main__":
    main()

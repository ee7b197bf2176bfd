"""Dynamic partition pruning over the engine's hive-partitioned stores.

At 100 TB the day-partitioned rollup/funnel/BM25 stores are joined against
runtime-filtered dimension frames (a campaign window, a cohort of days, a
tenant list) whose qualifying keys are only known at execution time — DPP
is what turns that join into a partition-pruned scan instead of a full
store read. Catalyst inserts it for free when the partition column is the
join key and the dim side broadcasts; this test pins that the engine's
store layout actually qualifies (a column rename, a cast on the join key,
or a non-partition join column would silently lose it)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from l1dbproto_spark.streaming.rollup import ContinuousAggregate


def _store(spark, tmp_path, n_days=30):
    base = int(datetime.datetime(2026, 1, 1).timestamp())
    ev = spark.range(100 * n_days).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 3).cast("string").alias("event_type"),
        F.timestamp_seconds(
            F.lit(base) + (F.col("id") % n_days) * 86_400
        ).alias("ts"),
        (F.col("id") % 10).cast("double").alias("value"),
    )
    agg = ContinuousAggregate(
        spark, str(tmp_path / "rollup"), 3600, group_cols=["event_type"]
    )
    agg.merge(ev, epoch_id=0)
    return agg


def test_store_join_gets_dynamic_partition_pruning(spark, tmp_path):
    agg = _store(spark, tmp_path)
    # runtime-filtered day dimension (values unknown at plan time: they
    # come from a parquet scan with a pushed filter, the DPP trigger shape)
    dim = spark.range(60).select(
        F.date_add(F.lit("2026-01-01").cast("date"), F.col("id").cast("int"))
        .alias("d"),
        (F.col("id") % 7).alias("tag"),
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    picked = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("tag") == 0)
    st = agg.state()
    joined = st.join(picked.hint("broadcast"), st.bucket_day == F.col("d"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression(bucket_day" in plan, plan[:2000]
    # and the pruned join computes the right thing: only the dim's days
    got_days = {r.bucket_day for r in joined.select("bucket_day").distinct().collect()}
    want_days = {
        r.d
        for r in picked.filter(
            (F.col("d") >= "2026-01-01") & (F.col("d") < "2026-01-31")
        ).collect()
    }
    assert got_days == want_days and got_days


def test_serve_range_static_pruning_still_first_choice(spark, tmp_path):
    """serve()'s explicit literal range stays a STATIC PartitionFilter (no
    subquery machinery when bounds are known at plan time) — the cheap
    path DPP complements, not replaces."""
    agg = _store(spark, tmp_path)
    out = agg.serve(
        datetime.datetime(2026, 1, 3), datetime.datetime(2026, 1, 5)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters")[1][:300]
    assert "bucket_day" in seg and "dynamicpruning" not in seg

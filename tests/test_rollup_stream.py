"""Continuous aggregate (streaming/rollup.py): incremental merges equal
one batch aggregation (exact for n/sum/min/max, HLL within the sketch's
documented error), same-epoch retries are skipped, later batches still
fold, restart resumes from the store, the state read is day-pruned, the
served range prunes partitions, and the availableNow binding works end
to end."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.rollup import ContinuousAggregate

SF_DIR = "/root/testdata/sf0.001"
HOUR = 3600


def _batch_truth(events, bucket_seconds=HOUR):
    b = F.timestamp_seconds(
        (F.unix_timestamp("ts") / bucket_seconds).cast("long") * bucket_seconds
    )
    return (
        events.groupBy(b.alias("bucket_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_val"),
            F.min(F.col("value").cast("double")).alias("min_val"),
            F.max(F.col("value").cast("double")).alias("max_val"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )


def _pd(df, cols):
    return (
        df.select(*cols)
        .toPandas()
        .sort_values(cols[:2])
        .reset_index(drop=True)
    )


def _halves(events):
    mid = events.selectExpr(
        "percentile(cast(ts as double), 0.5) as m"
    ).collect()[0].m
    t = F.col("ts").cast("double")
    return events.filter(t <= mid), events.filter(t > mid)


def _mk(spark, path, **kw):
    return ContinuousAggregate(
        spark, path, HOUR, group_cols=["event_type"], **kw
    )


def test_incremental_equals_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    agg = _mk(spark, str(tmp_path / "rollup"))
    for i, b in enumerate(_halves(events)):
        agg.merge(b, epoch_id=i)
    cols = ["bucket_start", "event_type", "n", "sum_val", "min_val", "max_val"]
    got = _pd(agg.finalize(), cols)
    truth = _batch_truth(events)
    want = _pd(truth, cols)
    pd.testing.assert_frame_equal(got, want)
    # HLL estimates within the default-lgK sketch's documented rel. error
    est = {
        (r.bucket_start, r.event_type): r.approx_users
        for r in agg.finalize().collect()
    }
    for r in truth.collect():
        e = est[(r.bucket_start, r.event_type)]
        assert abs(e - r.exact_users) <= max(2, 0.05 * r.exact_users), (
            r.bucket_start,
            r.event_type,
        )


def test_same_epoch_retry_skipped_later_epoch_folds(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    b1, b2 = _halves(events)
    agg = _mk(spark, str(tmp_path / "rollup"))
    agg.merge(b1, epoch_id=0)
    snap = _pd(agg.finalize(), ["bucket_start", "event_type", "n", "sum_val"])
    agg.merge(b1, epoch_id=0)  # foreachBatch retry: identical batch+epoch
    retry = _pd(agg.finalize(), ["bucket_start", "event_type", "n", "sum_val"])
    pd.testing.assert_frame_equal(retry, snap)  # no double count
    agg.merge(b2, epoch_id=1)  # a later epoch still folds
    cols = ["bucket_start", "event_type", "n", "sum_val", "min_val", "max_val"]
    pd.testing.assert_frame_equal(
        _pd(agg.finalize(), cols), _pd(_batch_truth(events), cols)
    )


def test_restart_resumes_from_store(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    b1, b2 = _halves(events)
    path = str(tmp_path / "rollup")
    _mk(spark, path).merge(b1, epoch_id=0)
    agg2 = _mk(spark, path)  # fresh instance = restart
    agg2.merge(b2, epoch_id=1)
    cols = ["bucket_start", "event_type", "n", "sum_val", "min_val", "max_val"]
    pd.testing.assert_frame_equal(
        _pd(agg2.finalize(), cols), _pd(_batch_truth(events), cols)
    )


def test_state_read_is_day_pruned(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    agg = _mk(spark, str(tmp_path / "rollup"))
    agg.merge(events, epoch_id=0)
    one_day = events.filter(
        F.to_date("ts") == events.select(F.to_date("ts").alias("d")).first().d
    )
    agg.merge(one_day, epoch_id=1)
    plan = agg.last_state_scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan, plan
    assert "bucket_day" in plan.split("PartitionFilters")[1][:200], plan


def test_serve_range_prunes_and_filters(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    agg = _mk(spark, str(tmp_path / "rollup"))
    agg.merge(events, epoch_id=0)
    lo = events.agg(F.min("ts")).collect()[0][0]
    start = datetime.datetime(lo.year, lo.month, lo.day)
    end = start + datetime.timedelta(days=1)
    served = agg.serve(start, end)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket_day" in plan, plan
    got = {r.bucket_start for r in served.collect()}
    assert got, "served range empty"
    assert all(start <= b < end for b in got)
    # served rows equal the full finalize restricted to the range
    want = {
        r.bucket_start
        for r in agg.finalize()
        .filter(
            (F.col("bucket_start") >= F.lit(start))
            & (F.col("bucket_start") < F.lit(end))
        )
        .collect()
    }
    assert got == want


def test_untouched_groups_survive_day_rewrite(spark, tmp_path):
    """Groups in a rewritten day partition but absent from the batch must
    survive the dynamic overwrite verbatim."""
    schema = "ts_s string, event_type string, value double, user_id long"
    b1 = spark.createDataFrame(
        [
            ("2024-03-01 00:10:00", "view", 1.0, 1),
            ("2024-03-01 05:10:00", "click", 2.0, 2),
        ],
        schema,
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    b2 = spark.createDataFrame(
        [("2024-03-01 05:20:00", "click", 3.0, 3)], schema
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    agg = _mk(spark, str(tmp_path / "rollup"))
    agg.merge(b1, epoch_id=0)
    agg.merge(b2, epoch_id=1)
    rows = {
        (r.bucket_start.hour, r.event_type): (r.n, r.sum_val)
        for r in agg.finalize().collect()
    }
    assert rows[(0, "view")] == (1, 1.0)  # untouched group intact
    assert rows[(5, "click")] == (2, 5.0)  # folded


def test_compaction_bounds_files(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    agg = _mk(spark, str(tmp_path / "rollup"))
    for i, b in enumerate(_halves(events)):
        agg.merge(b, epoch_id=i)
    before = agg.finalize().toPandas()
    agg.compact()
    assert all(n == 1 for n in agg.partition_file_counts().values())
    after = agg.finalize().toPandas()
    cols = ["bucket_start", "event_type"]
    pd.testing.assert_frame_equal(
        before.sort_values(cols).reset_index(drop=True),
        after.sort_values(cols).reset_index(drop=True),
    )


def test_available_now_binding(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = _mk(spark, str(tmp_path / "rollup"))
    q = (
        agg.bind_stream(stream, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cols = ["bucket_start", "event_type", "n", "sum_val", "min_val", "max_val"]
    pd.testing.assert_frame_equal(
        _pd(agg.finalize(), cols), _pd(_batch_truth(events), cols)
    )


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="bucket_seconds"):
        ContinuousAggregate(spark, str(tmp_path / "x"), 0)
    with pytest.raises(ValueError, match="divide 86400"):
        ContinuousAggregate(spark, str(tmp_path / "x"), 7_000)
    with pytest.raises(ValueError, match="86400"):
        ContinuousAggregate(spark, str(tmp_path / "x"), 100_000)

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
    for bad in (0, 7_000, 100_000):
        with pytest.raises(ValueError, match="divide 86400"):
            ContinuousAggregate(spark, str(tmp_path / "x"), bad)


_SCHEMA4 = "ts_s string, event_type string, value double, user_id long"


def _frame(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA4).withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )


def test_null_ts_rows_dropped_not_destructive(spark, tmp_path):
    """NULL-timestamp events are dropped (documented), and folding a
    second NULL-bearing batch must not destroy earlier state (the r9
    review's NULL-partition overwrite hazard)."""
    agg = _mk(spark, str(tmp_path / "rollup"))
    agg.merge(
        _frame(spark, [("2024-03-01 00:10:00", "view", 1.0, 1), (None, "view", 9.0, 2)]),
        epoch_id=0,
    )
    agg.merge(_frame(spark, [(None, "view", 7.0, 3)]), epoch_id=1)
    rows = [(r.n, r.sum_val) for r in agg.finalize().collect()]
    assert rows == [(1, 1.0)]


def test_pre_1970_timestamps_bucket_correctly(spark, tmp_path):
    """floor, not truncate-toward-zero: 1969-12-31 23:30 UTC belongs to the
    23:00 bucket of 1969-12-31, not to 1970-01-01 00:00."""
    agg = _mk(spark, str(tmp_path / "rollup"))
    agg.merge(
        _frame(spark, [("1969-12-31 23:30:00", "view", 1.0, 1)]), epoch_id=0
    )
    r = agg.finalize().collect()[0]
    assert str(r.bucket_start) == "1969-12-31 23:00:00"


def test_partial_commit_retry_refolds_missing_day_only(spark, tmp_path):
    """The per-day epoch skip: when one touched day already committed this
    (run, epoch)'s fold and another did not (a crash mid multi-day
    overwrite), the retry must re-fold ONLY the missing day."""
    day1 = [("2024-03-01 00:10:00", "view", 1.0, 1)]
    day2 = [("2024-03-02 00:10:00", "view", 10.0, 2)]
    path = str(tmp_path / "rollup")
    # simulate the partial commit: day1 committed under epoch 5...
    _mk(spark, path).merge(_frame(spark, day1), epoch_id=5)
    # ...then the retry replays the FULL two-day batch for epoch 5
    agg = _mk(spark, path)
    agg.merge(_frame(spark, day1 + day2), epoch_id=5)
    rows = {
        str(r.bucket_start)[:10]: (r.n, r.sum_val)
        for r in agg.finalize().collect()
    }
    assert rows == {"2024-03-01": (1, 1.0), "2024-03-02": (1, 10.0)}
    # and a full retry of the fully-committed epoch is a complete no-op
    agg.merge(_frame(spark, day1 + day2), epoch_id=5)
    rows2 = {
        str(r.bucket_start)[:10]: (r.n, r.sum_val)
        for r in agg.finalize().collect()
    }
    assert rows2 == rows


def test_epochless_merge_preserves_epoch_marker(spark, tmp_path):
    """An ad-hoc (epoch-less) merge touching an epoch-marked group must
    not clobber the stored (run, epoch) — a later replay of that epoch
    would otherwise re-fold it (r9 review)."""
    path = str(tmp_path / "rollup")
    d = [("2024-03-01 00:10:00", "view", 1.0, 1)]
    agg = _mk(spark, path, run_id="run-a")
    agg.merge(_frame(spark, d), epoch_id=7)
    agg.merge(_frame(spark, [("2024-03-01 00:15:00", "view", 5.0, 9)]))  # ad hoc
    agg.merge(_frame(spark, d), epoch_id=7)  # replayed epoch: must skip
    r = agg.finalize().collect()[0]
    assert (r.n, r.sum_val) == (2, 6.0)  # 1.0 + 5.0, epoch 7 folded ONCE


def test_rebinding_new_checkpoint_gets_new_scope(spark, tmp_path):
    """bind_stream derives the run scope per binding: the same instance
    re-bound to a fresh checkpoint (epochs restarting at 0) must keep
    folding instead of false-matching the first binding's epochs."""
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    agg = _mk(spark, str(tmp_path / "rollup"))
    for ck in ("ckptA", "ckptB"):  # second binding = fresh checkpoint
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            agg.bind_stream(stream, str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    n_total = events.count()
    # both full passes folded: every group's n is exactly doubled
    got = {r.bucket_start: r.n for r in agg.finalize().filter(F.col("event_type") == "view").collect()}
    want = {
        r.bucket_start: 2 * r.n
        for r in _batch_truth(events).filter(F.col("event_type") == "view").collect()
    }
    assert got == want and n_total > 0


def test_mixed_lg_config_k_degrades_not_wedges(spark, tmp_path):
    """Restarting with a different lg_config_k must keep merging (union
    downsamples) instead of wedging the stream on HLL_UNION_DIFFERENT_LG_K."""
    path = str(tmp_path / "rollup")
    d1 = [("2024-03-01 00:10:00", "view", 1.0, i) for i in range(50)]
    d2 = [("2024-03-01 00:20:00", "view", 1.0, i) for i in range(50, 100)]
    _mk(spark, path, run_id="r", lg_config_k=12).merge(_frame(spark, d1), epoch_id=0)
    agg = _mk(spark, path, run_id="r", lg_config_k=14)
    agg.merge(_frame(spark, d2), epoch_id=1)
    r = agg.finalize().collect()[0]
    assert r.n == 100
    assert abs(r.approx_users - 100) <= 10


def test_new_run_id_does_not_false_skip_restarted_epochs(spark, tmp_path):
    """Epoch numbers restart at 0 with a fresh checkpoint; a new run_id
    must keep those batches folding instead of matching old epochs."""
    path = str(tmp_path / "rollup")
    d = [("2024-03-01 00:10:00", "view", 1.0, 1)]
    _mk(spark, path, run_id="run-a").merge(_frame(spark, d), epoch_id=0)
    agg_b = _mk(spark, path, run_id="run-b")
    agg_b.merge(_frame(spark, [("2024-03-01 00:20:00", "view", 2.0, 2)]), epoch_id=0)
    r = agg_b.finalize().collect()[0]
    assert (r.n, r.sum_val) == (2, 3.0)


def test_avg_uses_nonnull_count_sql_semantics(spark, tmp_path):
    # value NULLs: SQL AVG divides by COUNT(value), not COUNT(*) — and an
    # all-NULL bucket serves NULL avg/sum, never a divide-by-zero
    rows = [
        (1, "a", "2026-01-01 00:10:00", 10.0),
        (2, "a", "2026-01-01 00:20:00", None),
        (3, "a", "2026-01-01 00:30:00", 20.0),
        (4, "b", "2026-01-01 00:40:00", None),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string, value double"
    ).select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    agg = _mk(spark, str(tmp_path / "rollup"))
    agg.merge(ev, epoch_id=0)
    out = {r.event_type: r for r in agg.finalize().collect()}
    assert out["a"].n == 3
    assert out["a"].sum_val == 30.0
    assert out["a"].avg_val == 15.0  # 30 / 2 non-null, NOT 30 / 3
    assert out["b"].n == 1
    assert out["b"].sum_val is None
    assert out["b"].avg_val is None


def test_legacy_null_run_rows_gated_behind_opt_in(spark, tmp_path):
    # pre-upgrade rows read back with last_run NULL: by default a fresh
    # incarnation's epoch 0 must NOT false-match them (it re-folds); with
    # accept_legacy_epochs=True the one migration run skips them
    events = load_table(spark, SF_DIR, "events")
    b1, _ = _halves(events)
    path = str(tmp_path / "rollup")
    agg = _mk(spark, path)
    agg.merge(b1, epoch_id=0)
    snap = _pd(agg.finalize(), ["bucket_start", "event_type", "n", "sum_val"])
    # simulate a legacy store: strip the run scope off every marker
    legacy = agg.state().withColumn(
        "last_run", F.lit(None).cast("string")
    ).localCheckpoint()
    legacy.write.mode("overwrite").partitionBy("bucket_day").parquet(path)

    migration = _mk(spark, path, accept_legacy_epochs=True)
    migration.merge(b1, epoch_id=0)  # upgrade mid-flight retry: skipped
    pd.testing.assert_frame_equal(
        _pd(migration.finalize(), ["bucket_start", "event_type", "n", "sum_val"]),
        snap,
    )

    fresh = _mk(spark, path)  # default: NULL run never matches
    fresh.merge(b1, epoch_id=0)
    refolded = _pd(fresh.finalize(), ["bucket_start", "event_type", "n", "sum_val"])
    assert (refolded["n"] == 2 * snap["n"]).all()  # the fold was NOT dropped


def test_downsample_exact_vs_direct_daily_rollup(spark, tmp_path):
    # hourly store downsampled to daily == a DIRECT daily rollup of the
    # same events, exactly, for every exact column (the mergeable-partials
    # cascade); HLL estimate within the sketch's error of exact distincts
    events = load_table(spark, SF_DIR, "events")
    hourly = _mk(spark, str(tmp_path / "hourly"))
    for i, b in enumerate(_halves(events)):
        hourly.merge(b, epoch_id=i)
    daily = ContinuousAggregate(
        spark, str(tmp_path / "daily"), 86_400, group_cols=["event_type"]
    )
    daily.merge(events, epoch_id=0)
    cols = ["bucket_start", "event_type", "n", "sum_val", "avg_val", "min_val", "max_val"]
    got = _pd(hourly.downsample(86_400), cols)
    want = _pd(daily.finalize(), cols)
    pd.testing.assert_frame_equal(got, want)
    exact = {
        (r.bucket_start, r.event_type): r.u
        for r in events.groupBy(
            F.date_trunc("DAY", "ts").alias("bucket_start"), "event_type"
        ).agg(F.countDistinct("user_id").alias("u")).collect()
    }
    for r in hourly.downsample(86_400).collect():
        e = exact[(r.bucket_start, r.event_type)]
        assert abs(r.approx_users - e) <= max(2, 0.05 * e)


def test_downsample_validates_resolution(spark, tmp_path):
    agg = _mk(spark, str(tmp_path / "rollup"))
    with pytest.raises(ValueError, match="multiple of the store resolution"):
        agg.downsample(1800)  # finer than the hourly store


def test_registered_serve_split_is_null_safe(spark, tmp_path, monkeypatch):
    # the registered rollup_hourly_serve epoch split must not lose
    # NULL-user rows (r10 review find: `% 2` predicates are both false on
    # NULL) — run the registered builder against a fixture WITH null users
    # and compare to the one-pass truth
    import l1dbproto_spark.queries.serving as serving

    rows = [
        (1, "a", "2026-01-01 00:10:00", 10.0),
        (None, "a", "2026-01-01 00:20:00", 20.0),
        (2, "a", "2026-01-01 00:40:00", 30.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string, value double"
    ).select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    monkeypatch.setattr(serving, "load_table", lambda s, d, t: ev)
    out = serving.rollup_hourly_serve(spark, "ignored").collect()
    assert len(out) == 1 and out[0].n == 3 and out[0].sum_val == 60.0


def test_concurrent_writer_fails_fast_and_loses_nothing(spark, tmp_path):
    """r10 advice closure: the single-writer contract is now ENFORCED.
    A second writer racing the lock raises instead of interleaving with
    the first's read-modify-write, and the store equals exactly the
    first writer's fold. Crash semantics: a leftover lock keeps failing
    merges (the crashed epoch's partial fold needs its own retry) until
    clear_writer_lock, after which the re-delivery folds normally."""
    events = load_table(spark, SF_DIR, "events")
    b1, b2 = _halves(events)
    agg = _mk(spark, str(tmp_path / "rollup"))
    agg.merge(b1, epoch_id=0)
    before = _pd(
        agg.state(),
        ["bucket_start", "event_type", "n", "min_val", "max_val"],
    )
    # simulate a writer holding the lock (as a racing merge would)
    assert agg._fs.create_exclusive(agg._lock_path, "run=other epoch=9")
    with pytest.raises(RuntimeError, match="concurrent rollup writer"):
        agg.merge(b2, epoch_id=1)
    with pytest.raises(RuntimeError, match="concurrent rollup writer"):
        agg.compact()
    after = _pd(
        agg.state(),
        ["bucket_start", "event_type", "n", "min_val", "max_val"],
    )
    pd.testing.assert_frame_equal(after, before)  # loser lost loudly, not a fold
    # crashed-writer recovery: clear, re-deliver, incremental == batch
    assert agg.clear_writer_lock()
    assert not agg.clear_writer_lock()  # idempotent: nothing left
    agg.merge(b2, epoch_id=1)
    cols = ["bucket_start", "event_type", "n", "sum_val", "min_val", "max_val"]
    pd.testing.assert_frame_equal(
        _pd(agg.finalize(), cols), _pd(_batch_truth(events), cols)
    )
    # a completed merge released its lock: the next writer proceeds
    agg.compact()


def test_writer_lock_is_check_and_set(spark, tmp_path):
    """create_exclusive must be a real CAS: the second create FAILS (touch
    would overwrite and let both racers 'win'), and the content names the
    holder for the error message."""
    agg = _mk(spark, str(tmp_path / "rollup"))
    assert agg._fs.create_exclusive(agg._lock_path, "run=a epoch=1")
    assert not agg._fs.create_exclusive(agg._lock_path, "run=b epoch=2")
    assert agg._fs.read_text(agg._lock_path) == "run=a epoch=1"
    agg.clear_writer_lock()

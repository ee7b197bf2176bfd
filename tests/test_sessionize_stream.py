"""Streaming sessionization == batch sessionization over the same events,
plus the watermark late-drop contract.

Harness: the events table split into time-ordered tranche files read with
maxFilesPerTrigger=1, so the watermark genuinely advances between
micro-batches; a far-future sentinel event closes every real session (in
append mode a session only emits once the watermark passes its end+gap),
and the comparison excludes the sentinel user."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.sessionize import StreamingSessionizer

SENTINEL_USER = -999


def _write_tranches(spark, sf_dir, base, extra_late_event=None):
    """events split at the median ts into two tranche files plus a
    far-future sentinel file (distinct mtimes pin the batch order)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    mid, hi = ev.agg(
        F.expr("percentile(unix_timestamp(ts), 0.5)"),
        F.max("ts"),
    ).first()
    early = ev.filter(F.unix_timestamp("ts") <= mid)
    late = ev.filter(F.unix_timestamp("ts") > mid)
    sentinel = spark.createDataFrame(
        [(SENTINEL_USER, (pd.Timestamp(hi) + pd.Timedelta(days=30)).to_pydatetime(), 0.0)],
        "user_id LONG, ts TIMESTAMP, value DOUBLE",
    )
    paths = []
    for i, df in enumerate([early, late, sentinel]):
        p = str(base / f"tranche_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        paths.append(p)
    return ev, paths


def _run_stream(spark, schema, src_dir, name):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src_dir)
    )
    s = StreamingSessionizer()
    q = (
        s.sessions(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


def _flatten(spark, sf_dir, tmp_path, drop_late=None):
    """Copy tranche parquet files into ONE source dir as sequentially
    named single files so maxFilesPerTrigger=1 processes them in order."""
    import glob
    import shutil

    ev, tranches = _write_tranches(spark, sf_dir, tmp_path)
    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    t = 1_700_000_000
    for i, tr in enumerate(tranches):
        part = glob.glob(f"{tr}/part-*.parquet")[0]
        dst = str(src / f"{i:03d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (t + i, t + i))
    return ev, str(src)


def test_streaming_sessions_equal_batch(spark, sf_dir, tmp_path):
    ev, src = _flatten(spark, sf_dir, tmp_path)
    got = (
        _run_stream(spark, "user_id LONG, ts TIMESTAMP, value DOUBLE", src, "sess_eq")
        .filter(F.col("user_id") != SENTINEL_USER)
        .toPandas()
    )
    want = StreamingSessionizer().batch_sessions(ev).toPandas()
    keys = ["user_id", "session_start"]
    got = got.sort_values(keys, ignore_index=True)[sorted(got.columns)]
    want = want.sort_values(keys, ignore_index=True)[sorted(want.columns)]
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_late_event_dropped_by_watermark(spark, sf_dir, tmp_path):
    """An event arriving AFTER the sentinel (watermark already far past
    it) must be dropped: the late user never appears in the output."""
    ev, src = _flatten(spark, sf_dir, tmp_path)
    first_ts = ev.agg(F.min("ts")).first()[0]
    late_user = -777
    late = spark.createDataFrame(
        [(late_user, first_ts, 1.0)], "user_id LONG, ts TIMESTAMP, value DOUBLE"
    )
    p = str(tmp_path / "late")
    late.coalesce(1).write.mode("overwrite").parquet(p)
    import glob
    import shutil

    part = glob.glob(f"{p}/part-*.parquet")[0]
    dst = f"{src}/999.parquet"
    shutil.copy(part, dst)
    os.utime(dst, (1_700_000_900, 1_700_000_900))

    out = _run_stream(
        spark, "user_id LONG, ts TIMESTAMP, value DOUBLE", src, "sess_late"
    )
    assert out.filter(F.col("user_id") == late_user).count() == 0
    assert out.filter(F.col("user_id") != SENTINEL_USER).count() > 0

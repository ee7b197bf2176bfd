"""Streaming funnel maintenance (streaming/funnel.py): incremental
chronological merges equal the batch operator, epoch re-delivery is a
no-op, restart resumes from the store, the state read is bucket-pruned,
and the availableNow binding works end to end."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from l1dbproto_spark.operators.analytics import funnel_conversion
from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.funnel import StreamingFunnel

SF_DIR = "/root/testdata/sf0.001"
STAGES = ["view", "click", "purchase"]


def _summary_pd(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values("stage_idx")
        .reset_index(drop=True)
        .astype({"n_users": "int64"})
    )


def _chrono_batches(events, n=3):
    """Split chronologically (global ts order => per-user in-order)."""
    qs = [i / n for i in range(1, n)]
    ts_bounds = events.selectExpr(
        *[f"percentile(cast(ts as double), {q}) as q{i}" for i, q in enumerate(qs)]
    ).collect()[0]
    edges = [ts_bounds[i] for i in range(n - 1)]
    t = F.col("ts").cast("double")
    batches = []
    prev = None
    for e in edges:
        cond = t <= F.lit(e) if prev is None else (t > F.lit(prev)) & (t <= F.lit(e))
        batches.append(events.filter(cond))
        prev = e
    batches.append(events.filter(t > F.lit(prev)))
    return batches


def test_incremental_equals_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    sf = StreamingFunnel(spark, str(tmp_path / "state"), STAGES)
    for b in _chrono_batches(events, 3):
        sf.merge(b)
    got = _summary_pd(sf.summary())
    want = _summary_pd(funnel_conversion(events, STAGES))
    pd.testing.assert_frame_equal(got, want)


def test_redelivery_is_noop(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    b1, b2, b3 = _chrono_batches(events, 3)
    sf = StreamingFunnel(spark, str(tmp_path / "state"), STAGES)
    sf.merge(b1)
    sf.merge(b2)
    before = _summary_pd(sf.summary())
    sf.merge(b2)  # epoch retry / at-least-once re-delivery
    after = _summary_pd(sf.summary())
    pd.testing.assert_frame_equal(before, after)
    sf.merge(b3)
    final = _summary_pd(sf.summary())
    want = _summary_pd(funnel_conversion(events, STAGES))
    pd.testing.assert_frame_equal(final, want)


def test_restart_resumes_from_store(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    b1, b2 = _chrono_batches(events, 2)
    path = str(tmp_path / "state")
    StreamingFunnel(spark, path, STAGES).merge(b1)
    # fresh instance (process restart): must see b1's state and finish
    sf2 = StreamingFunnel(spark, path, STAGES)
    sf2.merge(b2)
    got = _summary_pd(sf2.summary())
    want = _summary_pd(funnel_conversion(events, STAGES))
    pd.testing.assert_frame_equal(got, want)


def test_state_read_is_bucket_pruned(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    sf = StreamingFunnel(spark, str(tmp_path / "state"), STAGES, n_buckets=64)
    b1, b2 = _chrono_batches(events, 2)
    sf.merge(b1)
    # second batch restricted to ONE user -> state scan prunes to one bucket
    one_user = b2.filter(F.col("user_id") == b2.select("user_id").first().user_id)
    sf.merge(one_user)
    plan = sf.last_state_scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan, plan
    assert "user_bucket" in plan.split("PartitionFilters")[1][:200], plan


def test_untouched_users_survive_bucket_rewrite(spark, tmp_path):
    """Users sharing a rewritten bucket but absent from the batch must
    replay verbatim (n_buckets=1 forces every user into the rewritten
    bucket)."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, None),
        (2, "2024-01-01 00:01:00", 1, "click", 0.0, None),
        (3, "2024-01-01 00:02:00", 2, "view", 0.0, None),
    ]
    schema = "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    b1 = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    b2rows = [(4, "2024-01-01 00:03:00", 2, "click", 0.0, None)]
    b2 = spark.createDataFrame(b2rows, schema).withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    sf = StreamingFunnel(spark, str(tmp_path / "state"), STAGES, n_buckets=1)
    sf.merge(b1)
    sf.merge(b2)  # touches only user 2, but rewrites the single bucket
    st = {r.user_id: (r.t0, r.t1) for r in sf.state().collect()}
    assert st[1][0] is not None and st[1][1] is not None  # user 1 intact
    assert st[2][0] is not None and st[2][1] is not None


def test_available_now_binding(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    sf = StreamingFunnel(spark, str(tmp_path / "state"), STAGES)
    q = sf.bind_stream(stream, str(tmp_path / "ckpt")).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    got = _summary_pd(sf.summary())
    want = _summary_pd(funnel_conversion(events, STAGES))
    pd.testing.assert_frame_equal(got, want)

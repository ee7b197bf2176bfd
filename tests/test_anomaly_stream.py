"""Streaming rolling-anomaly scorer (streaming/anomaly.py): per-batch
emissions equal the batch operator over the full input, epoch retry
re-emits bit-identical scores even for batches deeper than the window,
restart resumes, state stays bounded at 2N rows per key."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from l1dbproto_spark.operators.analytics import rolling_zscore
from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.anomaly import StreamingAnomalyScorer

SF_DIR = "/root/testdata/sf0.001"


def _chrono_batches(events, n=3):
    qs = [i / n for i in range(1, n)]
    b = events.selectExpr(
        *[f"percentile(cast(ts as double), {q}) as q{i}" for i, q in enumerate(qs)]
    ).collect()[0]
    edges = [b[i] for i in range(n - 1)]
    t = F.col("ts").cast("double")
    out, prev = [], None
    for e in edges:
        cond = t <= F.lit(e) if prev is None else (t > F.lit(prev)) & (t <= F.lit(e))
        out.append(events.filter(cond))
        prev = e
    out.append(events.filter(t > F.lit(prev)))
    return out


def _scores(df) -> pd.DataFrame:
    return (
        df.select("event_id", "zscore", "is_anomaly")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def test_streamed_scores_equal_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    sc = StreamingAnomalyScorer(spark, str(tmp_path / "state"))
    emitted = [
        _scores(sc.score(b, epoch_id=i))
        for i, b in enumerate(_chrono_batches(events, 3))
    ]
    got = pd.concat(emitted).sort_values("event_id").reset_index(drop=True)
    want = _scores(rolling_zscore(events))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every row emitted exactly once
    assert got.event_id.is_unique and len(got) == len(want)


def test_epoch_retry_bit_identical(spark, tmp_path):
    """A retried epoch (batch FAR deeper than the N-row window) must
    re-emit identical scores and leave the state unchanged — the
    two-generation retention at work."""
    events = load_table(spark, SF_DIR, "events")
    b1, b2, b3 = _chrono_batches(events, 3)
    sc = StreamingAnomalyScorer(spark, str(tmp_path / "state"))
    sc.score(b1, epoch_id=0)
    first = _scores(sc.score(b2, epoch_id=1))
    state_before = (
        sc.state().toPandas().sort_values(["user_id", "event_id"]).reset_index(drop=True)
    )
    again = _scores(sc.score(b2, epoch_id=1))  # foreachBatch retry
    pd.testing.assert_frame_equal(first, again)
    state_after = (
        sc.state().toPandas().sort_values(["user_id", "event_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(state_before, state_after)
    # stream still converges to batch after the retry
    e3 = _scores(sc.score(b3, epoch_id=2))
    want = _scores(rolling_zscore(events))
    # b3's emissions match the batch operator's rows
    want3 = want[want.event_id.isin(e3.event_id)].reset_index(drop=True)
    pd.testing.assert_frame_equal(e3, want3, check_dtype=False)
    # state bounded at 2N rows per key
    per_key = sc.state().groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    assert per_key <= 2 * sc.n_prev


def test_cross_epoch_redelivery_replays_stored_scores(spark, tmp_path):
    """Rows from an earlier epoch re-delivered inside a later batch (still
    within the retained window) re-emit their stored scores."""
    events = load_table(spark, SF_DIR, "events")
    b1, b2 = _chrono_batches(events, 2)
    sc = StreamingAnomalyScorer(spark, str(tmp_path / "state"), n_prev=10)
    s1 = _scores(sc.score(b1, epoch_id=0))
    # re-deliver each user's LAST b1 row (retained) mixed into b2
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    tail1 = (
        b1.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    mixed = b2.unionByName(tail1)
    s2 = _scores(sc.score(mixed, epoch_id=1))
    redelivered = set(r.event_id for r in tail1.select("event_id").collect())
    got_re = s2[s2.event_id.isin(redelivered)].reset_index(drop=True)
    want_re = s1[s1.event_id.isin(redelivered)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got_re, want_re, check_dtype=False)
    # and the genuinely-new rows still match the batch operator
    want_all = _scores(rolling_zscore(events))
    new_ids = s2[~s2.event_id.isin(redelivered)].event_id
    pd.testing.assert_frame_equal(
        s2[s2.event_id.isin(new_ids)].reset_index(drop=True),
        want_all[want_all.event_id.isin(new_ids)].reset_index(drop=True),
        check_dtype=False,
    )


def test_restart_resumes(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    b1, b2 = _chrono_batches(events, 2)
    path = str(tmp_path / "state")
    StreamingAnomalyScorer(spark, path).score(b1, epoch_id=0)
    sc2 = StreamingAnomalyScorer(spark, path)
    got2 = _scores(sc2.score(b2, epoch_id=1))
    all_scores = _scores(rolling_zscore(events))
    want2 = all_scores[all_scores.event_id.isin(got2.event_id)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)

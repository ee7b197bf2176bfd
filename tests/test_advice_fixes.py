"""Regression tests for the round-1 ADVICE findings.

Each test pins one fixed defect:
* word_shingles crashed (INVALID_PARAMETER_VALUE.START) on docs shorter than
  the shingle width and diverged from the oracle's greatest(len-2, 1);
* asof_join's tie_break was a silent no-op (resolved equal-ts right rows by
  physical row order);
* day/night-gated visit streaming livelocked when the start time fell inside
  the 06:00-20:00 day window;
* APDB writes leaked partitionOverwriteMode=dynamic into the shared session.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.asof import asof_join
from l1dbproto_spark.operators.dedup import word_shingles


def test_word_shingles_short_doc_truncated(spark):
    docs = spark.createDataFrame(
        [(1, "only two"), (2, "one"), (3, "a b c d")], ["doc_id", "text"]
    )
    rows = {
        (r.doc_id, r.shingle)
        for r in word_shingles(docs, n=3).collect()
    }
    # short docs -> exactly one truncated shingle (the whole text)
    assert (1, "only two") in rows
    assert (2, "one") in rows
    assert {s for d, s in rows if d == 1} == {"only two"}
    assert {s for d, s in rows if d == 3} == {"a b c", "b c d"}


@pytest.mark.parametrize("reverse", [False, True])
def test_asof_tie_break_deterministic(spark, reverse):
    # two right rows at the SAME timestamp: tie_break (event_id) must pick
    # the greatest one regardless of physical input order
    right_rows = [
        (1, 10.0, 100, 7.5),
        (1, 10.0, 200, 9.5),
    ]
    if reverse:
        right_rows = list(reversed(right_rows))
    right = spark.createDataFrame(
        right_rows, ["user_id", "ts", "event_id", "value"]
    ).coalesce(1)
    left = spark.createDataFrame([(1, 10.0), (1, 15.0)], ["user_id", "ts"])
    out = asof_join(
        left, right, by=["user_id"], ts_col="ts",
        payload_cols=["value"], tie_break="event_id",
    )
    vals = {r.ts: r.asof_value for r in out.collect()}
    # inclusive as-of: the equal-ts right row matches, and among the two
    # equal-ts rows event_id=200 wins
    assert vals == {10.0: 9.5, 15.0: 9.5}


def test_day_night_gate_advances_time():
    from l1dbproto_spark.streaming.visit_stream import VisitStreamDriver, night_gated

    # start just before the day->night edge: gated batches must advance the
    # clock until 20:00 instead of recomputing the same gated visit_time
    drv = VisitStreamDriver.__new__(VisitStreamDriver)
    drv.start_time = datetime.datetime(2026, 1, 1, 19, 59, 30)
    drv.interval_s = 45
    drv.gate_day_night = True
    drv.counts = []
    drv.ticks = 0
    drv.next_visit_id = 1
    drv.maintain_every = None  # post-visit maintenance hook (off here)
    processed = []
    drv._process_one = lambda vid, vt: (processed.append(vt), drv.counts.append((vid, 0)))

    class _FakeBatch:
        def isEmpty(self):
            return False

    for _ in range(3):
        drv.foreach_batch(_FakeBatch(), 0)
    assert processed, "gated stream made no progress (livelock)"
    assert all(night_gated(t) for t in processed)
    assert drv.ticks == 3


def test_partition_overwrite_mode_not_leaked(spark, tmp_path):
    from l1dbproto_spark.apdb import ApdbSpark

    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    objects = spark.createDataFrame(
        [(1, 10.0, 1.0), (2, 11.0, 1.5)], ["diaObjectId", "ra", "dec"]
    )
    apdb.store(datetime.datetime(2026, 1, 1), objects)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == before
    assert apdb.count_rows("DiaObjectLast") == 2

"""Structured Streaming visit loop (T1-T5) + replica retention (T6)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.apdb import ApdbSpark
from l1dbproto_spark.plans.region import Circle
from l1dbproto_spark.streaming.visit_stream import VisitStreamDriver, night_gated
from l1dbproto_spark.workload.dia import DiaConfig
from l1dbproto_spark.workload.generators import rand_cone_xyz

POINTING = Circle(70.0, -20.0, 1.76)


@pytest.fixture(scope="module")
def var_cat(spark):
    df = rand_cone_xyz(spark, 300, POINTING.ra, POINTING.dec, POINTING.radius_deg, seed=51).cache()
    df.count()
    return df


def _driver(spark, var_cat, root, **kw):
    db = ApdbSpark(spark, root, enable_replica=True, replica_chunk_seconds=45)
    db.make_schema(drop=False)
    return VisitStreamDriver(
        spark,
        db,
        var_cat,
        POINTING,
        dia_cfg=DiaConfig(false_per_visit=20, transient_per_visit=5),
        start_time=datetime.datetime(2026, 3, 1, 2, 0, 0),
        **kw,
    )


def test_stream_processes_visits_and_checkpoints(spark, var_cat, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("apdb_stream"))
    drv = _driver(spark, var_cat, root)
    counts = drv.run_stream(n_visits=2)
    assert len(counts) >= 2
    assert counts[0][1].objects_stored > 0
    lv = drv.apdb.last_visit()
    assert lv["visitId"] >= 2

    # restart: a NEW driver resumes from the checkpoint (T5)
    drv2 = _driver(spark, var_cat, root)
    assert drv2.next_visit_id == lv["visitId"] + 1
    drv2.run_batch(1)
    assert drv2.apdb.last_visit()["visitId"] == lv["visitId"] + 1
    # object count monotonicity across restart
    last = drv2.apdb._read("DiaObjectLast")
    assert last.groupBy("diaObjectId").count().filter(F.col("count") > 1).count() == 0


def test_replica_chunks_and_retention(spark, var_cat, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("apdb_replica"))
    drv = _driver(spark, var_cat, root)
    drv.run_batch(3)
    chunks = spark.read.parquet(f"{root}/DiaSourceChunks")
    n_chunks = chunks.select("replica_chunk").distinct().count()
    assert n_chunks >= 2  # 45 s visits, 45 s chunk duration

    # retention: keep nothing older than ~1 chunk
    now = drv.start_time + datetime.timedelta(seconds=45 * 3)
    dropped = drv.apdb.cleanup_replica_chunks(now, keep_days=45.0 / 86400.0)
    assert dropped > 0
    remaining = spark.read.parquet(f"{root}/DiaSourceChunks")
    assert remaining.select("replica_chunk").distinct().count() < n_chunks


def test_day_night_gate():
    assert night_gated(datetime.datetime(2026, 1, 1, 3, 0))
    assert not night_gated(datetime.datetime(2026, 1, 1, 12, 0))
    assert night_gated(datetime.datetime(2026, 1, 1, 21, 0))

"""Scale-evidence guard for the Q1 hot read (VERDICT round-1 task 8).

After ~50 accumulated visits the region read must still be:
  (a) partition-pruned — the executed plan carries a PartitionFilter on
      pixel_bucket, so only the cone's buckets are listed/scanned;
  (b) row-group-skippable — the pixelId range predicates are pushed to the
      parquet scan, and every data file is internally sorted by pixelId so
      file/row-group min-max stats are tight (the apdb.store layout
      invariants: repartition('pixel_bucket') + sortWithinPartitions('pixelId'));
  (c) correct — identical to a brute-force filter over the full table.

This pins the store() write-layout invariants against regressions: breaking
the sort or the partitioning makes these assertions fail before any
benchmark would notice.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.apdb import ApdbSpark
from l1dbproto_spark.plans.region import Circle

N_VISITS = 50
POINTING = Circle(40.0, -30.0, 1.76)


@pytest.fixture(scope="module")
def accumulated_apdb(spark, tmp_path_factory):
    from l1dbproto_spark.workload.generators import rand_cone_xyz, with_radec

    root = str(tmp_path_factory.mktemp("apdb_scale"))
    db = ApdbSpark(spark, root)
    db.make_schema(drop=True)
    # small per-visit batches over a wide-ish cone: many visits accumulate
    # many files per touched bucket — the regime where layout hygiene matters
    cat = with_radec(
        rand_cone_xyz(spark, 400, POINTING.ra, POINTING.dec, POINTING.radius_deg, seed=7)
    )
    objs = cat.select(
        (F.col("source_idx") + 1).alias("diaObjectId"), "ra", "dec"
    ).localCheckpoint(eager=True)
    t0 = datetime.datetime(2026, 1, 1, 3, 0)
    for v in range(N_VISITS):
        db.store(t0 + datetime.timedelta(seconds=45 * v), objs)
    return db


def _executed_plan(df) -> str:
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_partition_pruning_and_pushdown(accumulated_apdb):
    df = accumulated_apdb.get_dia_objects(POINTING, refine=False)
    plan = _executed_plan(df)
    assert "PartitionFilters" in plan and "pixel_bucket" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "pixel_bucket partition filter missing from scan"
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "pixelId" in pushed, "pixelId range predicates not pushed to parquet scan"


@pytest.mark.parametrize("table", ["DiaObject", "DiaObjectLast"])
def test_q1_files_sorted_by_pixel_id(accumulated_apdb, spark, table):
    """Every data file of the spatial tables must be internally sorted by
    pixelId — the invariant that keeps parquet row-group min/max stats tight.
    (Round-2 regression catch: an unordered partitionBy write makes Spark
    insert its own non-stable partition-column sort, silently destroying the
    pixelId clustering.)"""
    files = [
        f
        for f in spark.read.parquet(accumulated_apdb._path(table)).inputFiles()
        if f.endswith(".parquet")
    ]
    assert files
    for f in files[:8]:  # spot-check a handful of files
        pix = [r[0] for r in spark.read.parquet(f).select("pixelId").collect()]
        assert pix == sorted(pix), f"unsorted pixelId in {f}"


def test_q1_matches_brute_force(accumulated_apdb):
    df = accumulated_apdb.get_dia_objects(POINTING, refine=True)
    full = accumulated_apdb._read("DiaObjectLast")
    brute = full.filter(POINTING.contains_expr(F.col("ra"), F.col("dec")))
    got = {r[0] for r in df.select("diaObjectId").collect()}
    want = {r[0] for r in brute.select("diaObjectId").collect()}
    assert got == want and len(got) > 0


def test_q1_last_table_stays_compact(accumulated_apdb):
    """DiaObjectLast is rewritten per touched bucket each store — after 50
    visits it must hold exactly one (latest) version per object, not 50."""
    last = accumulated_apdb._read("DiaObjectLast")
    assert last.count() == last.select("diaObjectId").distinct().count()

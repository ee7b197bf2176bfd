"""End-to-end APDB visit-loop invariants (FIXTURES.md 'Correctness
invariants'): the reference never tests these (SURVEY.md §5 — it validates
operationally via metrics); we make them explicit.

1. getDiaObjects(cone) == brute-force latest-version-in-cone oracle
2. exactly one DiaObjectLast row per id == argmax(validityStart)
3. nDiaSources after N matched visits == N
4. history reads: only matched ids within the months window
5. DiaSource id formula (visit*n_det+detector)*1e6 + 1..n
6. checkpoint save/recover roundtrip
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.apdb import ApdbSpark
from l1dbproto_spark.functions.geo import angular_separation_deg
from l1dbproto_spark.plans.region import Circle
from l1dbproto_spark.workload.dia import DiaConfig, detect_sources
from l1dbproto_spark.workload.generators import rand_cone_xyz, with_radec
from l1dbproto_spark.workload.visit_pipeline import VisitConfig, process_visit

T0 = datetime.datetime(2026, 1, 1, 3, 0, 0)
POINTING = Circle(50.0, -35.0, 1.76)


@pytest.fixture(scope="module")
def apdb(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("apdb"))
    db = ApdbSpark(spark, root, read_sources_months=12.0)
    db.make_schema(drop=True)

    # static var catalog: 800 sources inside the FOV cone (+ some outside)
    cat_in = rand_cone_xyz(spark, 800, POINTING.ra, POINTING.dec, POINTING.radius_deg, seed=31)
    cat_out = (
        rand_cone_xyz(spark, 200, POINTING.ra + 30, POINTING.dec + 20, 2.0, seed=32)
        .withColumn("source_idx", F.col("source_idx") + 800)
    )
    var_cat = cat_in.unionByName(cat_out).cache()
    var_cat.count()

    cfg = DiaConfig(false_per_visit=50, transient_per_visit=10)
    vcfg = VisitConfig(n_detectors=189)
    last_obj = 0
    counts = []
    for visit_id in range(1, 4):
        t = T0 + datetime.timedelta(minutes=visit_id)
        detections, last_obj = detect_sources(
            spark, var_cat, POINTING, cfg, visit_seed=100 + visit_id, last_object_id=last_obj
        )
        c = process_visit(
            apdb=db,
            visit_id=visit_id,
            visit_time=t,
            detections=detections.select("diaObjectId", "ra", "dec"),
            region=POINTING,
            cfg=vcfg,
        )
        counts.append(c)
        db.save_visit(visit_id, t, last_obj)
    db._counts = counts
    db._last_obj = last_obj
    return db


def test_last_has_one_row_per_object(apdb):
    last = apdb._read("DiaObjectLast")
    dup = last.groupBy("diaObjectId").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_last_is_argmax_validity(apdb, spark):
    hist = apdb._read("DiaObject")
    expected = (
        hist.groupBy("diaObjectId").agg(F.max("validityStart").alias("validityStart"))
    )
    last = apdb._read("DiaObjectLast").select("diaObjectId", "validityStart")
    assert last.exceptAll(expected).count() == 0
    assert expected.exceptAll(last).count() == 0


def test_ndiasources_increments(apdb):
    """Variable sources detected in all 3 visits must have nDiaSources == 3."""
    last = apdb._read("DiaObjectLast").filter(F.col("diaObjectId") < 800)
    mx = last.agg(F.max("nDiaSources")).collect()[0][0]
    assert mx == 3
    # and a healthy majority detected every visit (detection_fraction = 1)
    n3 = last.filter(F.col("nDiaSources") == 3).count()
    assert n3 > 0


def test_cone_read_matches_bruteforce(apdb):
    got = apdb.get_dia_objects(POINTING).select("diaObjectId")
    brute = (
        apdb._read("DiaObjectLast")
        .filter(
            angular_separation_deg(
                F.col("ra"), F.col("dec"), F.lit(POINTING.ra), F.lit(POINTING.dec)
            )
            <= POINTING.radius_deg
        )
        .select("diaObjectId")
    )
    assert got.exceptAll(brute).count() == 0
    assert brute.exceptAll(got).count() == 0


def test_history_only_matched_ids_within_window(apdb, spark):
    ids = [0, 1, 2, 3, 4]
    t = T0 + datetime.timedelta(days=1)
    hist = apdb.get_dia_sources(POINTING, ids, t)
    bad = hist.filter(~F.col("diaObjectId").isin(ids)).count()
    assert bad == 0
    from l1dbproto_spark.functions.timeutil import python_datetime_to_mjd

    cutoff = python_datetime_to_mjd(t) - 12.0 * 30.0
    assert hist.filter(F.col("midpointMjdTai") < cutoff).count() == 0


def test_source_id_formula(apdb):
    src = apdb._read("DiaSource").filter(F.col("visit") == 2)
    n_det = 189
    base = (2 * n_det + 0) * 1_000_000
    row = src.agg(F.min("diaSourceId"), F.max("diaSourceId"), F.count("*")).collect()[0]
    assert row[0] == base + 1
    assert row[1] == base + row[2]


def test_transient_ids_above_start(apdb):
    trans = apdb._read("DiaObjectLast").filter(F.col("diaObjectId") >= 1_000_000_000)
    assert trans.count() > 0
    assert apdb._last_obj >= 1_000_000_000


def test_checkpoint_roundtrip(apdb):
    lv = apdb.last_visit()
    assert lv is not None
    assert lv["visitId"] == 3
    assert lv["lastObjectId"] == apdb._last_obj


def test_forced_photometry_eligibility(apdb):
    """Forced sources only for objects with nDiaSources > 1 => none on visit 1,
    and never for transients (each transient is detected exactly once in this
    sim, so nDiaSources stays 1). Guards against the lazy-plan-over-mutated-
    storage bug: a forced plan re-evaluated after the store's Last-merge sees
    transients self-match to nDiaSources=2."""
    f = apdb._read("DiaForcedSource")
    assert f.filter(F.col("visit") == 1).count() == 0
    assert f.filter(F.col("visit") == 2).count() > 0
    assert f.filter(F.col("diaObjectId") >= 1_000_000_000).count() == 0


def test_read_counts_recorded(apdb):
    c1, c2, c3 = apdb._counts
    assert c1.objects_read == 0  # empty DB on first visit
    assert c2.objects_read > 0
    assert c3.objects_stored >= c3.transients_stored > 0


def test_reference_api_aliases(apdb):
    """Verbatim reference call shapes (README.md:100-151)."""
    df = apdb.getDiaObjects(POINTING)
    assert df.count() == apdb.get_dia_objects(POINTING).count()
    assert apdb.tableDef("DiaSource").fieldNames()[0] == "diaSourceId"
    t = T0 + datetime.timedelta(days=1)
    assert apdb.getDiaSources(POINTING, [0, 1], t).count() >= 0


def test_column_pruning_and_api_names(apdb):
    """P7 column pruning + P9 client-side renames on the hot read."""
    df = apdb.get_dia_objects(POINTING, columns=["diaObjectId", "ra", "dec"])
    assert df.columns == ["diaObjectId", "ra", "dec"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "flux_f32" not in plan.split("ReadSchema")[-1][:400]
    api = apdb.get_dia_objects(POINTING, columns=["diaObjectId", "ra", "dec"], api_names=True)
    assert api.columns == ["id", "coord_ra", "coord_dec"]


def test_from_uri(apdb, spark):
    from l1dbproto_spark.apdb import ApdbSpark

    db2 = ApdbSpark.from_uri(spark, "file://" + apdb.root)
    assert db2.count_rows("DiaObjectLast") == apdb.count_rows("DiaObjectLast")


def test_history_counts_exclude_inflight_visit(spark, tmp_path):
    """The r14 overlap optimization runs the Q2/Q3 history-count jobs
    CONCURRENTLY with store(); the frames must still be pre-store
    snapshots. Built before store, the file-based scans pin their file
    listing at construction, so the counts can never include the visit's
    own appends — proven here by counting AFTER the store completes."""
    db = ApdbSpark(spark, str(tmp_path / "apdb_snap"), read_sources_months=12.0)
    db.make_schema(drop=True)
    t1 = T0
    t2 = T0 + datetime.timedelta(minutes=1)

    def _batch(visit_id, t):
        ids = spark.range(1, 6).select(
            F.col("id").alias("diaObjectId"),
            F.lit(50.0).alias("ra"),
            F.lit(-35.0).alias("dec"),
        )
        obj = ids.withColumn("nDiaSources", F.lit(visit_id)).withColumn(
            "lastNonForcedSource", F.lit(t).cast("timestamp")
        )
        src = ids.select(
            (F.col("diaObjectId") * 10 + visit_id).alias("diaSourceId"),
            "diaObjectId",
            F.lit(visit_id).alias("visit"),
            F.lit(0).alias("detector"),
            F.lit(0).cast("long").alias("parentDiaSourceId"),
            F.lit(1.0).alias("psFlux"),
            F.lit(0.01).alias("psFluxErr"),
            F.lit(61041.0 + visit_id).alias("midpointMjdTai"),
            "ra",
            "dec",
        )
        return obj, src

    obj1, src1 = _batch(1, t1)
    db.store(t1, obj1, src1)

    # build the history frame BEFORE the second store (as process_visit
    # does), run its count while/after the store appends visit 2's rows
    ids = obj1.select("diaObjectId")
    pre = db.get_dia_sources(POINTING, ids, t2)
    obj2, src2 = _batch(2, t2)
    db.store(t2, obj2, src2)
    # the pre-store snapshot sees only visit 1's five rows, even though
    # the table now holds ten
    assert pre.count() == 5
    assert db.count_rows("DiaSource") == 10

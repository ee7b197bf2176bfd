"""J6 update-join (source reassignment) + F4 spherical areas."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.apdb import ApdbSpark
from l1dbproto_spark.plans.region import Circle
from l1dbproto_spark.workload.dia import DiaConfig, detect_sources
from l1dbproto_spark.functions.geo import unit_vector
from l1dbproto_spark.workload.generators import rand_cone_xyz
from l1dbproto_spark.workload.geom import (
    spherical_polygon_area,
    spherical_triangle_area,
)
from l1dbproto_spark.workload.visit_pipeline import process_visit

POINTING = Circle(10.0, -60.0, 1.76)


def test_reassign_sources(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("apdb_reassign"))
    db = ApdbSpark(spark, root)
    db.make_schema(drop=True)
    cat = rand_cone_xyz(spark, 100, POINTING.ra, POINTING.dec, POINTING.radius_deg, seed=61)
    det, _ = detect_sources(
        spark, cat, POINTING, DiaConfig(false_per_visit=10, transient_per_visit=2),
        visit_seed=700, last_object_id=0,
    )
    process_visit(db, 1, datetime.datetime(2026, 4, 1, 1, 0), det.select("diaObjectId", "ra", "dec"), POINTING)

    ids = [r[0] for r in db._read("DiaSource").select("diaSourceId").limit(3).collect()]
    sso_id = 2_000_000_000
    mapping = spark.createDataFrame(
        [(i, sso_id) for i in ids], "diaSourceId long, newDiaObjectId long"
    )
    n = db.reassign_sources(mapping)
    assert n == 3
    after = db._read("DiaSource")
    assert after.filter(F.col("diaObjectId") == sso_id).count() == 3
    assert after.filter(F.col("diaSourceId").isin(ids) & (F.col("diaObjectId") != sso_id)).count() == 0
    # untouched rows preserved, total count unchanged
    assert after.count() == det.count()


def test_reassign_empty_mapping(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("apdb_reassign2"))
    db = ApdbSpark(spark, root)
    db.make_schema(drop=True)
    mapping = spark.createDataFrame([], "diaSourceId long, newDiaObjectId long")
    assert db.reassign_sources(mapping) == 0


def test_spherical_areas():
    """Reference test strategy (tests/test_geom.py:99-151): analytically known
    areas + permutation invariance."""
    px, py, pz = (1, 0, 0), (0, 1, 0), (0, 0, 1)
    octant = spherical_triangle_area(px, py, pz)
    assert math.isclose(octant, math.pi / 2, rel_tol=1e-12)
    # permutation invariance
    assert math.isclose(spherical_triangle_area(py, pz, px), octant, rel_tol=1e-12)
    # half the northern hemisphere as a 4-vertex polygon (fan origin chosen
    # so no fan triangle has antipodal corners)
    quad = spherical_polygon_area([py, (-1, 0, 0), pz, px])
    assert math.isclose(quad, math.pi, rel_tol=1e-9)
    # small flat triangle ~ planar area
    eps = 1e-4
    a = unit_vector(0.0, 0.0)
    b = unit_vector(math.degrees(eps), 0.0)
    c = unit_vector(0.0, math.degrees(eps))
    small = spherical_triangle_area(a, b, c)
    assert math.isclose(small, eps * eps / 2, rel_tol=1e-3)


def test_compaction_preserves_data(spark, tmp_path_factory):
    import datetime
    from l1dbproto_spark.workload.dia import DiaConfig, detect_sources
    from l1dbproto_spark.workload.visit_pipeline import process_visit
    import glob

    root = str(tmp_path_factory.mktemp("apdb_compact"))
    db = ApdbSpark(spark, root)
    db.make_schema(drop=True)
    cat = rand_cone_xyz(spark, 100, POINTING.ra, POINTING.dec, POINTING.radius_deg, seed=62)
    last = 0
    for v in range(1, 4):
        det, last = detect_sources(
            spark, cat, POINTING, DiaConfig(false_per_visit=10, transient_per_visit=2),
            visit_seed=710 + v, last_object_id=last,
        )
        process_visit(db, v, datetime.datetime(2026, 4, 1, 1, v), det.select("diaObjectId", "ra", "dec"), POINTING)
    before_rows = db._read("DiaSource").count()
    before_files = len(glob.glob(f"{root}/DiaSource/*/*.parquet"))
    db.compact("DiaSource")
    after_rows = db._read("DiaSource").count()
    after_files = len(glob.glob(f"{root}/DiaSource/*/*.parquet"))
    assert after_rows == before_rows
    assert after_files < before_files

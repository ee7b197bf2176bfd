"""Property tests for the geometry expression library — ports of the
reference's own test strategy (tests/test_geom.py, tests/test_generators.py:
unit norms, containment bounds, rotation exactness)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.functions.geo import (
    angular_separation_deg,
    apply_rotation,
    rotation_matrix,
    unit_vector,
    xyz_to_dec,
    xyz_to_ra,
)
from l1dbproto_spark.workload.generators import rand_sphere_xyz, with_radec


def test_radec_xyz_roundtrip(spark):
    df = with_radec(rand_sphere_xyz(spark, 2000, seed=1))
    from l1dbproto_spark.functions.geo import radec_to_xyz

    x2, y2, z2 = radec_to_xyz(F.col("ra"), F.col("dec"))
    err = df.select(
        F.max(
            F.abs(x2 - F.col("x")) + F.abs(y2 - F.col("y")) + F.abs(z2 - F.col("z"))
        ).alias("e")
    ).collect()[0]["e"]
    assert err < 1e-12


def test_ra_dec_ranges(spark):
    df = with_radec(rand_sphere_xyz(spark, 2000, seed=2))
    row = df.select(
        F.min("ra"), F.max("ra"), F.min("dec"), F.max("dec")
    ).collect()[0]
    assert 0 <= row[0] and row[1] < 360
    assert -90 <= row[2] and row[3] <= 90


def test_rotation_matrix_maps_a_to_b():
    rng = np.random.default_rng(3)
    for _ in range(50):
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        b = rng.normal(size=3)
        b /= np.linalg.norm(b)
        m = np.array(rotation_matrix(tuple(a), tuple(b)))
        assert np.allclose(m @ a, b, atol=1e-12)
        # proper rotation
        assert np.allclose(m @ m.T, np.eye(3), atol=1e-12)
        assert math.isclose(np.linalg.det(m), 1.0, abs_tol=1e-12)


def test_apply_rotation_columns(spark):
    m = rotation_matrix((0.0, 0.0, 1.0), unit_vector(30.0, -45.0))
    df = rand_sphere_xyz(spark, 500, seed=4)
    rx, ry, rz = apply_rotation(m, F.col("x"), F.col("y"), F.col("z"))
    norm_err = df.select(
        F.max(F.abs(F.sqrt(rx * rx + ry * ry + rz * rz) - 1.0)).alias("e")
    ).collect()[0]["e"]
    assert norm_err < 1e-12


def test_angular_separation(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 90.0, 0.0), (10.0, 20.0, 10.0, 20.0), (0.0, -90.0, 0.0, 90.0)],
        "ra1 double, dec1 double, ra2 double, dec2 double",
    )
    out = df.select(
        angular_separation_deg(
            F.col("ra1"), F.col("dec1"), F.col("ra2"), F.col("dec2")
        ).alias("sep")
    ).collect()
    assert math.isclose(out[0]["sep"], 90.0, abs_tol=1e-9)
    assert math.isclose(out[1]["sep"], 0.0, abs_tol=1e-9)
    assert math.isclose(out[2]["sep"], 180.0, abs_tol=1e-9)


def test_xyz_to_ra_wraps(spark):
    df = spark.createDataFrame([(1.0, -1e-9, 0.0)], "x double, y double, z double")
    ra = df.select(xyz_to_ra(F.col("x"), F.col("y")).alias("ra")).collect()[0]["ra"]
    assert 0 <= ra < 360


def test_dec_poles(spark):
    df = spark.createDataFrame([(0.0, 0.0, 1.0), (0.0, 0.0, -1.0)], "x double, y double, z double")
    out = [r["dec"] for r in df.select(xyz_to_dec(F.col("z")).alias("dec")).collect()]
    assert out == [90.0, -90.0]


def test_cone_crossmatch_matches_exact_oracle(spark):
    """The unregistered standalone cone filter (COVERAGE P1) against the
    exact DuckDB cone predicate — same derived points, same constants.
    sf0.01: the cone is empty at sf0.001's order count."""
    import duckdb

    sf_dir = "/root/testdata/sf0.01"

    from l1dbproto_spark.queries.geo import (
        _CX, _CY, _CZ, _COS_T, _D2R, _DERIVED_SQL, cone_crossmatch,
    )

    got = sorted(r.o_orderkey for r in cone_crossmatch(spark, sf_dir).collect())
    want = sorted(
        row[0]
        for row in duckdb.sql(
            f"""
            WITH derived AS ({_DERIVED_SQL.replace('orders', f"'{sf_dir}/orders.parquet'")}),
            xyz AS (
              SELECT o_orderkey,
                cos(dec * {_D2R}) * cos(ra * {_D2R}) AS x,
                cos(dec * {_D2R}) * sin(ra * {_D2R}) AS y,
                sin(dec * {_D2R}) AS z
              FROM derived
            )
            SELECT o_orderkey FROM xyz
            WHERE x * {_CX!r} + y * {_CY!r} + z * {_CZ!r} > {_COS_T}
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0

"""Generator properties — ports of the reference's tests/test_generators.py
(unit norm :48-50, hemisphere signs :52-62, cone containment :64-80)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from l1dbproto_spark.functions.geo import unit_vector
from l1dbproto_spark.workload.generators import rand_cone_xyz, rand_sphere_xyz


def _norm_err(df):
    return df.select(
        F.max(
            F.abs(
                F.sqrt(
                    F.col("x") * F.col("x")
                    + F.col("y") * F.col("y")
                    + F.col("z") * F.col("z")
                )
                - 1.0
            )
        ).alias("e")
    ).collect()[0]["e"]


def test_sphere_unit_norm(spark):
    assert _norm_err(rand_sphere_xyz(spark, 3000, seed=21)) < 1e-12


def test_sphere_hemisphere(spark):
    south = rand_sphere_xyz(spark, 1000, seed=22, hemisphere="south")
    assert south.filter(F.col("z") > 0).count() == 0
    north = rand_sphere_xyz(spark, 1000, seed=23, hemisphere="north")
    assert north.filter(F.col("z") < 0).count() == 0


def test_sphere_deterministic(spark):
    a = rand_sphere_xyz(spark, 100, seed=24).toPandas()
    b = rand_sphere_xyz(spark, 100, seed=24).toPandas()
    assert (a == b).all().all()


def test_cone_containment(spark):
    ra, dec, radius = 120.0, -30.0, 2.0
    df = rand_cone_xyz(spark, 3000, ra, dec, radius, seed=25)
    assert _norm_err(df) < 1e-12
    cx, cy, cz = unit_vector(ra, dec)
    min_dot = df.select(
        F.min(
            F.col("x") * cx + F.col("y") * cy + F.col("z") * cz
        ).alias("d")
    ).collect()[0]["d"]
    assert min_dot >= math.cos(math.radians(radius)) - 1e-12

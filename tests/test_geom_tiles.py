"""Tiling invariants — ports of the reference's tests/test_geom.py:63-97
(tile counts, corner-raft exclusion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.plans.region import Circle
from l1dbproto_spark.workload.generators import rand_cone_xyz, with_radec
from l1dbproto_spark.workload.geom import (
    make_tile_expr,
    n_camera_tiles,
    square_tile_expr,
)

POINTING = Circle(80.0, -50.0, 1.76)


def _dense_sample(spark, n=20000):
    return with_radec(
        rand_cone_xyz(spark, n, POINTING.ra, POINTING.dec, POINTING.radius_deg, seed=41)
    )


def test_square_tiling_counts(spark):
    df = _dense_sample(spark)
    tile = square_tile_expr(
        F.col("ra"), F.col("dec"), POINTING.ra, POINTING.dec, 3.52, 4
    )
    tiles = df.select(tile.alias("t")).filter(F.col("t") >= 0)
    distinct = tiles.select("t").distinct().count()
    assert distinct == 16  # dense circular sample inscribed in the square grid


def test_camera_tiling_count_and_corners(spark):
    assert n_camera_tiles(2) == 84
    assert n_camera_tiles(3) == 189
    df = _dense_sample(spark, 50000)
    tile = make_tile_expr(F.col("ra"), F.col("dec"), POINTING.ra, POINTING.dec, 3.52, -2)
    got = df.select(tile.alias("t"))
    n_distinct = got.filter(F.col("t") >= 0).select("t").distinct().count()
    # circular FOV cannot reach all 84 raft-subdivided cells of the square,
    # but must cover most of them and never produce an out-of-range id
    assert 60 <= n_distinct <= 84
    assert got.agg(F.max("t")).collect()[0][0] < (5 * 2) ** 2


def test_outside_fov_is_minus_one(spark):
    far = with_radec(rand_cone_xyz(spark, 1000, POINTING.ra + 60, 0.0, 1.0, seed=42))
    tile = make_tile_expr(F.col("ra"), F.col("dec"), POINTING.ra, POINTING.dec, 3.52, 4)
    assert far.select(tile.alias("t")).filter(F.col("t") >= 0).count() == 0

"""Spherical-geometry queries on coordinates derived deterministically from
the test tables — the oracle-checkable face of the APDB spatial layer.

Mapping (deterministic, engine-portable): each order is a point at
``ra = (o_orderkey % 3600)/10`` (0..359.9), ``dec = (o_custkey % 1800)/10 - 90``.

Engine-parity discipline: degree->radian conversion is a multiplication by a
Python-computed double constant embedded verbatim in BOTH the Spark plan and
the oracle SQL (Spark's F.radians computes ``deg/180*pi`` while DuckDB
computes ``deg*(pi/180)`` — different rounding). Trig outputs are never
emitted as result columns; only integer keys/ids, so a last-ulp libm
difference could only matter within an ulp of a predicate boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import unit_vector
from ..functions.pixelize import pixel_expr
from ..sources.catalog import load_table
from . import query

_D2R = repr(math.pi / 180.0)

# cone center/radius for the cross-match (reference FOV-scale: DIA.py:72-77)
_CRA, _CDEC, _CRAD = 120.0, -40.0, 15.0
_CX, _CY, _CZ = unit_vector(_CRA, _CDEC)
_COS_T = repr(math.cos(math.radians(_CRAD)))

_DERIVED_SQL = f"""
      SELECT
        o_orderkey,
        CAST(o_orderkey % 3600 AS DOUBLE) / 10.0 AS ra,
        CAST(o_custkey % 1800 AS DOUBLE) / 10.0 - 90.0 AS dec
      FROM orders
"""


def _derived_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        ((F.col("o_orderkey") % 3600).cast("double") / 10.0).alias("ra"),
        ((F.col("o_custkey") % 1800).cast("double") / 10.0 - 90.0).alias("dec"),
    )


def _xyz_cols(df: DataFrame) -> DataFrame:
    d2r = F.lit(float(_D2R))
    ra_r, dec_r = F.col("ra") * d2r, F.col("dec") * d2r
    return df.withColumns(
        {
            "x": F.cos(dec_r) * F.cos(ra_r),
            "y": F.cos(dec_r) * F.sin(ra_r),
            "z": F.sin(dec_r),
        }
    )


_XYZ_SQL = f"""
      SELECT o_orderkey, ra, dec,
        cos(dec * {_D2R}) * cos(ra * {_D2R}) AS x,
        cos(dec * {_D2R}) * sin(ra * {_D2R}) AS y,
        sin(dec * {_D2R}) AS z
      FROM derived
"""


def cone_crossmatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's cone cross-match (``DIA.py:72-77``):
    ``dot(center, v) > cos(radius)`` as a native filter — the predicate that
    at scale is preceded by pixel-range partition pruning."""
    pts = _xyz_cols(_derived_points(spark, sf_dir))
    pred = (
        F.col("x") * float(_CX) + F.col("y") * float(_CY) + F.col("z") * float(_CZ)
    ) > float(_COS_T)
    return pts.filter(pred).select("o_orderkey")


# Rotated out of the driver registry in driver round 8 (slot to column_profile);
# the identical oracle runs in-suite: tests/test_unregistered_batteries.py
# test_pixelization_ids_matches_oracle. J5/§4 stay driver-checked via
# pixel_range_scan (the range planner consumes these ids).
PIXELIZATION_IDS_ORACLE = f"""
    WITH derived AS ({_DERIVED_SQL}),
    xyz AS ({_XYZ_SQL}),
    p AS (
      SELECT o_orderkey, x, y, z, abs(x) AS ax, abs(y) AS ay, abs(z) AS az,
             greatest(abs(x), abs(y), abs(z)) AS d
      FROM xyz
    ),
    f AS (
      SELECT o_orderkey, x, y, z, d,
        CASE WHEN az >= ax AND az >= ay THEN (CASE WHEN z >= 0 THEN 4 ELSE 5 END)
             WHEN ay >= ax THEN (CASE WHEN y >= 0 THEN 1 ELSE 3 END)
             ELSE (CASE WHEN x >= 0 THEN 0 ELSE 2 END) END AS face
      FROM p
    ),
    uv AS (
      SELECT o_orderkey, face,
        (CASE WHEN face IN (0, 2) THEN y ELSE x END) / d AS u,
        (CASE WHEN face IN (4, 5) THEN y ELSE z END) / d AS v
      FROM f
    )
    SELECT o_orderkey,
      CAST(face AS BIGINT) * 16384
        + greatest(0, least(127, CAST(floor((v + 1.0) * 64.0) AS BIGINT))) * 128
        + greatest(0, least(127, CAST(floor((u + 1.0) * 64.0) AS BIGINT))) AS pixel_id
    FROM uv
    """


def pixelization_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quad-sphere pixel index (functions/pixelize.py) computed for every
    derived point — the write-time spatial key that makes region queries
    partition-prunable. The oracle re-implements the formula independently in
    SQL, checking determinism of the index."""
    pts = _xyz_cols(_derived_points(spark, sf_dir))
    return pts.select(
        "o_orderkey",
        pixel_expr(F.col("x"), F.col("y"), F.col("z"), 7).alias("pixel_id"),
    )


@query(
    "pixel_range_scan",
    oracle=f"""
    WITH derived AS ({_DERIVED_SQL}),
    xyz AS ({_XYZ_SQL})
    SELECT o_orderkey
    FROM xyz
    WHERE x * {_CX!r} + y * {_CY!r} + z * {_CZ!r} > {_COS_T}
    """,
    survey="S5,J5 (coarse-to-fine: ranges + exact refine) + J1,P1,P3,F1,F2 (cone cross-match)",
)
def pixel_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-to-fine region read (``_executors.py:182-189``): pixel-range
    predicate (the superset envelope from the planner) followed by the exact
    cone refine — results must equal the pure exact cone filter (the oracle,
    which is precisely the cone cross-match of ``DIA.py:72-77``; the former
    separate ``cone_crossmatch`` query produced this identical result, so
    this one entry verifies both operators)."""
    from ..functions.pixelize import cone_envelope_ranges, filter_by_ranges

    pts = _xyz_cols(_derived_points(spark, sf_dir))
    ranges = cone_envelope_ranges(_CRA, _CDEC, _CRAD, level=7)
    coarse = filter_by_ranges(
        pts.withColumn("pix", pixel_expr(F.col("x"), F.col("y"), F.col("z"), 7)),
        F.col("pix"),
        ranges,
    )
    exact = (
        F.col("x") * float(_CX) + F.col("y") * float(_CY) + F.col("z") * float(_CZ)
    ) > float(_COS_T)
    return coarse.filter(exact).select("o_orderkey")

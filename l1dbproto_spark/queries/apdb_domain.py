"""APDB-domain query shapes expressed over the driver's relational tables so
the DuckDB oracle can check them. The full APDB layer (l1dbproto_spark/apdb.py)
is exercised end-to-end by tests/test_apdb.py on generated Dia* data; these
queries pin the *semantics* of its building blocks on oracle-checkable data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.pixelize import pixel_expr
from ..sources.catalog import load_table
from . import query

_D2R = repr(math.pi / 180.0)


@query(
    "pixel_histogram",
    oracle=f"""
    WITH derived AS (
      SELECT o_orderkey,
        CAST(o_orderkey % 3600 AS DOUBLE) / 10.0 AS ra,
        CAST(o_custkey % 1800 AS DOUBLE) / 10.0 - 90.0 AS dec
      FROM orders
    ),
    xyz AS (
      SELECT o_orderkey,
        cos(dec * {_D2R}) * cos(ra * {_D2R}) AS x,
        cos(dec * {_D2R}) * sin(ra * {_D2R}) AS y,
        sin(dec * {_D2R}) AS z
      FROM derived
    ),
    p AS (
      SELECT o_orderkey, abs(x) AS ax, abs(y) AS ay, abs(z) AS az, x, y, z,
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
    pix AS (
      SELECT o_orderkey,
        CAST(face AS BIGINT) * 16384
          + greatest(0, least(127, CAST(floor(((CASE WHEN face IN (4,5) THEN y ELSE z END) / d + 1.0) * 64.0) AS BIGINT))) * 128
          + greatest(0, least(127, CAST(floor(((CASE WHEN face IN (0,2) THEN y ELSE x END) / d + 1.0) * 64.0) AS BIGINT))) AS pixel_id
      FROM f
    )
    SELECT pixel_id >> 8 AS pixel_bucket,
           COUNT(*) AS n_points,
           COUNT(DISTINCT pixel_id) AS n_pixels
    FROM pix
    GROUP BY 1
    """,
    survey="A8 (part_sim histogram: points per partition, pixels per bucket)",
)
def pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partitioning study's distribution stats (``part_sim.py:88-140``):
    rows per spatial bucket and distinct pixels per bucket — the skew check
    that sizes pixel_bucket partitioning at 100 TB."""
    d2r = F.lit(float(_D2R))
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        "o_orderkey",
        ((F.col("o_orderkey") % 3600).cast("double") / 10.0).alias("ra"),
        ((F.col("o_custkey") % 1800).cast("double") / 10.0 - 90.0).alias("dec"),
    )
    ra_r, dec_r = F.col("ra") * d2r, F.col("dec") * d2r
    pts = pts.withColumns(
        {
            "x": F.cos(dec_r) * F.cos(ra_r),
            "y": F.cos(dec_r) * F.sin(ra_r),
            "z": F.sin(dec_r),
        }
    )
    pix = pts.select(
        "o_orderkey", pixel_expr(F.col("x"), F.col("y"), F.col("z"), 7).alias("pixel_id")
    )
    return (
        pix.groupBy(F.shiftright(F.col("pixel_id"), 8).alias("pixel_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.countDistinct("pixel_id").alias("n_pixels"),
        )
    )


# Rotated out of the 50-cap registry in driver round 8 (slot to hamming_topk); the
# SAME DuckDB oracle runs in-suite in tests/test_unregistered_batteries.py.
# U1 stays driver-covered through the workload union inside ap_visit.
def catalog_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog union with dedup — the variables+transients concatenation
    (``DIA.py:85-86``) generalized to a distinct union."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    a = orders.filter(F.col("o_totalprice") > 350000).select(*cols)
    b = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp")
    ).select(*cols)
    return a.unionByName(b).distinct()

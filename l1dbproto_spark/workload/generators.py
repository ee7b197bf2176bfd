"""Random point generators on the sphere, as DataFrame builders.

Re-expresses ``generators.py:33-91`` of the reference (numpy gaussian triples
normalized to the unit sphere; cone sampling via uniform z + rotation) as
seeded Spark expressions — deterministic given (n, seed), fully distributed
(``spark.range`` partitions the id space; no driver-side arrays).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import apply_rotation, rotation_matrix, xyz_to_dec, xyz_to_ra


def rand_sphere_xyz(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    hemisphere: Optional[str] = None,
    id_col: str = "source_idx",
) -> DataFrame:
    """n uniform random unit vectors (``generators.py:33-58``): three
    independent gaussians normalized; optional hemisphere constraint via
    |z| (reference uses southern pointings, ``ap_proto.py:306``)."""
    df = spark.range(n).withColumnRenamed("id", id_col)
    gx, gy, gz = F.randn(seed), F.randn(seed + 1), F.randn(seed + 2)
    norm = F.sqrt(gx * gx + gy * gy + gz * gz)
    x, y, z = gx / norm, gy / norm, gz / norm
    if hemisphere == "south":
        z = -F.abs(z)
    elif hemisphere == "north":
        z = F.abs(z)
    return df.select(
        F.col(id_col),
        x.alias("x"),
        y.alias("y"),
        z.alias("z"),
    )


def rand_cone_xyz(
    spark: SparkSession,
    n: int,
    center_ra: float,
    center_dec: float,
    radius_deg: float,
    seed: int = 42,
    id_col: str = "source_idx",
) -> DataFrame:
    """n uniform random points inside a cone (``generators.py:61-91``):
    z ~ U[cos r, 1], phi ~ U[0, 2pi) around +z, then a plan-constant
    Rodrigues rotation (``geom.py:37-56``) takes +z to the cone axis."""
    cos_r = math.cos(math.radians(radius_deg))
    df = spark.range(n).withColumnRenamed("id", id_col)
    z = F.lit(cos_r) + F.rand(seed) * F.lit(1.0 - cos_r)
    phi = F.rand(seed + 1) * F.lit(2.0 * math.pi)
    s = F.sqrt(F.lit(1.0) - z * z)
    x, y = s * F.cos(phi), s * F.sin(phi)
    from ..functions.geo import unit_vector

    m = rotation_matrix((0.0, 0.0, 1.0), unit_vector(center_ra, center_dec))
    rx, ry, rz = apply_rotation(m, x, y, z)
    return df.select(F.col(id_col), rx.alias("x"), ry.alias("y"), rz.alias("z"))


def with_radec(df: DataFrame) -> DataFrame:
    """Attach (ra, dec) degree columns to an xyz DataFrame — the reference's
    per-row ``polar`` pandas apply (``_executors.py:297-311``) as column math."""
    return df.withColumns(
        {
            "ra": xyz_to_ra(F.col("x"), F.col("y")),
            "dec": xyz_to_dec(F.col("z")),
        }
    )

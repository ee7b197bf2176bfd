"""Spherical-geometry column expressions.

Re-expresses the reference's per-row pandas/sphgeom geometry as native Spark
column math (no UDFs — everything stays in whole-stage codegen):

* xyz -> (ra, dec): reference ``_executors.py:297-300,402-405`` does
  ``SpherePoint(Vector3d).getRa().asDegrees()`` per row via pandas apply.
* (ra, dec) -> xyz: reference ``_executors.py:257-260``.
* region containment (cone): reference ``DIA.py:72-77`` —
  ``inner(pointing, v) > cos(theta)`` — and ``_executors.py:166-170``
  (mask outsiders), ``:185-189`` (coarse-to-fine refine).
* rotation matrices: reference ``geom.py:37-56`` (Rodrigues formula) — the
  matrix is computed driver-side (plan constant) and applied as column math.

Angles are degrees throughout, matching the reference contract
(``README.md:63-66``).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def radec_to_xyz(ra: Column, dec: Column) -> tuple[Column, Column, Column]:
    """(ra, dec) degrees -> unit vector (x, y, z)."""
    ra_r, dec_r = F.radians(ra), F.radians(dec)
    cos_dec = F.cos(dec_r)
    return (cos_dec * F.cos(ra_r), cos_dec * F.sin(ra_r), F.sin(dec_r))


def xyz_to_ra(x: Column, y: Column) -> Column:
    """xyz -> ra degrees in [0, 360)."""
    ra = F.degrees(F.atan2(y, x))
    return F.when(ra < 0, ra + 360.0).otherwise(ra)


def xyz_to_dec(z: Column) -> Column:
    """unit-vector z -> dec degrees in [-90, 90]."""
    # clamp for numeric safety at the poles
    return F.degrees(F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), z))))


def dot3(ax: Column, ay: Column, az: Column, b: Sequence[float]) -> Column:
    """Dot product of a column vector with a plan-time constant vector."""
    return ax * float(b[0]) + ay * float(b[1]) + az * float(b[2])


def cone_contains_xyz(
    x: Column, y: Column, z: Column, center: Sequence[float], radius_deg: float
) -> Column:
    """True when the unit vector lies inside the cone — the reference's
    cross-match predicate (``DIA.py:72-77``): dot(center, v) > cos(radius)."""
    return dot3(x, y, z, center) > math.cos(math.radians(radius_deg))


def cone_contains_radec(
    ra: Column, dec: Column, center_ra: float, center_dec: float, radius_deg: float
) -> Column:
    """Cone containment directly on (ra, dec) degree columns — the exact
    refine filter applied after the coarse pixel-range scan
    (``_executors.py:185-189``)."""
    x, y, z = radec_to_xyz(ra, dec)
    cx, cy, cz = unit_vector(center_ra, center_dec)
    return cone_contains_xyz(x, y, z, (cx, cy, cz), radius_deg)


def unit_vector(ra_deg: float, dec_deg: float) -> tuple[float, float, float]:
    """Driver-side (ra, dec) -> unit vector (plan constant)."""
    ra, dec = math.radians(ra_deg), math.radians(dec_deg)
    return (
        math.cos(dec) * math.cos(ra),
        math.cos(dec) * math.sin(ra),
        math.sin(dec),
    )


def rotation_matrix(a: Sequence[float], b: Sequence[float]) -> list[list[float]]:
    """Rodrigues rotation taking unit vector a to unit vector b — computed
    driver-side like the reference (``geom.py:37-56``), then applied to
    columns with :func:`apply_rotation`."""
    ax, ay, az = a
    bx, by, bz = b
    # v = a x b, c = a . b
    vx, vy, vz = ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx
    c = ax * bx + ay * by + az * bz
    s2 = vx * vx + vy * vy + vz * vz
    if s2 < 1e-30:
        if c > 0:
            return [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        # 180-degree rotation about any axis orthogonal to a
        return [[-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]]
    k = (1.0 - c) / s2
    return [
        [c + vx * vx * k, vx * vy * k - vz, vx * vz * k + vy],
        [vy * vx * k + vz, c + vy * vy * k, vy * vz * k - vx],
        [vz * vx * k - vy, vz * vy * k + vx, c + vz * vz * k],
    ]


def apply_rotation(
    m: Sequence[Sequence[float]], x: Column, y: Column, z: Column
) -> tuple[Column, Column, Column]:
    """Apply a plan-constant 3x3 rotation to column vectors."""
    return (
        dot3(x, y, z, m[0]),
        dot3(x, y, z, m[1]),
        dot3(x, y, z, m[2]),
    )


def angular_separation_deg(
    ra1: Column, dec1: Column, ra2: Column, dec2: Column
) -> Column:
    """Great-circle separation in degrees (haversine — numerically stable
    for small angles, unlike acos(dot))."""
    r1, d1, r2, d2 = F.radians(ra1), F.radians(dec1), F.radians(ra2), F.radians(dec2)
    sin_dd = F.sin((d2 - d1) / 2)
    sin_dr = F.sin((r2 - r1) / 2)
    h = sin_dd * sin_dd + F.cos(d1) * F.cos(d2) * sin_dr * sin_dr
    return F.degrees(2 * F.asin(F.sqrt(F.least(F.lit(1.0), h))))

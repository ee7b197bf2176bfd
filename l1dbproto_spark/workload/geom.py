"""Field-of-view tilings — the reference's ``geom.py:59-222`` re-expressed.

The reference builds explicit ConvexPolygon tiles (square grid on the tangent
plane, or the LSST camera footprint: 5x5 rafts minus corners, ``21*ndiv^2``
tiles) and fans work out per tile via fork/MPI. In Spark the tiles become a
*partition key*: a gnomonic (tangent-plane) projection around the pointing
gives each row a tile id by pure column math, and the engine repartitions on
it — the spatial join J4 without polygons.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def tangent_plane_xy(
    ra: Column, dec: Column, center_ra: float, center_dec: float
) -> tuple[Column, Column]:
    """Gnomonic projection onto the plane tangent at the pointing center.
    Returns (xi, eta) in radians (standard coordinates)."""
    ra_r, dec_r = F.radians(ra), F.radians(dec)
    ra0, dec0 = math.radians(center_ra), math.radians(center_dec)
    cos_c = (
        F.sin(dec_r) * math.sin(dec0)
        + F.cos(dec_r) * math.cos(dec0) * F.cos(ra_r - F.lit(ra0))
    )
    xi = F.cos(dec_r) * F.sin(ra_r - F.lit(ra0)) / cos_c
    eta = (
        F.sin(dec_r) * math.cos(dec0)
        - F.cos(dec_r) * math.sin(dec0) * F.cos(ra_r - F.lit(ra0))
    ) / cos_c
    return xi, eta


def square_tile_expr(
    ra: Column,
    dec: Column,
    center_ra: float,
    center_dec: float,
    fov_deg: float,
    ndiv: int,
) -> Column:
    """Square ndiv x ndiv tiling of the FOV (``geom.py:59-143``): tile id in
    [0, ndiv^2) or -1 outside the FOV square."""
    xi, eta = tangent_plane_xy(ra, dec, center_ra, center_dec)
    half = math.tan(math.radians(fov_deg / 2.0))
    ix = F.floor((xi + half) / (2 * half) * ndiv).cast("int")
    iy = F.floor((eta + half) / (2 * half) * ndiv).cast("int")
    inside = (ix >= 0) & (ix < ndiv) & (iy >= 0) & (iy < ndiv)
    return F.when(inside, iy * ndiv + ix).otherwise(F.lit(-1))


_RAFT_GRID = 5  # 5x5 rafts, 4 corners cut -> 21 rafts (geom.py:146-202)


def camera_tile_expr(
    ra: Column,
    dec: Column,
    center_ra: float,
    center_dec: float,
    fov_deg: float,
    ndiv: int,
) -> Column:
    """LSST-camera-footprint tiling (``geom.py:146-202``): 5x5 raft grid with
    the 4 corner rafts excluded, each raft split ndiv x ndiv ->
    ``21*ndiv^2`` tiles (count verified by the reference's own test,
    ``tests/test_geom.py:79-90``). Returns tile id or -1 outside."""
    xi, eta = tangent_plane_xy(ra, dec, center_ra, center_dec)
    half = math.tan(math.radians(fov_deg / 2.0))
    n = _RAFT_GRID * ndiv
    ix = F.floor((xi + half) / (2 * half) * n).cast("int")
    iy = F.floor((eta + half) / (2 * half) * n).cast("int")
    raft_x, raft_y = (ix / ndiv).cast("int"), (iy / ndiv).cast("int")
    corner = (
        ((raft_x == 0) | (raft_x == _RAFT_GRID - 1))
        & ((raft_y == 0) | (raft_y == _RAFT_GRID - 1))
    )
    inside = (ix >= 0) & (ix < n) & (iy >= 0) & (iy < n) & ~corner
    return F.when(inside, iy * n + ix).otherwise(F.lit(-1))


def n_camera_tiles(ndiv: int) -> int:
    """21 * ndiv^2 (``geom.py:159-160``; ``tests/test_geom.py:83-84``)."""
    return (_RAFT_GRID * _RAFT_GRID - 4) * ndiv * ndiv


def spherical_triangle_area(a, b, c) -> float:
    """Spherical excess of the triangle with unit-vector corners a, b, c
    (reference ``geom.py:225-248``) — driver-side plan constant (F4).
    Uses the numerically stable L'Huilier-free dihedral form."""
    import numpy as np

    a, b, c = (np.asarray(v, dtype=float) for v in (a, b, c))

    def angle(u, v, w):
        # dihedral angle at u between great circles u-v and u-w
        n1 = np.cross(u, v)
        n2 = np.cross(u, w)
        cosang = np.dot(n1, n2) / (np.linalg.norm(n1) * np.linalg.norm(n2))
        return math.acos(max(-1.0, min(1.0, cosang)))

    return angle(a, b, c) + angle(b, c, a) + angle(c, a, b) - math.pi


def spherical_polygon_area(vertices) -> float:
    """Area (steradians) of a convex spherical polygon by fan triangulation
    from the first vertex (reference ``geom.py:251-267``)."""
    total = 0.0
    for i in range(1, len(vertices) - 1):
        total += spherical_triangle_area(
            vertices[0], vertices[i], vertices[i + 1]
        )
    return total


def make_tile_expr(
    ra: Column,
    dec: Column,
    center_ra: float,
    center_dec: float,
    fov_deg: float,
    ndiv: int,
) -> Column:
    """Tiling dispatch (``geom.py:205-222``): ndiv>0 square grid, ndiv<0
    camera footprint with \\|ndiv\\| subdivisions."""
    if ndiv >= 0:
        return square_tile_expr(ra, dec, center_ra, center_dec, fov_deg, ndiv)
    return camera_tile_expr(ra, dec, center_ra, center_dec, fov_deg, -ndiv)

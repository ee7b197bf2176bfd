"""Quad-sphere pixelization: the spatial index underlying partition pruning.

The reference delegates pixelization to sphgeom (HTM/Q3C/MQ3C) and studies
partition pruning with it (``part_sim.py:63-66,75-87,103-116``; API contract
``README.md:118-123``: region -> envelope -> ``[low, high)`` pixel-ID ranges).
This module is a from-scratch MQ3C-style quad-cube scheme with two twin
implementations that must agree bit-for-bit:

* :func:`pixel_expr` — pure Spark column arithmetic (codegen'd, no UDF) used
  to compute ``pixelId`` at write time and in refine filters;
* :func:`pixel_np` — the numpy twin used driver-side by the envelope planner
  (:func:`cone_envelope_ranges`) to turn a region into pixel ranges at plan
  time.

Scheme: cube face (0..5: +x,+y,-x,-y,+z,-z) selected by dominant axis; the
two off-axis coordinates divided by the dominant magnitude give (u, v) in
[-1, 1]; at level L each face is a 2^L x 2^L grid, row-major:
``pixel = face * 4^L + iv * 2^L + iu``.

The planner returns a *superset* envelope (cells are kept when their center
lies within radius + padded cell circumradius) — the coarse-to-fine contract
(``_executors.py:182-189``): scan by ranges, then refine with the exact
predicate. At 100 TB the ranges prune both parquet row groups (min/max stats
on pixelId) and hive partitions (pixel_bucket = pixelId >> shift).
"""

from __future__ import annotations

import math
from functools import reduce

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_LEVEL = 7  # 6 * 4^7 = 98,304 pixels; ~0.7 deg cells at the equator


def pixel_expr(x: Column, y: Column, z: Column, level: int = DEFAULT_LEVEL) -> Column:
    """pixelId as a native column expression from unit-vector columns."""
    n = 1 << level
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face = (
        F.when((az >= ax) & (az >= ay), F.when(z >= 0, F.lit(4)).otherwise(F.lit(5)))
        .when(ay >= ax, F.when(y >= 0, F.lit(1)).otherwise(F.lit(3)))
        .otherwise(F.when(x >= 0, F.lit(0)).otherwise(F.lit(2)))
    )
    d = F.greatest(ax, ay, az)
    u = F.when(face.isin(0, 2), y).otherwise(x) / d
    v = F.when(face.isin(4, 5), y).otherwise(z) / d
    iu = F.greatest(
        F.lit(0), F.least(F.lit(n - 1), F.floor((u + 1.0) * (n / 2.0)).cast("long"))
    )
    iv = F.greatest(
        F.lit(0), F.least(F.lit(n - 1), F.floor((v + 1.0) * (n / 2.0)).cast("long"))
    )
    return (face.cast("long") * (n * n) + iv * n + iu).alias("pixelId")


def pixel_expr_radec(ra: Column, dec: Column, level: int = DEFAULT_LEVEL) -> Column:
    from .geo import radec_to_xyz

    x, y, z = radec_to_xyz(ra, dec)
    return pixel_expr(x, y, z, level)


def pixel_np(xyz: np.ndarray, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """Numpy twin of :func:`pixel_expr` — identical arithmetic, identical
    comparison order, so the two agree bit-for-bit on every input."""
    n = 1 << level
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (az >= ax) & (az >= ay),
        np.where(z >= 0, 4, 5),
        np.where(ay >= ax, np.where(y >= 0, 1, 3), np.where(x >= 0, 0, 2)),
    )
    d = np.maximum(np.maximum(ax, ay), az)
    u = np.where(np.isin(face, (0, 2)), y, x) / d
    v = np.where(np.isin(face, (4, 5)), y, z) / d
    iu = np.clip(np.floor((u + 1.0) * (n / 2.0)).astype(np.int64), 0, n - 1)
    iv = np.clip(np.floor((v + 1.0) * (n / 2.0)).astype(np.int64), 0, n - 1)
    return face.astype(np.int64) * (n * n) + iv * n + iu


def _cell_centers_and_radii(level: int) -> tuple[np.ndarray, np.ndarray]:
    """Unit-vector centers and padded circumradii (radians) of every cell."""
    n = 1 << level
    idx = np.arange(n * n)
    iu, iv = idx % n, idx // n
    # face-plane coordinates of centers and corners
    uc = (iu + 0.5) * 2.0 / n - 1.0
    vc = (iv + 0.5) * 2.0 / n - 1.0

    def to_xyz(face: int, u: np.ndarray, v: np.ndarray) -> np.ndarray:
        one = np.ones_like(u)
        if face == 0:
            vec = np.stack([one, u, v], 1)
        elif face == 2:
            vec = np.stack([-one, u, v], 1)
        elif face == 1:
            vec = np.stack([u, one, v], 1)
        elif face == 3:
            vec = np.stack([u, -one, v], 1)
        elif face == 4:
            vec = np.stack([u, v, one], 1)
        else:
            vec = np.stack([u, v, -one], 1)
        return vec / np.linalg.norm(vec, axis=1, keepdims=True)

    centers, radii = [], []
    half = 1.0 / n
    corner_offsets = [(-half, -half), (-half, half), (half, -half), (half, half)]
    for face in range(6):
        c = to_xyz(face, uc, vc)
        max_cos = np.ones(len(c))
        for du, dv in corner_offsets:
            corner = to_xyz(face, uc + du, vc + dv)
            max_cos = np.minimum(max_cos, np.sum(c * corner, axis=1))
        r = np.arccos(np.clip(max_cos, -1.0, 1.0)) * 1.05 + 1e-9  # pad 5%
        centers.append(c)
        radii.append(r)
    return np.concatenate(centers), np.concatenate(radii)


_CELL_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def cone_envelope_ranges(
    center_ra: float,
    center_dec: float,
    radius_deg: float,
    level: int = DEFAULT_LEVEL,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Region -> sorted, merged ``[low, high)`` pixel-ID ranges (superset).

    Driver-side planning step, the analog of the reference's
    ``pixelization.envelope(region)`` (``part_sim.py:103-116``). The range
    list is capped at ``max_ranges`` by merging the smallest gaps — the same
    trade the reference measures as ``num_queries`` vs ``num_sp_part``
    (``metrics.md:43-44``): fewer ranges = fewer scans but more superset rows.
    """
    if level not in _CELL_CACHE:
        _CELL_CACHE[level] = _cell_centers_and_radii(level)
    centers, radii = _CELL_CACHE[level]
    from .geo import unit_vector

    c = np.array(unit_vector(center_ra, center_dec))
    ang = np.arccos(np.clip(centers @ c, -1.0, 1.0))
    hit = np.flatnonzero(ang <= math.radians(radius_deg) + radii)
    if len(hit) == 0:
        return []
    # merge consecutive ids into ranges
    breaks = np.flatnonzero(np.diff(hit) > 1)
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [len(hit) - 1]])
    ranges = [(int(hit[s]), int(hit[e]) + 1) for s, e in zip(starts, ends)]
    # cap the number of ranges by merging the smallest inter-range gaps
    while len(ranges) > max_ranges:
        gaps = [
            (ranges[i + 1][0] - ranges[i][1], i) for i in range(len(ranges) - 1)
        ]
        _, i = min(gaps)
        ranges[i] = (ranges[i][0], ranges[i + 1][1])
        del ranges[i + 1]
    return ranges


def ranges_predicate(col: Column, ranges: list[tuple[int, int]]) -> Column:
    """OR-of-BETWEEN predicate over ``[low, high)`` ranges — pushed down to
    parquet min/max skipping (SURVEY.md J5).

    Use only with modest range counts on *stored* columns: predicate pushdown
    substitutes the column expression into every term, so a computed column
    under many ranges explodes codegen — use :func:`filter_by_ranges` there.
    """
    if not ranges:
        return F.lit(False)
    preds = [(col >= lo) & (col < hi) for lo, hi in ranges]
    return reduce(lambda a, b: a | b, preds)


def filter_by_ranges(df, col: Column, ranges: list[tuple[int, int]], max_or_terms: int = 16):
    """Keep rows whose ``col`` falls in any ``[low, high)`` range.

    Small lists compile to the OR-chain (pushdown-friendly: reaches parquet
    row-group skipping). Large lists become a broadcast range semi-join —
    O(rows x ranges) comparisons without inlining the column expression per
    term (whole-stage codegen stays within janino method limits)."""
    if not ranges:
        return df.filter(F.lit(False))
    if len(ranges) <= max_or_terms:
        return df.filter(ranges_predicate(col, ranges))
    spark = df.sparkSession
    rdf = spark.createDataFrame(ranges, "r_lo long, r_hi long")
    return df.join(
        F.broadcast(rdf), (col >= F.col("r_lo")) & (col < F.col("r_hi")), "left_semi"
    )

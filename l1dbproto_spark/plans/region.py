"""Plan-time spherical regions.

The reference passes sphgeom ``Circle``/``ConvexPolygon`` regions through its
API (``ap_proto.py:313``, ``geom.py:59-143``); in this engine a region is a
plan-time object that compiles to (a) pixel-range predicates for the coarse
scan and (b) an exact containment column expression for the refine filter —
the coarse-to-fine contract of ``_executors.py:182-189``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column

from ..functions.geo import cone_contains_radec, unit_vector
from ..functions.pixelize import DEFAULT_LEVEL, cone_envelope_ranges


@dataclass(frozen=True)
class Circle:
    """Spherical cap: center (ra, dec) degrees + opening radius degrees."""

    ra: float
    dec: float
    radius_deg: float

    def dilated(self, margin_arcsec: float) -> "Circle":
        """Region padding (reference ``geom.py:270-303`` ``dilatedBy``; used
        with the 52-arcsec detector padding, ``config.py:37``)."""
        return Circle(self.ra, self.dec, self.radius_deg + margin_arcsec / 3600.0)

    def center_xyz(self) -> tuple[float, float, float]:
        return unit_vector(self.ra, self.dec)

    def contains_expr(self, ra: Column, dec: Column) -> Column:
        """Exact containment predicate (native trig, no UDF)."""
        return cone_contains_radec(ra, dec, self.ra, self.dec, self.radius_deg)

    def pixel_ranges(
        self, level: int = DEFAULT_LEVEL, max_ranges: int = 64
    ) -> list[tuple[int, int]]:
        """Superset envelope as merged [low, high) pixel-ID ranges."""
        return cone_envelope_ranges(
            self.ra, self.dec, self.radius_deg, level, max_ranges
        )

    def area_sq_deg(self) -> float:
        """Cap area (for densities, cf. ``gen_sources.py:81-83``)."""
        r = math.radians(self.radius_deg)
        return math.degrees(1.0) ** 2 * 2.0 * math.pi * (1.0 - math.cos(r))

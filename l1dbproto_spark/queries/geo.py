"""Spherical-geometry queries (cone cross-match, pixelization) on coordinates
derived deterministically from the test tables.

Filled incrementally; see functions/geo.py and plans/region.py."""

from __future__ import annotations

"""Deduplication operators over documents (training-data pipeline extension):
exact hash dedup, n-gram Jaccard near-dup, MinHash signatures, SimHash.

Filled incrementally; see operators/dedup.py for the reusable builders."""

from __future__ import annotations

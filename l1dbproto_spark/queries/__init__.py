"""Registered query surface — the operator coverage checked against DuckDB.

Each query is one operator (or operator composition) from SURVEY.md §2,
re-expressed as a Spark DataFrame plan, paired with an ANSI-SQL oracle that
DuckDB runs on the same parquet tables. The driver compares row count, schema,
and an order-insensitive value hash (CORRECTNESS_r{N}.json).

Determinism contract between Spark and DuckDB (both IEEE-754 engines, but
float aggregation is order-dependent):
  * money/quantity sums are aggregated as exact DECIMALs, cast to double only
    after the exact sum — bit-identical regardless of partition/accumulation
    order;
  * averages are computed as exact-decimal-sum / count in double — one
    deterministic division;
  * inherently-float math (trig, cosine similarity) is evaluated in the same
    operand order on both sides and rounded to a tolerance-safe number of
    decimals.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None -> rows-only check
    survey: str  # SURVEY.md §2 operator ids this query covers
    headline: bool = False  # include in bench.py


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str] = None, survey: str = "", headline: bool = False):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name, fn, oracle, survey, headline)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return registry."""
    from . import (  # noqa: F401
        relational,
        relational2,
        windows,
        windows2,
        events,
        text,
        dedup,
        similarity,
        geo,
        apdb_domain,
        multimodal,
        synthesis,
        misc,
    )

    return QUERIES

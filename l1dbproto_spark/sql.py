"""Plain-SQL surface: register the catalog as temp views and run SQL.

The engine is DataFrame-first, but the same tables and queries are reachable
through ``spark.sql`` — users who live in SQL get the identical Catalyst
plans (predicate pushdown, broadcast selection, AQE) because DataFrame and
SQL compile to the same logical algebra. ``register_views`` exposes every
catalog table (through `sources/catalog.load_table`, so the events
nanosecond-timestamp handling is identical); `tests/test_sql_surface.py`
proves a portable subset of the registry's ANSI oracles returns
bit-identical results through this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.catalog import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Create (or replace) one temp view per catalog table; returns the view
    names. ``prefix`` namespaces the views when two scale factors coexist."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register views for ``sf_dir`` and run one SQL statement against them."""
    register_views(spark, sf_dir)
    return spark.sql(query)

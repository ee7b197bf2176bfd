"""Typed column synthesis — the reference's random schema fill (F15,
``_executors.py:432-503``: every felis type filled with random values) and
seeded generators (F16-F18).

Two forms:
* deterministic fill — values derived from the portable hash of the row key,
  one expression per felis type; oracle-checkable bit-for-bit;
* random fill — Spark-native rand/randn with a fixed seed; deterministic
  within Spark but engine-specific, so a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..sources.catalog import load_table
from . import query

_HASH_SQL = "CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)"


@query(
    "deterministic_schema_fill",
    oracle=f"""
    WITH h AS (SELECT o_orderkey, {_HASH_SQL} AS hv FROM orders)
    SELECT
      o_orderkey,
      CAST(hv AS DOUBLE) / 1152921504606846976.0 AS f64,
      CAST(hv % 1000 AS INTEGER) AS i32,
      CAST(hv % 2 = 0 AS BOOLEAN) AS flag,
      substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS s8,
      make_timestamp(hv % 31536000000000) AS ts
    FROM h
    """,
    survey="F15 (typed schema fill, deterministic variant)",
)
def deterministic_schema_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One expression per felis primitive, derived from the row-key hash —
    the reproducible form of the reference's per-type random fill
    (``_executors.py:466-496``)."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey").cast("string")
    hv = portable_hash64(key)
    return orders.select(
        "o_orderkey",
        (hv.cast("double") / F.lit(float(1 << 60))).alias("f64"),
        (hv % 1000).cast("int").alias("i32"),
        ((hv % 2) == 0).alias("flag"),
        F.substring(F.md5(key), 1, 8).alias("s8"),
        F.timestamp_micros(hv % F.lit(31536000000000)).alias("ts"),
    )


@query(
    "random_schema_fill",
    oracle=None,  # engine-specific RNG; rows-only check
    survey="F15,F16-F18 (random fill + seeded sampling)",
)
def random_schema_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's literal behavior: seeded random values per felis type
    (uniform double, gaussian, bounded int, bernoulli flag) + a Bernoulli
    row sample (F18, ``DIA.py:78-80``). Deterministic per Spark seed."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.rand(42).alias("u"),
            F.randn(43).alias("g"),
            (F.rand(44) * 1000).cast("int").alias("i32"),
            (F.rand(45) < 0.5).alias("flag"),
        )
        .filter(F.rand(46) < 0.9)
    )

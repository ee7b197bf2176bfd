"""Typed column synthesis — the reference's random schema fill (F15,
``_executors.py:432-503``: every felis type filled with random values) and
seeded sampling (F18).

One registered query: all "random" values are counter-based — derived from the
portable md5 hash of the row key (a hash-based RNG, the distributed-systems
form of seeded randomness: reproducible, order-independent, partition-count-
independent — unlike Spark's rand(seed), whose stream depends on partition
layout and differs per engine). Every column and the Bernoulli row sample are
therefore bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..sources.catalog import load_table
from . import query

_HASH_SQL = "CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)"
# independent second stream for the Bernoulli sample (salted key)
_HASH2_SQL = (
    "CAST(concat('0x', substr(md5(concat('sample:', CAST(o_orderkey AS VARCHAR))), 1, 15))"
    " AS BIGINT)"
)


@query(
    "schema_fill",
    oracle=f"""
    WITH h AS (
      SELECT o_orderkey, {_HASH_SQL} AS hv, {_HASH2_SQL} AS hs
      FROM orders
    )
    SELECT
      o_orderkey,
      CAST(hv AS DOUBLE) / 1152921504606846976.0 AS f64,
      CAST(hv % 1000 AS INTEGER) AS i32,
      CAST(hv % 2 = 0 AS BOOLEAN) AS flag,
      substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS s8,
      make_timestamp(hv % 31536000000000) AS ts
    FROM h
    WHERE hs % 10 < 9
    """,
    survey="F15 (typed schema fill, hash-RNG) + F18 (seeded Bernoulli sampling)",
)
def schema_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One expression per felis primitive (uniform double, bounded int,
    boolean, string, timestamp) derived from the row-key hash — the
    reproducible form of the reference's per-type random fill
    (``_executors.py:466-496``) — plus a 90% Bernoulli row sample drawn from
    an independent salted hash stream (``DIA.py:78-80``)."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey").cast("string")
    hv = portable_hash64(key)
    hs = portable_hash64(F.concat(F.lit("sample:"), key))
    return (
        orders.select(
            "o_orderkey",
            (hv.cast("double") / F.lit(float(1 << 60))).alias("f64"),
            (hv % 1000).cast("int").alias("i32"),
            ((hv % 2) == 0).alias("flag"),
            F.substring(F.md5(key), 1, 8).alias("s8"),
            F.timestamp_micros(hv % F.lit(31536000000000)).alias("ts"),
            (hs % 10).alias("_samp"),
        )
        .filter(F.col("_samp") < 9)
        .drop("_samp")
    )

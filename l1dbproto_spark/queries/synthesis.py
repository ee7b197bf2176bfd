"""Typed column synthesis — the reference's random schema fill (F15,
``_executors.py:432-503``: every felis type filled with random values) and
seeded sampling (F18).

All "random" values are counter-based — derived from the portable md5 hash
of the row key (a hash-based RNG, the distributed-systems form of seeded
randomness: reproducible, order-independent, partition-count-independent —
unlike Spark's rand(seed), whose stream depends on partition layout and
differs per engine). Every column and the Bernoulli row sample are
therefore bit-reproducible in the DuckDB oracle
(tests/test_unregistered_batteries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..sources.catalog import load_table


def schema_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One expression per felis primitive (uniform double, bounded int,
    boolean, string, timestamp) derived from the row-key hash — the
    reproducible form of the reference's per-type random fill
    (``_executors.py:466-496``) — plus a 90% Bernoulli row sample drawn from
    an independent salted hash stream (``DIA.py:78-80``).

    Unregistered in round 4 (50-slot registry cap): its slot went to
    ``sample_mixture``, which pins the same hash-RNG determinism contract
    (F15/F18) under a driver oracle. Kept as API surface under the same
    DuckDB oracle in tests/test_unregistered_batteries.py."""
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

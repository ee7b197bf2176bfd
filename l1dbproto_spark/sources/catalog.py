"""Parquet catalog access for the driver-provided test tables.

Spark-first analog of the reference's sources (SURVEY.md §2.1): the reference
loads a numpy ``.npy`` catalog (``ap_proto.py:279-281``) and reads DB tables via
an API layer; here every table is a partition-prunable parquet scan and Catalyst
handles column pruning / predicate pushdown automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
        # vectorized reader rejects — read nanos as raw long, truncate to
        # micros like DuckDB does) and as naive TIMESTAMP(MICROS) (which
        # Spark reads as TIMESTAMP_NTZ — a type watermarks/windows reject).
        # Normalize both to TIMESTAMP: under the engine's UTC sessions the
        # NTZ cast is a numeric identity, so oracle comparisons agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        t = df.schema["ts"].dataType
        if isinstance(t, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(t, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""SparkSession construction tuned for this engine.

Local mode is the test bed (one JVM, N threads); the configuration is chosen so
the same code scales to a multi-executor cluster: shuffle partition counts come
from the environment, AQE handles runtime re-planning and skew, Arrow is on for
every pandas exchange, and the session timezone is pinned to UTC so timestamp
semantics match the DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "l1dbproto_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster the caller would supply master/deploy config externally
    (spark-submit); everything set here is master-agnostic except the default
    ``local[N]``.
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # engine-written parquet (visit stores, rollup state, bucketed
        # copies) compresses zstd: ~8% faster visit tail locally (3/3
        # interleaved pairs, OPTIMIZATION_r14.md) and strictly fewer
        # read bytes at cluster scale; env-overridable because the right
        # codec is a property of the deployment's CPU:I/O ratio
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

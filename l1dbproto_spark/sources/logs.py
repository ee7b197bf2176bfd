"""Log-line source + parsing expressions — the reference's metrics ingestion.

The reference tails ap_proto log files (plain/gzip, follow mode —
``log2csv.py:306-319,228-263``; ``log2influx.py:415-428,339-374``), finds the
`` apdb_metrics: `` marker, parses the JSON payload and a
comma-milliseconds timestamp (``log2influx.py:119-127``), then dispatches on
metric name (``log2csv.py:221-225``).

Spark-first: ``spark.read.text`` / ``spark.readStream.text`` (gzip is
transparent for the batch reader), with parsing as native expressions —
``regexp_extract`` for the line structure, ``to_timestamp`` after comma->dot
rewrite (F12), ``from_json`` for the payload (F11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRICS_MARKER = " apdb_metrics: "

# payload schema: log2csv.py:324-328 / metrics.md:6-25
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("timestamp", T.DoubleType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("values", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("source", T.StringType()),
    ]
)

# "2020-02-10 18:40:00,148 - lsst.l1dbproto - INFO - ... apdb_metrics: {...}"
_LINE_RE = r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})"


def parse_metrics_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """text lines -> (ts timestamp, name, visit int, table, tile, rank,
    values map<string,double>). Lines without the metrics marker are dropped
    (the reference skips them the same way, ``log2csv.py:321-323``)."""
    c = F.col(value_col)
    ts_str = F.regexp_extract(c, _LINE_RE, 1)
    payload = F.substring_index(c, METRICS_MARKER, -1)
    df = (
        lines.filter(c.contains(METRICS_MARKER))
        .select(
            F.to_timestamp(
                F.regexp_replace(ts_str, ",", "."), "yyyy-MM-dd HH:mm:ss.SSS"
            ).alias("ts"),
            F.from_json(payload, PAYLOAD_SCHEMA).alias("m"),
        )
        # drop lines whose payload failed to parse (from_json -> null struct
        # or null name) — otherwise they surface as null-visit junk rows in
        # downstream reports
        .filter(F.col("m").isNotNull() & F.col("m.name").isNotNull())
        .select(
            "ts",
            F.col("m.name").alias("name"),
            F.col("m.tags.visit").cast("int").alias("visit"),
            F.col("m.tags.table").alias("table"),
            F.col("m.tags.tile").alias("tile"),
            F.col("m.tags.rank").cast("int").alias("rank"),
            F.col("m.values").alias("values"),
        )
    )
    return df


def read_log_batch(spark: SparkSession, path: str) -> DataFrame:
    """Plain or .gz log files (S9 batch form)."""
    return parse_metrics_lines(spark.read.text(path))


def read_log_stream(spark: SparkSession, path: str) -> DataFrame:
    """Growing-directory stream (S9 follow mode -> file stream source)."""
    return parse_metrics_lines(spark.readStream.text(path))


def format_log_line(
    ts: str, name: str, visit: int, values: dict, table: str | None = None
) -> str:
    """Synthesize a reference-shaped log line (test fixture helper,
    FIXTURES.md metrics_log)."""
    import json

    tags: dict = {"visit": visit}
    if table is not None:
        tags["table"] = table
    payload = {
        "name": name,
        "timestamp": 0.0,
        "tags": tags,
        "values": values,
        "source": "ap_proto",
    }
    return f"{ts} - lsst.l1dbproto - INFO -{METRICS_MARKER}{json.dumps(payload)}"

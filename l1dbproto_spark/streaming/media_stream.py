"""Streaming media ingest — the landing-zone gate for BINARY media,
mirroring the text gate (streaming/ingest_stream.py) shape exactly:
files dropped into a directory are picked up by a ``binaryFile`` stream,
each micro-batch is decode-validated by ONE probe pass
(operators/multimodal.probe_media — magic-dispatched to the WAV / AVI /
image decoders, headers only), and three outputs land per epoch:

* admitted  -> ``<out>/epoch=<id>/``            (path, id, kind, typed
  metadata, n_bytes, content fingerprint — the CATALOG rows; the
  landing files stay the payload store, blobs are never copied)
* quarantine -> ``<out>_quarantine/epoch=<id>/`` (path + fingerprint of
  every blob no decoder opens)
* metrics    -> ``<out>_metrics/epoch=<id>/``    (n_admitted,
  n_quarantined, per-kind counts)

All three use per-epoch dynamic partition overwrite — the engine's
retry-idempotency pattern (a replayed epoch replaces its own partitions).
The metrics table makes a poisoned camera/recorder feed VISIBLE the
epoch it breaks, while admitted media keep flowing.

Scale: binaryFile streaming reads each blob once; the probe computes
headers only (no pixel/PCM buffer crosses Arrow); the gate holds no
state, so every epoch is independent — nothing to compact, retries need
no probes. ``media_id = xxhash64(path)`` keys the catalog
deterministically across retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.multimodal import probe_media

_BINARY_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)

# The gate's on-disk contracts. A freshly-started gate whose first epoch
# is all-valid (or all-invalid) leaves the other side as a partition
# directory with ZERO parquet files, which schema inference cannot read
# — so every consumer (the gate's own metrics read-back, monitoring,
# tests) goes through these explicit schemas. test_media_stream pins
# them against what probe() actually writes.
ADMITTED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("fps", T.DoubleType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("fingerprint", T.StringType(), True),
        T.StructField("epoch", T.IntegerType(), True),
    ]
)
QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("fingerprint", T.StringType(), True),
        T.StructField("epoch", T.IntegerType(), True),
    ]
)


def read_admitted(spark: SparkSession, out_path: str) -> DataFrame:
    """Typed read of the gate's catalog table (empty-epoch safe)."""
    return spark.read.schema(ADMITTED_SCHEMA).parquet(out_path.rstrip("/"))


def read_quarantined(spark: SparkSession, out_path: str) -> DataFrame:
    """Typed read of the gate's quarantine table (empty-epoch safe)."""
    return spark.read.schema(QUARANTINE_SCHEMA).parquet(
        out_path.rstrip("/") + "_quarantine"
    )


class StreamingMediaIngest:
    """Decode-validate a binary-file stream under the quarantine
    contract. ``probe(batch)`` returns (admitted, quarantined) for one
    (path, content) frame — the same core the batch path uses, so batch
    and stream can never drift; ``bind_stream`` wires the full gate."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def probe(self, blobs: DataFrame) -> tuple[DataFrame, DataFrame]:
        base = blobs.select(
            F.col("path"),
            F.xxhash64(F.col("path")).alias("media_id"),
            F.length(F.col("content")).alias("n_bytes"),
            F.md5(F.col("content")).alias("fingerprint"),
            F.col("content"),
        )
        probed = probe_media(
            base.select("media_id", "content"), payload_col="content"
        )
        joined = base.drop("content").join(probed, "media_id")
        admitted = joined.filter(F.col("ok")).select(
            "media_id",
            "path",
            "kind",
            "width",
            "height",
            "sample_rate",
            "duration_ms",
            "fps",
            "n_frames",
            "n_bytes",
            "fingerprint",
        )
        quarantined = joined.filter(~F.col("ok")).select(
            "media_id", "path", "n_bytes", "fingerprint"
        )
        return admitted, quarantined

    def foreach_batch(self, out_path: str):
        """The per-epoch body, exposed for retry-idempotency tests."""
        out = out_path.rstrip("/")

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            admitted, quarantined = self.probe(batch_df)
            eid = int(epoch_id)
            spark = batch_df.sparkSession

            def _write(df: DataFrame, path: str):
                stamped = df.withColumn("epoch", F.lit(eid))
                (
                    stamped.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("epoch")
                    .parquet(path)
                )
                # the writer's schema, epoch partition column included —
                # handed to the read-back so an all-valid (or all-invalid)
                # epoch, whose side lands a directory with ZERO parquet
                # files, reads back as an empty typed frame instead of
                # throwing UNABLE_TO_INFER_SCHEMA and killing the stream
                return stamped.schema

            adm_schema = _write(admitted, out)
            qua_schema = _write(quarantined, out + "_quarantine")
            # counts from the just-WRITTEN partitions (the text gate's
            # rule): the metric reports what actually landed on disk
            adm = (
                spark.read.schema(adm_schema)
                .parquet(out)
                .filter(F.col("epoch") == eid)
            )
            qua = (
                spark.read.schema(qua_schema)
                .parquet(out + "_quarantine")
                .filter(F.col("epoch") == eid)
            )
            counts = (
                adm.agg(
                    F.count(F.lit(1)).alias("n_admitted"),
                    F.count_if(F.col("kind") == "image").alias("n_image"),
                    F.count_if(F.col("kind") == "audio").alias("n_audio"),
                    F.count_if(F.col("kind") == "video").alias("n_video"),
                ).crossJoin(
                    qua.agg(F.count(F.lit(1)).alias("n_quarantined"))
                )
            )
            _write(counts, out + "_metrics")

        return _each

    def bind_stream(self, landing_path: str, out_path: str):
        """availableNow binaryFile stream over the landing directory;
        restarts resume from ``<out>_checkpoint`` and read only files
        not yet processed."""
        blobs = (
            self.spark.readStream.format("binaryFile")
            .schema(_BINARY_SCHEMA)
            .load(landing_path)
        )
        return (
            blobs.writeStream.foreachBatch(self.foreach_batch(out_path))
            .option(
                "checkpointLocation", out_path.rstrip("/") + "_checkpoint"
            )
            .trigger(availableNow=True)
            .start()
        )


def media_ingest_rate(spark: SparkSession, out_path: str) -> DataFrame:
    """(epoch, n_admitted, n_quarantined, n_image, n_audio, n_video,
    rate) from the gate's metrics table — the monitoring query."""
    m = spark.read.parquet(out_path.rstrip("/") + "_metrics")
    return m.select(
        "epoch",
        "n_admitted",
        "n_quarantined",
        "n_image",
        "n_audio",
        "n_video",
        (
            F.col("n_quarantined").cast("double")
            / F.greatest(
                F.col("n_admitted") + F.col("n_quarantined"), F.lit(1)
            )
        ).alias("rate"),
    )

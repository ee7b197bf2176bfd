"""Streaming quarantine ingest — the landing-zone form of the batch
read_csv_quarantined / read_jsonl contract (sources/jsonl.py): files
dropped into a directory are picked up by a text-file stream, each
micro-batch parses under the SAME schema-required, one-bad-line-costs-
one-row rules, and three outputs land per epoch:

* clean rows    -> ``<out>/epoch=<id>/``       (the corpus append)
* quarantine    -> ``<out>_quarantine/epoch=<id>/`` (verbatim bad lines)
* epoch counts  -> ``<out>_metrics/epoch=<id>/``    (n_clean, n_quarantined)

All three use per-epoch dynamic partition overwrite, the engine's
retry-idempotency pattern (a replayed foreachBatch epoch replaces its own
partitions instead of duplicating them — streaming/decontam.py,
doc_dedup.py use the identical shape). The metrics table is what makes a
poisoned feed VISIBLE instead of silent: a monitoring query over
``<out>_metrics`` sees the quarantine rate jump the epoch a producer
breaks its schema, while the clean corpus keeps flowing.

Scale: readStream.text is per-file parallel (gzip) / split-parallel
(plain), parsing is pure per-row expressions, and nothing in the gate
holds state — every epoch is independent, so there is no store to
compact and retries need no probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.jsonl import CORRUPT_COL, parse_csv_lines, parse_jsonl_lines


class StreamingQuarantineIngest:
    """Parse a text-line stream under the quarantine contract.

    ``fmt`` is ``"csv"`` (with ``header``/``sep`` honoring the batch
    reader's normalized-header drop) or ``"jsonl"``. ``parse(lines)``
    returns (clean, quarantine) for one batch frame — the exact
    ``sources.jsonl`` cores, so batch and stream can never drift;
    ``bind_stream(landing_path, out_path)`` wires the full gate."""

    def __init__(
        self,
        spark: SparkSession,
        schema: T.StructType | str,
        fmt: str = "csv",
        header: bool = True,
        sep: str = ",",
    ) -> None:
        if fmt not in ("csv", "jsonl"):
            raise ValueError(f"fmt must be 'csv' or 'jsonl', got {fmt!r}")
        self.spark = spark
        self.schema = (
            T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
        )
        self.fmt = fmt
        self.header = header
        self.sep = sep

    def parse(self, lines: DataFrame) -> tuple[DataFrame, DataFrame]:
        if self.fmt == "csv":
            return parse_csv_lines(lines, self.schema, self.header, self.sep)
        return parse_jsonl_lines(lines, self.schema)

    def foreach_batch(self, out_path: str):
        """The per-epoch body, exposed for retry-idempotency tests."""
        out = out_path.rstrip("/")

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            clean, quarantine = self.parse(batch_df)
            eid = int(epoch_id)
            spark = batch_df.sparkSession

            def _write(df: DataFrame, path: str) -> None:
                (
                    df.withColumn("epoch", F.lit(eid))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("epoch")
                    .parquet(path)
                )

            _write(clean, out)
            _write(quarantine, out + "_quarantine")
            # counts come from the just-WRITTEN epoch partitions, not a
            # re-aggregation of the branches — two text parses per epoch
            # (one per written output), not four (r11 review find), and
            # the metric reports what actually landed on disk
            def _n(path: str) -> DataFrame:
                return spark.read.parquet(path).filter(
                    F.col("epoch") == eid
                )

            counts = _n(out).agg(F.count(F.lit(1)).alias("n_clean")).crossJoin(
                _n(out + "_quarantine").agg(
                    F.count(F.lit(1)).alias("n_quarantined")
                )
            )
            _write(counts, out + "_metrics")

        return _each

    def bind_stream(self, landing_path: str, out_path: str):
        """availableNow text stream over the landing directory; restarts
        resume from the checkpoint (``<out>_checkpoint``) and only read
        files not yet processed."""
        lines = self.spark.readStream.text(landing_path)
        return (
            lines.writeStream.foreachBatch(self.foreach_batch(out_path))
            .option(
                "checkpointLocation", out_path.rstrip("/") + "_checkpoint"
            )
            .trigger(availableNow=True)
            .start()
        )


def quarantine_rate(spark: SparkSession, out_path: str) -> DataFrame:
    """(epoch, n_clean, n_quarantined, rate) from the gate's metrics
    table — the monitoring query: alert when rate jumps."""
    m = spark.read.parquet(out_path.rstrip("/") + "_metrics")
    return m.select(
        "epoch",
        "n_clean",
        "n_quarantined",
        (
            F.col("n_quarantined").cast("double")
            / F.greatest(F.col("n_clean") + F.col("n_quarantined"), F.lit(1))
        ).alias("rate"),
    )

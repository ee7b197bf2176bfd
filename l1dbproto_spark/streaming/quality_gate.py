"""Streaming quality gate — ingestion-side filtering with the learned
classifier (operators/classifier.py) and optionally the Gopher rule
battery, mirroring the decontamination gate's stateless shape
(streaming/decontam.py).

Like decontamination — and unlike the dedup gates — quality is a pure
per-document property: the fitted model is static, so the gate holds the
bounded (bucket, coef) table Spark-cached and every micro-batch is an
independent featurize -> broadcast-join -> filter. Trivially idempotent
under foreachBatch retries (a replayed epoch recomputes the same
admitted set), and the union of admitted batches equals the batch-mode
filter over the union of inputs (tests/test_quality_gate_stream.py).

Scale: per-batch cost is the batch's own featurization plus a broadcast
join against ``num_buckets`` rows — no state, no store, nothing to
compact, no shuffle proportional to anything but the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classifier import quality_classifier_scores


class StreamingQualityGate:
    """Filter micro-batches through the learned quality classifier.

    ``score(batch)`` returns (id, logit, score) for auditing;
    ``admit(batch)`` returns the rows with ``score >= threshold``
    (optionally also requiring the Gopher rule battery's pass flag);
    ``bind_stream`` wires admit into ``foreachBatch`` with per-epoch
    dynamic partition overwrite — idempotent under epoch retries."""

    def __init__(
        self,
        spark: SparkSession,
        coef_table: DataFrame,
        intercept: float,
        num_buckets: int = 4096,
        threshold: float = 0.5,
        require_gopher_pass: bool = False,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self.spark = spark
        # bounded by construction (<= num_buckets rows): cache once,
        # broadcast into every micro-batch's scoring join
        self.coef_table = coef_table.cache()
        self.intercept = float(intercept)
        self.num_buckets = num_buckets
        self.threshold = threshold
        self.require_gopher_pass = require_gopher_pass
        self.text_col = text_col
        self.id_col = id_col

    def score(self, batch: DataFrame) -> DataFrame:
        return quality_classifier_scores(
            batch,
            self.coef_table,
            self.intercept,
            self.num_buckets,
            self.text_col,
            self.id_col,
        )

    def admit(self, batch: DataFrame) -> DataFrame:
        """The batch's high scorers — original columns. The score join
        keys on the id (the scoring output is batch-sized); low scorers
        and, optionally, Gopher-rule failures are dropped."""
        keep = (
            self.score(batch)
            .filter(F.col("score") >= self.threshold)
            .select(self.id_col)
        )
        out = batch.join(keep, self.id_col, "left_semi")
        if self.require_gopher_pass:
            from ..operators.quality import gopher_quality_signals

            passing = (
                gopher_quality_signals(out, text_col=self.text_col)
                .filter(F.col("passes_gopher"))
                .select(self.id_col)
            )
            out = out.join(passing, self.id_col, "left_semi")
        return out

    def bind_stream(self, doc_stream: DataFrame, output_path: str):
        """foreachBatch wiring with per-epoch dynamic overwrite (a
        retried epoch replaces its own partition — the engine's standard
        at-least-once-to-exactly-once pattern)."""

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            admitted = self.admit(batch_df).withColumn(
                "epoch", F.lit(int(epoch_id))
            )
            (
                admitted.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(output_path)
            )

        return (
            doc_stream.writeStream.foreachBatch(_each)
            .option(
                "checkpointLocation", output_path.rstrip("/") + "_checkpoint"
            )
            .trigger(availableNow=True)
            .start()
        )

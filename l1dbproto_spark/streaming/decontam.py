"""Streaming decontamination — the ingestion-side form of the batch
eval-overlap check (operators/contamination.py).

Unlike the dedup gates (streaming/doc_dedup.py), decontamination needs NO
growing state: the eval set is static, so the gate precomputes the eval
shingle index ONCE (Spark-cached, MBs by construction) and every
micro-batch is an independent broadcast-join filter against it. That makes
the gate trivially idempotent — a retried foreachBatch epoch recomputes
the same admitted set from scratch — and the union of admitted batches
equals the batch-mode ``decontaminate`` keepers over the union of inputs
(tests/test_decontam_stream.py), because per-document contamination
depends only on that document and the (fixed) eval set.

Scale: the per-batch cost is the batch's shingle explode plus a broadcast
join — no shuffle of anything proportional to the corpus, no store
reads/writes, nothing to compact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.contamination import build_eval_index, ngram_contamination


class StreamingDecontamGate:
    """Filter micro-batches against a static eval set.

    ``admit(batch)`` returns the rows whose contamination against every
    eval document is ≤ ``max_contamination``; ``report(batch)`` returns
    the per-(doc, eval) contamination rows for auditing. ``bind_stream``
    wires admit into ``foreachBatch`` with per-epoch partition overwrite
    (idempotent under retries, like the dedup gates)."""

    def __init__(
        self,
        spark: SparkSession,
        eval_set: DataFrame,
        n: int = 8,
        max_contamination: float = 0.0,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self.spark = spark
        self.n = n
        self.max_contamination = max_contamination
        self.text_col = text_col
        self.id_col = id_col
        self.index = build_eval_index(eval_set, n, text_col, id_col, cache=True)

    def report(self, batch: DataFrame, min_overlap: int = 1) -> DataFrame:
        return ngram_contamination(
            batch,
            None,
            self.n,
            min_overlap,
            self.text_col,
            self.id_col,
            index=self.index,
        )

    def admit(self, batch: DataFrame) -> DataFrame:
        """The batch minus documents contaminated above the threshold —
        original columns, broadcast anti-join against the flagged ids."""
        flagged = (
            self.report(batch)
            .filter(F.col("contamination") > self.max_contamination)
            .select(F.col("doc_id").alias(self.id_col))
            .distinct()
        )
        return batch.join(F.broadcast(flagged), self.id_col, "left_anti")

    def bind_stream(self, doc_stream: DataFrame, output_path: str):
        """foreachBatch wiring: admitted rows land under
        ``epoch=<id>`` partitions with per-epoch dynamic overwrite, so a
        retried epoch replaces its own output instead of duplicating it."""

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

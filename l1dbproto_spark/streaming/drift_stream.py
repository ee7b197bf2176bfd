"""Streaming drift monitor — operators/drift.py applied per micro-batch
against a PINNED reference snapshot: each epoch of an arriving corpus
stream is measured (KS for numerics, chi-square/TVD for categoricals)
and one drift row per watched column lands under
``<out>/epoch=<id>/``, the same per-epoch dynamic-overwrite
retry-idempotency shape every gate in this package uses. The monitor
MEASURES and records; thresholding/alerting is a query over the output
table (``drifted_epochs``), keeping policy out of the hot path like
checks/profile/report.

The reference is loaded once and localCheckpoint-pinned: every epoch
compares against the identical frozen distribution, not a re-read that
could move under the stream. Per-epoch cost is the drift_report plan —
per-key COUNT exchanges only; batch sizes are micro-batch-bounded and
the reference side's aggregation is cached by the pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..operators.drift import drift_report


class StreamingDriftMonitor:
    """Measure each micro-batch's drift against a reference snapshot.

    ``report(batch)`` returns the drift frame for one batch (the exact
    batch operator, so stream and batch can never disagree);
    ``bind_stream`` wires a parquet-directory stream through it."""

    def __init__(
        self,
        spark: SparkSession,
        reference: DataFrame,
        numeric_cols: list[str] | None = None,
        categorical_cols: list[str] | None = None,
        bins: int | None = 64,
        quantile_cols: list[str] | None = None,
        quantile_bins: int = 10,
    ) -> None:
        if not (numeric_cols or categorical_cols or quantile_cols):
            raise ValueError(
                "no columns to watch: pass numeric or categorical columns"
            )
        self.spark = spark
        self.numeric_cols = list(numeric_cols or [])
        self.categorical_cols = list(categorical_cols or [])
        self.quantile_cols = list(quantile_cols or [])
        self.quantile_bins = quantile_bins
        self.bins = bins
        watched = self.numeric_cols + self.categorical_cols + self.quantile_cols
        # pin the frozen reference projection: epochs must all compare
        # against the same bytes, and the pin stops per-epoch re-reads
        self.reference = reference.select(*watched).transform(pin, eager=True)

    def report(self, batch: DataFrame) -> DataFrame:
        return drift_report(
            self.reference,
            batch,
            numeric_cols=self.numeric_cols,
            categorical_cols=self.categorical_cols,
            bins=self.bins,
            quantile_cols=self.quantile_cols,
            quantile_bins=self.quantile_bins,
        )

    def foreach_batch(self, out_path: str):
        out = out_path.rstrip("/")

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            rows = self.report(batch_df).withColumn(
                "epoch", F.lit(int(epoch_id))
            )
            (
                rows.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(out)
            )

        return _each

    def bind_stream(self, landing_path: str, out_path: str, schema):
        """availableNow parquet stream over the landing directory; one
        drift row per watched column per epoch lands under ``out_path``,
        checkpointed at ``<out>_checkpoint``."""
        batches = (
            self.spark.readStream.schema(schema).parquet(landing_path)
        )
        return (
            batches.writeStream.foreachBatch(self.foreach_batch(out_path))
            .option(
                "checkpointLocation", out_path.rstrip("/") + "_checkpoint"
            )
            .trigger(availableNow=True)
            .start()
        )


def drifted_epochs(
    spark: SparkSession,
    out_path: str,
    ks_threshold: float = 0.1,
    tvd_threshold: float = 0.05,
) -> DataFrame:
    """The alerting query over the monitor's output: epochs/columns whose
    statistic crossed a threshold — (epoch, column, kind, statistic,
    tvd, top_mover). Policy lives HERE, in a query, not in the gate.

    A NULL or NaN statistic ALERTS: the drift operators emit NULL when a
    side has zero non-null rows (empty-side contract in operators/drift),
    and a threshold comparison against NULL/NaN is never true — without
    this branch a fully-drained snapshot would read as 'no drift'."""
    m = spark.read.parquet(out_path.rstrip("/"))
    stat = F.col("statistic")
    undefined = stat.isNull() | F.isnan(stat)
    return m.filter(
        undefined
        | ((F.col("kind") == "ks") & (stat > ks_threshold))
        | ((F.col("kind") == "chi2") & (F.col("tvd") > tvd_threshold))
    ).select("epoch", "column", "kind", "statistic", "tvd", "top_mover")

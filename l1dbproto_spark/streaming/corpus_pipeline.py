"""Composed streaming corpus pipeline: quality gate -> exact-dup gate ->
near-dup gate -> decontamination gate -> (optional) ANN index append, all
inside ONE ``foreachBatch`` of one ``availableNow`` stream.

The individual gates each carry their own correctness contract
(stateless-batch equality for quality/decontam, store-backed first-seen
admission for the dedup pair, id-idempotent appends for the index — see
their modules); this class is the composition those contracts were
designed for, and tests/test_corpus_stream_pipeline.py pins that they
actually compose: the streamed pipeline's admitted set equals the same
gate chain driven directly batch-by-batch, and the final output satisfies
the batch-level invariants over the union (unique fingerprints, zero
contamination, quality above threshold).

Ordering rationale (cheap/selective first, stateful last):

1. **quality** — stateless, drops the bulk cheaply (broadcast coef join);
2. **exact dedup** — one uniform-key shuffle + pruned store probe; removes
   byte-identical mass before the costlier shingling;
3. **near dedup** — MinHash banding over the survivors only;
4. **decontam** — broadcast eval-index join over what is left;
5. **index append** — embeddings of the final admitted documents, id-level
   idempotent.

Each stage's store updates are per-batch idempotent (epoch-retry rules in
streaming/doc_dedup.py), and the output write uses per-epoch dynamic
partition overwrite, so the composition inherits the gates'
exactly-once-output story unchanged: a retried epoch re-runs the whole
chain, every store append is a no-op, and the epoch partition is
replaced, not duplicated.

At 100 TB: the composition adds NO new shuffle beyond the member gates'
own plans — the inter-stage handoffs are left-semi joins on the doc id
of the current micro-batch (batch-sized, not corpus-sized), and every
store probe stays partition-pruned to the batch's buckets.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ComposedCorpusPipeline:
    """Chain the streaming corpus gates over one document stream.

    Parameters are the already-constructed gates (so every knob stays on
    its own class); ``embedding_resolver`` maps an admitted-documents
    DataFrame to the vector rows to append (e.g. a join against an
    embeddings table), required iff ``index_append`` is given.
    """

    def __init__(
        self,
        quality_gate=None,
        exact_gate=None,
        near_dup_gate=None,
        decontam_gate=None,
        index_append=None,
        embedding_resolver: Optional[Callable[[DataFrame], DataFrame]] = None,
        id_col: str = "doc_id",
    ) -> None:
        if (index_append is None) != (embedding_resolver is None):
            raise ValueError(
                "index_append and embedding_resolver come as a pair"
            )
        self.quality_gate = quality_gate
        self.exact_gate = exact_gate
        self.near_dup_gate = near_dup_gate
        self.decontam_gate = decontam_gate
        self.index_append = index_append
        self.embedding_resolver = embedding_resolver
        self.id_col = id_col
        #: per-stage (stage, rows) of the last audited process_batch call
        self.last_audit: list[tuple[str, int]] | None = None

    def process_batch(
        self, batch: DataFrame, epoch_id: int | None = None, audit: bool = False
    ) -> DataFrame:
        """One micro-batch through the full gate chain; returns the
        admitted rows with the original columns. Usable directly for
        backfills — identical semantics to the stream binding (the same
        per-gate epoch rules apply via ``epoch_id``).

        ``audit=True`` records per-stage surviving row counts in
        ``self.last_audit`` (``[(stage, rows), ...]`` — the drop-rate
        observability a production gate chain is monitored by). Each
        count is one extra bounded action per stage; off by default."""
        stages: list[tuple[str, int]] = []

        def note(name: str, df: DataFrame) -> None:
            if audit:
                stages.append((name, df.count()))

        out = batch
        note("input", out)
        if self.quality_gate is not None:
            out = self.quality_gate.admit(out)
            note("quality", out)
        if self.exact_gate is not None:
            kept = self.exact_gate.admit(out, epoch_id=epoch_id).select(
                F.col(self.id_col)
            )
            out = out.join(kept, self.id_col, "left_semi")
            note("exact_dedup", out)
        if self.near_dup_gate is not None:
            kept = self.near_dup_gate.admit(out, epoch_id=epoch_id).select(
                F.col(self.id_col)
            )
            out = out.join(kept, self.id_col, "left_semi")
            note("near_dedup", out)
        if self.decontam_gate is not None:
            out = self.decontam_gate.admit(out)
            note("decontam", out)
        if self.index_append is not None:
            self.index_append.append(self.embedding_resolver(out))
        self.last_audit = stages if audit else None
        return out

    def bind_stream(
        self,
        doc_stream: DataFrame,
        output_path: str,
        audit_path: str | None = None,
    ):
        """Wire the chain into one Structured Streaming query
        (availableNow, the gate-family trigger): admitted rows land under
        ``epoch=<id>`` partitions with dynamic overwrite — the same
        retried-epoch-replaces-itself contract as the individual gates.

        ``audit_path``: optionally persist the per-stage audit as an
        ``(epoch, stage_index, stage, rows)`` parquet table, one epoch
        partition per micro-batch under the same dynamic-overwrite rule —
        the queryable drop-rate log (a retried epoch replaces its own
        audit rows too, so the log never double-counts)."""

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            admitted = self.process_batch(
                batch_df, epoch_id=epoch_id, audit=audit_path is not None
            )
            (
                admitted.withColumn("epoch", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(output_path)
            )
            if audit_path is not None:
                spark = batch_df.sparkSession
                rows = [
                    (int(epoch_id), i, stage, int(n))
                    for i, (stage, n) in enumerate(self.last_audit)
                ]
                (
                    spark.createDataFrame(
                        rows, "epoch long, stage_index int, stage string, rows long"
                    )
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("epoch")
                    .parquet(audit_path)
                )

        return (
            doc_stream.writeStream.foreachBatch(_each)
            .option(
                "checkpointLocation", output_path.rstrip("/") + "_checkpoint"
            )
            .trigger(availableNow=True)
            .start()
        )

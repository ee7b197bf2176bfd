"""Streaming ANN query service: a stream of QUERY vectors probed against
a persisted IVF-PQ index — the read-side counterpart of
:mod:`l1dbproto_spark.streaming.index_append` (which maintains the same
index from a stream of CORPUS vectors). Together they are the
similarity-search-as-a-service shape: one stream grows the index,
another answers top-k against it.

Each micro-batch runs the exact production probe
(:func:`operators.pq.pq_index_topk`): nearest-centroid probing,
PARTITION-PRUNED code scan (only the probed ``cluster=`` directories are
listed), ADC scoring over codes, exact-cosine re-rank of the k*refine
survivors against the corpus. Results land under ``epoch=<id>``
partitions with dynamic overwrite — the family's retried-epoch-
replaces-itself contract — so the output table is an append-only log of
answered queries, idempotent under epoch retries.

Freshness: the index handle re-reads ``codes.parquet`` per batch, so
vectors appended by a concurrent :class:`StreamingIndexAppend` become
searchable at the NEXT micro-batch (eventual visibility, the standard
ANN-service contract; the quantizers are frozen at index build time for
both sides)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pq import PQIndex, load_pq_index, pq_index_topk


class StreamingAnnQuery:
    """Bind a query-vector stream to a persisted PQ index.

    ``corpus`` is the full-precision vector table consulted only by the
    exact re-rank (broadcast-probed survivors, never shuffled); at scale
    it is the same table the index was built from."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        corpus: DataFrame,
        k: int = 5,
        n_probe: int = 2,
        refine: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        self.spark = spark
        self.index: PQIndex = load_pq_index(spark, root)
        self.corpus = corpus
        self.k = k
        self.n_probe = n_probe
        self.refine = refine
        self.vec_col = vec_col
        self.id_col = id_col

    def answer(self, batch: DataFrame) -> DataFrame:
        """Top-k for one micro-batch of query vectors — identical
        semantics to the batch :func:`pq_index_topk` call (pinned by
        tests), usable directly for backfills."""
        return pq_index_topk(
            self.index,
            batch,
            self.corpus,
            k=self.k,
            n_probe=self.n_probe,
            refine=self.refine,
            vec_col=self.vec_col,
            id_col=self.id_col,
        )

    def bind_stream(self, query_stream: DataFrame, output_path: str):
        """availableNow binding: each micro-batch's answers land under
        ``epoch=<id>`` with dynamic partition overwrite."""

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            (
                self.answer(batch_df)
                .withColumn("epoch", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(output_path)
            )

        return (
            query_stream.writeStream.foreachBatch(_each)
            .option(
                "checkpointLocation", output_path.rstrip("/") + "_checkpoint"
            )
            .trigger(availableNow=True)
            .start()
        )

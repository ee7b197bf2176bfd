"""Streaming IVF-PQ index maintenance — absorb a vector stream into a
persisted index (operators/pq.py) one micro-batch at a time.

The batch form (``append_to_pq_index``) assumes the caller owns id
uniqueness; a stream cannot (at-least-once sources re-deliver, foreachBatch
epochs retry), so the streaming binding makes the append ID-LEVEL
IDEMPOTENT instead of epoch-scoped: a vector id already present in the
code store is never appended again. That is the right semantics for an
index — an id's embedding is immutable, so re-delivery carries no new
information — and it makes retries, restarts, and overlapping backfills
all safe with ONE rule.

Scale shape per batch: one scan of the batch through the frozen
assign→encode plan, then a store probe PRUNED to the batch's assigned
clusters (the cluster list is driver-tiny — bounded by the batch size —
the same bounded-metadata pattern as the near-dup gate's bucket-prefix
pruning and pq_index_topk's probe pushdown; asserted on PartitionFilters
in tests), an anti-join on neighbor_id, and a partitioned append of only
the fresh rows. Nothing scales with the index except the pruned probe.
Partition file counts stay bounded the same way as the gate stores:
``PQIndex.compact()`` (fs.compact_store underneath) folds each cluster
directory back to one file; run it as scheduled maintenance.

SINGLE WRITER per index root: the id-idempotent append is an unlocked
read-store -> anti-join -> write, so two CONCURRENT writers (a backfill
``append`` racing the bound stream) can both observe an id as absent and
both insert it. Intra-batch duplicates are collapsed by the encode's
per-id aggregation; cross-writer races are not — serialize writers (one
bound stream OR one backfill at a time per root). If a race did
double-insert, ``PQIndex.compact()`` is the repair path: it dedups
(cluster, neighbor_id) during the fold, exact because an id's codes are
immutable under the frozen quantizers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin

from ..operators.pq import PQIndex, _encode_for_index, load_pq_index


class StreamingIndexAppend:
    """Bind a persisted IVF-PQ index to a vector stream (or call
    :meth:`append` directly per backfill batch)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        self.spark = spark
        self.index: PQIndex = load_pq_index(spark, root)
        self.vec_col = vec_col
        self.id_col = id_col
        # frozen quantizers: bounded tables, cached once for the stream's
        # lifetime (centroids = n_clusters rows, codebooks = m*k rows)
        self._cent = (
            self.index.centroids()
            .select("cluster", F.col("centroid").alias("_cvec"))
            .transform(pin, eager=True)
        )
        self._codebooks = self.index.codebooks().transform(pin, eager=True)

    def _coded_and_probe(self, batch: DataFrame):
        """Shared probe construction: (coded batch, pruned store read) —
        the one definition both append() and the plan test hook use, so
        the asserted plan IS the production plan. Returns (None, None)
        for an effectively-empty batch."""
        meta = self.index.meta
        coded = _encode_for_index(
            batch,
            self._cent,
            self._codebooks,
            meta.m,
            meta.dim,
            meta.residual,
            self.vec_col,
            self.id_col,
        ).transform(pin, eager=True)
        clusters = [
            r.cluster for r in coded.select("cluster").distinct().collect()
        ]
        if not clusters:
            return None, None
        probe = self.index.codes().filter(F.col("cluster").isin(clusters))
        return coded, probe

    def append(self, batch: DataFrame) -> int:
        """Encode the batch with the frozen quantizers and append rows
        whose id is not already stored. Returns the number of NEW rows.
        Degenerate vectors are excluded by the shared encode guard."""
        coded, probe = self._coded_and_probe(batch)
        if coded is None:
            return 0
        existing = probe.select("neighbor_id")
        fresh = coded.join(existing, "neighbor_id", "left_anti").transform(pin, 
            eager=True
        )
        n_new = fresh.count()
        if n_new:
            fresh.select("cluster", "neighbor_id", "codes").repartition(
                "cluster"
            ).write.mode("append").partitionBy("cluster").parquet(
                f"{self.index.root}/codes.parquet"
            )
        return n_new

    def existing_probe_plan(self, batch: DataFrame) -> str:
        """Executed-plan string of the store probe for ``batch`` — test
        hook for asserting the PartitionFilters pruning; built by the
        same _coded_and_probe the production append uses."""
        _, probe = self._coded_and_probe(batch)
        probe.count()
        return probe._jdf.queryExecution().executedPlan().toString()

    def bind_stream(self, vec_stream: DataFrame, checkpoint_dir: str):
        """foreachBatch binding (availableNow, the gate-family trigger):
        every micro-batch is absorbed via :meth:`append`; id-level
        idempotency makes epoch retries and re-deliveries no-ops.
        Returns the started StreamingQuery."""

        def _each(batch_df: DataFrame, _epoch_id: int) -> None:
            self.append(batch_df)

        return (
            vec_stream.writeStream.foreachBatch(_each)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

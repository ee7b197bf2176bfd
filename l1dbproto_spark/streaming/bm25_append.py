"""Streaming BM25 index maintenance — absorb a document stream into a
persisted inverted index (operators/bm25.py) one micro-batch at a time.

Same contract as the IVF-PQ stream appender (`streaming/index_append.py`):
the batch form (``append_to_bm25_index``) assumes the caller owns doc-id
uniqueness; a stream cannot (at-least-once re-delivery, foreachBatch epoch
retries), so the streaming binding is **doc-id idempotent**. Document text
is immutable (the dedup-gate family's standing assumption), so re-delivery
carries no new information.

Crash/retry safety — the append is three writes with ONE commit point:

1. the content-keyed **stats generation** row — its key (crc-sum of doc
   ids, count, dl sum) is deterministic for a given fresh set, so a
   retried epoch re-writes the SAME row and ``BM25Index.stats()`` folds it
   via dropDuplicates;
2. the **postings** append — a retry after a crash here re-appends the same
   rows (they are bit-identical per doc); the query path dedups
   (term, doc_id) on the pruned read and :meth:`compact` removes
   duplicates permanently;
3. the **manifest** append (``docs.parquet``) — THE commit point: the
   presence probe reads the manifest, so a doc "exists" exactly when its
   append committed, and a retry of a fully-committed epoch finds zero
   fresh docs and writes nothing.

A crash between 2 and 3 that is never retried leaves orphan postings for
unmanifested docs (they can surface in results with slightly-stale stats
until repaired); :meth:`compact` drops orphans by anti-joining the
manifest. Intra-batch duplicate doc_ids are collapsed (first text wins —
they are identical under the immutability assumption) BEFORE tokenizing,
so overlapping files inside one availableNow batch cannot inflate tf.

Scale shape per batch: one tokenize->tf pass over the batch, a manifest
probe PRUNED to the batch's doc buckets (driver-tiny literal list,
PartitionFilters asserted in tests), a doc-id anti-join, and partitioned
appends of the fresh rows. Nothing scales with the index but the pruned
probe.

Zero-token docs (empty/whitespace/punctuation-only text) are NOT indexable:
they produce no postings, can never match a query — excluded from postings,
manifest AND stats by the shared helpers (one engine-wide rule, pinned in
tests).

SINGLE WRITER per index root (the PQ contract): concurrent writers can
double-insert; :meth:`compact` dedups (term_bucket, term, doc_id) as the
repair path — safe because a doc's postings are immutable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..fs import TableFS
from ..operators.bm25 import (
    BM25Index,
    _doc_manifest,
    _doc_postings,
    _stats_generation,
    load_bm25_index,
)

_POSTINGS_SCHEMA = "doc_id long, term string, dl int, tf long, term_bucket int"
_MANIFEST_SCHEMA = "doc_id long, dl int, doc_bucket int"


class StreamingBM25Append:
    """Bind a persisted BM25 index to a document stream (or call
    :meth:`append` directly per backfill batch)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.spark = spark
        self.index: BM25Index = load_bm25_index(spark, root)
        self.id_col = id_col
        self.text_col = text_col
        self._fs = TableFS(spark, root)

    def _fresh_and_probe(self, batch: DataFrame):
        """(deduped batch, fresh manifest rows, bucket-pruned store probe) —
        one definition for both append() and the plan test hook. All None
        when the batch has no indexable (>= 1 token) docs."""
        deduped = batch.dropDuplicates([self.id_col])  # intra-batch re-delivery
        manifest = _doc_manifest(
            deduped, self.id_col, self.text_col, self.index.meta.n_buckets
        ).transform(pin, eager=True)
        buckets = [r.doc_bucket for r in manifest.select("doc_bucket").distinct().collect()]
        if not buckets:
            return None, None, None
        probe = self.index.manifest().filter(F.col("doc_bucket").isin(buckets))
        fresh = manifest.join(
            probe.select("doc_id"), "doc_id", "left_anti"
        ).transform(pin, eager=True)
        return deduped, fresh, probe

    def append(self, batch: DataFrame) -> int:
        """Absorb one batch: stats generation, postings, then the manifest
        commit point — only for docs not yet indexed. Returns the number
        of fresh docs."""
        deduped, fresh, _ = self._fresh_and_probe(batch)
        if fresh is None:
            return 0
        n_fresh = fresh.count()
        if not n_fresh:
            return 0
        root = self.index.root
        # 1. content-keyed stats generation (retry-identical, reader-folded)
        _stats_generation(fresh).write.mode("append").parquet(f"{root}/stats.parquet")
        # 2. postings for the fresh docs only
        fresh_docs = deduped.join(
            F.broadcast(fresh.select(F.col("doc_id").alias(self.id_col))), self.id_col, "left_semi"
        )
        _doc_postings(
            fresh_docs, self.id_col, self.text_col, self.index.meta.n_buckets
        ).repartition("term_bucket").write.mode("append").partitionBy("term_bucket").parquet(
            f"{root}/postings.parquet"
        )
        # 3. manifest — the commit point
        fresh.repartition("doc_bucket").write.mode("append").partitionBy("doc_bucket").parquet(
            f"{root}/docs.parquet"
        )
        return n_fresh

    def existing_probe_plan(self, batch: DataFrame) -> str:
        """Executed-plan string of the manifest probe — test hook for the
        PartitionFilters assertion; same construction as production.
        Returns '' for a batch with no indexable docs (no probe built)."""
        _, _, probe = self._fresh_and_probe(batch)
        if probe is None:
            return ""
        probe.count()
        return probe._jdf.queryExecution().executedPlan().toString()

    def compact(self, num_tasks: int = 64) -> None:
        """Repair + fold: drop orphan postings (crash between the postings
        and manifest writes that never retried), dedup (term_bucket, term,
        doc_id) from crash-retried appends, and fold per-batch file fan-in
        to one file per partition in both stores."""
        root = self.index.root
        manifest_ids = self.index.manifest().select("doc_id").transform(pin, eager=True)
        posts = (
            self.spark.read.schema(_POSTINGS_SCHEMA)
            .parquet(f"{root}/postings.parquet")
            # no broadcast hint: the manifest scales with the corpus — let
            # AQE pick the join strategy
            .join(manifest_ids, "doc_id", "left_semi")
            .dropDuplicates(["term_bucket", "term", "doc_id"])
            .transform(pin, eager=True)
        )
        posts.repartition("term_bucket").sortWithinPartitions("term", "doc_id").write.mode(
            "overwrite"
        ).partitionBy("term_bucket").parquet(f"{root}/postings.parquet")
        self._fs.compact_store(
            self.spark,
            f"{root}/docs.parquet",
            _MANIFEST_SCHEMA,
            "doc_bucket",
            sort_cols=["doc_id"],
            num_tasks=num_tasks,
            dedup_cols=["doc_bucket", "doc_id"],
        )

    def bind_stream(self, doc_stream: DataFrame, checkpoint_dir: str):
        """foreachBatch binding (availableNow, the gate-family trigger);
        doc-id idempotency makes epoch retries and re-deliveries no-ops."""

        def _each(batch_df: DataFrame, _epoch_id: int) -> None:
            self.append(batch_df)

        return (
            doc_stream.writeStream.foreachBatch(_each)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

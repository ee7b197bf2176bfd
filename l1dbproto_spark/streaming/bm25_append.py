"""Streaming BM25 index maintenance — absorb a document stream into a
persisted inverted index (operators/bm25.py) one micro-batch at a time.

Same contract as the IVF-PQ stream appender (`streaming/index_append.py`):
the batch form (``append_to_bm25_index``) assumes the caller owns doc-id
uniqueness; a stream cannot (at-least-once re-delivery, foreachBatch epoch
retries), so the streaming binding is **doc-id idempotent** — a doc whose id
is already in the postings store is never appended again, and the stats
generation row counts only the genuinely-fresh docs. Document text is
immutable (the dedup-gate family's standing assumption), so re-delivery
carries no new information and one rule makes retries, restarts and
overlapping backfills all safe.

Scale shape per batch: one tokenize->tf pass over the batch, a store probe
PRUNED to the batch's term buckets (driver-tiny literal list — a
re-delivered doc's postings live exactly in the buckets its terms hash to,
so the pruned probe is a complete presence check; PartitionFilters asserted
in tests), a doc-id anti-join, and a partitioned append of the fresh rows +
one stats generation row. Nothing scales with the index but the pruned
probe.

Zero-token docs (empty/whitespace/punctuation-only text) are NOT indexable:
they produce no postings, can never match a query, and would defeat the
presence probe — they are excluded from postings AND stats (documented
contract, pinned in tests).

SINGLE WRITER per index root (the PQ contract): concurrent writers can
double-insert; ``compact()`` dedups (term_bucket, term, doc_id) as the
repair path — safe because a doc's postings are immutable — and folds the
per-batch file fan-in back to one file per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..fs import TableFS
from ..operators.bm25 import (
    BM25Index,
    _doc_postings,
    load_bm25_index,
)

_POSTINGS_SCHEMA = "doc_id long, term string, dl int, tf long, term_bucket int"


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

    def _postings_and_probe(self, batch: DataFrame):
        """(batch postings, bucket-pruned store probe) — one definition for
        both append() and the plan test hook. (None, None) when the batch
        has no indexable (>=1 token) docs."""
        posts = _doc_postings(
            batch, self.id_col, self.text_col, self.index.meta.n_buckets
        ).transform(pin, eager=True)
        buckets = [r.term_bucket for r in posts.select("term_bucket").distinct().collect()]
        if not buckets:
            return None, None
        probe = self.index.postings().filter(F.col("term_bucket").isin(buckets))
        return posts, probe

    def append(self, batch: DataFrame) -> int:
        """Append postings + a stats generation for docs not yet indexed.
        Returns the number of fresh docs."""
        posts, probe = self._postings_and_probe(batch)
        if posts is None:
            return 0
        fresh = posts.join(
            probe.select("doc_id").distinct(), "doc_id", "left_anti"
        ).transform(pin, eager=True)
        stats = fresh.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
        ).first()
        if not stats.n_docs:
            return 0
        fresh.repartition("term_bucket").write.mode("append").partitionBy(
            "term_bucket"
        ).parquet(f"{self.index.root}/postings.parquet")
        self.spark.createDataFrame(
            [(stats.n_docs, int(stats.sum_dl))], "n_docs long, sum_dl long"
        ).write.mode("append").parquet(f"{self.index.root}/stats.parquet")
        return stats.n_docs

    def existing_probe_plan(self, batch: DataFrame) -> str:
        """Executed-plan string of the store probe — test hook for the
        PartitionFilters assertion; same construction as production."""
        _, probe = self._postings_and_probe(batch)
        probe.count()
        return probe._jdf.queryExecution().executedPlan().toString()

    def compact(self, num_tasks: int = 64) -> None:
        """Fold per-batch postings file fan-in to one file per bucket and
        dedup (term_bucket, term, doc_id) — the concurrent-writer repair
        path (postings are immutable per doc, so dedup is exact)."""
        self._fs.compact_store(
            self.spark,
            f"{self.index.root}/postings.parquet",
            _POSTINGS_SCHEMA,
            "term_bucket",
            sort_cols=["term", "doc_id"],
            num_tasks=num_tasks,
            dedup_cols=["term_bucket", "term", "doc_id"],
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

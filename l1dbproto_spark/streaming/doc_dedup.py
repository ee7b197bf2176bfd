"""Streaming document deduplication — the ingestion-side gate of the
training-data pipeline.

Batch dedup (operators/dedup.py) answers "which documents in this corpus are
duplicates"; an ingestion pipeline needs the incremental form: documents
arrive in micro-batches and each batch must be filtered against EVERYTHING
seen so far before it is admitted. This module implements that as the
MERGE-per-microbatch pattern (foreachBatch + a persistent fingerprint
store), the same scale-preferred shape the visit pipeline uses for per-key
state (SURVEY.md §7.3): state lives in a table, not the streaming
checkpoint, so it survives restarts, is queryable, and is shared by
concurrent readers.

Scale: the fingerprint store is hive-partitioned by the leading byte of the
md5 (256 buckets) — the per-batch anti-join shuffles only the batch side
after partition-pruned store reads, and the store's per-partition file count
is bounded by compaction like any APDB table. Fingerprints are uniform by
construction: no skew at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import TableFS
from ..operators.dedup import normalize_text


class StreamingDocDedup:
    """Incremental exact-dedup gate backed by a fingerprint table.

    ``admit(batch)`` — dedup a micro-batch within itself and against the
    store, append the fresh fingerprints, and return the admitted rows.
    Designed to be called from ``foreachBatch`` (``bind_stream``) or
    directly in a backfill loop; identical semantics either way, and the
    union of admitted batches equals batch-mode ``exact_dedup_groups``
    keepers over the union of inputs (tests/test_doc_dedup_stream.py).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self.spark = spark
        self.store_path = store_path
        self.text_col = text_col
        self.id_col = id_col
        self._fs = TableFS(spark, store_path)

    def seen(self) -> DataFrame:
        """The fingerprint store: (fp_bucket, fingerprint, keep_doc_id)."""
        if not self._fs.has_parquet_file(self.store_path):
            return self.spark.createDataFrame(
                [], "fp_bucket string, fingerprint string, keep_doc_id long"
            )
        return self.spark.read.parquet(self.store_path)

    def admit(self, batch: DataFrame) -> DataFrame:
        """Admit the unseen documents of one micro-batch.

        1. fingerprint = md5(normalized text); in-batch winner = min doc_id
           per fingerprint (one uniform-key shuffle);
        2. left-anti join against the store (store side partition-pruned by
           fp_bucket, batch side tiny);
        3. append the fresh fingerprints, partitioned by fp_bucket;
        4. return the admitted (winner) rows with their fingerprints.

        The returned DataFrame is pinned (localCheckpoint) BEFORE the store
        append so its plan cannot observe the store mutation it precedes —
        the same read-before-overwrite discipline as the APDB Last merge."""
        fp = F.md5(normalize_text(F.col(self.text_col)))
        fingered = batch.withColumn("fingerprint", fp).withColumn(
            "fp_bucket", F.substring("fingerprint", 1, 2)
        )
        win = F.min(self.id_col).alias("keep_doc_id")
        winners = (
            fingered.groupBy("fp_bucket", "fingerprint")
            .agg(win, F.count(F.lit(1)).alias("n_copies_in_batch"))
        )
        fresh = (
            winners.join(
                self.seen().select("fingerprint"), "fingerprint", "left_anti"
            )
            .localCheckpoint(eager=True)
        )
        fresh.select("fp_bucket", "fingerprint", F.col("keep_doc_id")).repartition(
            "fp_bucket"
        ).write.mode("append").partitionBy("fp_bucket").parquet(self.store_path)
        return fresh.select(
            "fingerprint",
            F.col("keep_doc_id").alias(self.id_col),
            "n_copies_in_batch",
        )

    def bind_stream(self, doc_stream: DataFrame, output_path: str):
        """Wire the gate into a Structured Streaming query: admitted rows
        append to ``output_path``; returns the StreamingQuery."""

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            admitted = self.admit(batch_df)
            admitted.write.mode("append").parquet(output_path)

        return doc_stream.writeStream.foreachBatch(_each).start()


class StreamingNearDupGate:
    """Incremental NEAR-dup admission via a persistent MinHash-LSH bucket
    store — the approximate counterpart of :class:`StreamingDocDedup`.

    A document is rejected when it shares any LSH band bucket with a
    previously-admitted document (standard LSH admission: P[reject] tracks
    the banding S-curve over Jaccard similarity, tuned by bands x rows).
    Admitted documents append their (band, bucket) keys to the store.

    Scale: the store is hive-partitioned by ``band`` (bands are few and
    uniform) and the per-batch semi-join runs bucket-to-bucket — the batch
    side is tiny, the store side is an equi-join key scan. State is a
    table (MERGE-per-microbatch), restart-safe and queryable like the
    exact gate's fingerprint store."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        bands: int = 4,
        rows_per_band: int = 2,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self.spark = spark
        self.store_path = store_path
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.text_col = text_col
        self.id_col = id_col
        self._fs = TableFS(spark, store_path)

    def seen_buckets(self) -> DataFrame:
        if not self._fs.has_parquet_file(self.store_path):
            return self.spark.createDataFrame(
                [], "band int, bucket string, doc_id long"
            )
        return self.spark.read.parquet(self.store_path)

    def _batch_buckets(self, batch: DataFrame) -> DataFrame:
        from ..operators.dedup import (
            minhash_band_buckets,
            minhash_signatures,
            shingle_rows,
        )

        sig = minhash_signatures(
            shingle_rows(batch, text_col=self.text_col, id_col=self.id_col),
            k=self.bands * self.rows_per_band,
        )
        return minhash_band_buckets(
            sig, bands=self.bands, rows_per_band=self.rows_per_band
        )

    def admit(self, batch: DataFrame) -> DataFrame:
        """Admit documents with no LSH bucket collision against the store or
        against an earlier (lower-id) document of the same batch; append the
        admitted documents' bucket keys. Returns the admitted (doc_id)
        rows with their bucket count (= bands, a sanity column)."""
        buckets = self._batch_buckets(batch).localCheckpoint(eager=True)
        # collide vs store
        store_hit = (
            buckets.join(self.seen_buckets(), ["band", "bucket"], "left_semi")
            .select(self.id_col)
            .distinct()
        )
        # collide within batch: earlier (min) doc per bucket wins
        first_per_bucket = buckets.groupBy("band", "bucket").agg(
            F.min(self.id_col).alias("_first")
        )
        batch_hit = (
            buckets.join(first_per_bucket, ["band", "bucket"])
            .filter(F.col(self.id_col) > F.col("_first"))
            .select(self.id_col)
            .distinct()
        )
        rejected = store_hit.unionByName(batch_hit).distinct()
        admitted = (
            buckets.join(rejected, self.id_col, "left_anti")
            .groupBy(self.id_col)
            .agg(F.count(F.lit(1)).alias("n_buckets"))
            .localCheckpoint(eager=True)
        )
        buckets.join(admitted.select(self.id_col), self.id_col, "left_semi").select(
            "band", "bucket", F.col(self.id_col).alias("doc_id")
        ).repartition("band").write.mode("append").partitionBy("band").parquet(
            self.store_path
        )
        return admitted

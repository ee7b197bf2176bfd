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
md5 (256 buckets); each batch collects its distinct fp_bucket values
(driver-tiny, at most 256 strings) and filters the store read with them, so
the scan carries a real PartitionFilter and lists/scans only the touched
partitions (asserted by tests/test_doc_dedup_stream.py). Each admit appends
one file per touched partition, so both gates expose
``partition_file_counts()`` / ``compact()`` / ``maintenance()``
(TableFS.compact_store — the same fold-to-one-file rewrite ApdbSpark
tables get) to keep the per-partition file count bounded; run
``maintenance()`` on a schedule outside the per-batch hot path.
Fingerprints are uniform by construction: no skew at any corpus size.

Restart/retry safety: fingerprints are persisted before the caller writes
output, and a retried foreachBatch epoch re-emits rows whose stored
keep_doc_id AND admitting epoch match the current batch, while the output
write overwrites its own epoch partition — the store append is
no-duplicate and the output is per-epoch idempotent, so a crash at any
point between the two writes neither loses nor duplicates documents. The
epoch is stored alongside each fingerprint so a LATER genuine re-delivery
of the same doc_id by an at-least-once source (which would match its own
stored keep_doc_id) is distinguished from a true same-epoch retry and
rejected instead of duplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin

from ..fs import TableFS
from ..operators.dedup import normalize_text


def _check_store_schema(spark, fs, path: str, required: list[str], gate: str) -> None:
    """Fail LOUDLY when an existing store predates the pinned schema.

    The pinned-schema read null-fills missing columns, which silently
    corrupts gate semantics instead of erroring: a store without
    ``epoch`` makes every same-epoch retry comparison NULL (retried rows
    dropped — document loss), and a near-dup store without ``bkt_pfx``
    partitioning reads NULL prefixes, so prefix pruning discards the
    ENTIRE bucket history and re-admits every historical near-duplicate
    (review find). Incompatible stores must be rebuilt (or backfilled
    once through admit with the current version) — detecting that here
    turns silent corruption into an actionable error."""
    if not fs.has_parquet_file(path):
        return
    actual = set(spark.read.parquet(path).columns)
    missing = [c for c in required if c not in actual]
    if missing:
        raise ValueError(
            f"{gate} store at {path} predates the current schema "
            f"(missing columns: {missing}); rebuild the store or backfill "
            "it through admit() with this version before binding streams"
        )


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
        _check_store_schema(
            spark, self._fs, store_path,
            ["fp_bucket", "fingerprint", "keep_doc_id", "epoch"],
            "exact-dedup gate",
        )
        self.last_store_scan: DataFrame | None = None

    # Explicit read schema: hive partition-type inference would type
    # fp_bucket as BIGINT whenever every present partition value happens to
    # be all-digit hex (e.g. "90"), breaking the string bucket-pruning
    # filter on the next batch. Pinning the schema keeps it a string.
    _STORE_SCHEMA = "fp_bucket string, fingerprint string, keep_doc_id long, epoch long"

    def seen(self) -> DataFrame:
        """The fingerprint store: (fp_bucket, fingerprint, keep_doc_id,
        epoch) — ``epoch`` is the foreachBatch epoch that admitted the
        fingerprint (-1 for direct/backfill calls)."""
        if not self._fs.has_parquet_file(self.store_path):
            return self.spark.createDataFrame([], self._STORE_SCHEMA)
        return self.spark.read.schema(self._STORE_SCHEMA).parquet(self.store_path)

    def admit(self, batch: DataFrame, epoch_id: int | None = None) -> DataFrame:
        """Admit the unseen documents of one micro-batch.

        1. fingerprint = md5(normalized text); in-batch winner = min doc_id
           per fingerprint (one uniform-key shuffle);
        2. prune the store to the batch's fp_bucket values (collected
           driver-side — at most 256 two-hex-char strings) so the
           hive-partitioned store read lists/scans ONLY the touched
           partitions, then left-join on fingerprint;
        3. admit rows whose fingerprint is absent from the store OR whose
           stored (``keep_doc_id``, ``epoch``) BOTH equal the batch winner
           and the current epoch — that conjunction makes a foreachBatch
           epoch RETRY (fingerprints persisted, output write lost) re-emit
           its rows, while a LATER genuine re-delivery of the same doc_id
           by an at-least-once source fails the epoch check and is rejected
           rather than duplicated across epoch partitions;
        4. append only the genuinely-fresh fingerprints, partitioned by
           fp_bucket (a retry appends nothing — no store duplicates);
        5. return the admitted (winner) rows with their fingerprints.

        Direct/backfill calls (``epoch_id=None``) all share the sentinel
        epoch -1, i.e. a re-run of the same backfill batch is treated as a
        retry and stays idempotent.

        The batch aggregate is pinned (localCheckpoint) before the bucket
        collect so the input is computed once; the admitted plan may re-read
        the store after the append, which is safe precisely because of the
        re-admit rule in step 3."""
        ep = -1 if epoch_id is None else int(epoch_id)
        # null text fingerprints as the EMPTY document: a null md5 would
        # never equi-join the store, so null-text docs were re-admitted
        # on every delivery (unbounded duplication); coalescing makes
        # null and empty docs deduplicate together under the same
        # epoch-retry semantics (found by the garbage-resilience sweep)
        fp = F.md5(
            normalize_text(F.coalesce(F.col(self.text_col), F.lit("")))
        )
        fingered = batch.withColumn("fingerprint", fp).withColumn(
            "fp_bucket", F.substring("fingerprint", 1, 2)
        )
        win = F.min(self.id_col).alias("keep_doc_id")
        winners = (
            fingered.groupBy("fp_bucket", "fingerprint")
            .agg(win, F.count(F.lit(1)).alias("n_copies_in_batch"))
            .transform(pin, eager=True)
        )
        batch_buckets = [
            r.fp_bucket for r in winners.select("fp_bucket").distinct().collect()
        ]
        store = self.seen()
        if batch_buckets:
            store = store.filter(F.col("fp_bucket").isin(batch_buckets))
        self.last_store_scan = store  # plan-assertion handle (tests)
        admitted = (
            winners.join(
                store.select(
                    "fingerprint",
                    F.col("keep_doc_id").alias("_seen_keep"),
                    F.col("epoch").alias("_seen_epoch"),
                ),
                "fingerprint",
                "left",
            )
            .filter(
                F.col("_seen_keep").isNull()
                | (
                    (F.col("_seen_keep") == F.col("keep_doc_id"))
                    & (F.col("_seen_epoch") == F.lit(ep))
                )
            )
            .transform(pin, eager=True)
        )
        admitted.filter(F.col("_seen_keep").isNull()).select(
            "fp_bucket", "fingerprint", F.col("keep_doc_id"), F.lit(ep).alias("epoch")
        ).repartition("fp_bucket").write.mode("append").partitionBy(
            "fp_bucket"
        ).parquet(self.store_path)
        return admitted.select(
            "fingerprint",
            F.col("keep_doc_id").alias(self.id_col),
            "n_copies_in_batch",
        )

    def partition_file_counts(self) -> dict[str, int]:
        """Data files per fp_bucket partition (driver FS metadata only)."""
        return self._fs.partition_file_counts(self.store_path)

    def compact(self) -> None:
        """Fold the fingerprint store to one file per fp_bucket partition
        (rows preserved exactly — admit semantics unchanged)."""
        self._fs.compact_store(
            self.spark,
            self.store_path,
            self._STORE_SCHEMA,
            "fp_bucket",
            sort_cols=["fingerprint"],
        )

    def maintenance(self, max_files_per_partition: int = 8) -> bool:
        """Compact when the worst partition exceeds the file threshold;
        returns True when a compaction ran. The gate-store analog of
        ApdbSpark.maintenance — call it every N batches or on a timer,
        never inside admit()."""
        counts = self.partition_file_counts()
        if counts and max(counts.values()) > max_files_per_partition:
            self.compact()
            return True
        return False

    def bind_stream(
        self,
        doc_stream: DataFrame,
        output_path: str,
        maintain_every: int | None = None,
        max_files_per_partition: int = 8,
    ):
        """Wire the gate into a Structured Streaming query: admitted rows
        land under ``output_path`` partitioned by epoch; returns the
        StreamingQuery.

        Exactly-once output: each epoch OVERWRITES its own partition
        (dynamic partition overwrite), so a retried epoch — which ``admit``
        re-emits in full via the keep_doc_id rule — replaces rather than
        duplicates its previous attempt's rows.

        ``maintain_every=N`` runs :meth:`maintenance` after every N epochs
        (the VisitStreamDriver pattern): each admit appends one file per
        touched fp_bucket, so a long-running gate needs the periodic fold
        or store-read fan-in grows without bound. Compaction happens AFTER
        the epoch's output commits — a crash mid-compaction leaves a
        consistent store (the rewrite is a whole-partition dynamic
        overwrite of identical rows) and the epoch is not retried for it."""
        epochs_seen = 0

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            nonlocal epochs_seen
            admitted = self.admit(batch_df, epoch_id=epoch_id)
            (
                admitted.withColumn("epoch", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(output_path)
            )
            epochs_seen += 1
            if maintain_every and epochs_seen % maintain_every == 0:
                self.maintenance(max_files_per_partition)

        return doc_stream.writeStream.foreachBatch(_each).start()


class StreamingNearDupGate:
    """Incremental NEAR-dup admission via a persistent MinHash-LSH bucket
    store — the approximate counterpart of :class:`StreamingDocDedup`.

    A document is rejected when it shares any LSH band bucket with a
    previously-admitted document (standard LSH admission: P[reject] tracks
    the banding S-curve over Jaccard similarity, tuned by bands x rows).
    Admitted documents append their (band, bucket) keys to the store.

    Scale: the store is hive-partitioned by ``bkt_pfx`` — the first two hex
    chars of the (md5) bucket key, 256 uniform partitions, exactly the
    exact gate's fp_bucket pattern. Each batch collects its distinct
    prefixes (bounded by batch_docs x bands, capped at 256 strings) and
    filters the store read with them, so every micro-batch lists/scans only
    the touched partitions instead of joining the entire bucket history.
    State is a table (MERGE-per-microbatch), restart-safe and queryable
    like the exact gate's fingerprint store."""

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
        _check_store_schema(
            spark, self._fs, store_path,
            ["bkt_pfx", "band", "bucket", "doc_id", "epoch"],
            "near-dup gate",
        )
        self.last_store_scan: DataFrame | None = None

    # bkt_pfx pinned string for the same hive-inference reason as fp_bucket
    _STORE_SCHEMA = "bkt_pfx string, band int, bucket string, doc_id long, epoch long"

    def seen_buckets(self) -> DataFrame:
        if not self._fs.has_parquet_file(self.store_path):
            return self.spark.createDataFrame([], self._STORE_SCHEMA)
        return self.spark.read.schema(self._STORE_SCHEMA).parquet(self.store_path)

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

    def admit(self, batch: DataFrame, epoch_id: int | None = None) -> DataFrame:
        """Admit documents with no LSH bucket collision against the store or
        against an earlier (lower-id) document of the same batch; append the
        admitted documents' bucket keys. Returns the admitted (doc_id)
        rows with their bucket count (= bands, a sanity column).

        A collision with the document's OWN stored buckets from the SAME
        epoch does not reject: that is what a retried foreachBatch epoch
        looks like after a crash between the store append and the caller's
        output write, so the self-exemption makes admit idempotent per
        batch — the retry re-emits the same admitted set instead of
        silently dropping it (the bucket re-append on that path is
        harmless: admission checks are existence joins). An own-bucket row
        from an EARLIER epoch is a real collision — an at-least-once source
        re-delivering the document later — and rejects, so re-delivery is
        not duplicated. Direct calls (``epoch_id=None``) share the sentinel
        epoch -1, keeping backfill re-runs idempotent."""
        ep = -1 if epoch_id is None else int(epoch_id)
        buckets = (
            self._batch_buckets(batch)
            .withColumn("bkt_pfx", F.substring("bucket", 1, 2))
            .transform(pin, eager=True)
        )
        batch_prefixes = [
            r.bkt_pfx for r in buckets.select("bkt_pfx").distinct().collect()
        ]
        store = self.seen_buckets()
        if batch_prefixes:
            store = store.filter(F.col("bkt_pfx").isin(batch_prefixes))
        self.last_store_scan = store  # plan-assertion handle (tests)
        # collide vs store, exempting each document's own same-epoch buckets
        store_hit = (
            store.select(
                "band",
                "bucket",
                F.col("doc_id").alias("_seen_doc"),
                F.col("epoch").alias("_seen_epoch"),
            )
            .join(buckets, ["band", "bucket"])
            .filter(
                (F.col("_seen_doc") != F.col(self.id_col))
                | (F.col("_seen_epoch") != F.lit(ep))
            )
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
            .transform(pin, eager=True)
        )
        fresh = buckets.join(
            admitted.select(self.id_col), self.id_col, "left_semi"
        )
        fresh.select(
            "bkt_pfx", "band", "bucket", F.col(self.id_col).alias("doc_id"),
            F.lit(ep).alias("epoch"),
        ).repartition("bkt_pfx").write.mode("append").partitionBy("bkt_pfx").parquet(
            self.store_path
        )
        return admitted

    def bind_stream(
        self,
        doc_stream: DataFrame,
        output_path: str,
        maintain_every: int | None = None,
        max_files_per_partition: int = 8,
    ):
        """Wire the near-dup gate into a Structured Streaming query —
        the same epoch-partitioned exactly-once output and optional
        periodic store compaction as StreamingDocDedup.bind_stream."""
        epochs_seen = 0

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            nonlocal epochs_seen
            admitted = self.admit(batch_df, epoch_id=epoch_id)
            (
                admitted.withColumn("epoch", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(output_path)
            )
            epochs_seen += 1
            if maintain_every and epochs_seen % maintain_every == 0:
                self.maintenance(max_files_per_partition)

        return doc_stream.writeStream.foreachBatch(_each).start()

    def partition_file_counts(self) -> dict[str, int]:
        """Data files per bkt_pfx partition (driver FS metadata only)."""
        return self._fs.partition_file_counts(self.store_path)

    def compact(self) -> None:
        """Fold the bucket store to one file per bkt_pfx partition (rows
        preserved exactly — admit semantics unchanged)."""
        self._fs.compact_store(
            self.spark,
            self.store_path,
            self._STORE_SCHEMA,
            "bkt_pfx",
            sort_cols=["band", "bucket"],
        )

    def maintenance(self, max_files_per_partition: int = 8) -> bool:
        """Compact when the worst partition exceeds the file threshold;
        returns True when a compaction ran (see StreamingDocDedup.maintenance)."""
        counts = self.partition_file_counts()
        if counts and max(counts.values()) > max_files_per_partition:
            self.compact()
            return True
        return False

"""Continuous aggregate — a persisted time-bucketed rollup maintained
incrementally over an append-only event stream (the TimescaleDB
"hypertable rollup" / materialized-view-maintenance analog, in the
engine's MERGE-per-microbatch house pattern).

Batch analytics answer "aggregate 100 TB of events now"; a serving path
needs the incremental form: per-(time bucket, dimension) partials folded
in as events arrive, queries reading the compact rollup instead of the
raw table. State lives in a hive-partitioned parquet table (not the
streaming checkpoint) — restart-safe, queryable, shared (same rationale
as the funnel/dedup/BM25 stores).

Partials are MERGEABLE aggregates only, so incremental == batch by
algebra, not by luck:

* ``n``          — row count (sum-merge)
* ``n_val``      — non-null value count (sum-merge; the AVG denominator,
  so ``avg_val`` keeps SQL AVG semantics when value_col has NULLs)
* ``sum_val``    — exact DECIMAL(38,6) sum (sum-merge; the registry's
  order-independence contract — bit-identical to a one-pass sum no
  matter how events were batched)
* ``min_val`` / ``max_val`` — min/max-merge
* ``users_hll`` — Apache DataSketches HLL of the user column
  (``hll_sketch_agg`` per batch, ``hll_union_agg`` on merge). Register
  state is max-merged, so the sketch is batching-invariant; the
  ESTIMATE of a merged sketch may differ from a one-pass sketch's
  (merge drops the HIP estimator — DataSketches documented behavior),
  which is why the equivalence test pins n/sum/min/max exactly and the
  HLL to the documented rel. error.

Scale: the store is hive-partitioned by ``bucket_day``; a micro-batch
collects its distinct touched days (driver-tiny literals) and both the
state read and the dynamic-partition overwrite are scoped to them — a
day of history is rewritten only while events for it still arrive, so
with bounded lateness the rewrite cost is bounded regardless of table
age (pair with a watermarked reorder buffer upstream to bound it
hard). Group keys inside a bucket are uniform aggregation keys; the
merge is one map-side-combinable groupBy per batch.

Retry/re-delivery safety: every stored row carries the ``(last_run,
last_epoch)`` that last folded data into its group, committed IN THE
SAME job as the data. ``merge(batch, epoch_id)`` probes each touched
day for ``(last_run, last_epoch) == (run_id, epoch_id)`` and skips the
DAYS that already hold this epoch's fold — per day, not per batch,
because a multi-day dynamic overwrite is not atomic across partitions:
a crash can commit day D1 but not D2, and the retry must re-fold D2
while leaving D1 alone (foreachBatch replays the identical batch for
an epoch, so per-day skip + per-day re-fold reconstructs the exact
intended state). Counts and sums are NOT idempotent under blind
re-merge, which is why the epoch rides in the state (the funnel store
relies on its min-fold fixed point instead; a rollup cannot). The
``run_id`` scopes epochs to one streaming query incarnation: epoch
numbers RESTART at 0 with a fresh checkpointLocation, and without the
scope a restarted stream would false-match old epochs and silently drop
batches. ``bind_stream`` derives the scope from the checkpoint location
per binding, so the two lifetimes coincide by construction; pass an
explicit ``run_id`` only to override that. An ad-hoc merge with no
epoch neither claims nor clobbers a stored (run, epoch) marker — the
caller owns at-most-once delivery there.

Rows with NULL timestamps are dropped (an unbucketable event has no
place in a time rollup); count them upstream if they matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..fs import TableFS

_PARTIALS = ["n", "n_val", "sum_val", "min_val", "max_val", "users_hll"]


class ContinuousAggregate:
    """Maintain per-(time bucket, group keys) mergeable partials.

    ``merge(batch, epoch_id)`` folds one micro-batch into the store;
    ``state()`` reads raw partials; ``finalize()`` produces the served
    metrics (avg from the exact sum, HLL estimate); ``bind_stream``
    wires merge into ``foreachBatch``.

    SINGLE WRITER PER STORE PATH — now ENFORCED fail-fast (r10 advice):
    ``merge`` is a read-modify-write, and two CONCURRENT writers (e.g.
    an ad-hoc merge racing an active stream) could interleave between
    the state read and the dynamic overwrite and silently lose one
    side's fold. Every writer (merge, compact) therefore takes an
    exclusive ``_writer.lock`` intent marker (filesystem create with
    overwrite=false — a check-and-set) for its write window and RAISES
    if another writer holds it; the loser loses loudly, never a fold.
    Serialize writers per store path; ad-hoc backfills go through the
    same stream's foreachBatch or run while it is stopped. A lock left
    by a crashed writer fails subsequent merges until
    ``clear_writer_lock()`` — deliberate: the crashed (run, epoch) may
    have committed a PARTIAL multi-day fold that only its own retry
    repairs, so the operator must re-deliver before resuming.

    ``accept_legacy_epochs=True`` opts into matching pre-upgrade rows
    whose ``last_run`` is NULL on epoch equality alone during the
    retry-skip probe (an upgrade mid-flight then never re-folds an
    already-committed epoch). It is OFF by default because a fresh
    stream incarnation restarting epochs at 0 against such a store
    would false-match a legacy marker and silently drop that day's
    fold — enable it only for the one migration run, or stamp legacy
    rows with a real run id instead."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        bucket_seconds: int,
        group_cols: list[str] | None = None,
        ts_col: str = "ts",
        value_col: str = "value",
        user_col: str = "user_id",
        run_id: str | None = None,
        lg_config_k: int = 12,
        accept_legacy_epochs: bool = False,
    ) -> None:
        if bucket_seconds < 1 or 86_400 % bucket_seconds != 0:
            # the day partition must contain whole buckets, or a bucket's
            # partials would split across partitions and double-serve
            raise ValueError(
                "bucket_seconds must be >= 1 and divide 86400 evenly "
                f"(got {bucket_seconds})"
            )
        self.spark = spark
        self.store_path = store_path
        self.bucket_seconds = int(bucket_seconds)
        self.group_cols = list(group_cols or [])
        self.ts_col = ts_col
        self.value_col = value_col
        self.user_col = user_col
        self._explicit_run = run_id is not None
        self.run_id = run_id if run_id is not None else "run-0"
        self.accept_legacy_epochs = bool(accept_legacy_epochs)
        self.lg_config_k = int(lg_config_k)
        self._fs = TableFS(spark, store_path)
        # exclusive intent marker for the merge's read-modify-write window;
        # underscore prefix keeps it invisible to parquet readers
        self._lock_path = store_path.rstrip("/") + "/_writer.lock"
        gcols = "".join(f"{c} string, " for c in self.group_cols)
        self._schema = (
            "bucket_day date, bucket_start timestamp, "
            + gcols
            + "n long, n_val long, sum_val decimal(38,6), min_val double, "
            + "max_val double, users_hll binary, "
            + "last_run string, last_epoch long"
        )
        self._keys = ["bucket_start", *self.group_cols]
        self.last_state_scan: DataFrame | None = None

    # ------------------------------------------------------------- state
    def _bucket(self, ts):
        w = self.bucket_seconds
        # floor, not cast: cast truncates toward zero and would round
        # pre-1970 (negative-epoch) timestamps into the WRONG (later)
        # bucket and day partition
        return F.timestamp_seconds(F.floor(F.unix_timestamp(ts) / w) * w)

    def state(self) -> DataFrame:
        if not self._fs.has_parquet_file(self.store_path):
            return self.spark.createDataFrame([], self._schema)
        return self.spark.read.schema(self._schema).parquet(self.store_path)

    def _batch_partials(
        self, batch: DataFrame, epoch: int | None, run: str
    ) -> DataFrame:
        from ..operators.sketches import hll_input

        ev = batch.filter(F.col(self.ts_col).isNotNull()).select(
            self._bucket(F.col(self.ts_col)).alias("bucket_start"),
            *[F.col(c).cast("string").alias(c) for c in self.group_cols],
            F.col(self.value_col).cast("decimal(38,6)").alias("_v"),
            F.col(self.value_col).cast("double").alias("_vd"),
            hll_input(batch, self.user_col).alias("_u"),
        )
        return ev.groupBy(*self._keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.count("_vd").alias("n_val"),  # non-null values: the avg denominator
            F.sum("_v").alias("sum_val"),
            F.min("_vd").alias("min_val"),
            F.max("_vd").alias("max_val"),
            F.hll_sketch_agg("_u", F.lit(self.lg_config_k)).alias("users_hll"),
            F.lit(run).alias("last_run"),
            F.lit(epoch).cast("long").alias("last_epoch"),
        )

    # ------------------------------------------------------------- merge
    def merge(
        self,
        batch: DataFrame,
        epoch_id: int | None = None,
        run_id: str | None = None,
    ) -> None:
        """Fold one micro-batch into the rollup (day-scoped MERGE).

        Reads and rewrites ONLY the day partitions the batch touches, and
        of those, only the days NOT already holding this (run, epoch)'s
        fold — the per-day skip that makes retries of a partially-
        committed multi-day overwrite reconstruct the exact intended
        state (module docstring). ``run_id`` overrides the instance scope
        for this call (bind_stream passes its checkpoint-derived scope).

        Legacy compat: rows written before the run column existed read
        back with last_run NULL; ONLY when the instance was constructed
        with ``accept_legacy_epochs=True`` does the probe accept them on
        epoch equality alone (so an upgrade mid-flight does not re-fold
        an already-committed epoch). The default rejects the NULL match
        because a fresh incarnation restarting epochs at 0 would
        false-match a legacy marker and silently drop that day's fold —
        see the class docstring.

        Single-writer enforcement: the merge takes an EXCLUSIVE intent
        marker (``_writer.lock`` under the store path, created with
        overwrite=false — a filesystem-level check-and-set) for the
        read-modify-write window and raises RuntimeError if another
        writer holds it, instead of silently losing a fold to an
        interleaved state-read/overwrite. A lock left behind by a
        CRASHED writer also fails the next merge loudly — the store may
        hold a partial multi-day fold that the crashed (run, epoch)'s
        RETRY must repair first; inspect and :meth:`clear_writer_lock`,
        then re-deliver."""
        run = run_id or self.run_id
        if not self._fs.create_exclusive(
            self._lock_path, f"run={run} epoch={epoch_id}"
        ):
            raise RuntimeError(
                f"concurrent rollup writer: {self._lock_path} is held "
                f"({self._fs.read_text(self._lock_path) or 'no owner info'}). "
                "Serialize writers per store path; if no merge is in "
                "flight a previous writer crashed mid-fold — re-deliver "
                "its batch after clear_writer_lock()."
            )
        try:
            self._merge_locked(batch, epoch_id, run)
        finally:
            self._fs.delete(self._lock_path)

    def _merge_locked(
        self, batch: DataFrame, epoch_id: int | None, run: str
    ) -> None:
        # lazy pin + the touched-days collect as the materializing action:
        # the distinct computes every partition, so ONE job both folds the
        # batch into partials and returns the day list (the iterative-
        # operator probe fold — an eager pin here was a second full pass
        # over the batch aggregation for no extra information)
        partials = self._batch_partials(batch, epoch_id, run).withColumn(
            "bucket_day", F.to_date("bucket_start")
        ).transform(pin, eager=False)
        days = [
            r.d
            for r in partials.select(F.col("bucket_day").alias("d"))
            .distinct()
            .collect()
        ]
        if not days:
            return
        if epoch_id is not None:
            done = {
                r.d
                for r in self.state()
                .filter(F.col("bucket_day").isin(days))
                .filter(
                    (
                        (F.col("last_run") == run)
                        if not self.accept_legacy_epochs
                        else (
                            (F.col("last_run") == run)
                            | F.col("last_run").isNull()
                        )
                    )
                    & (F.col("last_epoch") == epoch_id)
                )
                .select(F.col("bucket_day").alias("d"))
                .distinct()
                .collect()
            }
            days = [d for d in days if d not in done]
            if not days:
                return  # fully committed retry of this (run, epoch)
            partials = partials.filter(F.col("bucket_day").isin(days))
        st = self.state().filter(F.col("bucket_day").isin(days))
        self.last_state_scan = st  # plan-assertion handle (tests)
        both = st.select(partials.columns).withColumn(
            "_src", F.lit(0)
        ).unionByName(partials.withColumn("_src", F.lit(1)))
        # marker rank: an EPOCHED contribution always beats an epoch-less
        # one (an ad-hoc merge must not clobber a stored (run, epoch)
        # marker — the replayed epoch would then re-fold, double counting);
        # among epoched rows the batch side wins, so a touched group takes
        # the new epoch and untouched groups keep theirs
        marker_rank = (
            F.col("last_epoch").isNotNull().cast("int") * 2 + F.col("_src")
        )
        merged = (
            both.groupBy("bucket_day", *self._keys)
            .agg(
                F.sum("n").alias("n"),
                F.sum("n_val").alias("n_val"),
                F.sum("sum_val").alias("sum_val"),
                F.min("min_val").alias("min_val"),
                F.max("max_val").alias("max_val"),
                # tolerate mixed lgConfigK (a restart with a different
                # lg_config_k knob must degrade the estimate, not wedge
                # the stream in a crash-retry loop)
                F.hll_union_agg("users_hll", F.lit(True)).alias("users_hll"),
                F.max_by(F.struct("last_run", "last_epoch"), marker_rank)
                .alias("_re"),
            )
            .select(
                "bucket_day",
                *self._keys,
                *_PARTIALS,
                F.col("_re.last_run").alias("last_run"),
                F.col("_re.last_epoch").alias("last_epoch"),
            )
            # read-before-overwrite: materialize the merged partials
            # BEFORE the dynamic overwrite deletes the partitions the
            # plan reads (the engine-wide partition-rewrite pin)
            .transform(pin, eager=True)
        )
        (
            merged.repartition("bucket_day")
            .select(
                "bucket_day", *self._keys, *_PARTIALS, "last_run", "last_epoch"
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket_day")
            .parquet(self.store_path)
        )

    # ----------------------------------------------------------- queries
    def _finalize_of(self, st: DataFrame) -> DataFrame:
        return st.select(
            "bucket_start",
            *self.group_cols,
            "n",
            F.col("sum_val").cast("double").alias("sum_val"),
            # SQL AVG semantics: sum of non-null values / COUNT of non-null
            # values (NULL when none) — n counts ALL rows and would skew the
            # mean low whenever value_col has NULLs
            F.when(
                F.col("n_val") > 0,
                F.col("sum_val").cast("double") / F.col("n_val"),
            ).alias("avg_val"),
            "min_val",
            "max_val",
            F.round(F.hll_sketch_estimate("users_hll")).cast("long").alias(
                "approx_users"
            ),
        )

    def finalize(self) -> DataFrame:
        """Served metrics per (bucket_start, *group_cols): exact n / sum /
        min / max, avg as the one-division exact-sum mean over NON-NULL
        values (SQL AVG semantics — NULL when the bucket has none), HLL
        user estimate rounded to a long."""
        return self._finalize_of(self.state())

    def downsample(self, bucket_seconds: int) -> DataFrame:
        """Serve a COARSER resolution exactly from the stored partials —
        the multi-resolution cascade (hourly store answers daily/weekly
        queries) with no raw-event re-scan: every partial is mergeable,
        so re-bucketing is one groupBy over the already-compact rollup.
        n / n_val / sum_val / min / max (and therefore avg) are EXACTLY
        what a direct coarse rollup would hold (pinned by test); the HLL
        union is batching-invariant in sketch state, though its ESTIMATE
        can differ from a one-pass coarse sketch's within the documented
        error (module docstring). ``bucket_seconds`` must be a multiple
        of the store's resolution — finer would need the raw events."""
        if bucket_seconds % self.bucket_seconds != 0:
            raise ValueError(
                f"downsample to {bucket_seconds}s needs a multiple of the "
                f"store resolution {self.bucket_seconds}s (finer buckets "
                "would need the raw events)"
            )
        w = int(bucket_seconds)
        b = F.timestamp_seconds(
            F.floor(F.unix_timestamp("bucket_start") / w) * w
        )
        merged = self.state().groupBy(
            b.alias("bucket_start"), *self.group_cols
        ).agg(
            F.sum("n").alias("n"),
            F.sum("n_val").alias("n_val"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
            F.hll_union_agg("users_hll", F.lit(True)).alias("users_hll"),
        )
        return self._finalize_of(merged)

    def serve(self, start, end) -> DataFrame:
        """finalize() restricted to [start, end), with the range ALSO
        applied to the bucket_day PARTITION column (bucket_start derives
        bucket_day, but only an explicit partition-column predicate makes
        the read prune its file listing)."""
        st = self.state().filter(
            (F.col("bucket_day") >= F.to_date(F.lit(start)))
            & (F.col("bucket_day") <= F.to_date(F.lit(end)))
        )
        return self._finalize_of(st).filter(
            (F.col("bucket_start") >= F.lit(start))
            & (F.col("bucket_start") < F.lit(end))
        )

    def partition_file_counts(self) -> dict[str, int]:
        return self._fs.partition_file_counts(self.store_path)

    def compact(self) -> None:
        """Rewrite fragmented partitions — a writer like merge, so it takes
        the same exclusive lock (a compact racing a merge would resurrect
        the pre-merge partition it read)."""
        if not self._fs.create_exclusive(self._lock_path, "compact"):
            raise RuntimeError(
                f"concurrent rollup writer: {self._lock_path} is held "
                f"({self._fs.read_text(self._lock_path) or 'no owner info'})"
            )
        try:
            self._fs.compact_store(
                self.spark, self.store_path, self._schema, "bucket_day"
            )
        finally:
            self._fs.delete(self._lock_path)

    def clear_writer_lock(self) -> bool:
        """Remove a writer lock left by a CRASHED writer (after confirming
        no merge is in flight and re-delivering its batch — see merge).
        Returns False when no lock was present."""
        return self._fs.delete(self._lock_path)

    def bind_stream(self, stream_df: DataFrame, checkpoint_dir: str):
        """Wire merge into foreachBatch (availableNow or continuous).

        Unless the instance was constructed with an explicit ``run_id``,
        the run scope is derived from ``checkpoint_dir`` PER BINDING (a
        closure value, never instance mutation) — the epoch counter and
        the run scope then share a lifetime by construction: a restart
        from the same checkpoint keeps both, a fresh checkpoint resets
        both, and re-binding the same object to a new checkpoint gets a
        new scope. The path is lightly normalized (scheme prefix and
        trailing slashes stripped) so equivalent spellings across
        restarts keep the scope; deleting a checkpoint but reusing its
        path defeats the derivation — pass an explicit run_id then."""
        if self._explicit_run:
            rid = self.run_id
        else:
            import hashlib

            norm = checkpoint_dir.rstrip("/")
            if norm.startswith("file:"):
                norm = norm[len("file:"):]
            norm = norm.lstrip("/")
            rid = "ckpt-" + hashlib.md5(norm.encode()).hexdigest()[:12]

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            self.merge(batch_df, epoch_id, run_id=rid)

        return stream_df.writeStream.foreachBatch(_each).option(
            "checkpointLocation", checkpoint_dir
        )

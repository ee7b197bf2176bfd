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

Retry/re-delivery safety: every stored row carries the ``last_epoch``
that last folded data into its group. ``merge(batch, epoch_id)`` first
probes the touched partitions for ``last_epoch == epoch_id`` — a hit
means a prior attempt of THIS epoch already committed its overwrite
(foreachBatch replays the identical batch for an epoch, so the fold is
already in the partials) and the merge is skipped; counts and sums are
NOT idempotent under blind re-merge, which is exactly why the epoch
rides in the state (the funnel store can rely on its min-fold fixed
point instead; a rollup cannot). Without an epoch (ad-hoc batch use)
the caller owns at-most-once delivery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..fs import TableFS

_PARTIALS = ["n", "sum_val", "min_val", "max_val", "users_hll"]


class ContinuousAggregate:
    """Maintain per-(time bucket, group keys) mergeable partials.

    ``merge(batch, epoch_id)`` folds one micro-batch into the store;
    ``state()`` reads raw partials; ``finalize()`` produces the served
    metrics (avg from the exact sum, HLL estimate); ``bind_stream``
    wires merge into ``foreachBatch``."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        bucket_seconds: int,
        group_cols: list[str] | None = None,
        ts_col: str = "ts",
        value_col: str = "value",
        user_col: str = "user_id",
    ) -> None:
        if bucket_seconds < 1:
            raise ValueError("bucket_seconds must be >= 1")
        if bucket_seconds > 86_400:
            # the day partition must contain whole buckets, or a bucket's
            # partials would split across partitions and double-serve
            raise ValueError("bucket_seconds must divide into days (<= 86400)")
        if 86_400 % bucket_seconds != 0:
            raise ValueError("bucket_seconds must divide 86400 evenly")
        self.spark = spark
        self.store_path = store_path
        self.bucket_seconds = int(bucket_seconds)
        self.group_cols = list(group_cols or [])
        self.ts_col = ts_col
        self.value_col = value_col
        self.user_col = user_col
        self._fs = TableFS(spark, store_path)
        gcols = "".join(f"{c} string, " for c in self.group_cols)
        self._schema = (
            "bucket_day date, bucket_start timestamp, "
            + gcols
            + "n long, sum_val decimal(38,6), min_val double, "
            + "max_val double, users_hll binary, last_epoch long"
        )
        self._keys = ["bucket_start", *self.group_cols]
        self.last_state_scan: DataFrame | None = None

    # ------------------------------------------------------------- state
    def _bucket(self, ts):
        w = self.bucket_seconds
        return F.timestamp_seconds(
            (F.unix_timestamp(ts) / w).cast("long") * w
        )

    def state(self) -> DataFrame:
        if not self._fs.has_parquet_file(self.store_path):
            return self.spark.createDataFrame([], self._schema)
        return self.spark.read.schema(self._schema).parquet(self.store_path)

    def _batch_partials(self, batch: DataFrame, epoch: int | None) -> DataFrame:
        ev = batch.select(
            self._bucket(F.col(self.ts_col)).alias("bucket_start"),
            *[F.col(c).cast("string").alias(c) for c in self.group_cols],
            F.col(self.value_col).cast("decimal(38,6)").alias("_v"),
            F.col(self.value_col).cast("double").alias("_vd"),
            F.col(self.user_col).alias("_u"),
        )
        return ev.groupBy(*self._keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_v").alias("sum_val"),
            F.min("_vd").alias("min_val"),
            F.max("_vd").alias("max_val"),
            F.hll_sketch_agg("_u").alias("users_hll"),
            F.lit(epoch).cast("long").alias("last_epoch"),
        )

    # ------------------------------------------------------------- merge
    def merge(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Fold one micro-batch into the rollup (day-scoped MERGE).

        Reads and rewrites ONLY the day partitions the batch touches;
        same-epoch retries are detected from the stored ``last_epoch``
        and skipped (module docstring)."""
        partials = self._batch_partials(batch, epoch_id).withColumn(
            "bucket_day", F.to_date("bucket_start")
        ).transform(pin, eager=True)
        days = [r.d for r in partials.select(F.col("bucket_day").alias("d")).distinct().collect()]
        if not days:
            return
        st = self.state().filter(F.col("bucket_day").isin(days))
        self.last_state_scan = st  # plan-assertion handle (tests)
        if epoch_id is not None and st.filter(
            F.col("last_epoch") == epoch_id
        ).limit(1).count() > 0:
            return  # committed retry of this epoch — fold already stored
        both = st.select(partials.columns).unionByName(partials)
        merged = (
            both.groupBy("bucket_day", *self._keys)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_val").alias("sum_val"),
                F.min("min_val").alias("min_val"),
                F.max("max_val").alias("max_val"),
                F.hll_union_agg("users_hll").alias("users_hll"),
                # groups untouched by this batch keep their old epoch; a
                # touched group takes the new one (max over {old, new} is
                # correct because foreachBatch epochs are monotone)
                F.max("last_epoch").alias("last_epoch"),
            )
            # read-before-overwrite: materialize the merged partials
            # BEFORE the dynamic overwrite deletes the partitions the
            # plan reads (the engine-wide partition-rewrite pin)
            .transform(pin, eager=True)
        )
        (
            merged.repartition("bucket_day")
            .select("bucket_day", *self._keys, *_PARTIALS, "last_epoch")
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
            (F.col("sum_val").cast("double") / F.col("n")).alias("avg_val"),
            "min_val",
            "max_val",
            F.round(F.hll_sketch_estimate("users_hll")).cast("long").alias(
                "approx_users"
            ),
        )

    def finalize(self) -> DataFrame:
        """Served metrics per (bucket_start, *group_cols): exact n / sum /
        min / max, avg as the one-division exact-sum mean, HLL user
        estimate rounded to a long."""
        return self._finalize_of(self.state())

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
        self._fs.compact_store(
            self.spark, self.store_path, self._schema, "bucket_day"
        )

    def bind_stream(self, stream_df: DataFrame, checkpoint_dir: str):
        """Wire merge into foreachBatch (availableNow or continuous)."""

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            self.merge(batch_df, epoch_id)

        return stream_df.writeStream.foreachBatch(_each).option(
            "checkpointLocation", checkpoint_dir
        )

"""Streaming ordered-funnel maintenance — the incremental form of
``operators/analytics.funnel_times`` (reference analog: the per-visit
running counters of SURVEY.md A1/T3, maintained with the engine's
MERGE-per-microbatch pattern rather than operator state).

State = one row per user holding the sequential stage timestamps
``t0..t{n-1}``. The per-batch merge replays the state AS EVENTS: each
stored ``t_i`` becomes a synthetic (user, t_i, stage_i) event, unioned
with the batch and pushed through the SAME batch operator — so the
incremental path cannot drift from the batch semantics by construction
(state invariant t0 < t1 < ... makes the replay a fixed point).

Exactness contract: per-user IN-ORDER delivery ACROSS batches (any order
within a batch). In-order arrival means an earlier-stage timestamp can
never decrease after later stages were matched, which is exactly what
makes the (t0..tn) tuple sufficient state; out-of-order sources need the
watermarked reorder buffer (streaming/metrics.py) in front. Chronological
micro-batches (every file/rate source) satisfy the contract trivially.

Scale: state is hive-partitioned by ``user_bucket = pmod(hash(user), N)``;
a batch rewrites ONLY the buckets its users touch (driver-computed literal
partition filter -> PartitionFilters prune, same pattern as the dedup
gates and the BM25 index), and the rewrite is a dynamic partition
overwrite — the classic bucket-scoped MERGE of `apdb.store`. Re-merged
batches are idempotent (min-fold fixed point), so foreachBatch epoch
retries are safe. Single writer per store path, like every store here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..fs import TableFS
from ..operators.analytics import funnel_times


class StreamingFunnel:
    """Maintain per-user sequential funnel timestamps across micro-batches.

    ``merge(batch)`` folds one batch into the state store; ``state()``
    reads the store; ``summary()`` returns the same (stage_idx, stage,
    n_users, pct_of_first) frame as the batch ``funnel_conversion``;
    ``bind_stream`` wires merge into ``foreachBatch``."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        stages: list[str],
        user_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
        n_buckets: int = 64,
    ) -> None:
        if len(stages) < 1:
            raise ValueError("stages must be non-empty")
        self.spark = spark
        self.store_path = store_path
        self.stages = list(stages)
        self.user_col = user_col
        self.ts_col = ts_col
        self.type_col = type_col
        self.n_buckets = int(n_buckets)
        self._fs = TableFS(spark, store_path)
        self._tcols = [f"t{i}" for i in range(len(stages))]
        # explicit read schema: partition-type inference must not retype
        # user_bucket (same lesson as the dedup gates' fp_bucket)
        self._schema = "user_bucket int, " + f"{user_col} long, " + ", ".join(
            f"{c} timestamp" for c in self._tcols
        )
        self.last_state_scan: DataFrame | None = None

    # ------------------------------------------------------------- state
    def _bucket(self, col):
        return F.pmod(F.hash(col), F.lit(self.n_buckets)).cast("int")

    def state(self) -> DataFrame:
        if not self._fs.has_parquet_file(self.store_path):
            return self.spark.createDataFrame([], self._schema)
        return self.spark.read.schema(self._schema).parquet(self.store_path)

    def _state_as_events(self, st: DataFrame) -> DataFrame:
        """Replay state rows as synthetic events — one explode, not a
        per-stage union (a union would re-plan the store scan per stage)."""
        pairs = F.array(
            *[
                F.struct(
                    F.col(c).alias("ts"), F.lit(s).alias("etype")
                )
                for c, s in zip(self._tcols, self.stages)
            ]
        )
        return (
            st.select(self.user_col, F.explode(pairs).alias("e"))
            .filter(F.col("e.ts").isNotNull())
            .select(
                self.user_col,
                F.col("e.ts").alias(self.ts_col),
                F.col("e.etype").alias(self.type_col),
            )
        )

    # ------------------------------------------------------------- merge
    def merge(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Fold one micro-batch into the state store (bucket-scoped MERGE).

        Only events whose type is a funnel stage participate; only the
        buckets containing batch users are read and rewritten. Users
        sharing a touched bucket but absent from the batch replay to their
        identical state row (fixed point), so the dynamic overwrite loses
        nothing."""
        ev = (
            batch.select(
                F.col(self.user_col), F.col(self.ts_col), F.col(self.type_col)
            )
            .filter(F.col(self.type_col).isin(self.stages))
            .transform(pin, eager=True)
        )
        buckets = [
            r.b
            for r in ev.select(self._bucket(F.col(self.user_col)).alias("b"))
            .distinct()
            .collect()
        ]
        if not buckets:
            return
        st = self.state().filter(F.col("user_bucket").isin(buckets))
        self.last_state_scan = st  # plan-assertion handle (tests)
        events = ev.unionByName(self._state_as_events(st))
        new_state = (
            funnel_times(
                events, self.stages, self.user_col, self.ts_col, self.type_col
            )
            .withColumn("user_bucket", self._bucket(F.col(self.user_col)))
            # read-before-overwrite: materialize the merged state BEFORE
            # the dynamic overwrite deletes the partitions it was computed
            # from (same pin as apdb's partition rewrites); bounded by the
            # touched buckets
            .transform(pin, eager=True)
        )
        (
            new_state.repartition("user_bucket")
            .select("user_bucket", self.user_col, *self._tcols)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("user_bucket")
            .parquet(self.store_path)
        )

    # ----------------------------------------------------------- queries
    def summary(self) -> DataFrame:
        """Same output contract as the batch ``funnel_conversion``:
        (stage_idx int, stage string, n_users long, pct_of_first double)."""
        st = self.state()
        counts = st.agg(
            *[F.count(c).alias(f"c{i}") for i, c in enumerate(self._tcols)]
        )
        rows = F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("stage_idx"),
                    F.lit(s).alias("stage"),
                    F.col(f"c{i}").alias("n_users"),
                )
                for i, s in enumerate(self.stages)
            ]
        )
        return counts.select(F.explode(rows).alias("r"), F.col("c0")).select(
            F.col("r.stage_idx").alias("stage_idx"),
            F.col("r.stage").alias("stage"),
            F.col("r.n_users").alias("n_users"),
            # same c0=0 guard as the batch operator (empty store)
            F.when(
                F.col("c0") > 0, F.round(F.col("r.n_users") / F.col("c0"), 6)
            ).alias("pct_of_first"),
        )

    def bind_stream(self, stream_df: DataFrame, checkpoint_dir: str):
        """Wire merge into foreachBatch (availableNow or continuous)."""

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            self.merge(batch_df, epoch_id)

        return (
            stream_df.writeStream.foreachBatch(_each)
            .option("checkpointLocation", checkpoint_dir)
        )

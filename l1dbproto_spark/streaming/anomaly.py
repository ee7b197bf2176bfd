"""Streaming rolling-anomaly scoring — the incremental form of
``operators/analytics.rolling_zscore`` (per-key z-score against the
previous N values), maintained with the engine's MERGE-per-microbatch
pattern like streaming/funnel.py.

State holds TWO generations per key, bounded at 2N rows: the N most
recent rows from epochs before the last merge (the context the last
batch was scored against) and the N most recent rows overall (the
context the NEXT batch needs). That two-generation retention is what
makes a foreachBatch EPOCH RETRY exact: the retry drops the failed
epoch's rows and recomputes from the identical pre-epoch context, so it
re-emits bit-identical scores no matter how large the batch was —
single-generation state cannot do this once a batch is deeper than N
(the pre-batch context gets evicted). Rows re-delivered from an EARLIER
epoch (at-least-once sources) re-emit their STORED scores while still
retained; re-delivery deeper than the retained window is out of contract.

Scoring itself replays the pre-epoch context THROUGH THE SAME batch
operator over (context ∪ fresh rows), so incremental scores equal the
batch operator's over the full history under the per-key in-order
delivery contract (as in StreamingFunnel).

Scale: state is hive-partitioned by key bucket with driver-literal
partition pruning; each merge rewrites only touched buckets (dynamic
overwrite, pinned before the write). Epoch ids must increase
monotonically (foreachBatch provides them); direct calls may omit the
epoch and pay a full-state max-epoch scan — fine for backfills, not for
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..fs import TableFS
from ..operators.analytics import rolling_zscore


class StreamingAnomalyScorer:
    """Score each micro-batch's rows against their rolling per-key history.

    ``score(batch, epoch_id)`` merges the batch into the state store and
    returns the batch rows with (zscore, is_anomaly); ``bind_stream``
    wires it into ``foreachBatch`` with an output sink callback."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        key_col: str = "user_id",
        ts_col: str = "ts",
        id_col: str = "event_id",
        val_col: str = "value",
        n_prev: int = 10,
        min_n: int = 5,
        z_thresh: float = 2.0,
        n_buckets: int = 64,
    ) -> None:
        self.spark = spark
        self.store_path = store_path
        self.key_col = key_col
        self.ts_col = ts_col
        self.id_col = id_col
        self.val_col = val_col
        self.n_prev = int(n_prev)
        self.min_n = int(min_n)
        self.z_thresh = float(z_thresh)
        self.n_buckets = int(n_buckets)
        self._fs = TableFS(spark, store_path)
        self._schema = (
            f"key_bucket int, {key_col} long, {ts_col} timestamp, "
            f"{id_col} long, {val_col} double, zscore double, "
            f"is_anomaly boolean, epoch long"
        )
        self.last_state_scan: DataFrame | None = None

    def _bucket(self, col):
        return F.pmod(F.hash(col), F.lit(self.n_buckets)).cast("int")

    def state(self) -> DataFrame:
        if not self._fs.has_parquet_file(self.store_path):
            return self.spark.createDataFrame([], self._schema)
        return self.spark.read.schema(self._schema).parquet(self.store_path)

    def _top_n(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy(self.key_col).orderBy(
            F.col(self.ts_col).desc(), F.col(self.id_col).desc()
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= self.n_prev)
            .drop("_rn")
        )

    def score(self, batch: DataFrame, epoch_id: int | None = None) -> DataFrame:
        """Merge one micro-batch at ``epoch_id``; return its rows scored
        against the rolling history. Same epoch re-run (retry) -> identical
        output; earlier-epoch row re-delivery -> stored scores re-emitted."""
        vcols = [self.key_col, self.ts_col, self.id_col, self.val_col]
        ocols = vcols + ["zscore", "is_anomaly"]
        if epoch_id is None:
            row = self.state().agg(F.max("epoch").alias("m")).collect()[0]
            epoch_id = 0 if row.m is None else int(row.m) + 1
        e = int(epoch_id)
        ev = (
            batch.select(*[F.col(c) for c in vcols])
            # intra-batch duplicate ids would double-count in the rolling
            # window (same class of bug as the r8 BM25 intra-batch tf find)
            .dropDuplicates([self.key_col, self.id_col])
            .transform(pin, eager=True)
        )
        buckets = [
            r.b
            for r in ev.select(self._bucket(F.col(self.key_col)).alias("b"))
            .distinct()
            .collect()
        ]
        if not buckets:
            return ev.withColumn("zscore", F.lit(None).cast("double")).withColumn(
                "is_anomaly", F.lit(None).cast("boolean")
            )
        st = (
            self.state()
            .filter(F.col("key_bucket").isin(buckets))
            .transform(pin, eager=True)
        )
        self.last_state_scan = st
        # rows of epoch >= e are a failed run of THIS epoch: drop them so
        # the retry recomputes from the pre-epoch context
        prev = st.filter(F.col("epoch") < e)
        prev_top = self._top_n(prev)
        keys = [self.key_col, self.id_col]
        # earlier-epoch re-deliveries re-emit their stored scores verbatim
        replay = prev.join(ev.select(*keys), keys, "left_semi").select(*ocols)
        fresh = ev.join(prev, keys, "left_anti")
        ctx = prev_top.select(*vcols).unionByName(fresh).transform(pin, eager=True)
        fresh_scored = (
            rolling_zscore(
                ctx,
                self.key_col,
                self.ts_col,
                self.id_col,
                self.val_col,
                self.n_prev,
                self.min_n,
                self.z_thresh,
            )
            .join(fresh.select(*keys), keys, "left_semi")
            .transform(pin, eager=True)
        )
        # two-generation retention: top-N of the pre-epoch rows (retry
        # context for THIS epoch) ∪ top-N overall (context for the next);
        # bounded at 2N rows per key forever
        gen_prev = prev_top.select(*ocols, "epoch")
        gen_all = self._top_n(
            gen_prev.unionByName(
                fresh_scored.select(*ocols).withColumn("epoch", F.lit(e).cast("long"))
            )
        )
        new_state = (
            gen_prev.unionByName(gen_all)
            .dropDuplicates(keys)
            .withColumn("key_bucket", self._bucket(F.col(self.key_col)))
            .select("key_bucket", *ocols, "epoch")
            # read-before-overwrite, as in StreamingFunnel.merge
            .transform(pin, eager=True)
        )
        (
            new_state.repartition("key_bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("key_bucket")
            .parquet(self.store_path)
        )
        return fresh_scored.select(*ocols).unionByName(replay)

    def bind_stream(self, stream_df: DataFrame, checkpoint_dir: str, sink):
        """foreachBatch binding: ``sink(scored_df, epoch_id)`` receives each
        batch's scored rows (e.g. to append to an alerts table)."""

        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            sink(self.score(batch_df, epoch_id), epoch_id)

        return (
            stream_df.writeStream.foreachBatch(_each)
            .option("checkpointLocation", checkpoint_dir)
        )

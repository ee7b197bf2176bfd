"""Streaming exact weighted reservoir — the stream form of
``operators.sampling.weighted_topk_sample``: maintain an EXACT
Efraimidis-Spirakis weighted sample of size k (per group) over an
append-only document stream. At any point the stored sample equals the
batch operator run over every document seen so far — not approximately,
EQUAL (pinned by test): min-k over deterministic race keys is an
associative, commutative, idempotent fold, so merge order, batching, and
re-delivery cannot change the result.

That last property is the interesting one: like the funnel store's
min-fold (streaming/funnel.py) and unlike the rollup's counts, this gate
needs NO epoch markers — a replayed foreachBatch epoch or a plain
at-least-once re-delivery contributes rows whose (salt, id)-deterministic
keys are already in (or already lost to) the sample, and duplicates are
collapsed by id before ranking. Exactly-once falls out of the algebra.

State is k rows per group (the SAMPLE, plus each row's race key), read
and fully rewritten per merge — driver-tiny by construction, so there is
no partition scoping, no compaction, and the read-pin-overwrite cycle
costs one small job. The batch side computes its local top-k with the
two-phase window before touching the store, so a giant micro-batch never
sorts a group in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..fs import TableFS
from ..operators.sampling import weighted_topk_sample


class StreamingWeightedSample:
    """Maintain the exact E-S top-k sample per group across micro-batches.

    ``payload_cols`` are carried alongside (id, group, weight) into the
    stored sample — the sampled DOCUMENTS, not just their ids. ``merge``
    folds one batch; ``sample()`` reads the current sample (sample_rank
    1..k per group); ``bind_stream`` wires foreachBatch."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        k: int,
        weight_col: str,
        group_col: str | None = None,
        payload_cols: list[str] | None = None,
        salt: str = "wtopk-v1",
        id_col: str = "doc_id",
    ) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.spark = spark
        self.store_path = store_path
        self.k = int(k)
        self.weight_col = weight_col
        self.group_col = group_col
        self.payload_cols = list(payload_cols or [])
        self.salt = salt
        self.id_col = id_col
        self._fs = TableFS(spark, store_path)
        self._cols = (
            [id_col]
            + ([group_col] if group_col else [])
            + [weight_col]
            + self.payload_cols
        )

    def state(self) -> DataFrame:
        if not self._fs.has_parquet_file(self.store_path):
            return None
        return self.spark.read.parquet(self.store_path).drop(
            "sample_key", "sample_rank"
        )

    def merge(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Fold one micro-batch: sample = top-k(stored sample ∪ batch).

        The fold is the operator itself over the union — batch/stream
        can never drift because there is exactly one implementation.
        Duplicate ids (replays, at-least-once) collapse before ranking:
        a deterministic key makes duplicates EXACT duplicates, and one
        document must not occupy two sample slots."""
        inc = batch.select(*self._cols).transform(pin, eager=True)
        st = self.state()
        pool = inc if st is None else inc.unionByName(st)
        dedup_keys = [self.id_col] + ([self.group_col] if self.group_col else [])
        merged = weighted_topk_sample(
            pool.dropDuplicates(dedup_keys),
            self.k,
            self.weight_col,
            self.group_col,
            self.salt,
            self.id_col,
        ).transform(pin, eager=True)  # read-before-overwrite (house rule)
        merged.write.mode("overwrite").parquet(self.store_path)

    def sample(self) -> DataFrame:
        """The current sample: payload + sample_rank (1..k per group)."""
        return self.spark.read.parquet(self.store_path)

    def bind_stream(self, doc_stream: DataFrame, checkpoint_dir: str):
        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            self.merge(batch_df, epoch_id)

        return (
            doc_stream.writeStream.foreachBatch(_each)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

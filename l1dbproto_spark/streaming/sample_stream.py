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

State is k rows per group (the SAMPLE, plus each row's race key),
driver-tiny by construction — so there is no partition scoping and no
compaction — and it is stored CRASH-SAFE under a versioned layout
(r11 review find: a plain whole-store overwrite has a delete-then-write
window where a crash loses ALL accumulated state, and the retry would
silently re-seed from one batch): each merge writes a fresh ``v=<n>``
directory and the CURRENT sample is the highest version whose Spark
``_SUCCESS`` marker exists — the job commit itself is the atomic flip,
no pointer file with its own truncation window. A crash mid-write
leaves a marker-less directory the next merge overwrites; a crash
during the best-effort GC of superseded versions leaves partial LOWER
versions that the max-complete rule never selects. The
batch side computes its local top-k with the two-phase window before
touching the store, so a giant micro-batch never sorts a group in one
task.
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

    # ------------------------------------------------ versioned layout
    def _version_dir(self, v: str) -> str:
        return self.store_path.rstrip("/") + "/" + v

    def _version_nums(self) -> list[int]:
        return sorted(
            int(n[2:])
            for n in self._fs.list_names(self.store_path)
            if n.startswith("v=") and n[2:].isdigit()
        )

    def _current_version(self) -> str | None:
        """Highest version directory whose _SUCCESS marker exists — the
        job commit IS the atomic flip (module docstring)."""
        complete = [
            n
            for n in self._version_nums()
            if self._fs.exists(self._version_dir(f"v={n}") + "/_SUCCESS")
        ]
        return f"v={complete[-1]}" if complete else None

    def state(self) -> DataFrame:
        v = self._current_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._version_dir(v)).drop(
            "sample_key", "sample_rank"
        )

    def merge(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Fold one micro-batch: sample = top-k(stored sample ∪ batch).

        The fold is the operator itself over the union — batch/stream
        can never drift because there is exactly one implementation.
        Duplicate ids (replays, at-least-once) collapse before ranking:
        a deterministic key makes duplicates EXACT duplicates, and one
        document must not occupy two sample slots.

        Crash safety (module docstring): the fold lands in a NEW version
        directory; its _SUCCESS marker is the commit. A crash anywhere
        before that leaves the prior sample untouched for the retry."""
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
        )
        nums = self._version_nums()
        # next number past EVERY existing dir (complete or crashed — a
        # crashed partial with the same number would be overwritten
        # anyway, but never reuse a COMPLETE one: its readers may be live)
        nxt = f"v={nums[-1] + 1 if nums else 0}"
        merged.write.mode("overwrite").parquet(self._version_dir(nxt))
        # best-effort GC of superseded versions — the max-complete rule
        # never selects them, so a crash mid-delete is harmless
        for n in self._version_nums():
            if f"v={n}" != nxt:
                self._fs.delete(self._version_dir(f"v={n}"))

    def sample(self) -> DataFrame:
        """The current sample: payload + sample_rank (1..k per group)."""
        v = self._current_version()
        if v is None:
            raise FileNotFoundError(
                f"no committed sample at {self.store_path} "
                "(no complete version)"
            )
        return self.spark.read.parquet(self._version_dir(v))

    def bind_stream(self, doc_stream: DataFrame, checkpoint_dir: str):
        def _each(batch_df: DataFrame, epoch_id: int) -> None:
            self.merge(batch_df, epoch_id)

        return (
            doc_stream.writeStream.foreachBatch(_each)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

"""Structured Streaming visit loop — the T1-T5 surface.

The reference's visit loop is an unbounded micro-batch sequence: one visit
every 45 s with a day/night duty cycle (``ap_proto.py:66-81,294-295``),
per-key state evolving via read-modify-write (``_executors.py:315-325``),
checkpoint recovery (``visit_info.py:56-97``).

Spark mapping: a rate source ticks the cadence; ``foreachBatch`` runs the
same per-visit DAG as the batch pipeline (the T3 pattern — stateful MERGE per
micro-batch rather than operator state, the scale-preferred form per
SURVEY.md §7.3); the visits table doubles as the recovery checkpoint.
Day/night gating is a filter on the batch timestamp (P8).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

from ..apdb import ApdbSpark
from ..plans.region import Circle
from ..workload.dia import DiaConfig, detect_sources
from ..workload.visit_pipeline import VisitConfig, process_visit


def night_gated(visit_time: datetime.datetime) -> bool:
    """Visits only outside 06:00-20:00 (``ap_proto.py:66-68``)."""
    return not (6 <= visit_time.hour < 20)


class VisitStreamDriver:
    """Drives visits from a micro-batch source. Each micro-batch processes
    one visit through the full pipeline and advances the checkpoint — restart
    resumes from the visits table exactly like the reference
    (``ap_proto.py:258-265``)."""

    # visit budget for bounded runs (run_stream): class-level default so
    # partially-constructed instances (tests) behave as "unbounded"
    _stop_after: int | None = None

    def __init__(
        self,
        spark: SparkSession,
        apdb: ApdbSpark,
        var_catalog: DataFrame,
        pointing: Circle,
        dia_cfg: DiaConfig | None = None,
        visit_cfg: VisitConfig | None = None,
        start_time: datetime.datetime | None = None,
        interval_s: int = 45,
        gate_day_night: bool = False,
        maintain_every: int | None = None,
        maintain_max_files: int = 8,
    ) -> None:
        self.spark = spark
        self.apdb = apdb
        self.var_catalog = var_catalog
        self.pointing = pointing
        self.dia_cfg = dia_cfg or DiaConfig()
        self.visit_cfg = visit_cfg or VisitConfig()
        self.interval_s = interval_s
        self.gate_day_night = gate_day_night
        # periodic small-file maintenance: compact when the worst partition
        # exceeds maintain_max_files, checked every maintain_every visits.
        # In production this is a separate scheduled job; inline here it
        # bounds the file-count growth that would otherwise slowly raise
        # per-visit read latency (PERFORMANCE.md "sustained drift").
        self.maintain_every = maintain_every
        self.maintain_max_files = maintain_max_files
        last = apdb.last_visit()
        self.next_visit_id = (last["visitId"] + 1) if last else 1
        self.last_object_id = last["lastObjectId"] if last else 0
        self.start_time = (
            last["visitTime"] + datetime.timedelta(seconds=interval_s)
            if last
            else (start_time or datetime.datetime(2026, 1, 1, 0, 0, 0))
        )
        self.counts: list = []
        # wall-clock tick counter: advances on EVERY micro-batch (gated or
        # not) so day/night gating cannot livelock — a stream started inside
        # the 06:00-20:00 day window steps time forward until night, like the
        # reference loop which advances time regardless of gating.
        self.ticks = 0

    def _process_one(self, visit_id: int, visit_time: datetime.datetime) -> None:
        detections, self.last_object_id = detect_sources(
            self.spark,
            self.var_catalog,
            self.pointing,
            self.dia_cfg,
            visit_seed=visit_id,
            last_object_id=self.last_object_id,
        )
        c = process_visit(
            self.apdb,
            visit_id,
            visit_time,
            detections.select("diaObjectId", "ra", "dec"),
            self.pointing,
            self.visit_cfg,
        )
        self.apdb.save_visit(visit_id, visit_time, self.last_object_id)
        self.counts.append((visit_id, c))

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch hook: each non-empty micro-batch = one visit.

        Maintenance runs AFTER the visit completes (store + visit marker
        committed), off the visit critical path: a visit must land inside
        the 45 s budget, while the compaction consumes the idle gap
        before the next trigger — the gap a fixed-cadence stream has by
        construction. Inline (pre-r11) it rode inside the measured visit,
        and the compaction event grows with store size while the budget
        does not (r10 verdict: the worst bench visit was the inline
        DiaObject compaction). Running it synchronously between visits —
        not on a background thread — keeps the single-writer story: a
        compaction's partition overwrite can never race the next visit's
        appends into the same table."""
        if batch_df.isEmpty():
            return
        if self._stop_after is not None and len(self.counts) >= self._stop_after:
            return
        visit_time = self.start_time + datetime.timedelta(
            seconds=self.interval_s * self.ticks
        )
        self.ticks += 1
        if self.gate_day_night and not night_gated(visit_time):
            return
        visit_id = self.next_visit_id
        self._process_one(visit_id, visit_time)
        self.next_visit_id += 1
        if self.maintain_every and visit_id % self.maintain_every == 0:
            self.apdb.maintenance(self.maintain_max_files)

    def run_stream(self, n_visits: int, trigger_seconds: float = 0.0):
        """Run ``n_visits`` micro-batches through a rate source. Synchronous:
        returns after the visits are processed (tests/demo); production
        would leave the query running at Trigger.ProcessingTime('45 seconds').

        The default trigger is 0 (run micro-batches back-to-back): a fixed
        sub-batch-time interval only produces a "Current batch is falling
        behind" warning per batch without changing throughput, so bounded
        runs pace themselves by batch duration alone."""
        self._stop_after = n_visits
        stream = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(self.foreach_batch)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start()
        )
        import time

        deadline = time.time() + max(60.0, n_visits * 30.0)
        try:
            while len(self.counts) < n_visits and time.time() < deadline:
                time.sleep(0.2)
        finally:
            q.stop()
        return self.counts

    def run_batch(self, n_visits: int):
        """The same loop driven directly (the reference's default mode).
        Maintenance runs between visits here too — same off-critical-path
        placement as foreach_batch."""
        for _ in range(n_visits):
            visit_time = self.start_time + datetime.timedelta(
                seconds=self.interval_s * self.ticks
            )
            self.ticks += 1
            visit_id = self.next_visit_id
            self._process_one(visit_id, visit_time)
            self.next_visit_id += 1
            if self.maintain_every and visit_id % self.maintain_every == 0:
                self.apdb.maintenance(self.maintain_max_files)
        return self.counts

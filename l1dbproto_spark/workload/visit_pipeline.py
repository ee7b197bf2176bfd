"""The per-visit AP pipeline — the reference's ``InMemoryExecutor.visit``
(``_executors.py:126-238``) as one Spark DAG per visit.

Sequence (SURVEY.md §3.1 step 7):
  a. pad region (F5, ``_executors.py:172-173``);
  b. Q1 read: latest objects in region (S5) + exact refine (P3);
  c. source-object match + nDiaSources increment (J2,
     ``_executors.py:315-323``);
  d. DiaSource build with deterministic ids (P5 + W3,
     ``_executors.py:409-428``);
  e. forced-photometry eligibility + build (P4/P6,
     ``_executors.py:353-371``);
  f. duty-cycled history reads Q2/Q3 (T4, ``_executors.py:162-164,205-217``);
  g. store (S7, ``_executors.py:227-238``).

The reference's fork/MPI tile fan-out (X1-X3) is deleted: Spark tasks
parallelize the same DAG by partition.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..checkpoint import ctx_submit, pin

from ..apdb import ApdbSpark
from ..functions.timeutil import python_datetime_to_mjd
from ..plans.region import Circle


@dataclass
class VisitConfig:
    detector_region_padding_arcsec: float = 52.0  # config.py:37
    forced_cutoff_days: float = 30.0  # config.py:50-53
    n_detectors: int = 189  # LSST focal plane
    src_read_duty_cycle: float = 1.0  # config.py:79-86
    src_read_period: int = 1000


@dataclass
class VisitCounts:
    """read/store counts per visit (``metrics.md:15-19``)."""

    objects_read: int = 0
    sources_read: int = 0
    forced_read: int = 0
    objects_stored: int = 0
    transients_stored: int = 0
    sources_stored: int = 0
    forced_stored: int = 0
    extra: dict = field(default_factory=dict)


def process_visit(
    apdb: ApdbSpark,
    visit_id: int,
    visit_time: datetime.datetime,
    detections: DataFrame,
    region: Circle,
    cfg: VisitConfig | None = None,
    detector: int = 0,
) -> VisitCounts:
    """Run one visit; ``detections`` has columns
    (diaObjectId, ra, dec[, detector])."""
    cfg = cfg or VisitConfig()
    counts = VisitCounts()
    padded = region.dilated(cfg.detector_region_padding_arcsec)
    mjd = python_datetime_to_mjd(visit_time)

    from concurrent.futures import ThreadPoolExecutor

    # --- Q1: latest objects in padded region, exact-refined (b)
    # (A2 note: df.observe would piggyback this count on the checkpoint
    # materialization, but localCheckpoint does not complete observations —
    # the explicit count on the pruned read is one small job, overlapped
    # with the match-checkpoint job below: both only READ the pre-store
    # DiaObjectLast, so they are safe to run concurrently.)
    known = apdb.get_dia_objects(padded).select(
        "diaObjectId", "nDiaSources", "lastNonForcedSource"
    )
    with ThreadPoolExecutor(max_workers=1) as ex:
        f_objects_read = ctx_submit(ex, known.count)

        # --- match + increment (c): left join with default 0 then +1
        if "detector" not in detections.columns:
            detections = detections.withColumn("detector", F.lit(detector))
        matched = detections.join(F.broadcast(known), "diaObjectId", "left").select(
            "diaObjectId",
            "ra",
            "dec",
            "detector",
            (F.coalesce(F.col("nDiaSources"), F.lit(0)) + F.lit(1)).alias(
                "nDiaSources"
            ),
        )
        objects = matched.withColumn(
            "lastNonForcedSource", F.lit(visit_time).cast("timestamp")
        )
        # Pin the matched catalog NOW: its plan scans DiaObjectLast, which
        # store() will overwrite — the overwrite invalidates caches on that
        # path (refreshByPath), and a lazy re-evaluation would then see
        # post-store state (transients self-matching to nDiaSources=2).
        # localCheckpoint truncates the lineage so every downstream consumer
        # (sources, forced, counts) sees the pre-store snapshot.
        objects = objects.transform(pin, eager=True)
        counts.objects_read = f_objects_read.result()

    # --- DiaSource build (d): id = (visit*n_det + detector)*1e6 + 1..n
    w = Window.partitionBy("detector").orderBy("diaObjectId")
    sources = objects.select(
        (
            (
                F.lit(visit_id).cast("long") * cfg.n_detectors
                + F.col("detector").cast("long")
            )
            * F.lit(1_000_000)
            + F.row_number().over(w)
        ).alias("diaSourceId"),
        "diaObjectId",
        F.lit(visit_id).alias("visit"),
        F.col("detector"),
        F.lit(0).cast("long").alias("parentDiaSourceId"),
        F.lit(1.0).alias("psFlux"),
        F.lit(0.01).alias("psFluxErr"),
        F.lit(mjd).alias("midpointMjdTai"),
        "ra",
        "dec",
    )

    # --- forced photometry (e): nDiaSources > 1 AND recent detection
    cutoff = visit_time - datetime.timedelta(days=cfg.forced_cutoff_days)
    forced = (
        objects.filter(
            (F.col("nDiaSources") > 1)
            & (F.col("lastNonForcedSource") > F.lit(cutoff).cast("timestamp"))
        )
        .select(
            "diaObjectId",
            "ra",
            "dec",
            F.lit(visit_id).alias("visit"),
            F.col("detector"),
            F.lit(mjd).alias("midpointMjdTai"),
        )
    )

    # --- duty-cycled history reads (f): _executors.py:162-164
    # The history DataFrames are BUILT here, before store() — file-based
    # scans snapshot their file listing at construction (InMemoryFileIndex),
    # so the frames can never observe this visit's appends — but their
    # count JOBS run concurrently WITH the store below: the reads are
    # pre-store snapshots either way, and overlapping them takes the whole
    # history phase off the visit critical path (r14 optimization; pinned
    # by test_apdb.py::test_history_counts_exclude_inflight_visit).
    phase = visit_id % cfg.src_read_period
    history_frames = None
    if phase < cfg.src_read_period * cfg.src_read_duty_cycle:
        ids = objects.select("diaObjectId")
        history_frames = (
            apdb.get_dia_sources(padded, ids, visit_time),
            apdb.get_dia_forced_sources(padded, ids, visit_time),
        )

    # --- store (g); the metrics aggregate and the history counts read only
    # pre-store snapshots (pinned objects / pre-listed files), so they
    # overlap the store writes
    metrics = objects.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("diaObjectId") >= 1_000_000_000).alias("trans"),
        F.count_if(
            (F.col("nDiaSources") > 1)
            & (F.col("lastNonForcedSource") > F.lit(cutoff).cast("timestamp"))
        ).alias("forced"),
    )
    with ThreadPoolExecutor(max_workers=3) as ex:
        f_metrics = ctx_submit(ex, metrics.collect)
        if history_frames is not None:
            if apdb.has_pending_intent(visit_time):
                # crash-restore path: store() will SCRUB this visit's
                # prior partial rows by rewriting DiaSource/DiaForcedSource
                # partitions — files the history frames' snapshotted
                # listing still references. Run the counts to completion
                # BEFORE the store so the scrub cannot yank files out from
                # under them (r14 advice item 1); the overlap stays on the
                # clean path, which is every visit but a crash replay.
                counts.sources_read = history_frames[0].count()
                counts.forced_read = history_frames[1].count()
                history_frames = None
            else:
                f_src = ctx_submit(ex, history_frames[0].count)
                f_forced = ctx_submit(ex, history_frames[1].count)
        apdb.store(visit_time, objects, sources, forced)
        if history_frames is not None:
            counts.sources_read = f_src.result()
            counts.forced_read = f_forced.result()
        row = f_metrics.result()[0]
    counts.objects_stored = row["n"]
    counts.transients_stored = row["trans"]
    counts.sources_stored = counts.objects_stored
    counts.forced_stored = row["forced"]
    return counts

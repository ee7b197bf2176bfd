"""Auto-maintenance (ApdbSpark.maintenance): file-count policy triggers
compaction, data survives byte-identically, reads stay correct."""

from __future__ import annotations

import datetime

from l1dbproto_spark.apdb import ApdbSpark
from l1dbproto_spark.plans.region import Circle
from l1dbproto_spark.workload.dia import DiaConfig, detect_sources
from l1dbproto_spark.workload.generators import rand_cone_xyz
from l1dbproto_spark.workload.visit_pipeline import process_visit


def test_maintenance_compacts_and_preserves_data(spark, tmp_path):
    pointing = Circle(40.0, -30.0, 1.76)
    db = ApdbSpark(spark, str(tmp_path / "apdb"))
    db.make_schema(drop=True)
    cat = rand_cone_xyz(
        spark, 2000, pointing.ra, pointing.dec, pointing.radius_deg, seed=5
    ).cache()
    cat.count()
    cfg = DiaConfig(false_per_visit=200, transient_per_visit=20)
    t0 = datetime.datetime(2026, 1, 1, 3, 0)
    last_obj = 0
    for v in range(1, 7):
        det, last_obj = detect_sources(
            spark, cat, pointing, cfg, visit_seed=40 + v, last_object_id=last_obj
        )
        process_visit(
            db, v, t0 + datetime.timedelta(seconds=45 * v),
            det.select("diaObjectId", "ra", "dec"), pointing,
        )
    cat.unpersist()

    before_counts = db.partition_file_counts("DiaObject")
    assert max(before_counts.values()) >= 6  # one file per visit per bucket
    before_rows = db._read("DiaObject").count()
    before_src = db._read("DiaSource").count()

    # threshold above worst -> no-op
    assert db.maintenance(max_files_per_partition=100) == []
    # offline form (no stagger cap): compacts every eligible table at once
    done = db.maintenance(max_files_per_partition=2, max_tables_per_tick=None)
    assert "DiaObject" in done

    after_counts = db.partition_file_counts("DiaObject")
    assert set(after_counts) == set(before_counts)  # same partitions
    assert max(after_counts.values()) <= 2
    assert db._read("DiaObject").count() == before_rows
    assert db._read("DiaSource").count() == before_src
    # hot read still correct after the rewrite
    assert db.get_dia_objects(pointing).count() > 0


def test_maintenance_staggers_one_table_per_tick(spark, tmp_path):
    """VERDICT r3 item 6: the default maintenance tick compacts exactly one
    table (most urgent first), so the post-compaction cold reads spread
    across visits instead of stacking on one."""
    pointing = Circle(40.0, -30.0, 1.76)
    db = ApdbSpark(spark, str(tmp_path / "apdb"))
    db.make_schema(drop=True)
    cat = rand_cone_xyz(
        spark, 1000, pointing.ra, pointing.dec, pointing.radius_deg, seed=7
    ).cache()
    cat.count()
    cfg = DiaConfig(false_per_visit=100, transient_per_visit=10)
    t0 = datetime.datetime(2026, 1, 1, 3, 0)
    last_obj = 0
    for v in range(1, 5):
        det, last_obj = detect_sources(
            spark, cat, pointing, cfg, visit_seed=70 + v, last_object_id=last_obj
        )
        process_visit(
            db, v, t0 + datetime.timedelta(seconds=45 * v),
            det.select("diaObjectId", "ra", "dec"), pointing,
        )
    cat.unpersist()

    ticks = [db.maintenance(max_files_per_partition=1) for _ in range(3)]
    assert all(len(t) == 1 for t in ticks), ticks
    # three different tables, one per tick — staggered, not stacked
    assert len({t[0] for t in ticks}) == 3, ticks


def test_visit_stream_auto_maintenance(spark, tmp_path):
    """maintain_every wires the file-count policy into the visit loop:
    file growth is bounded while the loop runs."""
    from l1dbproto_spark.streaming.visit_stream import VisitStreamDriver

    pointing = Circle(40.0, -30.0, 1.76)
    db = ApdbSpark(spark, str(tmp_path / "apdb"))
    db.make_schema(drop=True)
    cat = rand_cone_xyz(
        spark, 1000, pointing.ra, pointing.dec, pointing.radius_deg, seed=9
    ).cache()
    cat.count()
    drv = VisitStreamDriver(
        spark,
        db,
        cat,
        pointing,
        dia_cfg=DiaConfig(false_per_visit=100, transient_per_visit=10),
        start_time=datetime.datetime(2026, 1, 1, 3, 0),
        maintain_every=3,
        maintain_max_files=2,
    )
    events: list[list[str]] = []
    orig = db.maintenance

    def recording(max_files):
        events.append(orig(max_files))
        return events[-1]

    db.maintenance = recording
    drv.run_batch(6)
    cat.unpersist()
    # the policy fired at visits 3 and 6, each tick folding exactly ONE
    # (distinct) table — staggered, not stacked
    assert len(events) == 2 and all(len(e) == 1 for e in events), events
    assert events[0] != events[1], events
    # the most recently compacted table is back to ~1 file/partition
    worsts = [
        max(db.partition_file_counts(t).values())
        for t in ("DiaObject", "DiaSource", "DiaForcedSource")
    ]
    assert min(worsts) <= 2, worsts
    assert db.last_visit()["visitId"] == 6

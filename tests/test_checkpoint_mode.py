"""The engine-wide lineage-cut switch (l1dbproto_spark/checkpoint.py):
reliable mode must produce IDENTICAL results to the default local mode
(the cut changes storage, never the plan), must actually write RDD
checkpoint files under the configured dir (that is the fault-tolerance
property being bought), and must fail loudly when no dir is set."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark import checkpoint as ckpt
from l1dbproto_spark.checkpoint import (
    checkpoint_mode,
    get_checkpoint_mode,
    pin,
    set_checkpoint_mode,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ckpt_files(root: str) -> list[str]:
    return [
        p
        for p in glob.glob(f"{root}/**", recursive=True)
        if not p.endswith("/") and "part" in p.rsplit("/", 1)[-1]
    ]


def test_mode_validation_and_scoping(spark):
    assert get_checkpoint_mode() == "local"
    with pytest.raises(ValueError, match="must be one of"):
        set_checkpoint_mode("bogus")
    with pytest.raises(ValueError, match="requires the spark session"):
        set_checkpoint_mode("reliable", checkpoint_dir="/tmp/x")
    # context manager restores the previous mode even on error
    with pytest.raises(RuntimeError):
        with checkpoint_mode("local"):
            raise RuntimeError("boom")
    assert get_checkpoint_mode() == "local"


def test_reliable_without_dir_fails_loudly(spark, monkeypatch):
    """A reliable-mode pin with no checkpoint dir must raise the engine's
    clear error, not Spark's deep-stack one (guard tested via the
    introspection hook so the shared session's sticky dir can't mask it)."""
    monkeypatch.setattr(ckpt, "_has_checkpoint_dir", lambda df: False)
    df = spark.range(5)
    with checkpoint_mode("reliable"):
        with pytest.raises(RuntimeError, match="no checkpoint dir"):
            pin(df)


def test_clean_corpus_reliable_equals_local_and_writes_files(spark, tmp_path):
    """The flagship multi-gate pipeline (clean_corpus: length + quality +
    repetition + PII gates, exact + near dedup — the densest pin user in
    the engine) in reliable mode: identical keep/drop output, and RDD
    checkpoint part-files actually land under the configured dir."""
    from l1dbproto_spark.operators.corpus import clean_corpus

    docs = load_table(spark, SF_DIR, "documents")
    kw = dict(min_tokens=5, min_logprob=-9.5, repetition_gate=True, max_pii=3)

    res_l = clean_corpus(docs, **kw)
    want_kept = {r.doc_id for r in res_l.cleaned.select("doc_id").collect()}
    want_drops = {
        (r.doc_id, r.reason)
        for r in res_l.dropped.select("doc_id", "reason").collect()
    }

    ckpt_dir = str(tmp_path / "reliable_ckpt")
    with checkpoint_mode("reliable", spark, checkpoint_dir=ckpt_dir):
        res_r = clean_corpus(docs, **kw)
        got_kept = {r.doc_id for r in res_r.cleaned.select("doc_id").collect()}
        got_drops = {
            (r.doc_id, r.reason)
            for r in res_r.dropped.select("doc_id", "reason").collect()
        }
    assert got_kept == want_kept
    assert got_drops == want_drops
    assert len(_ckpt_files(ckpt_dir)) > 0  # the cut went through the fs
    assert get_checkpoint_mode() == "local"  # scope restored


def test_apdb_visit_reliable_equals_local(spark, tmp_path):
    """The APDB store path (apdb.py + visit_pipeline.py pins) honors the
    switch too: one full visit processed in each mode yields identical
    table contents."""
    import datetime

    from l1dbproto_spark.apdb import ApdbSpark
    from l1dbproto_spark.plans.region import Circle
    from l1dbproto_spark.workload.dia import DiaConfig, detect_sources
    from l1dbproto_spark.workload.generators import rand_cone_xyz
    from l1dbproto_spark.workload.visit_pipeline import process_visit

    pointing = Circle(40.0, -30.0, 1.76)
    cat = rand_cone_xyz(
        spark, 500, pointing.ra, pointing.dec, pointing.radius_deg, seed=7
    ).cache()
    cat.count()
    cfg = DiaConfig(false_per_visit=50, transient_per_visit=5)
    t = datetime.datetime(2026, 1, 1, 3, 0)

    def run_visit(root):
        db = ApdbSpark(spark, root)
        db.make_schema(drop=True)
        det, _ = detect_sources(
            spark, cat, pointing, cfg, visit_seed=42, last_object_id=0
        )
        process_visit(db, 1, t, det.select("diaObjectId", "ra", "dec"), pointing)
        return {
            (r.diaObjectId, r.validityStart)
            for r in db._read("DiaObject")
            .select("diaObjectId", "validityStart")
            .collect()
        }

    want = run_visit(str(tmp_path / "apdb_local"))
    with checkpoint_mode(
        "reliable", spark, checkpoint_dir=str(tmp_path / "apdb_ckpt")
    ):
        got = run_visit(str(tmp_path / "apdb_reliable"))
    cat.unpersist()
    assert got == want
    assert len(want) > 0


def test_scoped_mode_does_not_leak_across_threads(spark):
    """The r6-advice hazard: a scoped 'reliable' block on one thread must
    NOT flip the mode seen by a concurrently-running pipeline on another
    thread (the old process-global swap did exactly that)."""
    import threading

    from l1dbproto_spark.checkpoint import ctx_submit

    entered = threading.Event()
    release = threading.Event()
    seen_other: list[str] = []

    def other_pipeline():
        entered.wait(timeout=10)
        seen_other.append(get_checkpoint_mode())
        release.set()

    t = threading.Thread(target=other_pipeline)
    t.start()
    with checkpoint_mode("reliable", spark, checkpoint_dir="/tmp/ckpt_scope_test"):
        entered.set()
        assert release.wait(timeout=10)
        # inside the block: this flow sees reliable...
        assert get_checkpoint_mode() == "reliable"
        # ...and the engine's OWN pools inherit it via ctx_submit
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as ex:
            assert ctx_submit(ex, get_checkpoint_mode).result() == "reliable"
            # a plain submit does NOT inherit — documents the contract
            assert ex.submit(get_checkpoint_mode).result() == "local"
    t.join()
    assert seen_other == ["local"]
    assert get_checkpoint_mode() == "local"


def test_global_default_visible_to_all_threads(spark):
    """set_checkpoint_mode stays process-global: worker threads (engine
    pools use plain functions of the global) see the new default."""
    from concurrent.futures import ThreadPoolExecutor

    set_checkpoint_mode("reliable", spark, checkpoint_dir="/tmp/ckpt_glob_test")
    try:
        with ThreadPoolExecutor(max_workers=1) as ex:
            assert ex.submit(get_checkpoint_mode).result() == "reliable"
    finally:
        set_checkpoint_mode("local")


def test_lineage_is_cut_requires_materialization(spark, tmp_path):
    """r14 advice item 2: a LAZY pin has a LogicalRDD leaf immediately,
    but until the first action the RDD still recomputes through the
    original lineage (file scans included) — lineage_is_cut must say
    False until the checkpoint is materialized, in both modes."""
    from l1dbproto_spark.checkpoint import (
        checkpoint_mode,
        lineage_is_cut,
        pin,
    )

    src = spark.range(8).selectExpr("id", "id * 2 AS x")
    assert not lineage_is_cut(src)  # plain lineage

    lazy = src.transform(pin, eager=False)
    assert not lineage_is_cut(lazy)  # lazy, unmaterialized
    lazy.count()
    assert lineage_is_cut(lazy)  # materialized by the action

    eager = src.transform(pin, eager=True)
    assert lineage_is_cut(eager)

    with checkpoint_mode("reliable", spark, str(tmp_path / "ckpt")):
        rlazy = src.transform(pin, eager=False)
        assert not lineage_is_cut(rlazy)
        rlazy.count()
        assert lineage_is_cut(rlazy)

    # literal frames (LocalRelation leaves) were never scan-backed
    assert lineage_is_cut(spark.sql("SELECT 1 AS a"))
    # PySpark's createDataFrame parallelizes local rows into an
    # un-checkpointed LogicalRDD: it cannot rescan storage either, but
    # the materialization check cannot see that — conservative False is
    # the accepted cost (the caller pins, which is always safe)
    assert not lineage_is_cut(spark.createDataFrame([(1,)], "a long"))

"""Round-2 scale-hardening tests: exactly-once visit re-store after a crash,
Hadoop-FS (URI-rooted) storage, and the dedup pair-expansion guards."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from l1dbproto_spark.apdb import ApdbSpark

VISIT_T = datetime.datetime(2026, 1, 1, 3, 0, 0)


def _objects(spark, n=6, start_id=1):
    rows = [(start_id + i, 10.0 + i, 1.0 + 0.1 * i) for i in range(n)]
    return spark.createDataFrame(rows, ["diaObjectId", "ra", "dec"])


def _sources(spark, mjd, n=6, start_id=1):
    rows = [
        (1000 * start_id + i, start_id + i, 10.0 + i, 1.0 + 0.1 * i, mjd)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, ["diaSourceId", "diaObjectId", "ra", "dec", "midpointMjdTai"]
    )


def test_restore_same_visit_is_idempotent(spark, tmp_path):
    """Crash-recovery contract: save_visit is written last, so a crash
    mid-store re-runs the WHOLE visit; the re-run must leave zero duplicate
    diaSourceId / object versions (VERDICT round-1 item 4)."""
    from l1dbproto_spark.functions.timeutil import python_datetime_to_mjd

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    mjd = python_datetime_to_mjd(VISIT_T)

    # first attempt: full store, but "crash" before save_visit
    apdb.store(VISIT_T, _objects(spark), _sources(spark, mjd))
    # restart: the visit is not checkpointed, so the driver re-runs it
    apdb.store(VISIT_T, _objects(spark), _sources(spark, mjd))
    apdb.save_visit(1, VISIT_T, 6)

    src = apdb._read("DiaSource")
    assert src.count() == 6
    assert src.select("diaSourceId").distinct().count() == 6
    obj = apdb._read("DiaObject")
    assert obj.count() == 6  # one version per object, not two
    assert apdb.count_rows("DiaObjectLast") == 6
    # write-ahead intent marker lifecycle: retired by save_visit, so the
    # next visit's clean path is marker-absent (zero Spark jobs)
    assert not apdb._fs.exists(apdb._marker_path(VISIT_T))


def test_intent_marker_lifecycle(spark, tmp_path):
    """store() leaves the intent marker until save_visit commits the
    checkpoint row; a re-store with the marker present takes the scrub path."""
    from l1dbproto_spark.functions.timeutil import python_datetime_to_mjd

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    mjd = python_datetime_to_mjd(VISIT_T)
    marker = apdb._marker_path(VISIT_T)
    assert not apdb._fs.exists(marker)
    apdb.store(VISIT_T, _objects(spark), _sources(spark, mjd))
    assert apdb._fs.exists(marker)  # crash window: marker outlives store()
    apdb.save_visit(1, VISIT_T, 6)
    assert not apdb._fs.exists(marker)
    # exactly_once=False never touches markers
    apdb2 = ApdbSpark(spark, str(tmp_path / "apdb2"), exactly_once=False)
    apdb2.make_schema(drop=True)
    apdb2.store(VISIT_T, _objects(spark), _sources(spark, mjd))
    assert not apdb2._fs.exists(apdb2._marker_path(VISIT_T))


def test_restore_after_partial_store(spark, tmp_path):
    """Crash between the DiaObject append and the source append: the first
    attempt wrote objects (+Last) but no sources and died before save_visit.
    The re-run must scrub the half-written visit and land exactly once."""
    from l1dbproto_spark.functions.timeutil import python_datetime_to_mjd

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    mjd = python_datetime_to_mjd(VISIT_T)
    # attempt 1 "crashes" after the object writes (sources never appended)
    apdb.store(VISIT_T, _objects(spark))
    assert apdb._fs.exists(apdb._marker_path(VISIT_T))
    # restart: full re-run of the same visit
    apdb.store(VISIT_T, _objects(spark), _sources(spark, mjd))
    apdb.save_visit(1, VISIT_T, 6)
    assert apdb._read("DiaObject").count() == 6  # scrubbed, not doubled
    assert apdb._read("DiaSource").count() == 6
    assert apdb.count_rows("DiaObjectLast") == 6


def test_restore_crash_before_any_write(spark, tmp_path):
    """Marker exists but no rows were written (crash between touch and the
    first append): the re-run finds nothing to scrub and stores normally."""
    from l1dbproto_spark.functions.timeutil import python_datetime_to_mjd

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    apdb._fs.touch(apdb._marker_path(VISIT_T))
    apdb.store(VISIT_T, _objects(spark), _sources(spark, python_datetime_to_mjd(VISIT_T)))
    assert apdb._read("DiaObject").count() == 6
    assert apdb._read("DiaSource").count() == 6


def test_restore_preserves_other_visits(spark, tmp_path):
    """The visit-scoped delete must only remove the re-stored visit's rows —
    a neighbouring visit in the same month partition survives."""
    from l1dbproto_spark.functions.timeutil import python_datetime_to_mjd

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    t0 = VISIT_T
    t1 = VISIT_T + datetime.timedelta(seconds=45)
    apdb.store(t0, _objects(spark), _sources(spark, python_datetime_to_mjd(t0)))
    apdb.save_visit(1, t0, 6)
    apdb.store(
        t1,
        _objects(spark, start_id=7),
        _sources(spark, python_datetime_to_mjd(t1), start_id=7),
    )
    # crash before save_visit(2) -> visit 2 re-runs
    apdb.store(
        t1,
        _objects(spark, start_id=7),
        _sources(spark, python_datetime_to_mjd(t1), start_id=7),
    )
    src = apdb._read("DiaSource")
    assert src.count() == 12
    assert src.select("diaSourceId").distinct().count() == 12
    assert apdb._read("DiaObject").count() == 12


def test_file_uri_root(spark, tmp_path):
    """The storage layer works with an explicit file: URI root end-to-end
    (existence probes, DDL, store, reads, retention all via the Hadoop FS)."""
    from l1dbproto_spark.functions.timeutil import python_datetime_to_mjd

    uri = f"file://{tmp_path}/apdb_uri"
    apdb = ApdbSpark.from_uri(spark, uri, enable_replica=True)
    assert apdb.root == uri
    apdb.make_schema(drop=True)
    assert not apdb._exists("DiaObject")
    apdb.store(VISIT_T, _objects(spark), _sources(spark, python_datetime_to_mjd(VISIT_T)))
    apdb.save_visit(1, VISIT_T, 6)
    assert apdb._exists("DiaObject")
    assert apdb.count_rows("DiaObjectLast") == 6
    assert apdb.last_visit()["visitId"] == 1
    from l1dbproto_spark.plans.region import Circle

    got = apdb.get_dia_objects(Circle(12.0, 1.2, 60.0)).count()
    assert got > 0
    # retention drops the (old) replica chunk partitions through the FS
    dropped = apdb.cleanup_replica_chunks(
        VISIT_T + datetime.timedelta(days=60), keep_days=30.0
    )
    assert dropped == 2  # object + source chunk partitions (no forced stored)


def test_jaccard_df_cap_bounds_stop_phrase(spark):
    """Planted stop-phrase corpus: every doc shares one shingle; with the
    document-frequency cap the C(n,2) blow-up from that shingle is dropped,
    while genuinely similar pairs are still found."""
    from l1dbproto_spark.operators.dedup import (
        capped_shingle_count,
        shingle_jaccard_pairs,
        word_shingles,
    )

    stop = "click here now"
    docs = [(i, f"unique text body number {i} " + stop) for i in range(40)]
    # two planted near-duplicates sharing most shingles
    docs += [(100, "the quick brown fox jumps over the lazy dog " + stop)]
    docs += [(101, "the quick brown fox jumps over the lazy dog " + stop)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sh = word_shingles(df, n=3)
    # cap below the stop-phrase document frequency (42) but above any
    # legitimate shingle's
    pairs = shingle_jaccard_pairs(sh, min_jaccard=0.8, df_cap=10)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert got == {(100, 101)}
    assert capped_shingle_count(sh, 10) >= 1  # the stop shingles were dropped


def test_minhash_bucket_guard(spark):
    """A degenerate corpus of identical docs forms one mega-bucket; the size
    guard drops it (and only it)."""
    from l1dbproto_spark.operators.dedup import (
        capped_bucket_count,
        minhash_band_buckets,
        minhash_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    docs = [(i, "exactly the same text for every single doc") for i in range(30)]
    docs += [(100, f"different text one alpha beta gamma"), (101, "another unrelated body")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    buckets = minhash_band_buckets(minhash_signatures(word_shingles(df, n=3), k=8))
    unguarded = minhash_candidate_pairs(buckets, max_bucket_size=None).count()
    guarded = minhash_candidate_pairs(buckets, max_bucket_size=10).count()
    assert unguarded >= 30 * 29 // 2
    assert guarded == 0
    assert capped_bucket_count(buckets, 10) >= 1


def test_simhash_near_dup_pairs_exact(spark):
    """Block-banding retrieval finds exactly the pairs within max_bits —
    verified against an all-pairs brute force on a small corpus."""
    from itertools import combinations

    from l1dbproto_spark.operators.dedup import simhash, simhash_near_dup_pairs

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "completely unrelated words about spark and parquet files"),
        (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fps = {r.doc_id: r.simhash for r in simhash(df).collect()}
    for max_bits in (0, 3, 7):
        expected = {
            (a, b, bin(fps[a] ^ fps[b]).count("1"))
            for a, b in combinations(sorted(fps), 2)
            if bin(fps[a] ^ fps[b]).count("1") <= max_bits
        }
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_near_dup_pairs(
                simhash(df), max_bits=max_bits, max_bucket_size=None
            ).collect()
        }
        if max_bits <= 3:
            assert got == expected, f"max_bits={max_bits}"
        else:
            # >3 bits exceeds the 4-block pigeonhole guarantee: recall may
            # drop but precision cannot — every returned pair must be real
            assert got <= expected


def _sources_visit(spark, mjds, visit_id, n=6, start_id=1):
    """Sources with PER-EXPOSURE midpoints (not equal to the visit MJD) and
    an explicit visit id — the realistic caller-supplied shape."""
    rows = [
        (1000 * start_id + i, start_id + i, 10.0 + i, 1.0 + 0.1 * i,
         mjds[i % len(mjds)], visit_id)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        ["diaSourceId", "diaObjectId", "ra", "dec", "midpointMjdTai", "visit"],
    )


def test_restore_scrubs_replica_chunks(spark, tmp_path):
    """ADVICE r2: with enable_replica, the restore path must scrub the
    crashed attempt's rows from the three chunk tables too — the replica
    stream is part of the store+checkpoint exactly-once unit."""
    from l1dbproto_spark.functions.timeutil import python_datetime_to_mjd

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"), enable_replica=True)
    apdb.make_schema(drop=True)
    mjd = python_datetime_to_mjd(VISIT_T)
    apdb.store(VISIT_T, _objects(spark), _sources(spark, mjd))  # crash pre-save
    apdb.store(VISIT_T, _objects(spark), _sources(spark, mjd))  # re-run
    apdb.save_visit(1, VISIT_T, 6)
    assert apdb._read("DiaObjectChunks").count() == 6
    src_chunks = apdb._read("DiaSourceChunks")
    assert src_chunks.count() == 6
    assert src_chunks.select("diaSourceId").distinct().count() == 6


def test_restore_scrubs_per_exposure_midpoints(spark, tmp_path):
    """ADVICE r2: sources whose midpointMjdTai differs from the visit MJD
    (per-exposure midpoints) must still be scrubbed on re-run — the scrub
    keys on the visit id, not float MJD equality."""
    from l1dbproto_spark.functions.timeutil import python_datetime_to_mjd

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"), enable_replica=True)
    apdb.make_schema(drop=True)
    mjd = python_datetime_to_mjd(VISIT_T)
    exposures = [mjd - 2e-4, mjd + 1e-4, mjd + 3e-4]
    src = _sources_visit(spark, exposures, visit_id=1)
    apdb.store(VISIT_T, _objects(spark), src)  # crash pre-save
    apdb.store(VISIT_T, _objects(spark), src)  # re-run
    apdb.save_visit(1, VISIT_T, 6)
    dia_src = apdb._read("DiaSource")
    assert dia_src.count() == 6
    assert dia_src.select("diaSourceId").distinct().count() == 6
    assert apdb._read("DiaSourceChunks").count() == 6


def test_jaccard_df_cap_consistent_vocabulary(spark):
    """ADVICE r2: with a cap, the reported value is the exact Jaccard of the
    df-restricted shingle sets (numerator AND denominator drop the capped
    shingles) — the old form kept full set sizes, underestimating J and
    silently missing near-threshold pairs."""
    import duckdb
    from l1dbproto_spark.operators.dedup import shingle_jaccard_pairs, word_shingles

    stop = "click here now for more info today"  # several high-df shingles
    docs = [(i, f"unique text body number {i} " + stop) for i in range(30)]
    # planted pair: identical apart from one word — high restricted-vocab
    # Jaccard, but full-vocab J is diluted by the shared stop shingles
    docs += [(100, "alpha beta gamma delta epsilon zeta " + stop)]
    docs += [(101, "alpha beta gamma delta epsilon eta " + stop)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in shingle_jaccard_pairs(
            word_shingles(df, n=3), min_jaccard=0.3, df_cap=10
        ).collect()
    }
    # oracle: restricted-vocabulary Jaccard computed by DuckDB from scratch
    rows = [(d, t) for d, t in docs]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = {
        (a, b): j
        for a, b, j in con.execute(
            """
            WITH w AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\r\n\f]+') AS ws
              FROM docs
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(ws[i : i + 2], ' ') AS shingle
              FROM w, unnest(range(1, greatest(len(ws) - 2, 1) + 1)) AS t(i)
            ),
            kept AS (
              SELECT * FROM sh QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 10
            ),
            cnt AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
              FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT da, db, CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS j
            FROM inter JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
            WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.3
            """
        ).fetchall()
    }
    assert got == want
    assert (100, 101) in got  # the near-dup pair survives the cap


# --------------------------------------------------------------- r14:
# single-writer store contract (VERDICT r13 item 3): two concurrent
# store() calls against ONE root either serialize or fail loudly via the
# exclusive _store.lock — previously the contract lived only in the
# module docstring.


def test_concurrent_store_fails_loudly_when_lock_held(spark, tmp_path):
    """A held _store.lock (another writer mid-store) makes store() raise
    the loud concurrent-writer error instead of interleaving the
    DiaObjectLast read-merge-overwrite; clear_store_lock() is the
    documented repair, after which the store proceeds."""
    import pytest

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    # simulate an in-flight writer on the same root
    assert apdb._fs.create_exclusive(apdb._store_lock_path, "visit=other")
    with pytest.raises(RuntimeError, match="concurrent APDB store"):
        apdb.store(VISIT_T, _objects(spark))
    # nothing was written under the held lock
    assert apdb.count_rows("DiaObject") == 0
    apdb.clear_store_lock()
    apdb.store(VISIT_T, _objects(spark))
    apdb.save_visit(1, VISIT_T, 6)
    assert apdb.count_rows("DiaObject") == 6
    # the lock is released by store()'s finally — a second visit proceeds
    assert not apdb._fs.exists(apdb._store_lock_path)


def test_store_failure_releases_lock(spark, tmp_path):
    """An exception INSIDE the write group must not orphan the lock: the
    re-run of the failed visit (the sanctioned recovery) needs to acquire
    it. Only a hard process death leaves a stale lock, and that path is
    clear_store_lock()."""
    import pytest

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    bad = _objects(spark).withColumn("ra", F.col("ra") / F.lit(0)).select(
        "diaObjectId", F.assert_true(F.lit(False)).alias("ra"), "dec"
    )
    with pytest.raises(Exception):
        apdb.store(VISIT_T, bad)
    assert not apdb._fs.exists(apdb._store_lock_path)
    # the intent marker from the failed attempt remains -> re-run scrubs
    apdb.store(VISIT_T, _objects(spark))
    apdb.save_visit(1, VISIT_T, 6)
    assert apdb.count_rows("DiaObject") == 6


def test_two_threads_different_visits_serialize_or_fail_loudly(spark, tmp_path):
    """The actual race: two threads store DIFFERENT visits against one
    root concurrently. Allowed outcomes per thread: success, or the loud
    concurrent-writer RuntimeError — never silent corruption. Failed
    visits re-run cleanly and every visit ends present exactly once."""
    import threading

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    t1 = VISIT_T
    t2 = VISIT_T + datetime.timedelta(minutes=1)
    errors: dict[datetime.datetime, Exception | None] = {}
    gate = threading.Barrier(2)

    def run(vt, start_id):
        gate.wait()
        try:
            apdb.store(vt, _objects(spark, start_id=start_id))
            errors[vt] = None
        except Exception as e:  # noqa: BLE001 - recorded for assertion
            errors[vt] = e

    th = [
        threading.Thread(target=run, args=(t1, 1)),
        threading.Thread(target=run, args=(t2, 101)),
    ]
    for t in th:
        t.start()
    for t in th:
        t.join()
    for vt, err in errors.items():
        assert err is None or "concurrent APDB store" in str(err), (
            f"visit {vt}: unexpected failure mode {err!r}"
        )
    # re-run any loser (lock was released by the winner's finally)
    for vt, start_id in ((t1, 1), (t2, 101)):
        if errors[vt] is not None:
            apdb.store(vt, _objects(spark, start_id=start_id))
    apdb.save_visit(1, t1, 6)
    apdb.save_visit(2, t2, 106)
    obj = apdb._read("DiaObject")
    per_visit = {
        r.validityStart: r.n
        for r in obj.groupBy("validityStart").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_visit.values()) == {6} and len(per_visit) == 2
    assert apdb.count_rows("DiaObjectLast") == 12


def test_local_os_path_resolves_uri_forms(spark, tmp_path):
    """The O_EXCL lock must land on the SAME file Hadoop's Path resolves:
    file: URIs (with or without the authority slashes, with percent
    encoding) go through the JVM Path's toUri().getPath() instead of
    string-stripping (r14 advice item 4)."""
    from l1dbproto_spark.fs import TableFS

    fs = TableFS(spark, str(tmp_path))
    plain = f"{tmp_path}/a b/lock"
    assert fs._local_os_path(plain) == plain
    assert fs._local_os_path(f"file:{tmp_path}/x") == f"{tmp_path}/x"
    assert fs._local_os_path(f"file://{tmp_path}/x") == f"{tmp_path}/x"
    assert fs._local_os_path(f"file:///{str(tmp_path).lstrip('/')}/x") == f"{tmp_path}/x"
    # Hadoop Path is NOT an RFC URI: '%' is a literal path character, so
    # the lock must land on the literal 'a%20b' directory Hadoop opens —
    # toUri().getPath() preserves exactly that
    assert (
        fs._local_os_path(f"file:{tmp_path}/a%20b/lock")
        == f"{tmp_path}/a%20b/lock"
    )
    # the lock taken via a URI spelling blocks the plain-path spelling
    import os

    os.makedirs(f"{tmp_path}/d", exist_ok=True)
    assert fs.create_exclusive(f"file:{tmp_path}/d/lk", "one")
    assert not fs.create_exclusive(f"{tmp_path}/d/lk", "two")


def test_restore_runs_history_counts_before_store(spark, tmp_path):
    """r14 advice item 1: the visit pipeline overlaps the Q2/Q3 history
    counts with store() — but on the crash-restore path store() SCRUBS
    DiaSource/DiaForcedSource partitions, deleting files the history
    frames' snapshotted listing references. With a pending intent marker
    the counts must run to completion BEFORE store() (sequential
    fallback), and the replayed visit must still produce exact counts."""
    from l1dbproto_spark.plans.region import Circle
    from l1dbproto_spark.workload.visit_pipeline import (
        VisitConfig,
        process_visit,
    )

    apdb = ApdbSpark(spark, str(tmp_path / "apdb"))
    apdb.make_schema(drop=True)
    pointing = Circle(10.0, 1.0, 2.0)
    det = _objects(spark).select(
        "diaObjectId", F.lit(10.5).alias("ra"), F.lit(1.0).alias("dec")
    )
    # visit 0 seeds history; src_read_period=1 + duty 1.0 => every visit
    # reads history
    cfg = VisitConfig(src_read_period=1, src_read_duty_cycle=1.0)
    process_visit(apdb, 0, VISIT_T, det, pointing, cfg)
    apdb.save_visit(0, VISIT_T, 6)

    # visit 1 "crashed" mid-store: simulate by storing without save_visit,
    # leaving the intent marker behind
    t1 = VISIT_T + datetime.timedelta(seconds=45)
    c_first = process_visit(apdb, 1, t1, det, pointing, cfg)
    assert apdb.has_pending_intent(t1)

    # replay of visit 1 takes the restore path: history counts must run
    # to completion BEFORE store()'s scrub deletes the files their
    # snapshot references (no FileNotFoundException, no silent
    # undercount). The snapshot itself keeps the pre-r14 sequential
    # semantics: built before the scrub, it still sees the crashed
    # attempt's own rows, so the replay reads visit-0 + crashed-visit-1
    # history (2x the first attempt's counts).
    c_replay = process_visit(apdb, 1, t1, det, pointing, cfg)
    assert (
        c_replay.sources_read
        == c_first.sources_read + c_first.sources_stored
    )
    assert (
        c_replay.forced_read == c_first.forced_read + c_first.forced_stored
    )
    apdb.save_visit(1, t1, 6)
    assert not apdb.has_pending_intent(t1)
    # exactly-once: replay left no duplicate source rows
    src = apdb._read("DiaSource")
    assert src.count() == src.select("diaSourceId").distinct().count()

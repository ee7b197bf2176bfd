"""Streaming document dedup (streaming/doc_dedup.py): incremental admission
equals batch-mode dedup over the union of batches; the fingerprint store
survives a restart."""

from __future__ import annotations

from l1dbproto_spark.operators.dedup import exact_dedup_groups
from l1dbproto_spark.streaming.doc_dedup import (
    StreamingDocDedup,
    StreamingNearDupGate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_streaming_admission_equals_batch_dedup(spark, tmp_path):
    gate = StreamingDocDedup(spark, str(tmp_path / "fp_store"))
    b1 = [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "alpha beta gamma")]
    b2 = [(4, "delta epsilon"), (5, "zeta eta"), (6, "  ALPHA   beta GAMMA ")]
    b3 = [(7, "zeta eta"), (8, "theta iota")]

    admitted = []
    for batch in (b1, b2, b3):
        admitted += [
            (r.fingerprint, r.doc_id) for r in gate.admit(_docs(spark, batch)).collect()
        ]

    # one admission per distinct normalized text, winner = first-seen min id
    batch_groups = exact_dedup_groups(_docs(spark, b1 + b2 + b3)).collect()
    want = {(r.fingerprint, r.keep_doc_id) for r in batch_groups}
    assert set(admitted) == want
    assert len(admitted) == len(want)  # no fingerprint admitted twice

    # normalization folded case/whitespace: doc 6 never admitted
    assert 6 not in {d for _, d in admitted}


def test_fingerprint_store_survives_restart(spark, tmp_path):
    path = str(tmp_path / "fp_store")
    gate = StreamingDocDedup(spark, path)
    assert gate.admit(_docs(spark, [(1, "a b c")])).count() == 1
    # "restart": a new gate over the same store rejects the duplicate
    gate2 = StreamingDocDedup(spark, path)
    assert gate2.admit(_docs(spark, [(2, "a b c")])).count() == 0
    assert gate2.admit(_docs(spark, [(3, "x y z")])).count() == 1
    assert gate2.seen().count() == 2


def test_streaming_near_dup_gate(spark, tmp_path):
    """LSH near-dup admission: rephrased near-duplicates across batches are
    rejected, distinct content admitted; agrees with the batch LSH candidate
    graph on the same corpus."""
    from l1dbproto_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_candidate_pairs,
        minhash_signatures,
        shingle_rows,
    )
    from l1dbproto_spark.streaming.doc_dedup import StreamingNearDupGate

    b1 = [
        (1, "the quick brown fox jumps over the lazy dog every day"),
        (2, "completely unrelated writing about spark catalyst optimizer internals"),
    ]
    b2 = [
        (3, "the quick brown fox jumps over the lazy dog every day"),  # dup of 1
        (4, "new third topic discussing astronomy alert production pipelines"),
    ]
    gate = StreamingNearDupGate(spark, str(tmp_path / "lsh_store"))
    a1 = {r.doc_id for r in gate.admit(_docs(spark, b1)).collect()}
    a2 = {r.doc_id for r in gate.admit(_docs(spark, b2)).collect()}
    assert a1 == {1, 2}
    assert 3 not in a2 and 4 in a2

    # consistency with the batch candidate graph: every streaming rejection
    # corresponds to a batch LSH candidate pair with an earlier admitted doc
    all_docs = _docs(spark, b1 + b2)
    cand = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(
            minhash_band_buckets(minhash_signatures(shingle_rows(all_docs)))
        ).collect()
    }
    rejected = {d for d, _ in b1 + b2} - (a1 | a2)
    for d in rejected:
        assert any(a == d or b == d for a, b in cand)

    # restart survival: a fresh gate over the same store still rejects
    gate2 = StreamingNearDupGate(spark, str(tmp_path / "lsh_store"))
    again = {
        r.doc_id
        for r in gate2.admit(
            _docs(spark, [(9, "the quick brown fox jumps over the lazy dog every day")])
        ).collect()
    }
    assert again == set()


def test_bind_stream_end_to_end(spark, tmp_path):
    """The gate wired into a real Structured Streaming query over a file
    source: duplicates across micro-batches are rejected."""
    src = tmp_path / "incoming"
    out = tmp_path / "admitted"
    src.mkdir()
    _docs(spark, [(1, "one two"), (2, "three four")]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    gate = StreamingDocDedup(spark, str(tmp_path / "fp_store"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    q = gate.bind_stream(stream, str(out))
    try:
        q.processAllAvailable()
        # second file: one dup, one new
        _docs(spark, [(3, "one two"), (4, "five six")]).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert got == {1, 2, 4}


def test_store_scan_is_partition_pruned(spark, tmp_path):
    """VERDICT r2 item 2: the per-batch store read must carry a real hive
    PartitionFilter on fp_bucket — not a full store scan — so a 10^10-doc
    fingerprint store is never listed/shuffled wholesale per micro-batch."""
    gate = StreamingDocDedup(spark, str(tmp_path / "fp_store"))
    gate.admit(_docs(spark, [(1, "one two"), (2, "three four")]))
    gate.admit(_docs(spark, [(3, "one two"), (4, "five six")]))
    scan = gate.last_store_scan
    scan.count()
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "fp_bucket" in pf, plan


def test_exact_gate_epoch_retry_is_idempotent(spark, tmp_path):
    """ADVICE r2: a retried epoch (store append succeeded, output write
    didn't) must re-emit the same admitted rows and append nothing new."""
    gate = StreamingDocDedup(spark, str(tmp_path / "fp_store"))
    batch = [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")]
    first = {(r.fingerprint, r.doc_id) for r in gate.admit(_docs(spark, batch)).collect()}
    store_rows = gate.seen().count()
    retry = {(r.fingerprint, r.doc_id) for r in gate.admit(_docs(spark, batch)).collect()}
    assert retry == first and len(first) == 2
    assert gate.seen().count() == store_rows  # no duplicate fingerprints
    # a genuinely-later duplicate (different winner id) is still rejected
    assert gate.admit(_docs(spark, [(9, "alpha beta")])).count() == 0


def test_exact_gate_later_epoch_redelivery_rejected(spark, tmp_path):
    """ADVICE r3: a doc re-delivered by an at-least-once source in a LATER
    epoch matches its own stored keep_doc_id but NOT the stored epoch —
    it must be rejected, not re-admitted into a second epoch partition.
    A same-epoch retry still re-emits in full."""
    gate = StreamingDocDedup(spark, str(tmp_path / "fp_store"))
    batch = [(1, "alpha beta"), (2, "gamma delta")]
    first = {r.doc_id for r in gate.admit(_docs(spark, batch), epoch_id=5).collect()}
    assert first == {1, 2}
    # true retry of epoch 5: full re-emit, no store growth
    retry = {r.doc_id for r in gate.admit(_docs(spark, batch), epoch_id=5).collect()}
    assert retry == first
    assert gate.seen().count() == 2
    # the SAME rows re-delivered in epoch 6: all rejected
    assert gate.admit(_docs(spark, batch), epoch_id=6).count() == 0


def test_near_dup_gate_epoch_retry_is_idempotent(spark, tmp_path):
    from l1dbproto_spark.streaming.doc_dedup import StreamingNearDupGate

    gate = StreamingNearDupGate(spark, str(tmp_path / "lsh_store"))
    batch = [
        (1, "the quick brown fox jumps over the lazy dog every day"),
        (2, "completely unrelated writing about spark catalyst optimizer internals"),
    ]
    first = {r.doc_id for r in gate.admit(_docs(spark, batch)).collect()}
    retry = {r.doc_id for r in gate.admit(_docs(spark, batch)).collect()}
    assert retry == first == {1, 2}
    # different doc, same content: still rejected after the retry
    dup = gate.admit(
        _docs(spark, [(9, "the quick brown fox jumps over the lazy dog every day")])
    )
    assert dup.count() == 0


def test_near_dup_gate_later_epoch_redelivery_rejected(spark, tmp_path):
    """The self-exemption only covers same-epoch retries: the same docs
    re-delivered in a later epoch collide with their own stored buckets."""
    from l1dbproto_spark.streaming.doc_dedup import StreamingNearDupGate

    gate = StreamingNearDupGate(spark, str(tmp_path / "lsh_store"))
    batch = [
        (1, "the quick brown fox jumps over the lazy dog every day"),
        (2, "completely unrelated writing about spark catalyst optimizer internals"),
    ]
    assert {r.doc_id for r in gate.admit(_docs(spark, batch), epoch_id=3).collect()} == {1, 2}
    # same-epoch retry re-emits in full
    assert {r.doc_id for r in gate.admit(_docs(spark, batch), epoch_id=3).collect()} == {1, 2}
    # later-epoch re-delivery of the same doc ids: rejected
    assert gate.admit(_docs(spark, batch), epoch_id=4).count() == 0


def test_near_dup_store_scan_is_partition_pruned(spark, tmp_path):
    """VERDICT r3 item 3: the near-dup bucket store read must carry a real
    hive PartitionFilter on bkt_pfx — each micro-batch touches only the
    partitions its bucket keys hash into, never the whole bucket history."""
    from l1dbproto_spark.streaming.doc_dedup import StreamingNearDupGate

    gate = StreamingNearDupGate(spark, str(tmp_path / "lsh_store"))
    gate.admit(_docs(spark, [(1, "one two three four five"), (2, "six seven eight nine")]))
    gate.admit(_docs(spark, [(3, "ten eleven twelve thirteen"), (4, "one two three four five")]))
    scan = gate.last_store_scan
    scan.count()
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "bkt_pfx" in pf, plan


def test_gate_store_compaction_bounds_files_and_preserves_admission(
    spark, tmp_path
):
    """The bounded-file-count claim (doc_dedup.py module docstring): N
    appended micro-batches leave up to N files in a touched partition;
    maintenance() folds every partition back to exactly 1 file, the store
    rows are preserved exactly, and admission behaves identically after
    the rewrite (duplicates still rejected, fresh content admitted)."""
    path = str(tmp_path / "fp_store")
    gate = StreamingDocDedup(spark, path)
    n_batches = 10
    for b in range(n_batches):
        # distinct text per batch, constant fp_bucket spread
        assert gate.admit(
            _docs(spark, [(b * 10 + i, f"unique text {b} {i}") for i in range(20)])
        ).count() == 20
    before = gate.partition_file_counts()
    assert before and max(before.values()) > 1
    store_before = {
        (r.fp_bucket, r.fingerprint, r.keep_doc_id, r.epoch)
        for r in gate.seen().collect()
    }
    assert gate.maintenance(max_files_per_partition=1) is True
    after = gate.partition_file_counts()
    assert after and set(after) == set(before)
    assert max(after.values()) == 1, after
    # rows preserved exactly
    store_after = {
        (r.fp_bucket, r.fingerprint, r.keep_doc_id, r.epoch)
        for r in gate.seen().collect()
    }
    assert store_after == store_before
    # admission semantics unchanged: old duplicate rejected, fresh admitted
    assert gate.admit(_docs(spark, [(9001, "unique text 0 0")])).count() == 0
    assert gate.admit(_docs(spark, [(9002, "never seen before")])).count() == 1
    # below threshold -> no-op (the fresh admits above add at most one
    # file to their buckets, still within a threshold of 2)
    assert gate.maintenance(max_files_per_partition=2) is False


def test_near_dup_gate_store_compaction(spark, tmp_path):
    """Same bounded-file-count contract for the LSH bucket store."""
    from l1dbproto_spark.streaming.doc_dedup import StreamingNearDupGate

    path = str(tmp_path / "bkt_store")
    gate = StreamingNearDupGate(spark, path)
    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "completely different content about spark partition pruning at scale",
        "a third unrelated document discussing minhash signatures and bands",
        "yet another body of text on streaming gates and bucket stores",
    ]
    for b, t in enumerate(texts):
        assert gate.admit(_docs(spark, [(b, t + f" tail {b}")])).count() == 1
    before = gate.partition_file_counts()
    store_before = {
        (r.bkt_pfx, r.band, r.bucket, r.doc_id, r.epoch)
        for r in gate.seen_buckets().collect()
    }
    gate.compact()
    after = gate.partition_file_counts()
    assert after and set(after) == set(before)
    assert max(after.values()) == 1, after
    store_after = {
        (r.bkt_pfx, r.band, r.bucket, r.doc_id, r.epoch)
        for r in gate.seen_buckets().collect()
    }
    assert store_after == store_before
    # near-dup of an admitted doc still rejected after the rewrite
    assert gate.admit(_docs(spark, [(100, texts[0] + " tail 0")])).count() == 0


def test_bind_stream_auto_maintenance(spark, tmp_path):
    """maintain_every wires compaction into the streaming loop: after the
    epochs run, the store is folded to 1 file per touched partition and
    admission is unchanged (dup rejected, fresh admitted)."""
    src = tmp_path / "incoming"
    out = tmp_path / "admitted"
    src.mkdir()
    gate = StreamingDocDedup(spark, str(tmp_path / "fp_store"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    # maintain after every epoch with threshold 0 -> compaction runs as
    # soon as any partition holds >=1 file, so 2 epochs exercise both the
    # fold and admission-over-compacted-store
    q = gate.bind_stream(
        stream, str(out), maintain_every=1, max_files_per_partition=0
    )
    try:
        _docs(spark, [(i, f"first batch text {i}") for i in range(8)]).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        assert max(gate.partition_file_counts().values()) == 1
        _docs(
            spark,
            [(100, "first batch text 0"), (101, "second batch fresh")],
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert got == set(range(8)) | {101}
    assert max(gate.partition_file_counts().values()) == 1


def test_near_dup_gate_bind_stream(spark, tmp_path):
    """The near-dup gate wired into a real streaming query: a rephrased
    near-duplicate arriving in a later micro-batch is rejected."""
    from l1dbproto_spark.streaming.doc_dedup import StreamingNearDupGate

    src = tmp_path / "incoming"
    out = tmp_path / "admitted"
    src.mkdir()
    gate = StreamingNearDupGate(spark, str(tmp_path / "lsh_store"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    q = gate.bind_stream(stream, str(out), maintain_every=1,
                         max_files_per_partition=0)
    try:
        _docs(spark, [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "completely unrelated writing about spark catalyst optimizer internals"),
        ]).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        assert max(gate.partition_file_counts().values()) == 1
        _docs(spark, [
            (3, "the quick brown fox jumps over the lazy dog every day"),
            (4, "new third topic discussing astronomy alert production pipelines"),
        ]).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert got == {1, 2, 4}


def test_incompatible_old_store_fails_loudly(spark, tmp_path):
    """A store written by a pre-epoch/pre-bkt_pfx version raises a clear
    error at gate construction instead of silently corrupting admit
    semantics (null epochs drop retried rows; null prefixes discard the
    bucket history)."""
    import pytest

    old_exact = str(tmp_path / "old_exact")
    spark.createDataFrame(
        [("ab", "ffff", 1)], "fp_bucket string, fingerprint string, keep_doc_id long"
    ).write.partitionBy("fp_bucket").parquet(old_exact)
    with pytest.raises(ValueError, match="exact-dedup gate.*epoch"):
        StreamingDocDedup(spark, old_exact)

    old_near = str(tmp_path / "old_near")
    spark.createDataFrame(
        [(0, "sig", 1, 5)], "band int, bucket string, doc_id long, epoch long"
    ).write.partitionBy("band").parquet(old_near)
    with pytest.raises(ValueError, match="near-dup gate.*bkt_pfx"):
        StreamingNearDupGate(spark, old_near)

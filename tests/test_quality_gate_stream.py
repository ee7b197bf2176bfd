"""Streaming quality gate (streaming/quality_gate.py): per-batch
admission equals the batch-mode filter over the union (stateless by
design), idempotent admits, and the foreachBatch binding end-to-end."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.classifier import (
    quality_filter,
    train_quality_classifier,
)
from l1dbproto_spark.streaming.quality_gate import StreamingQualityGate

B = 256
GOOD = ["insight", "theorem", "careful", "study", "evidence", "method"]
BAD = ["click", "winner", "free", "deal", "buy", "now"]


def _mk(spark, ids, vocab, rng):
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(18))) for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def gate_and_corpus(spark):
    rng = random.Random(11)
    pos = _mk(spark, range(50), GOOD, rng)
    neg = _mk(spark, range(50), BAD, rng)
    coef, b0 = train_quality_classifier(pos, neg, num_buckets=B)
    mixed = _mk(spark, range(100, 160), GOOD, rng).unionByName(
        _mk(spark, range(200, 260), BAD, rng)
    )
    gate = StreamingQualityGate(
        spark, coef, b0, num_buckets=B, threshold=0.5
    )
    return gate, mixed, coef, b0


def test_streaming_matches_batch_filter(spark, gate_and_corpus):
    gate, corpus, coef, b0 = gate_and_corpus
    admitted = set()
    for lo, hi in [(0, 130), (130, 220), (220, 1000)]:
        batch = corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        admitted |= {r.doc_id for r in gate.admit(batch).collect()}
    want = {
        r.doc_id
        for r in quality_filter(
            corpus, coef, b0, threshold=0.5, num_buckets=B
        ).collect()
    }
    assert admitted == want
    # the gate separates: good ids dominate, bad ids largely rejected
    assert sum(1 for d in admitted if d < 200) > 55
    assert sum(1 for d in admitted if d >= 200) < 5


def test_admit_idempotent_and_schema_preserving(spark, gate_and_corpus):
    gate, corpus, _, _ = gate_and_corpus
    batch = corpus.filter(F.col("doc_id") < 140)
    a1 = {r.doc_id for r in gate.admit(batch).collect()}
    a2 = {r.doc_id for r in gate.admit(batch).collect()}
    assert a1 == a2
    assert gate.admit(batch).columns == batch.columns


def test_gopher_composition_tightens(spark, gate_and_corpus):
    """require_gopher_pass can only shrink the admitted set (the demo
    docs fail the 50-word Gopher floor, so it shrinks to empty)."""
    gate, corpus, coef, b0 = gate_and_corpus
    strict = StreamingQualityGate(
        spark,
        coef,
        b0,
        num_buckets=B,
        threshold=0.5,
        require_gopher_pass=True,
    )
    batch = corpus.filter(F.col("doc_id") < 140)
    loose = {r.doc_id for r in gate.admit(batch).collect()}
    tight = {r.doc_id for r in strict.admit(batch).collect()}
    assert tight <= loose


def test_bind_stream_end_to_end(spark, tmp_path, gate_and_corpus):
    gate, corpus, coef, b0 = gate_and_corpus
    src = tmp_path / "src"
    out = tmp_path / "out"
    corpus.write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    q = gate.bind_stream(stream, str(out))
    q.awaitTermination(120)
    got = {
        r.doc_id
        for r in spark.read.parquet(str(out)).select("doc_id").collect()
    }
    want = {
        r.doc_id
        for r in quality_filter(
            corpus, coef, b0, threshold=0.5, num_buckets=B
        ).collect()
    }
    assert got == want

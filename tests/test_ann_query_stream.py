"""Streaming ANN query service (streaming/ann_query.py): streamed
answers equal the batch pq_index_topk per chunk, epochs are partitioned,
and vectors appended by the maintenance stream become searchable at the
next micro-batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.pq import (
    build_pq_index,
    pq_codebooks,
    pq_index_topk,
)
from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.ann_query import StreamingAnnQuery
from l1dbproto_spark.streaming.index_append import StreamingIndexAppend

SF_DIR = "/root/testdata/sf0.001"
M, K_CODES, DIM, N_CLUSTERS = 8, 16, 64, 16


def _build(spark, emb, root, corpus_filter=None):
    corpus = emb if corpus_filter is None else emb.filter(corpus_filter)
    cent = emb.filter(F.col("vec_id") < N_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    build_pq_index(corpus, cent, cb, root, m=M, k_codes=K_CODES, dim=DIM)


def test_streamed_answers_equal_batch(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    _build(spark, emb, root)

    src = tmp_path / "queries"
    out = tmp_path / "answers"
    src.mkdir()
    chunks = [
        emb.filter(F.col("vec_id") < 5),
        emb.filter(F.col("vec_id").between(5, 9)),
    ]
    for c in chunks:
        c.coalesce(1).write.mode("append").parquet(str(src))

    svc = StreamingAnnQuery(spark, root, corpus=emb, k=5)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = svc.bind_stream(stream, str(out))
    q.awaitTermination(600)

    got = spark.read.parquet(str(out))
    assert {r.epoch for r in got.select("epoch").distinct().collect()} == {0, 1}
    want = pq_index_topk(
        svc.index, emb.filter(F.col("vec_id") < 10), emb, k=5
    )
    a = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in got.select("query_id", "neighbor_id", "rank").collect()
    }
    b = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in want.collect()
    }
    assert a == b and a


def test_appended_vectors_become_searchable(spark, tmp_path):
    """Write path + read path on the same index: after StreamingIndexAppend
    absorbs new corpus vectors, the next answer() sees them."""
    emb = load_table(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    # index seeded WITHOUT vec_id 100..499
    _build(spark, emb, root, corpus_filter=F.col("vec_id") < 100)

    svc = StreamingAnnQuery(spark, root, corpus=emb, k=5)
    queries = emb.filter(F.col("vec_id") < 3)
    before = {
        r.neighbor_id for r in svc.answer(queries).collect()
    }
    assert all(n < 100 for n in before)

    app = StreamingIndexAppend(spark, root)
    late = emb.filter(F.col("vec_id") >= 100)
    assert app.append(late) == late.count()

    after = {r.neighbor_id for r in svc.answer(queries).collect()}
    # the grown index answers exactly like one built over everything
    full_root = str(tmp_path / "full")
    _build(spark, emb, full_root)
    full_svc = StreamingAnnQuery(spark, full_root, corpus=emb, k=5)
    want = {r.neighbor_id for r in full_svc.answer(queries).collect()}
    assert after == want
    assert after != before  # growth visible


def test_answer_excludes_degenerate_query_vectors(spark, tmp_path):
    """NULL / NaN / zero-norm query vectors are excluded by the shared
    encode guard instead of crashing the probe or ranking as neighbors."""
    emb = load_table(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    _build(spark, emb, root)
    svc = StreamingAnnQuery(spark, root, corpus=emb, k=3)
    bad = spark.createDataFrame(
        [
            (9001, None),
            (9002, [float("nan")] * 64),
            (9003, [0.0] * 64),
        ],
        "vec_id long, embedding array<double>",
    )
    sane = emb.filter(F.col("vec_id") < 2).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    res = svc.answer(bad.unionByName(sane)).collect()
    qids = {r.query_id for r in res}
    assert qids <= {0, 1} and qids

"""Composed end-to-end streaming corpus pipeline (r5 verdict item 7 via
r6): quality gate -> exact dedup -> near dedup -> decontam -> index
append, all in ONE availableNow stream — asserted equal to the same gate
chain driven directly batch-by-batch (the form each gate's own test
already proves equals its batch operator), plus the batch-level
invariants over the union:

* no two admitted documents share a normalized-text fingerprint;
* every admitted document passes the batch quality filter;
* zero admitted document is contaminated against the eval set;
* the ANN index grew by exactly the admitted documents' vectors,
  id-idempotently.

The corpus is the real sf0.001 documents table split into three chunk
files (one micro-batch each via maxFilesPerTrigger), with exact clones
injected across chunks so the stateful gates have cross-batch work."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.classifier import (
    quality_filter,
    train_quality_classifier,
)
from l1dbproto_spark.operators.pq import build_pq_index, load_pq_index, pq_codebooks
from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.corpus_pipeline import ComposedCorpusPipeline
from l1dbproto_spark.streaming.decontam import StreamingDecontamGate
from l1dbproto_spark.streaming.doc_dedup import (
    StreamingDocDedup,
    StreamingNearDupGate,
)
from l1dbproto_spark.streaming.index_append import StreamingIndexAppend
from l1dbproto_spark.streaming.quality_gate import StreamingQualityGate

SF_DIR = "/root/testdata/sf0.001"
B = 256
M, K_CODES, DIM, N_CLUSTERS = 8, 16, 64, 16


@pytest.fixture(scope="module")
def corpus(spark):
    """Three chunks: docs 0-199, 200-399 (+ clones of 0-19 under new ids),
    400-499 (+ clones of 200-209). Clones are exact text copies — the
    exact gate must reject them across micro-batches."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    c1 = docs.filter(F.col("doc_id") < 200)
    clones1 = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    c2 = docs.filter(F.col("doc_id").between(200, 399)).unionByName(clones1)
    clones2 = docs.filter(F.col("doc_id").between(200, 209)).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text"
    )
    c3 = docs.filter(F.col("doc_id") >= 400).unionByName(clones2)
    return [c1, c2, c3]


@pytest.fixture(scope="module")
def classifier(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    pos = docs.filter(F.col("doc_id") % 3 == 0)
    neg = docs.filter(F.col("doc_id") % 3 == 1)
    coef, b0 = train_quality_classifier(pos, neg, num_buckets=B)
    return coef.cache(), b0


@pytest.fixture(scope="module")
def eval_set(spark):
    """Five corpus documents as the 'benchmark' — their duplicates (and
    themselves) must be decontaminated out of the training corpus."""
    return (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin([7, 42, 137, 251, 404]))
        .select("doc_id", "text")
    )


def _mk_pipeline(spark, tmp_path, tag, classifier, eval_set):
    coef, b0 = classifier
    emb = load_table(spark, SF_DIR, "embeddings")
    root = str(tmp_path / f"idx_{tag}")
    cent = emb.filter(F.col("vec_id") < N_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    # seed the index with the first 16 vectors (the centroids themselves)
    build_pq_index(
        emb.filter(F.col("vec_id") < 16), cent, cb, root,
        m=M, k_codes=K_CODES, dim=DIM,
    )

    def resolver(admitted):
        ids = admitted.select(
            (F.col("doc_id") % 500).alias("vec_id")
        ).distinct()
        return emb.join(ids, "vec_id", "left_semi")

    return ComposedCorpusPipeline(
        quality_gate=StreamingQualityGate(
            spark, coef, b0, num_buckets=B, threshold=0.5
        ),
        exact_gate=StreamingDocDedup(spark, str(tmp_path / f"fp_{tag}")),
        near_dup_gate=StreamingNearDupGate(spark, str(tmp_path / f"lsh_{tag}")),
        decontam_gate=StreamingDecontamGate(
            spark, eval_set, n=8, max_contamination=0.0, id_col="doc_id"
        ),
        index_append=StreamingIndexAppend(spark, root),
        embedding_resolver=resolver,
    ), root


def test_composed_stream_equals_direct_chain_and_batch_invariants(
    spark, tmp_path, corpus, classifier, eval_set
):
    coef, b0 = classifier
    # --- streamed: three files, one micro-batch each, one availableNow run
    src = tmp_path / "incoming"
    out = tmp_path / "admitted"
    src.mkdir()
    for i, chunk in enumerate(corpus):
        chunk.coalesce(1).write.mode("append").parquet(str(src))
    streamed, _root_s = _mk_pipeline(spark, tmp_path, "s", classifier, eval_set)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streamed.bind_stream(stream, str(out))
    q.awaitTermination(600)
    got = spark.read.parquet(str(out))
    got_ids = {r.doc_id for r in got.select("doc_id").collect()}
    # three micro-batches actually happened (epoch partitions)
    epochs = {r.epoch for r in got.select("epoch").distinct().collect()}
    assert len(epochs) == 3

    # --- direct: same chunks through process_batch on fresh stores
    direct, root_d = _mk_pipeline(spark, tmp_path, "d", classifier, eval_set)
    direct_ids = set()
    for i, chunk in enumerate(corpus):
        direct_ids |= {
            r.doc_id
            for r in direct.process_batch(chunk, epoch_id=i).collect()
        }
    assert got_ids == direct_ids and got_ids

    # --- batch-level invariants over the union
    union = corpus[0]
    for c in corpus[1:]:
        union = union.unionByName(c)
    admitted_docs = union.join(
        spark.createDataFrame([(i,) for i in got_ids], "doc_id long"),
        "doc_id",
        "left_semi",
    )
    # 1. quality: every admitted doc passes the batch filter
    q_ok = {
        r.doc_id
        for r in quality_filter(
            union, coef, b0, threshold=0.5, num_buckets=B
        ).collect()
    }
    assert got_ids <= q_ok
    # 2. exact dedup: admitted fingerprints are unique
    from l1dbproto_spark.operators.dedup import normalize_text

    n_docs = admitted_docs.count()
    n_fp = (
        admitted_docs.select(
            F.md5(normalize_text(F.coalesce("text", F.lit("")))).alias("fp")
        )
        .distinct()
        .count()
    )
    assert n_docs == n_fp
    # clones were injected AFTER their originals: none survive
    assert not {i for i in got_ids if i >= 10_000}
    # 3. decontam: nothing admitted overlaps the eval set above threshold
    from l1dbproto_spark.operators.contamination import ngram_contamination

    cont = ngram_contamination(admitted_docs, eval_set, n=8, id_col="doc_id")
    assert cont.filter(F.col("contamination") > 0.0).count() == 0
    assert not ({7, 42, 137, 251, 404} & got_ids)
    # 4. index: grew by exactly the admitted documents' vectors (plus the
    #    16 seeds), and a replayed append is a no-op (id idempotency)
    want_vecs = {i % 500 for i in got_ids} | set(range(16))
    idx = load_pq_index(spark, root_d)
    have = {r.neighbor_id for r in idx.codes().select("neighbor_id").collect()}
    assert have == want_vecs
    emb = load_table(spark, SF_DIR, "embeddings")
    assert direct.index_append.append(
        direct.embedding_resolver(admitted_docs)
    ) == 0

    # --- RESTART: a 4th chunk (re-delivered dups of earlier admissions +
    # fresh synthetic docs) arrives after the first query stopped; a new
    # availableNow binding over the SAME stores + checkpoint resumes at
    # epoch 3, rejects every re-delivery, and still equals the direct
    # chain's continuation
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    redelivered = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 30_000).alias("doc_id"), "text"
    )
    fresh = spark.createDataFrame(
        [
            (40_000 + i, f"entirely novel restart document number {i} "
             + " ".join(f"tok{i}x{j}" for j in range(12)))
            for i in range(8)
        ],
        "doc_id long, text string",
    )
    chunk4 = redelivered.unionByName(fresh)
    chunk4.coalesce(1).write.mode("append").parquet(str(src))
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q2 = streamed.bind_stream(stream2, str(out))
    q2.awaitTermination(600)
    after = spark.read.parquet(str(out))
    epochs2 = {r.epoch for r in after.select("epoch").distinct().collect()}
    assert epochs2 == {0, 1, 2, 3}
    # earlier epochs untouched by the restart
    prior = {
        r.doc_id
        for r in after.filter(F.col("epoch") < 3).select("doc_id").collect()
    }
    assert prior == got_ids
    got4 = {
        r.doc_id
        for r in after.filter(F.col("epoch") == 3).select("doc_id").collect()
    }
    direct4 = {
        r.doc_id for r in direct.process_batch(chunk4, epoch_id=3).collect()
    }
    assert got4 == direct4
    # every re-delivered duplicate rejected by the store-backed gates
    assert not {i for i in got4 if 30_000 <= i < 40_000}


def test_resolver_pairing_validated():
    with pytest.raises(ValueError, match="come as a pair"):
        ComposedCorpusPipeline(index_append=object())


def test_composed_pipeline_garbage_batches(spark, tmp_path, classifier, eval_set):
    """The composition inherits the gates' garbage resilience: null-text,
    whitespace-only, and duplicate-in-batch docs flow through without
    crashing, and a fully-empty batch is a no-op."""
    pipe, _root = _mk_pipeline(spark, tmp_path, "g", classifier, eval_set)
    garbage = spark.createDataFrame(
        [
            (1, None),
            (2, "   "),
            (3, "some genuine text with enough words to maybe pass gates"),
            (4, "some genuine text with enough words to maybe pass gates"),
        ],
        "doc_id long, text string",
    )
    out1 = pipe.process_batch(garbage, epoch_id=0)
    ids = {r.doc_id for r in out1.collect()}
    # exact gate admits at most one of the duplicate pair
    assert not ({3, 4} <= ids)
    # empty batch: no-op, returns an empty frame with the input schema
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pipe.process_batch(empty, epoch_id=1).count() == 0
    # re-running the same epoch (retry semantics) yields the same admits
    out_retry = {r.doc_id for r in pipe.process_batch(garbage, epoch_id=0).collect()}
    assert out_retry == ids


def test_streamed_audit_log(spark, tmp_path, corpus, classifier, eval_set):
    """audit_path: the per-stage drop-rate log lands epoch-partitioned,
    counts are monotone non-increasing through each epoch's gate chain,
    and the final stage count equals that epoch's admitted rows."""
    src = tmp_path / "incoming_a"
    out = tmp_path / "admitted_a"
    audit = tmp_path / "audit_a"
    src.mkdir()
    for chunk in corpus[:2]:
        chunk.coalesce(1).write.mode("append").parquet(str(src))
    pipe, _root = _mk_pipeline(spark, tmp_path, "a", classifier, eval_set)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = pipe.bind_stream(stream, str(out), audit_path=str(audit))
    q.awaitTermination(600)
    log = spark.read.parquet(str(audit)).collect()
    by_epoch = {}
    for r in log:
        by_epoch.setdefault(r.epoch, []).append((r.stage_index, r.stage, r.rows))
    assert set(by_epoch) == {0, 1}
    got = spark.read.parquet(str(out))
    for ep, rows in by_epoch.items():
        rows.sort()
        stages = [s for _, s, _ in rows]
        assert stages == ["input", "quality", "exact_dedup", "near_dedup", "decontam"]
        counts = [n for _, _, n in rows]
        assert counts == sorted(counts, reverse=True)
        admitted_ep = got.filter(F.col("epoch") == ep).count()
        assert counts[-1] == admitted_ep


def test_partial_gate_configurations(spark, tmp_path, classifier):
    """Gates are optional and independent: a quality-only pipeline equals
    the gate's own admit; an exact-only pipeline equals the dedup gate's
    keep set with original columns."""
    coef, b0 = classifier
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)

    q_gate = StreamingQualityGate(spark, coef, b0, num_buckets=B, threshold=0.5)
    p_quality = ComposedCorpusPipeline(quality_gate=q_gate)
    a = {r.doc_id for r in p_quality.process_batch(docs).collect()}
    b = {r.doc_id for r in q_gate.admit(docs).collect()}
    assert a == b

    e_gate = StreamingDocDedup(spark, str(tmp_path / "fp_partial"))
    p_exact = ComposedCorpusPipeline(exact_gate=e_gate)
    dup = docs.unionByName(
        docs.limit(5).select((F.col("doc_id") + 5000).alias("doc_id"), "text")
    )
    out = p_exact.process_batch(dup, epoch_id=0)
    assert set(out.columns) == {"doc_id", "text"}
    kept = {r.doc_id for r in out.collect()}
    assert len(kept) == 60  # 5 clones rejected, originals kept
    assert not {i for i in kept if i >= 5000}

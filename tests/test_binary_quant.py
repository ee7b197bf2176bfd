"""1-bit binary quantization (operators/quantize.py hamming_topk family):
numpy-reference signature packing, exact Hamming algebra, degenerate-vector
robustness, and pre-filter/re-rank recall against exact brute force."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from l1dbproto_spark.operators.quantize import (
    asym_sign_score,
    binary_signature,
    hamming,
    hamming_topk,
    quantize_embeddings,
)
from l1dbproto_spark.operators.similarity import ann_recall, brute_force_topk
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _np_signature(vec: list[float], dim: int) -> list[int]:
    """Reference packer: bit i of word i//64 set iff vec[i] > 0, stored as
    signed int64 words."""
    n_words = (dim + 63) // 64
    words = [0] * n_words
    for i, x in enumerate(vec):
        if x > 0:
            words[i // 64] |= 1 << (i % 64)
    return [int(np.int64(np.uint64(w))) for w in words]


def test_signature_matches_numpy_reference(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    got = (
        emb.select("vec_id", binary_signature(F.col("embedding"), 64).alias("sig"))
        .toPandas()
        .set_index("vec_id")["sig"]
        .to_dict()
    )
    vecs = emb.select("vec_id", "embedding").toPandas()
    for _, row in vecs.iterrows():
        assert list(got[row.vec_id]) == _np_signature(list(row.embedding), 64)


def test_signature_multiword_and_tail(spark):
    # dim=100 -> two words, tail word uses only bits 0..35
    df = spark.createDataFrame(
        [(1, [1.0 if i % 3 == 0 else -1.0 for i in range(100)])],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    got = df.select(binary_signature(F.col("v"), 100).alias("sig")).collect()[0].sig
    want = _np_signature([1.0 if i % 3 == 0 else -1.0 for i in range(100)], 100)
    assert list(got) == want
    assert len(got) == 2


def test_hamming_matches_numpy_popcount(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.standard_normal(64)]) for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    sigs = df.select("id", binary_signature(F.col("v"), 64).alias("sig"))
    a = sigs.select(F.col("id").alias("ida"), F.col("sig").alias("sa"))
    b = sigs.select(F.col("id").alias("idb"), F.col("sig").alias("sb"))
    got = {
        (r.ida, r.idb): r.h
        for r in a.crossJoin(b)
        .select("ida", "idb", hamming(F.col("sa"), F.col("sb")).alias("h"))
        .collect()
    }
    np_sigs = {i: _np_signature(v, 64)[0] for i, v in rows}
    for (ia, va), (ib, vb) in [(x, y) for x in rows for y in rows]:
        want = bin((np_sigs[ia] ^ np_sigs[ib]) & (2**64 - 1)).count("1")
        assert got[(ia, ib)] == want
    # identity: distance to self is zero
    assert all(got[(i, i)] == 0 for i, _ in rows)


def test_asym_sign_score_matches_numpy(spark):
    # asym score = sum_i q8[i] * (2*bit_i - 1), exact integers; check the
    # Spark unpack-and-fold against a direct numpy evaluation, including a
    # multi-word dim with a tail word (dim=100)
    rng = np.random.default_rng(11)
    dim = 100
    rows = [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(12)]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    q = quantize_embeddings(df, "v", "q").select(
        F.col("id").alias("qid"), F.col("qvec").alias("q8")
    )
    c = df.select(
        F.col("id").alias("cid"), binary_signature(F.col("v"), dim).alias("sig")
    )
    got = {
        (r.qid, r.cid): r.s
        for r in q.crossJoin(c)
        .select("qid", "cid", asym_sign_score(F.col("q8"), F.col("sig"), dim).alias("s"))
        .collect()
    }
    for qid, qv in rows:
        a = np.asarray(qv)
        amax = np.abs(a).max()
        q8 = np.floor(a / (amax / 127.0) + 0.5).astype(np.int64)
        for cid, cv in rows:
            signs = np.where(np.asarray(cv) > 0, 1, -1)
            assert got[(qid, cid)] == int((q8 * signs).sum()), (qid, cid)


def test_hamming_topk_symmetric_mode_still_exact(spark):
    # the opt-out symmetric path keeps its contract: k rows per query,
    # ranks 1..k, cosine matches brute force on the tiny fixture
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    approx = hamming_topk(emb, queries, k=5, refine=16, dim=64, asymmetric=False)
    exact = brute_force_topk(emb, queries, k=5)
    r = ann_recall(approx, exact).agg(F.avg("recall").alias("r")).collect()[0].r
    assert r >= 0.9  # tiny corpus: pre-filter covers most of it


def test_hamming_topk_recall_and_guards(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    approx = hamming_topk(emb, queries, k=5, refine=16, dim=64)
    r = ann_recall(approx, exact).agg(F.avg("recall").alias("r")).collect()[0].r
    # sf0.001 fixture is tiny (pre-filter covers most of the corpus):
    # recall must be near-exact here; the honest bench-shape floor (0.5)
    # lives in RECALL_FLOORS and tests/test_ann_recall_floors.py
    assert r >= 0.9
    # exactly k rows per query, ranks 1..k
    per_q = (
        approx.groupBy("query_id").agg(F.count("*").alias("n"), F.max("rank").alias("m"))
    ).collect()
    assert all(row.n == 5 and row.m == 5 for row in per_q)


def test_hamming_topk_degenerate_vectors(spark):
    # zero vector as corpus member: dropped from candidates (cosine
    # undefined), never crashes the ANSI division
    rows = [(0, [1.0, 2.0] + [0.0] * 62), (1, [0.0] * 64), (2, [1.0, 1.9] + [0.0] * 62)]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    out = hamming_topk(df, df.filter(F.col("vec_id") == 0), k=2, refine=2, dim=64)
    got = out.collect()
    assert [r.neighbor_id for r in got] == [2]

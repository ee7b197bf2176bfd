"""Product quantization (operators/pq.py): DuckDB-oracle equivalence of the
encode stage (deterministic codebooks), compression invariants, and ADC
recall against exact brute force."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.pq import adc_topk, pq_codebooks, pq_encode
from l1dbproto_spark.operators.similarity import brute_force_topk
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
M, K_CODES, DIM = 8, 16, 64


def test_pq_encode_matches_oracle(spark):
    """Per-subspace L2-argmin assignment reproduced by DuckDB from the same
    deterministic codebooks (first k_codes corpus vectors' subvectors)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    got = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb, cb, m=M, dim=DIM).collect()
    }
    sub = DIM // M
    want_rows = duckdb.sql(
        f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM '{SF_DIR}/embeddings.parquet'
        ),
        cb AS (
          SELECT CAST(vec_id AS INT) AS code, v FROM e
          WHERE vec_id < {K_CODES}
        ),
        subs AS (
          SELECT e.vec_id, j.j AS subspace,
                 v[j.j * {sub} + 1 : (j.j + 1) * {sub}] AS sub
          FROM e, unnest(range(0, {M})) AS j(j)
        ),
        cbsubs AS (
          SELECT code, j.j AS subspace,
                 v[j.j * {sub} + 1 : (j.j + 1) * {sub}] AS centroid
          FROM cb, unnest(range(0, {M})) AS j(j)
        ),
        assigned AS (
          SELECT vec_id, s.subspace, code,
                 ROW_NUMBER() OVER (
                   PARTITION BY vec_id, s.subspace
                   ORDER BY 2 * list_dot_product(sub, centroid)
                            - list_dot_product(centroid, centroid) DESC,
                            code
                 ) AS rn
          FROM subs s JOIN cbsubs c ON s.subspace = c.subspace
        )
        SELECT vec_id, subspace, code FROM assigned WHERE rn = 1
        ORDER BY vec_id, subspace
        """
    ).fetchall()
    want: dict[int, list[int]] = {}
    for vec_id, _subspace, code in want_rows:
        want.setdefault(vec_id, []).append(code)
    assert got == want
    # compression invariant: m codes per vector, all within [0, k_codes)
    assert all(len(c) == M and all(0 <= x < K_CODES for x in c) for c in got.values())


def test_adc_topk_recall_and_exact_rerank(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in adc_topk(emb, queries, cb, k=5, refine=8, m=M, k_codes=K_CODES, dim=DIM).collect()
    }
    # every query returns exactly k rows
    from collections import Counter

    per_q = Counter(q for q, _ in approx)
    assert all(v == 5 for v in per_q.values()) and len(per_q) == 10
    # deterministic-codebook PQ at 32x compression with 8x refine keeps
    # useful recall on this corpus; the re-rank reports EXACT cosine, so
    # wherever the pair sets agree the values agree bit-for-bit
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.5, recall
    for key, sim in approx.items():
        if key in exact:
            assert sim == exact[key]


def test_adc_scoring_plan_shape(spark):
    """Stage-1 ADC scoring must not shuffle the corpus: the only join
    against the coded corpus is the broadcast of the per-query LUTs
    (encode's internal argmin aggregates on uniform (vec, subspace) keys)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    df = adc_topk(emb, queries, cb, k=3, refine=2, m=M, k_codes=K_CODES, dim=DIM)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # the all-pairs ADC stage must score on the m-byte codes alone: the plan
    # subtree below the k*refine window filter (printed after the last _prn
    # node) is the crossJoin + encode — the full-precision corpus column
    # (aliased cvec) may only appear above it, in the survivor re-rank join
    below_prefilter = plan.split("_prn")[-1]
    assert "AS cvec" not in below_prefilter, below_prefilter


def test_pq_rejects_non_divisible_m(spark):
    """dim % m != 0 must raise in every entry point — a silent F.slice past
    the array end would drop the tail dimensions from the codes."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(emb, m=7, k_codes=K_CODES, dim=DIM)
    with pytest.raises(ValueError, match="divisible"):
        pq_encode(emb, cb, m=7, dim=DIM)
    with pytest.raises(ValueError, match="divisible"):
        adc_topk(emb, emb.limit(1), cb, m=7, dim=DIM)


def test_trained_codebooks_recall_parity(spark):
    """KMeans-trained codebooks (the paper's training procedure) plug into
    the same plan and must recall within noise of the first-k
    deterministic quantizer at equal (m, k_codes). On this SYNTHETIC
    corpus the embeddings are near-uniform, so actual corpus vectors are
    already a competitive quantizer and training cannot dominate — the
    trained path's win appears on clustered real-world distributions; what
    this pins is that training is wired correctly (right subspaces, right
    table shape, sane recall), not a structural regression."""
    from l1dbproto_spark.operators.pq import (
        adc_topk,
        pq_codebooks,
        trained_pq_codebooks,
    )
    from l1dbproto_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    kw = dict(k=5, refine=4, m=M, k_codes=K_CODES, dim=DIM)
    det_cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    det = {
        (r.query_id, r.neighbor_id)
        for r in adc_topk(emb, queries, det_cb, **kw).collect()
    }
    tr_cb = trained_pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    assert tr_cb.count() == M * K_CODES
    tr = {
        (r.query_id, r.neighbor_id)
        for r in adc_topk(emb, queries, tr_cb, **kw).collect()
    }
    r_det = len(exact & det) / len(exact)
    r_tr = len(exact & tr) / len(exact)
    assert r_tr >= r_det - 0.1, (r_tr, r_det)
    assert r_tr >= 0.4, r_tr

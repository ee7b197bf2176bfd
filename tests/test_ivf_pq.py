"""IVF x PQ composition (operators/pq.ivf_pq_topk): full-probe equivalence
with plain ADC, DuckDB-oracle equality of the whole pruned composition with
fixed quantizers, recall floor vs exact brute force, and plan-shape guards
(no full-corpus scan in the scoring stage)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from l1dbproto_spark.operators.pq import adc_topk, ivf_pq_topk, pq_codebooks
from l1dbproto_spark.operators.similarity import brute_force_topk
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
M, K_CODES, DIM, N_CLUSTERS = 8, 16, 64, 16


def _fixed_centroids(emb):
    """Deterministic coarse quantizer: the first 16 corpus vectors — the
    same fixed-quantizer pattern as the ann_topk_ivf driver oracle."""
    return emb.filter(F.col("vec_id") < N_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )


def test_full_probe_equals_plain_adc(spark):
    """Probing every cluster disables IVF pruning, so the composition must
    reproduce adc_topk exactly (same LUTs, same ADC scores, same re-rank) —
    the strongest internal check that the cluster plumbing drops no pairs."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    cent = _fixed_centroids(emb)
    kw = dict(k=5, refine=4, m=M, k_codes=K_CODES, dim=DIM)
    plain = {tuple(r) for r in adc_topk(emb, queries, cb, **kw).collect()}
    composed = {
        tuple(r)
        for r in ivf_pq_topk(
            emb, queries, cent, cb, n_probe=N_CLUSTERS, **kw
        ).collect()
    }
    assert composed == plain and len(plain) == 8 * 5


def test_ivf_pq_matches_duckdb_oracle(spark):
    """The full pruned composition — assignment, probing, encoding, LUT ADC
    scoring, k*refine prefilter, exact re-rank — reproduced by DuckDB from
    the same fixed quantizers, row-for-row."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    cent = _fixed_centroids(emb)
    got = {
        (r.query_id, r.neighbor_id): (r.cosine_sim, r.rank)
        for r in ivf_pq_topk(
            emb, queries, cent, cb, k=5, n_probe=2, refine=4,
            m=M, k_codes=K_CODES, dim=DIM,
        ).collect()
    }
    sub = DIM // M
    cscore = "2 * list_dot_product({v}, cent.cv) - list_dot_product(cent.cv, cent.cv)"
    want_rows = duckdb.sql(
        f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM '{SF_DIR}/embeddings.parquet'
        ),
        cent AS (SELECT CAST(vec_id AS INT) AS cluster, v AS cv FROM e
                 WHERE vec_id < {N_CLUSTERS}),
        assigned AS (
          SELECT vec_id AS neighbor_id, cluster FROM (
            SELECT e.vec_id, cent.cluster,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {cscore.format(v='e.v')} DESC, cent.cluster
                   ) AS rn
            FROM e CROSS JOIN cent
          ) t WHERE rn = 1
        ),
        cb AS (SELECT CAST(vec_id AS INT) AS code, v FROM e WHERE vec_id < {K_CODES}),
        cbsubs AS (
          SELECT code, j.j AS subspace,
                 v[j.j * {sub} + 1 : (j.j + 1) * {sub}] AS centroid
          FROM cb, unnest(range(0, {M})) AS j(j)
        ),
        subs AS (
          SELECT vec_id, j.j AS subspace,
                 v[j.j * {sub} + 1 : (j.j + 1) * {sub}] AS sub
          FROM e, unnest(range(0, {M})) AS j(j)
        ),
        codes AS (
          SELECT vec_id AS neighbor_id, subspace, code FROM (
            SELECT s.vec_id, s.subspace, c.code,
                   ROW_NUMBER() OVER (
                     PARTITION BY s.vec_id, s.subspace
                     ORDER BY 2 * list_dot_product(sub, centroid)
                              - list_dot_product(centroid, centroid) DESC,
                              code
                   ) AS rn
            FROM subs s JOIN cbsubs c ON s.subspace = c.subspace
          ) t WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, cluster FROM (
            SELECT q.vec_id, cent.cluster,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY {cscore.format(v='q.v')} DESC, cent.cluster
                   ) AS rn
            FROM e q CROSS JOIN cent WHERE q.vec_id < 10
          ) t WHERE rn <= 2
        ),
        qsubs AS (
          SELECT vec_id AS query_id, j.j AS subspace,
                 v[j.j * {sub} + 1 : (j.j + 1) * {sub}] AS qsub
          FROM e, unnest(range(0, {M})) AS j(j) WHERE vec_id < 10
        ),
        -- ADC = in-subspace-order sum of LUT lookups; list(ORDER BY) +
        -- list_sum reproduces the engine's ordered left fold from 0.0
        adc AS (
          SELECT p.query_id, a.neighbor_id,
                 list_sum(list(list_dot_product(q.qsub, cb2.centroid)
                               ORDER BY c.subspace)) AS adc
          FROM probes p
          JOIN assigned a USING (cluster)
          JOIN codes c ON c.neighbor_id = a.neighbor_id
          JOIN qsubs q ON q.query_id = p.query_id AND q.subspace = c.subspace
          JOIN cbsubs cb2 ON cb2.subspace = c.subspace AND cb2.code = c.code
          WHERE a.neighbor_id <> p.query_id
          GROUP BY p.query_id, a.neighbor_id
        ),
        cand AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY adc DESC, neighbor_id
            ) AS prn FROM adc
          ) t WHERE prn <= 20
        )
        SELECT query_id, neighbor_id, cosine_sim, rank FROM (
          SELECT cand.query_id, cand.neighbor_id,
                 round(list_dot_product(qe.v, ce.v)
                       / (sqrt(list_dot_product(qe.v, qe.v))
                          * sqrt(list_dot_product(ce.v, ce.v))), 9) AS cosine_sim,
                 ROW_NUMBER() OVER (
                   PARTITION BY cand.query_id
                   ORDER BY round(list_dot_product(qe.v, ce.v)
                       / (sqrt(list_dot_product(qe.v, qe.v))
                          * sqrt(list_dot_product(ce.v, ce.v))), 9) DESC,
                       cand.neighbor_id
                 ) AS rank
          FROM cand
          JOIN e qe ON qe.vec_id = cand.query_id
          JOIN e ce ON ce.vec_id = cand.neighbor_id
        ) t WHERE rank <= 5
        """
    ).fetchall()
    want = {(q, n): (s, r) for q, n, s, r in want_rows}
    assert got == want


def test_ivf_pq_recall_vs_brute(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    cent = _fixed_centroids(emb)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_topk(
            emb, queries, cent, cb, k=5, n_probe=3, refine=8,
            m=M, k_codes=K_CODES, dim=DIM,
        ).collect()
    }
    # two lossy levers stacked (3/16 probes + 32x codes): still a floor
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.25, recall


def test_ivf_pq_plan_shape(spark):
    """The scoring stage must be an equi-join on cluster (BroadcastHashJoin
    probing only the batch's clusters), never a full-corpus crossJoin, and
    no full-precision vector may flow below the k*refine prefilter."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    cent = _fixed_centroids(emb)
    df = ivf_pq_topk(
        emb, queries, cent, cb, k=3, n_probe=2, refine=2,
        m=M, k_codes=K_CODES, dim=DIM,
    )
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin [cluster" in plan, plan
    # "AS cvec" (the re-rank projection), not bare "cvec": the centroid
    # column _cvec in the assignment subtree would false-positive
    below_prefilter = plan.split("_prn")[-1]
    assert "AS cvec" not in below_prefilter, below_prefilter


def test_residual_recall_at_least_raw(spark):
    """The point of residual encoding (Jegou 2011 §IV-A): at EQUAL code
    budget (same m, k_codes, n_probe, refine) the residual-encoded
    composition must recall at least as much of the exact top-k as the
    raw-codebook one — residuals are concentrated around the origin, so
    the same codes spend their resolution on a smaller cell."""
    from l1dbproto_spark.operators.pq import (
        ivf_pq_residual_topk,
        residual_codebooks,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    cent = _fixed_centroids(emb)
    kw = dict(k=5, n_probe=3, refine=8, m=M, k_codes=K_CODES, dim=DIM)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    raw_cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    raw = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_topk(emb, queries, cent, raw_cb, **kw).collect()
    }
    res_cb = residual_codebooks(emb, cent, m=M, k_codes=K_CODES, dim=DIM)
    res = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_residual_topk(emb, queries, cent, res_cb, **kw).collect()
    }
    r_raw = len(exact & raw) / len(exact)
    r_res = len(exact & res) / len(exact)
    assert r_res >= r_raw, (r_res, r_raw)
    assert r_res >= 0.25, r_res


def test_residual_shared_codebook_variant(spark):
    """per_cluster=False is the paper's shared residual quantizer: same
    output shape, k results per query, and the exact re-rank keeps every
    returned similarity truthful (matches brute-force cosine for the same
    pair)."""
    from l1dbproto_spark.operators.pq import (
        ivf_pq_residual_topk,
        residual_codebooks,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cent = _fixed_centroids(emb)
    res_cb = residual_codebooks(
        emb, cent, m=M, k_codes=K_CODES, dim=DIM, per_cluster=False
    )
    assert "cluster" not in res_cb.columns
    out = ivf_pq_residual_topk(
        emb, queries, cent, res_cb, k=5, n_probe=3, refine=4,
        m=M, k_codes=K_CODES, dim=DIM,
    ).collect()
    assert len(out) == 8 * 5
    exact_sims = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in brute_force_topk(emb, queries, k=500).collect()
    }
    for r in out:
        assert r.cosine_sim == exact_sims[(r.query_id, r.neighbor_id)]


def test_residual_small_cluster_codebooks(spark):
    """A cluster with fewer than k_codes members gets a short per-cluster
    codebook; encoding and the filter-based LUT assembly must both handle
    it (codes stay in range, scoring still returns k results)."""
    from l1dbproto_spark.operators.pq import (
        ivf_pq_residual_topk,
        residual_codebooks,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    # 64 clusters over 500 vectors -> ~8 members/cluster << k_codes=16
    cent = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    res_cb = residual_codebooks(emb, cent, m=M, k_codes=K_CODES, dim=DIM)
    max_codes = res_cb.groupBy("cluster", "subspace").count()
    assert max_codes.agg(F.max("count")).first()[0] <= K_CODES
    queries = emb.filter(F.col("vec_id") < 6)
    out = ivf_pq_residual_topk(
        emb, queries, cent, res_cb, k=3, n_probe=8, refine=4,
        m=M, k_codes=K_CODES, dim=DIM,
    )
    rows = out.collect()
    assert len(rows) == 6 * 3
    assert {r.query_id for r in rows} == set(range(6))


def test_residual_plan_shape(spark):
    """Same guards as the raw composition: scoring is a BroadcastHashJoin
    on cluster (no SortMergeJoin, no crossJoin), and no full-precision
    corpus vector flows below the k*refine prefilter."""
    from l1dbproto_spark.operators.pq import (
        ivf_pq_residual_topk,
        residual_codebooks,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cent = _fixed_centroids(emb)
    res_cb = residual_codebooks(emb, cent, m=M, k_codes=K_CODES, dim=DIM)
    df = ivf_pq_residual_topk(
        emb, queries, cent, res_cb, k=3, n_probe=2, refine=2,
        m=M, k_codes=K_CODES, dim=DIM,
    )
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin [cluster" in plan, plan
    below_prefilter = plan.split("_prn")[-1]
    assert "AS cvec" not in below_prefilter, below_prefilter

"""Persistent IVF-PQ index (operators/pq.py build_pq_index/load_pq_index/
pq_index_topk): the build-once / query-many production shape. The persisted
path must return row-identical results to the in-memory compositions, the
probe-time code scan must be partition-pruned to the probed clusters, and
the full-precision corpus may appear only under the exact re-rank."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.pq import (
    build_pq_index,
    ivf_pq_residual_topk,
    ivf_pq_topk,
    load_pq_index,
    pq_codebooks,
    pq_index_topk,
    residual_codebooks,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
M, K_CODES, DIM, N_CLUSTERS = 8, 16, 64, 16


def _fixed_centroids(emb):
    return emb.filter(F.col("vec_id") < N_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )


def test_raw_index_matches_inmemory(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cent = _fixed_centroids(emb)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    kw = dict(k=5, n_probe=2, refine=4)
    want = {
        tuple(r)
        for r in ivf_pq_topk(
            emb, queries, cent, cb, m=M, k_codes=K_CODES, dim=DIM, **kw
        ).collect()
    }
    build_pq_index(
        emb, cent, cb, str(tmp_path / "idx"), m=M, k_codes=K_CODES, dim=DIM
    )
    idx = load_pq_index(spark, str(tmp_path / "idx"))
    assert (idx.meta.m, idx.meta.k_codes, idx.meta.dim) == (M, K_CODES, DIM)
    assert not idx.meta.residual and not idx.meta.per_cluster_codebooks
    got = {tuple(r) for r in pq_index_topk(idx, queries, emb, **kw).collect()}
    assert got == want and len(got) == 10 * 5


def test_residual_index_matches_inmemory(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cent = _fixed_centroids(emb)
    res_cb = residual_codebooks(emb, cent, m=M, k_codes=K_CODES, dim=DIM)
    kw = dict(k=5, n_probe=3, refine=4)
    want = {
        tuple(r)
        for r in ivf_pq_residual_topk(
            emb, queries, cent, res_cb, m=M, k_codes=K_CODES, dim=DIM, **kw
        ).collect()
    }
    build_pq_index(
        emb, cent, res_cb, str(tmp_path / "idx"),
        m=M, k_codes=K_CODES, dim=DIM, residual=True,
    )
    idx = load_pq_index(spark, str(tmp_path / "idx"))
    assert idx.meta.residual and idx.meta.per_cluster_codebooks
    got = {tuple(r) for r in pq_index_topk(idx, queries, emb, **kw).collect()}
    assert got == want and len(got) == 8 * 5


def test_index_scan_is_partition_pruned(spark, tmp_path):
    """The probe-time code read must carry PartitionFilters on the probed
    cluster ids (listing only those directories), and the corpus parquet
    may be scanned only in the exact re-rank below the prefilter."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    cent = _fixed_centroids(emb)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    build_pq_index(
        emb, cent, cb, str(tmp_path / "idx"), m=M, k_codes=K_CODES, dim=DIM
    )
    idx = load_pq_index(spark, str(tmp_path / "idx"))
    df = pq_index_topk(idx, queries, emb, k=3, n_probe=2, refine=2)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # identify the code scan by its column list — the Location path may be
    # truncated in the plan string for long tmp directories
    code_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet [neighbor_id#" in ln
    ]
    assert code_scans and all(
        "PartitionFilters: [cluster" in ln for ln in code_scans
    ), code_scans
    # at most 2*3=6 probed clusters listed, never all 16
    import re

    for ln in code_scans:
        in_list = re.search(r"cluster#\d+ IN \(([^)]*)\)", ln)
        assert in_list, ln
        assert len(in_list.group(1).split(",")) <= 6, ln
    # in the scoring subtree (printed after the _prn prefilter) the only
    # embeddings scans are the QUERY role (vec_id < 3 pushed down) — the
    # full corpus is never scanned to score; it appears only in the
    # re-rank above the prefilter
    scoring_side = plan.split("_prn")[-1]
    emb_scans = [
        ln
        for ln in scoring_side.splitlines()
        if "FileScan" in ln and "embeddings" in ln
    ]
    assert all("LessThan(vec_id,3)" in ln for ln in emb_scans), emb_scans


def test_index_queryable_without_rebuild(spark, tmp_path):
    """A fresh load from the directory alone (new handle, no build state)
    answers queries — the build-once/query-many contract."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cent = _fixed_centroids(emb)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    build_pq_index(
        emb, cent, cb, str(tmp_path / "idx"), m=M, k_codes=K_CODES, dim=DIM
    )
    idx = load_pq_index(spark, str(tmp_path / "idx"))
    q1 = emb.filter(F.col("vec_id") == 42)
    out = pq_index_topk(idx, q1, emb, k=4, n_probe=4, refine=4).collect()
    assert len(out) == 4
    assert all(r.query_id == 42 and r.neighbor_id != 42 for r in out)
    ranks = sorted(r.rank for r in out)
    assert ranks == [1, 2, 3, 4]


def test_append_equals_rebuild(spark, tmp_path):
    """Growing an index with append_to_pq_index equals building it from
    scratch over the union with the same frozen quantizers — for both
    the raw and residual forms — and the probe path stays
    partition-pruned after the append."""
    from l1dbproto_spark.operators.pq import append_to_pq_index

    emb = load_table(spark, SF_DIR, "embeddings")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 8)
    cent = _fixed_centroids(emb)
    kw = dict(k=5, n_probe=2, refine=4)
    for residual, cb in (
        (False, pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)),
        (True, residual_codebooks(emb, cent, m=M, k_codes=K_CODES, dim=DIM)),
    ):
        grown_root = str(tmp_path / f"grown_{residual}")
        build_pq_index(
            half_a, cent, cb, grown_root, m=M, k_codes=K_CODES, dim=DIM,
            residual=residual,
        )
        idx = load_pq_index(spark, grown_root)
        append_to_pq_index(idx, half_b)
        full_root = str(tmp_path / f"full_{residual}")
        build_pq_index(
            emb, cent, cb, full_root, m=M, k_codes=K_CODES, dim=DIM,
            residual=residual,
        )
        full = load_pq_index(spark, full_root)
        got = {tuple(r) for r in pq_index_topk(idx, queries, emb, **kw).collect()}
        want = {tuple(r) for r in pq_index_topk(full, queries, emb, **kw).collect()}
        assert got == want and len(got) == 8 * 5
        # code stores identical row-wise
        a = {
            (r.cluster, r.neighbor_id, tuple(r.codes))
            for r in idx.codes().collect()
        }
        b = {
            (r.cluster, r.neighbor_id, tuple(r.codes))
            for r in full.codes().collect()
        }
        assert a == b


def test_index_ingestion_excludes_degenerate_vectors(spark, tmp_path):
    """NULL / wrong-dim / NaN-element vectors never enter the code store
    (build or append); a well-formed all-zero vector does."""
    from l1dbproto_spark.operators.pq import append_to_pq_index

    emb = load_table(spark, SF_DIR, "embeddings")
    cent = _fixed_centroids(emb)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    root = str(tmp_path / "guarded")
    build_pq_index(emb, cent, cb, root, m=M, k_codes=K_CODES, dim=DIM)
    idx = load_pq_index(spark, root)
    n_before = idx.codes().count()
    bad = spark.createDataFrame(
        [
            (99990, None),
            (99991, [float("nan")] * DIM),
            (99992, [1.0] * (DIM - 1)),
            (99993, [0.0] * DIM),
        ],
        "vec_id long, embedding array<double>",
    )
    append_to_pq_index(idx, bad)
    stored = {
        r.neighbor_id
        for r in idx.codes().filter(F.col("neighbor_id") >= 99990).collect()
    }
    assert stored == {99993}
    assert idx.codes().count() == n_before + 1


def test_per_cluster_codebooks_require_residual(spark, tmp_path):
    """Raw (non-residual) composition with cluster-keyed codebooks is
    rejected loudly — the shared-LUT query path would silently mis-score
    them."""
    import pytest

    from l1dbproto_spark.operators.pq import ivf_pq_topk as mem_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    cent = _fixed_centroids(emb)
    per_cluster = residual_codebooks(emb, cent, m=M, k_codes=K_CODES, dim=DIM)
    assert "cluster" in per_cluster.columns
    with pytest.raises(ValueError, match="residual"):
        build_pq_index(
            emb, cent, per_cluster, str(tmp_path / "bad"),
            m=M, k_codes=K_CODES, dim=DIM, residual=False,
        )
    with pytest.raises(ValueError, match="residual"):
        mem_topk(
            emb, emb.limit(2), cent, per_cluster, m=M, k_codes=K_CODES, dim=DIM
        )

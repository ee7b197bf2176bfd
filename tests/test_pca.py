"""PCA projection (operators/pca.py): numpy-reference parity against the
fitted MLlib basis, dot-product preservation at full rank, variance
ordering, and the broadcast single-scan plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.pca import fit_pca, pca_project
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


def _vecs(spark):
    return load_table(spark, SF_DIR, "embeddings").limit(400)


@pytest.fixture(scope="module")
def fitted(spark):
    vecs = _vecs(spark)
    comps, var = fit_pca(vecs, k=16)
    return vecs, comps.cache(), var


def test_projection_matches_numpy(spark, fitted):
    vecs, comps, _ = fitted
    pc = np.array(
        [
            r.component
            for r in comps.orderBy("component_id").collect()
        ]
    ).T  # d x k
    got = {
        r.vec_id: np.array(r.embedding)
        for r in pca_project(vecs, comps).collect()
    }
    for r in vecs.collect():
        want = np.array(r.embedding) @ pc
        assert np.allclose(got[r.vec_id], want, atol=1e-9), r.vec_id


def test_explained_variance_sorted_and_normalized(spark, fitted):
    _, _, var = fitted
    assert var == sorted(var, reverse=True)
    assert 0 < sum(var) <= 1.0 + 1e-9
    assert len(var) == 16


def test_full_rank_preserves_dot_products(spark):
    vecs = _vecs(spark).limit(40)
    comps, _ = fit_pca(vecs, k=DIM)
    proj = {
        r.vec_id: np.array(r.embedding)
        for r in pca_project(vecs, comps).collect()
    }
    orig = {r.vec_id: np.array(r.embedding) for r in vecs.collect()}
    ids = sorted(orig)[:10]
    for a in ids[:5]:
        for b in ids[5:]:
            assert np.dot(proj[a], proj[b]) == pytest.approx(
                np.dot(orig[a], orig[b]), rel=1e-6, abs=1e-6
            )


def test_out_col_and_plan(spark, fitted):
    vecs, comps, _ = fitted
    out = pca_project(vecs, comps, out_col="emb16")
    row = out.limit(1).collect()[0]
    assert len(row.emb16) == 16 and len(row.embedding) == DIM
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("embeddings.parquet") == 1


def test_composes_with_brute_force_topk(spark, fitted):
    """ANN in the projected space composes mechanically and beats chance
    by an order of magnitude. The synthetic embeddings are isotropic —
    PCA's worst case (no variance to concentrate), so recall here is a
    floor guard, not a quality claim; on real encoder outputs the
    variance concentration is what makes the 768->64 composition
    standard practice."""
    from l1dbproto_spark.operators.similarity import brute_force_topk

    vecs, comps, _ = fitted
    proj = pca_project(vecs, comps).cache()
    queries = proj.filter(F.col("vec_id") < 5)
    full_q = vecs.filter(F.col("vec_id") < 5)
    approx = brute_force_topk(proj, queries, k=10)
    exact = brute_force_topk(vecs, full_q, k=10)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    # chance = 10/400 = 2.5%; require >4x chance on isotropic data
    assert len(a & e) / len(e) > 0.1


def test_composes_with_ivf_ann(spark, fitted):
    """The published pre-ANN pipeline: PCA-project the corpus, build an
    IVF index in the REDUCED space, query with projected queries. The
    composition must run end-to-end with the reduced dimension flowing
    through training, assignment, and scoring, and return well-formed
    per-query top-k."""
    from l1dbproto_spark.operators.similarity import ivf_topk

    vecs, comps, _ = fitted
    proj = pca_project(vecs, comps).cache()
    queries = proj.filter(F.col("vec_id") < 4)
    out = ivf_topk(proj, queries, k=5, n_clusters=8, n_probe=3)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for q, rs in by_q.items():
        assert len(rs) == 5
        assert all(r.neighbor_id != q for r in rs)

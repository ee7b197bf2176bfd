"""Multi-vector late-interaction retrieval (operators/multivector.py):
driver-grade DuckDB re-derivation of the full MaxSim rule over token
bags sliced from the embeddings fixture, an independent Python
reference, planted-twin retrieval, the two-stage rerank consistency
contract, degenerate-token guards, and plan shape."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.multivector import maxsim_rerank, maxsim_topk
from l1dbproto_spark.sources.catalog import load_table
from tools.check_correctness import compare

SF_DIR = "/root/testdata/sf0.001"
_N_TOK, _TOK_DIM = 4, 16  # 64-dim fixture vectors -> 4 token vectors


def _multivec(spark):
    """Deterministic token bags: slice each 64-dim embedding into 4
    contiguous 16-dim token vectors — both engines derive the identical
    bags from the same parquet."""
    emb = load_table(spark, SF_DIR, "embeddings")
    toks = F.array(
        *[
            F.slice(F.col("embedding"), i * _TOK_DIM + 1, _TOK_DIM)
            for i in range(_N_TOK)
        ]
    )
    return emb.select(F.col("vec_id").alias("doc_id"), toks.alias("token_vecs"))


def test_maxsim_topk_matches_duckdb(spark):
    """The FULL rule — per-token normalization, degenerate-token drop,
    per-query-token max over doc tokens, rounded ordered sum, min-id
    tie-break top-k — re-derived in DuckDB list algebra (driver-grade
    compare; list_dot_product is bit-identical to the ordered fold).
    Builder and oracle are the r14 promotion candidate's own (single
    source of truth in queries/similarity.py)."""
    from l1dbproto_spark.queries.similarity import (
        MAXSIM_TOKEN_TOPK_ORACLE,
        maxsim_token_topk,
    )

    got = maxsim_token_topk(spark, SF_DIR).toPandas()
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = duck.execute(MAXSIM_TOKEN_TOPK_ORACLE).df()
    duck.close()
    assert len(got) == 50  # 10 queries x k
    issues = compare("maxsim_topk", got, want)
    assert not issues, issues


def _py_maxsim(qtoks, dtoks):
    """Independent reference: same normalization and ordered-fold sums."""

    def unit(tok):
        n2 = 0.0
        for x in tok:
            n2 += float(x) * float(x)
        if not (n2 > 0) or math.isnan(n2):
            return None
        n = math.sqrt(n2)
        return [float(x) / n for x in tok]

    qs = [u for u in (unit(t) for t in qtoks) if u is not None]
    ds = [u for u in (unit(t) for t in dtoks) if u is not None]
    score = 0.0
    for t in qs:
        best = -math.inf
        for u in ds:
            acc = 0.0
            for a, b in zip(t, u):
                acc += a * b
            best = max(best, acc)
        score += round(best, 9)
    return round(score, 9)


def test_matches_python_reference_and_twin_retrieval(spark):
    """A cloned token bag is its twin's top-1 at score == n_query_tokens
    (every per-token max is the token itself, cosine 1.0), and every
    reported score equals the independent Python computation."""
    rows = [
        (1, [[1.0, 0.0], [0.0, 1.0]]),
        (2, [[0.6, 0.8], [0.8, 0.6]]),
        (101, [[2.0, 0.0], [0.0, 3.0]]),  # 1's twin up to per-token scale
        (102, [[0.3, 0.4], [0.4, 0.3]]),  # 2's twin (scaled by 0.5)
        (200, [[-1.0, 0.0], [0.0, -1.0]]),  # anti-aligned distractor
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, token_vecs array<array<double>>"
    )
    out = maxsim_topk(df, df.filter(F.col("doc_id") <= 2), k=4).collect()
    by_pair = {(r.query_id, r.neighbor_id): r.maxsim_score for r in out}
    data = dict(rows)
    for (qid, nid), score in by_pair.items():
        assert score == pytest.approx(_py_maxsim(data[qid], data[nid]), abs=1e-9)
    top1 = {r.query_id: r.neighbor_id for r in out if r.rank == 1}
    assert top1 == {1: 101, 2: 102}
    assert by_pair[(1, 101)] == pytest.approx(2.0)


def test_rerank_consistency_with_full_scoring(spark):
    """Two-stage contract: rerank scores its candidate pairs EXACTLY like
    the full operator (same normalization, same rounding), returns only
    candidate pairs, and ranks within the candidate set."""
    mv = _multivec(spark).filter(F.col("doc_id") < 60)
    queries = mv.filter(F.col("doc_id") < 5)
    full = {
        (r.query_id, r.neighbor_id): r.maxsim_score
        for r in maxsim_topk(mv, queries, k=60).collect()
    }
    # first stage: a crude candidate set — every 3rd doc
    cands = (
        queries.select("doc_id")
        .withColumnRenamed("doc_id", "query_id")
        .crossJoin(
            mv.filter(F.col("doc_id") % 3 == 0)
            .select(F.col("doc_id").alias("neighbor_id"))
        )
    )
    rer = maxsim_rerank(cands, mv, queries, k=3).collect()
    assert len(rer) > 0
    for r in rer:
        assert r.neighbor_id % 3 == 0  # only candidate pairs scored
        assert r.maxsim_score == full[(r.query_id, r.neighbor_id)]
    # within each query the rerank top-3 is the best of its candidates
    for qid in {r.query_id for r in rer}:
        cand_scores = sorted(
            (
                (s, -n)
                for (q, n), s in full.items()
                if q == qid and n % 3 == 0
            ),
            reverse=True,
        )[:3]
        got = [
            (r.maxsim_score, -r.neighbor_id)
            for r in sorted(
                (x for x in rer if x.query_id == qid), key=lambda x: x.rank
            )
        ]
        assert got == cand_scores


def test_degenerate_tokens_guarded(spark):
    """Zero-norm tokens are dropped per token; rows with no usable token
    drop entirely (both sides) instead of producing NaN scores."""
    rows = [
        (1, [[1.0, 0.0], [0.0, 0.0]]),  # one usable token
        (2, [[0.0, 0.0]]),  # no usable token -> dropped
        (3, [[0.0, 1.0]]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, token_vecs array<array<double>>"
    )
    out = maxsim_topk(df, df, k=5).collect()
    ids = {r.query_id for r in out} | {r.neighbor_id for r in out}
    assert 2 not in ids
    assert all(not math.isnan(r.maxsim_score) for r in out)
    # doc 1's zero token contributed nothing: score vs 3 is cos(90°)=0
    pair = {(r.query_id, r.neighbor_id): r.maxsim_score for r in out}
    assert pair[(1, 3)] == pytest.approx(0.0)


def test_plan_shape(spark):
    """Exact path: queries broadcast onto one corpus scan (a BNLJ of the
    1-side broadcast — never a CartesianProduct), top-k via window;
    rerank path: joins only, no cartesian anywhere."""
    mv = _multivec(spark)
    q = mv.filter(F.col("doc_id") < 10)
    plan = (
        maxsim_topk(mv, q, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    cands = q.select(F.col("doc_id").alias("query_id")).crossJoin(
        mv.select(F.col("doc_id").alias("neighbor_id")).limit(20)
    )
    plan2 = (
        maxsim_rerank(cands, mv, q, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan2


def test_token_ivf_two_stage(spark):
    """Token-level IVF first stage (r13): planted one-hot family axes —
    candidates are exactly the probed family at n_probe=1 (with n_hits =
    query-token x doc-cell co-occurrences), the capped set is the n_hits
    top slice, the assembled retriever equals exact MaxSim whenever the
    candidate set covers the true top-k, and full probing recovers the
    exact operator verbatim."""
    from l1dbproto_spark.operators.multivector import (
        maxsim_ivf_topk,
        token_ivf_candidates,
    )

    cents = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
        ],
        "cluster int, centroid array<double>",
    )

    def bag(fam, wiggle):
        t1 = [0.0] * 4
        t1[fam] = 1.0
        t1[3] = wiggle
        t2 = [0.0] * 4
        t2[fam] = 1.0
        t2[3] = wiggle / 2
        return [t1, t2]

    rows = [(d, bag(d // 10, 0.01 * (d % 10 + 1))) for d in range(30)]
    rows.append((100, bag(0, 0.005)))
    df = spark.createDataFrame(
        rows, "doc_id long, token_vecs array<array<double>>"
    )
    corpus = df.filter(F.col("doc_id") < 100)
    q = df.filter(F.col("doc_id") == 100)

    cands = token_ivf_candidates(corpus, q, cents, n_probe=1).collect()
    assert {r.neighbor_id for r in cands} == set(range(10))  # family 0 only
    assert all(r.n_hits == 2 for r in cands)  # 2 query tokens x 1 doc cell

    capped = token_ivf_candidates(
        corpus, q, cents, n_probe=1, max_candidates=3
    ).collect()
    assert {r.neighbor_id for r in capped} == {0, 1, 2}  # n_hits tie -> min ids

    # in-family scores dominate cross-family by construction, so the
    # probed family covers the true top-5 -> two-stage == exact
    exact = {
        (r.query_id, r.neighbor_id, r.maxsim_score, r.rank)
        for r in maxsim_topk(corpus, q, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id, r.maxsim_score, r.rank)
        for r in maxsim_ivf_topk(corpus, q, cents, k=5, n_probe=1).collect()
    }
    assert ivf == exact

    # probing every cell makes the candidate set total -> equal at any k
    exact15 = {
        (r.query_id, r.neighbor_id, r.maxsim_score, r.rank)
        for r in maxsim_topk(corpus, q, k=15).collect()
    }
    ivf15 = {
        (r.query_id, r.neighbor_id, r.maxsim_score, r.rank)
        for r in maxsim_ivf_topk(corpus, q, cents, k=15, n_probe=3).collect()
    }
    assert ivf15 == exact15

    with pytest.raises(ValueError, match="n_probe"):
        token_ivf_candidates(corpus, q, cents, n_probe=0)
    with pytest.raises(ValueError, match="max_candidates"):
        token_ivf_candidates(corpus, q, cents, max_candidates=0)
    plan = (
        maxsim_ivf_topk(corpus, q, cents, k=5, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_pool_tokens_bridge(spark):
    """pool_tokens (r13): the mean of unit tokens, ordered-fold exact;
    empty bags drop; and the bridge composes — pooled-vector exact ANN
    supplies candidates whose MaxSim rerank equals full scoring."""
    from l1dbproto_spark.operators.multivector import pool_tokens
    from l1dbproto_spark.operators.similarity import exact_topk

    rows = [
        (1, [[2.0, 0.0], [0.0, 5.0]]),   # units (1,0)+(0,1) -> (0.5, 0.5)
        (2, [[0.0, 0.0]]),               # no usable token -> dropped
        (3, [[3.0, 4.0]]),               # unit (0.6, 0.8)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, token_vecs array<array<double>>"
    )
    got = {r.doc_id: list(r.embedding) for r in pool_tokens(df).collect()}
    assert set(got) == {1, 3}
    assert got[1] == pytest.approx([0.5, 0.5], abs=1e-12)
    assert got[3] == pytest.approx([0.6, 0.8], abs=1e-12)

    # composition at the fixture shape: pooled first stage -> rerank;
    # every rerank pair's score equals the full operator's score
    mv = _multivec(spark).filter(F.col("doc_id") < 60)
    queries = mv.filter(F.col("doc_id") < 5)
    pooled = pool_tokens(mv, id_col="doc_id")
    cands = exact_topk(
        pooled, pool_tokens(queries, id_col="doc_id"), k=20,
        id_col="doc_id",
    ).select("query_id", "neighbor_id")
    rer = maxsim_rerank(cands, mv, queries, k=5).collect()
    full = {
        (r.query_id, r.neighbor_id): r.maxsim_score
        for r in maxsim_topk(mv, queries, k=60).collect()
    }
    assert len(rer) > 0
    for r in rer:
        assert r.maxsim_score == full[(r.query_id, r.neighbor_id)]


def test_cross_dimension_pairs_drop_not_null(spark):
    """Tokens of a DIFFERENT dimension across a pair make zip_with pad
    with NULL and the fold go NULL — such pairs drop from the ranking
    explicitly (one-dimension-everywhere contract) instead of riding
    into rank positions as NULL scores."""
    rows = [
        (1, [[1.0, 0.0]]),            # dim 2 query
        (2, [[0.8, 0.6]]),            # dim 2 -> scored
        (3, [[1.0, 0.0, 0.0]]),       # dim 3 -> pair with 1 drops
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, token_vecs array<array<double>>"
    )
    out = maxsim_topk(df, df.filter(F.col("doc_id") == 1), k=5).collect()
    assert {(r.query_id, r.neighbor_id) for r in out} == {(1, 2)}
    assert all(r.maxsim_score is not None for r in out)


def test_mixed_dimension_bag_drops_whole_row(spark):
    """A bag MIXING token dimensions is nulled as a whole (ADVICE r13):
    without the guard, array_max skips the NULL dots of the mismatched
    tokens and the pair is PARTIALLY scored — the matching-dim tokens
    silently win. The contract is one dimension per bag: mixed bags drop
    from both sides entirely."""
    rows = [
        (1, [[1.0, 0.0]]),                      # clean dim-2 query
        (2, [[0.8, 0.6], [1.0, 0.0, 0.0]]),     # MIXED bag -> dropped
        (3, [[0.0, 1.0]]),                      # clean dim-2 doc
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, token_vecs array<array<double>>"
    )
    out = maxsim_topk(df, df.filter(F.col("doc_id") == 1), k=5).collect()
    # doc 2 must NOT appear partially scored; doc 3 scores normally
    assert {(r.query_id, r.neighbor_id) for r in out} == {(1, 3)}
    # a mixed-bag QUERY likewise produces no rows at all
    out_q = maxsim_topk(df, df.filter(F.col("doc_id") == 2), k=5).collect()
    assert out_q == []


def test_rerank_deduplicates_fused_candidates(spark):
    """Fused first stages can emit the same (query, neighbor) pair more
    than once (ADVICE r13): maxsim_rerank must score it ONCE — duplicate
    ranks would displace a real candidate from top-k."""
    rows = [
        (1, [[1.0, 0.0]]),
        (2, [[0.8, 0.6]]),
        (3, [[0.6, 0.8]]),
        (4, [[0.0, 1.0]]),
    ]
    mv = spark.createDataFrame(
        rows, "doc_id long, token_vecs array<array<double>>"
    )
    q = mv.filter(F.col("doc_id") == 1)
    # neighbor 2 duplicated 3x (as if ANN + BM25 + fusion all returned it)
    cands = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2), (1, 3), (1, 4)],
        "query_id long, neighbor_id long",
    )
    out = maxsim_rerank(cands, mv, q, k=2).collect()
    got = [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    # without distinct: [(2,1),(2,2)] and doc 3 is displaced from top-2
    assert got == [(2, 1), (3, 2)]
    assert len({(r.query_id, r.neighbor_id) for r in out}) == len(out)

"""mmr_rerank (operators/rerank.py): greedy-selection parity against a
plain-Python MMR reference, non-numeric doc ids, and degenerate-vector
hardening (zero-norm / NULL / NaN embeddings must neither error under
ANSI mode nor hijack the ranking through NaN/±inf objectives)."""

from __future__ import annotations

import math

import pytest

from l1dbproto_spark.operators.rerank import mmr_rerank

SCHEMA = "query_id long, doc_id long, score double, vec array<double>"
SCHEMA_STR = "query_id long, doc_id string, score double, vec array<double>"


def _py_mmr(rows, k, lam):
    """Reference greedy MMR: rows = [(doc, rel, vec)], smaller-doc
    tiebreak, degenerate similarities ignored (match the operator's
    NULL-similarity contract)."""

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        prod = na * nb
        if not prod > 0 or math.isnan(prod):
            return None
        s = sum(x * y for x, y in zip(a, b)) / prod
        return None if math.isnan(s) else s

    remaining = {doc: (rel, vec) for doc, rel, vec in rows}
    maxsim: dict = {doc: None for doc in remaining}
    out = []
    for rank in range(1, k + 1):
        if not remaining:
            break
        best = None
        for doc, (rel, _) in sorted(remaining.items()):
            ms = maxsim[doc]
            mmr = lam * rel if ms is None else lam * rel - (1 - lam) * ms
            if best is None or mmr > best[1]:
                best = (doc, mmr)
        doc, mmr = best
        rel, pvec = remaining.pop(doc)
        out.append((doc, rel, mmr, rank))
        for other, (_, ovec) in remaining.items():
            s = cos(ovec, pvec)
            if s is not None:
                ms = maxsim[other]
                maxsim[other] = s if ms is None else max(ms, s)
    return out


def _rows(df):
    return sorted(
        (r.query_id, r.doc_id, r.mmr_rank, r.mmr_score) for r in df.collect()
    )


def test_parity_with_python_reference(spark):
    """Two queries x 6 candidates with engineered near-duplicates: the
    Spark greedy rounds must reproduce the Python reference pick-for-pick
    (ids, ranks, and objective values)."""
    cand = []
    for q in (0, 1):
        base = float(q + 1)
        cand += [
            (q, 10, 0.9 * base, [1.0, 0.0, 0.0]),
            (q, 11, 0.85 * base, [0.99, 0.14, 0.0]),  # near-dup of 10
            (q, 12, 0.8 * base, [0.0, 1.0, 0.0]),
            (q, 13, 0.75 * base, [0.0, 0.99, 0.14]),  # near-dup of 12
            (q, 14, 0.7 * base, [0.0, 0.0, 1.0]),
            (q, 15, 0.1 * base, [0.5, 0.5, 0.70710678]),
        ]
    df = spark.createDataFrame(cand, SCHEMA)
    got = mmr_rerank(df, k=4, lam=0.5)
    want = []
    for q in (0, 1):
        rows = [(d, r, v) for (qq, d, r, v) in cand if qq == q]
        want += [
            (q, doc, rank, pytest.approx(mmr, abs=1e-9))
            for doc, _, mmr, rank in _py_mmr(rows, k=4, lam=0.5)
        ]
    assert _rows(got) == sorted(want)
    # diversity sanity: with lam=0.5 the near-dups must not occupy the
    # top-2 slots on either query
    top2 = {
        (r.query_id, r.doc_id) for r in got.filter("mmr_rank <= 2").collect()
    }
    assert (0, 11) not in top2 and (1, 11) not in top2


def test_lam_one_reproduces_relevance_order(spark):
    cand = [
        (0, d, rel, [1.0, float(d)])
        for d, rel in [(1, 0.3), (2, 0.9), (3, 0.6), (4, 0.1)]
    ]
    got = mmr_rerank(spark.createDataFrame(cand, SCHEMA), k=4, lam=1.0)
    order = [
        r.doc_id for r in got.orderBy("mmr_rank").collect() if r.query_id == 0
    ]
    assert order == [2, 3, 1, 4]


def test_string_doc_ids(spark):
    """Non-numeric ids: selection runs (no negation of the id column) and
    ties break toward the lexicographically smaller id."""
    cand = [
        (0, "beta", 0.5, [1.0, 0.0]),
        (0, "alpha", 0.5, [0.0, 1.0]),  # tied rel -> alpha picked first
        (0, "gamma", 0.4, [1.0, 1.0]),
    ]
    got = mmr_rerank(spark.createDataFrame(cand, SCHEMA_STR), k=3, lam=1.0)
    order = [r.doc_id for r in got.orderBy("mmr_rank").collect()]
    assert order == ["alpha", "beta", "gamma"]


def test_degenerate_vectors_do_not_poison(spark):
    """A zero-norm, a NULL, and a NaN vector in the candidate set: no ANSI
    divide-by-zero, no +/-inf or NaN objective, and well-formed candidates
    still rank by the MMR objective around them."""
    nan = float("nan")
    cand = [
        (0, 1, 0.9, [1.0, 0.0]),
        (0, 2, 0.8, [0.0, 0.0]),  # zero norm
        (0, 3, 0.7, None),  # NULL vec
        (0, 4, 0.6, [nan, 1.0]),  # NaN component
        (0, 5, 0.5, [0.0, 1.0]),
    ]
    got = mmr_rerank(spark.createDataFrame(cand, SCHEMA), k=5, lam=0.5).collect()
    assert len(got) == 5
    by_doc = {r.doc_id: r for r in got}
    assert by_doc[1].mmr_rank == 1
    for r in got:
        assert not math.isnan(r.mmr_score) and not math.isinf(r.mmr_score), r
    # the degenerate rows never contribute similarity, so every later
    # round scores them by lam*rel alone -> they appear in rel order
    assert by_doc[2].mmr_rank < by_doc[3].mmr_rank < by_doc[4].mmr_rank


def test_degenerate_pick_leaves_maxsim_null(spark):
    """When the FIRST pick is a degenerate vector (highest rel), the
    survivors' maxsim stays NULL (not -inf): round 2 must rank by lam*rel,
    not by an objective blown up to +inf."""
    cand = [
        (0, 1, 0.9, [0.0, 0.0]),  # zero-norm wins round 1 on rel
        (0, 2, 0.8, [1.0, 0.0]),
        (0, 3, 0.2, [1.0, 0.0]),  # duplicate direction of 2
    ]
    got = mmr_rerank(spark.createDataFrame(cand, SCHEMA), k=3, lam=0.5)
    order = [r.doc_id for r in got.orderBy("mmr_rank").collect()]
    assert order == [1, 2, 3]
    scores = {r.doc_id: r.mmr_score for r in got.collect()}
    assert scores[2] == pytest.approx(0.4)  # lam*rel, maxsim still NULL
    assert scores[3] == pytest.approx(0.5 * 0.2 - 0.5 * 1.0)  # sim to 2


def test_null_score_candidates_lose(spark):
    """NULL relevance -> NULL mmr, which sorts SMALLEST under min_by's
    ascending key and would win every round unguarded (r9 review): the
    NULL-scored rows must instead fill the TRAILING ranks, after every
    scored candidate."""
    cand = [
        (0, 1, 0.9, [1.0, 0.0]),
        (0, 2, None, [0.0, 1.0]),
        (0, 3, 0.1, [1.0, 1.0]),
        (0, 4, None, [0.5, 0.5]),
    ]
    got = mmr_rerank(
        spark.createDataFrame(cand, SCHEMA), k=4, lam=1.0
    ).collect()
    by_rank = {r.mmr_rank: r.doc_id for r in got}
    assert by_rank[1] == 1 and by_rank[2] == 3
    assert set(by_rank[r] for r in (3, 4)) == {2, 4}


def test_fewer_candidates_than_k(spark):
    cand = [(0, 1, 0.9, [1.0]), (0, 2, 0.8, [1.0]), (1, 7, 0.5, [1.0])]
    got = mmr_rerank(spark.createDataFrame(cand, SCHEMA), k=10, lam=0.5)
    per_q = {
        r.query_id: r.n
        for r in got.groupBy("query_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert per_q == {0: 2, 1: 1}


def test_validation_errors(spark):
    df = spark.createDataFrame([(0, 1, 0.5, [1.0])], SCHEMA)
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(df, k=0)
    with pytest.raises(ValueError, match="lam must be"):
        mmr_rerank(df, k=1, lam=1.5)


def test_fold_matches_driver_round_reference(spark):
    """r14 equivalence pin: the single-aggregation fold must reproduce
    the pre-r14 k-driver-round implementation pick-for-pick (ids, ranks,
    objective values to the bit) on a frame that exercises every edge at
    once — NULL scores, degenerate vectors (zero-norm / NULL / NaN),
    queries shorter than k, and similarity rounding on/off."""
    from l1dbproto_spark.operators.rerank import _mmr_rerank_rounds

    nan = float("nan")
    cand = [
        (0, 10, 0.9, [1.0, 0.0, 0.0]),
        (0, 11, 0.85, [0.99, 0.14, 0.0]),
        (0, 12, 0.8, [0.0, 1.0, 0.0]),
        (0, 13, None, [0.0, 0.99, 0.14]),
        (0, 14, 0.7, [0.0, 0.0, 0.0]),  # zero norm
        (0, 15, 0.6, None),  # NULL vec
        (0, 16, 0.5, [nan, 1.0, 0.0]),  # NaN component
        (1, 20, 0.4, [0.5, 0.5, 0.70710678]),
        (1, 21, 0.4, [0.5, 0.5, 0.70710678]),  # tied rel, same vec
        (2, 30, 0.1, [1.0, 1.0, 1.0]),  # short query (1 candidate)
    ]
    df = spark.createDataFrame(cand, SCHEMA)
    for rd in (None, 9):
        got = mmr_rerank(df, k=5, lam=0.3, round_digits=rd)
        want = _mmr_rerank_rounds(df, k=5, lam=0.3, round_digits=rd)
        assert _rows(got) == _rows(want), f"round_digits={rd}"


def test_custom_column_names_roundtrip(spark):
    df = spark.createDataFrame(
        [(0, 1, 0.5, [1.0, 2.0])], "qid long, d long, s double, emb array<double>"
    )
    got = mmr_rerank(
        df, k=1, query_col="qid", doc_col="d", score_col="s", vec_col="emb"
    )
    assert got.columns == ["qid", "d", "s", "mmr_score", "mmr_rank"]

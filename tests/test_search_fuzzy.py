"""BM25 lexical retrieval + fuzzy matching (round 8): value correctness vs a
plain-Python reference, salted-top-k losslessness, fuzzy blocking recall vs
the exact cross product, and executed-plan guards (no cartesian, broadcast
stats/query sides only)."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from l1dbproto_spark.operators.bm25 import bm25_scores, bm25_topk, queries_df, tokens
from l1dbproto_spark.operators.fuzzy import (
    best_fuzzy_match,
    fuzzy_join,
    fuzzy_self_join,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "lazy dog lazy dog lazy dog"),
    (4, "completely unrelated words here only"),
    (5, "fox"),
]
QUERIES = [(1, "quick fox"), (2, "lazy dog")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Order-independent reference implementation (term-sorted sum)."""
    tok = {d: re.findall("[a-z0-9]+", t.lower()) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in tok.values()) / n
    dfreq = Counter()
    for terms in tok.values():
        dfreq.update(set(terms))
    out = {}
    for qid, qtext in queries:
        qterms = sorted(set(re.findall("[a-z0-9]+", qtext.lower())))
        for d, terms in tok.items():
            tf = Counter(terms)
            score = 0.0
            hit = False
            for t in qterms:
                if tf[t] == 0:
                    continue
                hit = True
                idf = round(math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0), 9)
                score += idf * tf[t] * (k1 + 1) / (tf[t] + k1 * (1 - b + b * len(terms) / avgdl))
            if hit:
                out[(qid, d)] = score
    return out


def test_bm25_scores_match_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    qt = queries_df(spark, QUERIES)
    got = {(r.query_id, r.doc_id): r.score for r in bm25_scores(docs, qt).collect()}
    want = _py_bm25(DOCS, QUERIES)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


def test_bm25_candidate_set_is_docs_with_any_query_term(spark):
    """A doc scores for a query iff it contains >= 1 query term (doc 4 never
    appears; doc 5 only for query 1)."""
    docs = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    got = {(r.query_id, r.doc_id) for r in bm25_scores(docs, queries_df(spark, QUERIES)).collect()}
    assert (1, 4) not in got and (2, 4) not in got
    assert (1, 5) in got and (2, 5) not in got


def test_bm25_salted_topk_equals_single_window(spark):
    """The salted two-phase top-k is lossless: same (query, doc, rank) set as
    ranking everything in one window, at several fanouts."""
    docs = load_table(spark, SF_DIR, "documents")
    qt = queries_df(spark, [(1, "dup merge join"), (2, "window hash scan")])
    base = None
    for fanout in (1, 4, 32):
        got = sorted(
            (r.query_id, r.doc_id, r.rank)
            for r in bm25_topk(docs, qt, 10, fanout=fanout).collect()
        )
        if base is None:
            base = got
        assert got == base, f"fanout={fanout} diverged"
    assert len(base) == 20  # 10 per query


def test_bm25_ranking_is_score_desc(spark):
    docs = load_table(spark, SF_DIR, "documents")
    qt = queries_df(spark, [(1, "dup merge join")])
    rows = sorted(bm25_topk(docs, qt, 10).collect(), key=lambda r: r.rank)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert [r.rank for r in rows] == list(range(1, 11))


def test_bm25_plan_no_cartesian_broadcast_stats(spark):
    """The only cross join is the broadcast of the 1-row stats frame; the
    postings term filter is a broadcast semi-join; no sort-merge joins."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        bm25_topk(docs, queries_df(spark, QUERIES), 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats crossJoin
    assert plan.count("BroadcastHashJoin") >= 3  # semi term filter + qterms + dfreq


# ---------------------------------------------------------------------------
# fuzzy


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_self_join_recall_vs_cross_product(spark):
    """Measured blocking recall on the part-name fixture: every reported pair
    is correct (precision 1.0 by construction — Levenshtein verifies), and
    the token-blocked candidate set recovers every cross-product pair that
    shares a word token. Pairs WITHOUT a shared token are outside the
    operator contract; the test counts how many exist so the contract's cost
    is measured, not assumed."""
    part = load_table(spark, SF_DIR, "part").select("p_name").distinct()
    got = {
        (r.a_name, r.b_name): r.dist
        for r in fuzzy_self_join(part, "p_name", 2).collect()
    }
    names = sorted(r.p_name for r in part.collect())
    truth, no_shared_token = {}, 0
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if _lev(a, b) <= 2:
                if set(a.lower().split()) & set(b.lower().split()):
                    truth[(a, b)] = _lev(a, b)
                else:
                    no_shared_token += 1
    assert got == truth  # exact within contract: same pairs, same distances
    # contract cost on this fixture: shared-token blocking misses nothing
    assert no_shared_token == 0


def test_fuzzy_join_plan_no_cartesian(spark):
    part = load_table(spark, SF_DIR, "part")
    plan = (
        fuzzy_self_join(part, "p_name", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_best_fuzzy_match_is_argmin(spark):
    pairs_df = spark.createDataFrame(
        [("red bolt",), ("ted bolt",), ("red belt",), ("zzz zzz",)], ["name"]
    )
    got = {r.name: (r.best_match, r.dist) for r in best_fuzzy_match(pairs_df, "name", 2).collect()}
    # red bolt: ted bolt (1) and red belt (1) -> lexicographic tie-break
    assert got["red bolt"] == ("red belt", 1)
    assert got["ted bolt"] == ("red bolt", 1)
    assert got["red belt"] == ("red bolt", 1)
    assert "zzz zzz" not in got  # no neighbor within distance


def test_fuzzy_two_sided_join(spark):
    left = spark.createDataFrame([("blue bolt",), ("small ring",)], ["l"])
    right = spark.createDataFrame([("blue belt",), ("small king",), ("other thing",)], ["r"])
    got = {(r.l_value, r.r_value, r.dist) for r in fuzzy_join(left, right, "l", "r", 2).collect()}
    assert ("blue bolt", "blue belt", 1) in got
    assert ("small ring", "small king", 1) in got
    assert all(p[0] != "other thing" and p[1] != "other thing" for p in got)


def test_fuzzy_block_cap_drops_hot_tokens(spark):
    """block_cap excludes blocks larger than the cap: with every name sharing
    the token 'x', cap=2 removes the block entirely."""
    names = spark.createDataFrame([(f"x name{i}",) for i in range(5)], ["name"])
    uncapped = fuzzy_self_join(names, "name", 2).count()
    capped = fuzzy_self_join(names, "name", 2, block_cap=2).count()
    assert uncapped > 0
    assert capped == 0


def test_bm25_absent_terms(spark):
    """Query terms absent from the whole corpus contribute nothing; a query
    whose EVERY term is absent returns no rows at all (never a null score)."""
    docs = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    qt = queries_df(spark, [(1, "quick zzz"), (2, "xyzzy plugh")])
    rows = bm25_scores(docs, qt).collect()
    assert {r.query_id for r in rows} == {1}
    assert all(r.score is not None and r.score > 0 for r in rows)
    # query 1's score equals a pure-"quick" query's score (zzz adds nothing)
    only_quick = {
        r.doc_id: r.score
        for r in bm25_scores(docs, queries_df(spark, [(1, "quick")])).collect()
    }
    assert {r.doc_id: r.score for r in rows} == only_quick


def test_fuzzy_distance_zero_and_case(spark):
    """max_distance=0 keeps only pairs equal as raw strings — but blocking
    lowercases tokens, so case-variants still meet in a block and are
    reported at their true (case-sensitive) distance when it fits."""
    names = spark.createDataFrame([("Red Bolt",), ("red bolt",), ("red belt",)], ["name"])
    d0 = {(r.a_name, r.b_name, r.dist) for r in fuzzy_self_join(names, "name", 0).collect()}
    assert d0 == set()  # distinct raw strings, none at distance 0
    d2 = {(r.a_name, r.b_name): r.dist for r in fuzzy_self_join(names, "name", 2).collect()}
    assert d2[("Red Bolt", "red bolt")] == 2  # R->r, B->b
    assert d2[("red belt", "red bolt")] == 1

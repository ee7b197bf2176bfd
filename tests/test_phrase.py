"""Exact phrase search: python-reference parity on constructed docs,
overlapping-occurrence counting, repeated-term phrases (the countDistinct-
offset rule), punctuation/case normalization, and plan guards."""

from __future__ import annotations

import re

from l1dbproto_spark.operators.phrase import phrase_match, phrase_rows
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

DOCS = [
    (1, "the quick fox and the quick fox again"),
    (2, "a a a a"),
    (3, "Quick, fox! the QUICK fox"),
    (4, "nothing relevant here"),
    (5, "quick"),
]
PHRASES = [(1, "quick fox"), (2, "a a"), (3, "the quick fox")]


def _py_phrase(docs, phrases):
    out = {}
    for pid, ptext in phrases:
        pt = re.findall("[a-z0-9]+", ptext.lower())
        for did, dtext in docs:
            dt = re.findall("[a-z0-9]+", dtext.lower())
            n = sum(
                1
                for a in range(len(dt) - len(pt) + 1)
                if dt[a : a + len(pt)] == pt
            )
            if n:
                out[(pid, did)] = n
    return out


def test_phrase_match_python_parity(spark):
    df = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    got = {
        (r.phrase_id, r.doc_id): r.n_occurrences
        for r in phrase_match(df, PHRASES).collect()
    }
    assert got == _py_phrase(DOCS, PHRASES)
    # spot-checks the parity actually covered the interesting cases:
    assert got[(2, 2)] == 3  # overlapping "a a" in "a a a a"
    assert got[(1, 3)] == 2  # punctuation/case-normalized matches
    assert (1, 4) not in got and (1, 5) not in got  # no partial-prefix hits


def test_phrase_rows_tokenization():
    rows = phrase_rows([(7, "The QUICK, fox!"), (8, "   "), (9, "x")])
    assert rows == [
        (7, "the", 0, 3),
        (7, "quick", 1, 3),
        (7, "fox", 2, 3),
        (9, "x", 0, 1),
    ]


def test_single_term_phrase_counts_tf(spark):
    df = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_match(df, [(1, "quick")]).collect()
    }
    assert got == {1: 2, 3: 2, 5: 1}


def test_empty_phrases(spark):
    df = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    assert phrase_match(df, []).count() == 0
    assert phrase_match(df, [(1, "!!!")]).count() == 0


def test_phrase_plan_single_scan_no_cartesian(spark):
    docs = load_table(spark, SF_DIR, "documents")
    from l1dbproto_spark.queries.search import PHRASES as REG

    plan = (
        phrase_match(docs, REG)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("documents.parquet") <= 1 or "documents" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # phrase tables broadcast

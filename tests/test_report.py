"""Corpus health report (operators/report.py): exact-mode DuckDB oracle
parity (including the ROLLUP total row), approx-mode HLL accuracy, and
single-scan plan shape."""

from __future__ import annotations

import duckdb
import pytest

from l1dbproto_spark.operators.report import corpus_report
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

ORACLE = f"""
WITH base AS (
  SELECT lang AS source,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS nt,
         length(text) AS nc,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM '{SF_DIR}/documents.parquet'
)
SELECT source, COUNT(*) AS n_docs, SUM(nt) AS n_tokens,
       SUM(nc) AS n_chars,
       COUNT(DISTINCT fp) AS n_distinct,
       1.0 - COUNT(DISTINCT fp) / COUNT(*) AS dup_rate,
       AVG(CASE WHEN nt = 0 THEN 1.0 ELSE 0.0 END) AS empty_frac
FROM base GROUP BY ROLLUP (source)
"""


def test_exact_mode_matches_duckdb_rollup(spark):
    got = {
        r.source: (
            r.n_docs,
            r.n_tokens,
            r.n_chars,
            r.n_distinct,
            round(r.dup_rate, 9),
            round(r.empty_frac, 9),
        )
        for r in corpus_report(
            load_table(spark, SF_DIR, "documents"),
            source_col="lang",
            approx=False,
        ).collect()
    }
    want = {
        s: (int(a), int(b), int(c), int(d), round(float(e), 9), round(float(f), 9))
        for s, a, b, c, d, e, f in duckdb.sql(ORACLE).fetchall()
    }
    assert got == want
    assert None in got  # the rollup total row


def test_approx_mode_close_to_exact(spark):
    docs = load_table(spark, SF_DIR, "documents")
    exact = corpus_report(docs, approx=False).first()
    approx = corpus_report(docs, approx=True).first()
    assert exact.n_docs == approx.n_docs
    assert approx.n_distinct == pytest.approx(exact.n_distinct, rel=0.05)
    # percentiles identical (same algorithm both modes)
    assert (exact.tok_p50, exact.tok_p90) == (approx.tok_p50, approx.tok_p90)


def test_single_scan(spark):
    import re
    from collections import Counter

    docs = load_table(spark, SF_DIR, "documents")
    out = corpus_report(docs, source_col="lang")
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = Counter(
        re.findall(r"testdata/sf0\.001/(\w+)\.parquet", plan)
    )
    assert scans.get("documents", 0) == 1


DIFF_ORACLE = f"""
WITH o AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM '{SF_DIR}/documents.parquet' WHERE doc_id < 400
),
n AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(
           CASE WHEN doc_id % 7 = 0 THEN text || ' changed' ELSE text END,
           '\\s+', ' ', 'g')))) AS fp
  FROM '{SF_DIR}/documents.parquet' WHERE doc_id >= 100
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'modified'
            ELSE 'unchanged' END AS change
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


def test_corpus_diff_matches_oracle(spark):
    from pyspark.sql import functions as F

    from l1dbproto_spark.operators.report import corpus_diff

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 100).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" changed"))
        ).otherwise(F.col("text")),
    )
    got = {
        r.doc_id: r.change
        for r in corpus_diff(old, new, include_unchanged=True).collect()
    }
    want = {int(d): c for d, c in duckdb.sql(DIFF_ORACLE).fetchall()}
    assert got == want
    assert set(got.values()) == {"added", "removed", "modified", "unchanged"}
    # default form drops unchanged
    from l1dbproto_spark.operators.report import corpus_diff as cd

    changes = {r.doc_id: r.change for r in cd(old, new).collect()}
    assert changes == {d: c for d, c in want.items() if c != "unchanged"}


def test_corpus_diff_whitespace_invariant(spark):
    from l1dbproto_spark.operators.report import corpus_diff

    old = spark.createDataFrame(
        [(1, "Hello   World"), (2, "abc")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "hello world"), (2, "abcd")], "doc_id long, text string"
    )
    got = {r.doc_id: r.change for r in corpus_diff(old, new).collect()}
    assert got == {2: "modified"}  # doc 1 normalizes equal


def test_corpus_diff_null_text_presence(spark):
    """A row present in both snapshots with NULL text on one side is
    modified/unchanged, never added/removed (presence != fingerprint)."""
    from l1dbproto_spark.operators.report import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (4, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "hello"), (2, None), (3, None), (5, "fresh")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.change
        for r in corpus_diff(old, new, include_unchanged=True).collect()
    }
    assert got == {
        1: "modified",   # NULL -> text
        2: "modified",   # text -> NULL
        3: "unchanged",  # NULL -> NULL
        4: "removed",
        5: "added",
    }

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

"""Data-quality check suite vs a DuckDB oracle computing the same metrics
on the same parquet, plus the one-scan plan guarantee, empty-table
fail-loudly behavior, and the referential-integrity join member."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.checks import CheckSuite, failures
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _suite():
    return (
        CheckSuite()
        .completeness("text", min_ratio=0.5)
        .uniqueness("doc_id")
        .in_range("n_chars", 0, 10_000_000)
        .matches("lang", r"^[a-z]{2}$", min_ratio=0.1)
        .in_set("lang", ["en", "de", "fr"], min_ratio=0.1)
        .satisfies("text_nonempty", F.length("text") > 0, min_ratio=0.5)
        .row_count(min_rows=1)
        .mean_between("n_chars", 0.0, 1e9)
    )


def test_metrics_match_duckdb(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = {r.check: r.metric for r in _suite().run(docs).collect()}
    want = duckdb.sql(
        f"""
        SELECT
          AVG(CASE WHEN text IS NOT NULL THEN 1.0 ELSE 0.0 END) AS completeness,
          COUNT(DISTINCT doc_id) * 1.0 / COUNT(*) AS uniqueness,
          AVG(CASE WHEN n_chars BETWEEN 0 AND 10000000
                   THEN 1.0 ELSE 0.0 END) AS in_range,
          AVG(CASE WHEN regexp_matches(lang, '^[a-z]{{2}}$')
                   THEN 1.0 ELSE 0.0 END) AS matches,
          AVG(CASE WHEN lang IN ('en','de','fr') THEN 1.0 ELSE 0.0 END) AS in_set,
          AVG(CASE WHEN length(text) > 0 THEN 1.0 ELSE 0.0 END) AS nonempty,
          COUNT(*) * 1.0 AS row_count,
          AVG(n_chars) AS mean_n_chars
        FROM '{SF_DIR}/documents.parquet'
        """
    ).fetchone()
    keys = [
        "completeness(text)",
        "uniqueness(doc_id)",
        "in_range(n_chars)",
        "matches(lang)",
        "in_set(lang)",
        "satisfies(text_nonempty)",
        "row_count",
        "mean(n_chars)",
    ]
    assert set(got) == set(keys)
    for k, w in zip(keys, want):
        assert got[k] == pytest.approx(w, abs=1e-12), k


def test_single_scan_plan(spark):
    """All single-table constraints must fold into ONE aggregation over ONE
    scan — the whole point of the suite at 100 TB."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = _suite().run(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_referential_integrity(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    # full dim: every l_orderkey resolves
    ok = (
        CheckSuite()
        .referential("l_orderkey", orders, "o_orderkey")
        .run(li)
        .collect()[0]
    )
    assert ok.metric == 1.0 and ok.passed
    # broken dim: half the orders missing -> ratio < 1, check fails
    broken = (
        CheckSuite()
        .referential("l_orderkey", orders.filter("o_orderkey % 2 = 0"), "o_orderkey")
        .run(li)
        .collect()[0]
    )
    want = (
        li.join(
            orders.filter("o_orderkey % 2 = 0").select("o_orderkey").distinct(),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(F.avg(F.when(F.col("o_orderkey").isNotNull(), 1.0).otherwise(0.0)))
        .first()[0]
    )
    assert broken.metric == pytest.approx(want)
    assert 0 < broken.metric < 1.0 and not broken.passed


def test_mixed_report_and_failures(spark):
    docs = load_table(spark, SF_DIR, "documents")
    orders = load_table(spark, SF_DIR, "orders")
    report = (
        CheckSuite()
        .completeness("text", min_ratio=0.5)
        .in_set("lang", ["zz"], min_ratio=0.9)  # deliberately failing
        .referential("doc_id", orders, "o_orderkey", min_ratio=1.0, name="bogus_fk")
        .run(docs)
    )
    rows = {r.check: r for r in report.collect()}
    assert rows["completeness(text)"].passed
    assert not rows["in_set(lang)"].passed
    fails = {r.check for r in failures(report).collect()}
    assert "in_set(lang)" in fails and "completeness(text)" not in fails


def test_empty_table_fails_not_passes(spark):
    docs = load_table(spark, SF_DIR, "documents").filter("doc_id < 0")
    report = (
        CheckSuite()
        .completeness("text")
        .row_count(min_rows=1)
        .run(docs)
        .collect()
    )
    assert all(not r.passed for r in report)


def test_duplicate_name_raises(spark):
    with pytest.raises(ValueError, match="duplicate"):
        CheckSuite().completeness("text").completeness("text")
    with pytest.raises(ValueError, match="empty"):
        CheckSuite().run(load_table(spark, SF_DIR, "documents"))


def test_uniqueness_approx_hll(spark):
    """approx=True swaps the full distinct shuffle for HLL registers: on a
    perfect key the estimate sits within the default 5% rsd of 1.0, and
    the acceptance band's upper side is open (HLL may overestimate)."""
    docs = load_table(spark, SF_DIR, "documents")
    row = (
        CheckSuite()
        .uniqueness("doc_id", min_ratio=0.9, approx=True)
        .run(docs)
        .collect()[0]
    )
    assert 0.9 <= row.metric <= 1.2
    assert row.passed
    # plan has no exact-distinct expand: approx aggregates map-side
    plan = (
        CheckSuite()
        .uniqueness("doc_id", approx=True)
        .completeness("text")
        .run(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan


def test_schema_check(spark):
    docs = load_table(spark, SF_DIR, "documents")
    good = (
        CheckSuite()
        .schema({"doc_id": "bigint", "text": "string", "n_chars": "bigint"})
        .run(docs)
        .collect()[0]
    )
    assert good.check == "schema" and good.metric == 1.0 and good.passed
    bad = (
        CheckSuite()
        .schema({"doc_id": "bigint", "text": "int", "missing_col": "string"})
        .completeness("text")
        .run(docs)
    )
    rows = {r.check: r for r in bad.collect()}
    assert rows["schema"].metric == pytest.approx(1 / 3)
    assert not rows["schema"].passed
    assert rows["completeness(text)"].passed  # scan checks unaffected


def test_validate_pipeline_stage(spark):
    from l1dbproto_spark.operators.pipeline import run_pipeline

    docs = load_table(spark, SF_DIR, "documents")
    ok_suite = CheckSuite().completeness("text", min_ratio=0.5).row_count()
    out, audit = run_pipeline(
        docs, [{"stage": "validate", "suite": ok_suite}], audit=True
    )
    assert out.count() == docs.count()
    assert audit[-1]["stage"] == "validate"

    bad_suite = CheckSuite().in_set("lang", ["zz"], min_ratio=0.9)
    with pytest.raises(ValueError, match="in_set\\(lang\\)"):
        run_pipeline(docs, [{"stage": "validate", "suite": bad_suite}])

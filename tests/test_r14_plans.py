"""Executed-plan regression guards for the r14 additions (langid,
BLEU/ROUGE/chrF, webdataset verify) — same discipline as
test_dedup_similarity_plans: pin the scale-shape claims (broadcast
model joins, zero-Python scan-side algebra, shuffle-free projections)
so a refactor that silently degrades them fails here first."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


def _no_python(plan: str) -> bool:
    return not re.search(r"BatchEvalPython|ArrowEvalPython|FlatMapsInPandas|MapInPandas", plan)


def test_langid_scores_broadcasts_model_no_cartesian(spark):
    """Corpus scoring: the sparse model joins BROADCAST (never shuffling
    the corpus by bucket), the only nested-loop is the bounded per-lang
    stats frame, and the whole path is JVM column algebra."""
    from l1dbproto_spark.operators.langid import langid_scores, train_langid

    labeled = spark.createDataFrame(
        [(0, "aaaa bbbb", "x"), (1, "zzzz yyyy", "y")],
        "doc_id long, text string, lang string",
    )
    cond, stats = train_langid(labeled, num_buckets=64)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    plan = _executed(langid_scores(docs, cond, stats, num_buckets=64))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert _no_python(plan), plan


def test_bleu_stats_is_shuffle_free_scan_algebra(spark):
    """Per-example BLEU statistics: a pure projection — ZERO exchanges,
    zero Python, rides the scan."""
    from l1dbproto_spark.operators.evals import bleu_ngram_stats

    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("example_id"),
        F.col("text").alias("prediction"),
        F.array(F.col("text")).alias("references"),
    )
    plan = _executed(bleu_ngram_stats(docs))
    assert _exchanges(plan) == 0, plan
    assert "Join" not in plan, plan
    assert _no_python(plan), plan


def test_chrf_is_shuffle_free_scan_algebra(spark):
    from l1dbproto_spark.operators.evals import chrf_scores

    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("example_id"),
        F.substring(F.col("text"), 1, 20).alias("prediction"),
        F.array(F.substring(F.col("text"), 1, 24)).alias("references"),
    )
    plan = _executed(chrf_scores(docs))
    assert _exchanges(plan) == 0, plan
    assert "Join" not in plan, plan
    assert _no_python(plan), plan


def test_bleu_report_single_aggregation(spark):
    """Corpus BLEU: the integer statistics fold into ONE single-partition
    aggregation (one Exchange SinglePartition), nothing else."""
    from l1dbproto_spark.operators.evals import bleu_report

    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("example_id"),
        F.col("text").alias("prediction"),
        F.array(F.col("text")).alias("references"),
    )
    plan = _executed(bleu_report(docs))
    assert len(re.findall(r"Exchange SinglePartition", plan)) == 1, plan
    assert _no_python(plan), plan


def test_rouge_l_is_shuffle_free_scan_algebra(spark):
    """The LCS dynamic program is nested-HOF column algebra: a pure
    projection, zero exchanges, zero Python."""
    from l1dbproto_spark.operators.evals import rouge_l_scores

    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("example_id"),
        F.substring(F.col("text"), 1, 60).alias("prediction"),
        F.array(F.substring(F.col("text"), 1, 60)).alias("references"),
    )
    plan = _executed(rouge_l_scores(docs))
    assert _exchanges(plan) == 0, plan
    assert "Join" not in plan, plan
    assert _no_python(plan), plan


def test_wer_is_shuffle_free_scan_algebra(spark):
    from l1dbproto_spark.operators.evals import wer_scores

    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("example_id"),
        F.substring(F.col("text"), 1, 60).alias("prediction"),
        F.array(F.substring(F.col("text"), 1, 60)).alias("references"),
    )
    plan = _executed(wer_scores(docs))
    assert _exchanges(plan) == 0, plan
    assert "Join" not in plan, plan
    assert _no_python(plan), plan

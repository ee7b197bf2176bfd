"""Persistent BM25 inverted index: indexed results == corpus-scan results,
grown (build + append) == rebuilt-from-union, partition pruning actually in
the executed plan, mergeable stats generations, and the load roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.bm25 import (
    bm25_index_topk,
    bm25_topk,
    build_bm25_index,
    append_to_bm25_index,
    load_bm25_index,
    queries_df,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
QUERIES = [(1, "dup merge join"), (2, "window hash scan")]


def _rows(df):
    return sorted((r.query_id, r.doc_id, r.score, r.rank) for r in df.collect())


def test_indexed_equals_corpus_scan(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    idx = build_bm25_index(docs, str(tmp_path / "idx"))
    got = _rows(bm25_index_topk(idx, QUERIES, 10))
    want = _rows(bm25_topk(docs, queries_df(spark, QUERIES), 10))
    assert got == want


def test_grown_equals_rebuilt(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    idx = build_bm25_index(old, str(tmp_path / "grow"))
    append_to_bm25_index(idx, new)
    rebuilt = build_bm25_index(docs, str(tmp_path / "full"))
    assert _rows(bm25_index_topk(idx, QUERIES, 10)) == _rows(
        bm25_index_topk(rebuilt, QUERIES, 10)
    )
    # two stats generations merged into the same corpus statistics
    grown_stats = idx.stats().first()
    full_stats = rebuilt.stats().first()
    assert grown_stats.n_docs == full_stats.n_docs
    assert abs(grown_stats.avgdl - full_stats.avgdl) < 1e-12


def test_partition_pruning_in_plan(spark, tmp_path):
    """The postings scan carries a literal term_bucket partition filter —
    the index can be arbitrarily large, the query touches only its terms'
    buckets."""
    docs = load_table(spark, SF_DIR, "documents")
    idx = build_bm25_index(docs, str(tmp_path / "prune"), n_buckets=64)
    plan = (
        bm25_index_topk(idx, QUERIES, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    assert "term_bucket" in plan.split("PartitionFilters")[1][:200], plan[:2000]
    assert "CartesianProduct" not in plan


def test_load_roundtrip_and_empty_queries(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    build_bm25_index(docs, str(tmp_path / "rt"), n_buckets=32)
    idx = load_bm25_index(spark, str(tmp_path / "rt"))
    assert idx.meta.n_buckets == 32
    assert _rows(bm25_index_topk(idx, QUERIES, 5)) == _rows(
        bm25_index_topk(idx, QUERIES, 5)
    )
    assert bm25_index_topk(idx, [(1, "!!!")], 5).count() == 0

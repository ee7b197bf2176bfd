"""Streaming BM25 index maintenance: doc-id-idempotent appends equal the
batch rebuild, the store probe is bucket-pruned (PartitionFilters), zero-token
docs are excluded from postings AND stats, restart over the same source is a
no-op, and compact folds the file fan-in while preserving query results."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from l1dbproto_spark.operators.bm25 import (
    bm25_index_topk,
    build_bm25_index,
    load_bm25_index,
)
from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.bm25_append import StreamingBM25Append

SF_DIR = "/root/testdata/sf0.001"
QUERIES = [(1, "dup merge join"), (2, "window hash scan")]


def _rows(idx, k=10):
    return sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in bm25_index_topk(idx, QUERIES, k).collect()
    )


def test_append_idempotent_and_matches_rebuild(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    root = str(tmp_path / "idx")
    build_bm25_index(old, root)
    app = StreamingBM25Append(spark, root)
    n1 = app.append(new)
    assert n1 == new.count()
    # re-delivery of the same batch: zero fresh docs, store unchanged
    assert app.append(new) == 0
    assert app.append(old) == 0
    grown = load_bm25_index(spark, root)
    rebuilt = build_bm25_index(docs, str(tmp_path / "full"))
    assert _rows(grown) == _rows(rebuilt)
    g, f = grown.stats().first(), rebuilt.stats().first()
    assert (g.n_docs, g.avgdl) == (f.n_docs, f.avgdl)


def test_store_probe_is_partition_pruned(spark, tmp_path):
    """The presence probe reads the doc MANIFEST pruned to the batch's doc
    buckets — a literal partition filter, never a full-manifest scan."""
    docs = load_table(spark, SF_DIR, "documents")
    root = str(tmp_path / "idx")
    build_bm25_index(docs, root)
    app = StreamingBM25Append(spark, root)
    one = spark.createDataFrame([(10_000_000, "dup dup merge")], "doc_id LONG, text STRING")
    plan = app.existing_probe_plan(one)
    assert "PartitionFilters: [" in plan
    assert "doc_bucket" in plan.split("PartitionFilters")[1][:200]


def test_zero_token_docs_excluded_everywhere(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    root = str(tmp_path / "idx")
    build_bm25_index(docs, root)
    app = StreamingBM25Append(spark, root)
    before = load_bm25_index(spark, root).stats().first()
    junk = spark.createDataFrame(
        [(20_000_000, ""), (20_000_001, "   "), (20_000_002, "!!! ???")],
        "doc_id LONG, text STRING",
    )
    assert app.append(junk) == 0
    after = load_bm25_index(spark, root).stats().first()
    assert (before.n_docs, before.avgdl) == (after.n_docs, after.avgdl)


def test_bind_stream_end_to_end_and_restart(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    root = str(tmp_path / "idx")
    build_bm25_index(old, root)
    src = str(tmp_path / "src")
    new.write.parquet(src)
    app = StreamingBM25Append(spark, root)
    for _ in range(2):  # second pass = restart over the same source: no-op
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = app.bind_stream(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
    grown = load_bm25_index(spark, root)
    assert _rows(grown) == _rows(build_bm25_index(docs, str(tmp_path / "full")))


def test_compact_bounds_files_and_preserves_queries(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    root = str(tmp_path / "idx")
    build_bm25_index(docs.filter(F.col("doc_id") < 50), root, n_buckets=8)
    app = StreamingBM25Append(spark, root)
    for lo in range(50, 130, 20):  # four appends touch every bucket
        app.append(docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 20)))
    before = _rows(load_bm25_index(spark, root))
    some_bucket = glob.glob(f"{root}/postings.parquet/term_bucket=*")[0]
    assert len(glob.glob(f"{some_bucket}/*.parquet")) > 1
    app.compact()
    for bucket in glob.glob(f"{root}/postings.parquet/term_bucket=*"):
        assert len(glob.glob(f"{bucket}/*.parquet")) == 1
    assert _rows(load_bm25_index(spark, root)) == before


def test_intra_batch_duplicates_do_not_inflate_tf(spark, tmp_path):
    """One availableNow batch built from overlapping files can deliver the
    same doc twice; the appender collapses them BEFORE tokenizing, so tf is
    never doubled (review find r8)."""
    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    root = str(tmp_path / "idx")
    build_bm25_index(old, root)
    app = StreamingBM25Append(spark, root)
    doubled = new.unionByName(new)  # overlapping backfill files in one batch
    assert app.append(doubled) == new.count()
    grown = load_bm25_index(spark, root)
    rebuilt = build_bm25_index(docs, str(tmp_path / "full"))
    assert _rows(grown) == _rows(rebuilt)
    g, f = grown.stats().first(), rebuilt.stats().first()
    assert (g.n_docs, g.avgdl) == (f.n_docs, f.avgdl)


def test_crash_retry_between_writes_converges(spark, tmp_path):
    """Simulated epoch retry after a crash MID-APPEND (stats + postings
    written, manifest — the commit point — not): the retry re-writes the
    same content-keyed stats row (reader-folded) and re-appends postings
    (query-path deduped), and the final index equals a clean rebuild
    (review find r8)."""
    from l1dbproto_spark.operators.bm25 import (
        _doc_postings,
        _stats_generation,
    )

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    root = str(tmp_path / "idx")
    build_bm25_index(old, root)
    app = StreamingBM25Append(spark, root)
    # crash simulation: perform append steps 1-2 manually, skip the manifest
    _, fresh, _ = app._fresh_and_probe(new)
    _stats_generation(fresh).write.mode("append").parquet(f"{root}/stats.parquet")
    _doc_postings(new, "doc_id", "text", app.index.meta.n_buckets).repartition(
        "term_bucket"
    ).write.mode("append").partitionBy("term_bucket").parquet(f"{root}/postings.parquet")
    # the retry: sees the docs as absent (manifest not written) and redoes all
    assert app.append(new) == new.count()
    grown = load_bm25_index(spark, root)
    rebuilt = build_bm25_index(docs, str(tmp_path / "full"))
    assert _rows(grown) == _rows(rebuilt)
    g, f = grown.stats().first(), rebuilt.stats().first()
    assert (g.n_docs, g.avgdl) == (f.n_docs, f.avgdl)  # dup stats gen folded
    # compact removes the duplicate postings permanently; results unchanged
    app.compact()
    assert _rows(load_bm25_index(spark, root)) == _rows(rebuilt)
    posts = load_bm25_index(spark, root).postings()
    assert posts.count() == posts.dropDuplicates(["term", "doc_id"]).count()


def test_zero_token_docs_one_rule_everywhere(spark, tmp_path):
    """Zero-token docs are excluded from stats by BOTH the batch build and
    the streaming appender, so grown == rebuilt holds for corpora containing
    empty docs (review find r8)."""
    docs = load_table(spark, SF_DIR, "documents")
    junk = spark.createDataFrame(
        [(20_000_000, ""), (20_000_001, "   "), (20_000_002, "!!! ???")],
        "doc_id LONG, text STRING",
    )
    full = docs.select("doc_id", "text").unionByName(junk)
    root = str(tmp_path / "idx")
    build_bm25_index(docs.filter(F.col("doc_id") % 2 == 0), root)
    app = StreamingBM25Append(spark, root)
    app.append(docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text"))
    assert app.append(junk) == 0
    grown = load_bm25_index(spark, root)
    rebuilt = build_bm25_index(full, str(tmp_path / "full"))
    g, f = grown.stats().first(), rebuilt.stats().first()
    assert (g.n_docs, g.avgdl) == (f.n_docs, f.avgdl)
    assert _rows(grown) == _rows(rebuilt)
    # and the probe-plan hook is empty-safe for unindexable batches
    assert app.existing_probe_plan(junk) == ""

"""Streaming IVF-PQ index maintenance (streaming/index_append.py):
id-level idempotent appends, streamed growth == batch rebuild, and the
partition-pruned store probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.pq import (
    build_pq_index,
    load_pq_index,
    pq_codebooks,
    pq_index_topk,
)
from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.index_append import StreamingIndexAppend

SF_DIR = "/root/testdata/sf0.001"
M, K_CODES, DIM, N_CLUSTERS = 8, 16, 64, 16


def _fixed_centroids(emb):
    return emb.filter(F.col("vec_id") < N_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )


def _seeded_index(spark, emb, root):
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    cent = _fixed_centroids(emb)
    cb = pq_codebooks(emb, m=M, k_codes=K_CODES, dim=DIM)
    build_pq_index(half_a, cent, cb, root, m=M, k_codes=K_CODES, dim=DIM)
    return cent, cb


def test_append_idempotent_and_matches_rebuild(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    cent, cb = _seeded_index(spark, emb, root)
    app = StreamingIndexAppend(spark, root)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    n1 = app.append(half_b)
    assert n1 == half_b.count()
    # re-delivery of the same batch (and an overlapping superset) is a no-op
    assert app.append(half_b) == 0
    assert app.append(emb) == 0
    full_root = str(tmp_path / "full")
    build_pq_index(emb, cent, cb, full_root, m=M, k_codes=K_CODES, dim=DIM)
    grown = load_pq_index(spark, root)
    full = load_pq_index(spark, full_root)
    a = {
        (r.cluster, r.neighbor_id, tuple(r.codes))
        for r in grown.codes().collect()
    }
    b = {
        (r.cluster, r.neighbor_id, tuple(r.codes))
        for r in full.codes().collect()
    }
    assert a == b
    queries = emb.filter(F.col("vec_id") < 8)
    kw = dict(k=5, n_probe=2, refine=4)
    got = {tuple(r) for r in pq_index_topk(grown, queries, emb, **kw).collect()}
    want = {tuple(r) for r in pq_index_topk(full, queries, emb, **kw).collect()}
    assert got == want


def test_store_probe_is_partition_pruned(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    _seeded_index(spark, emb, root)
    app = StreamingIndexAppend(spark, root)
    # a batch that lands in few clusters: vectors near centroid 3
    batch = emb.filter(F.col("vec_id").isin(3)).select(
        (F.col("vec_id") + 90000).alias("vec_id"), "embedding"
    )
    plan = app.existing_probe_plan(batch)
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*cluster[^\]]*\]", plan)
    assert m, plan


def test_bind_stream_end_to_end(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    cent, cb = _seeded_index(spark, emb, root)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "src")
    half_b.write.parquet(src)
    app = StreamingIndexAppend(spark, root)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)
    q = app.bind_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    grown = load_pq_index(spark, root)
    assert grown.codes().count() == emb.count()
    # restart over the same source is a no-op (checkpoint + id idempotency)
    stream2 = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)
    q2 = app.bind_stream(stream2, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert load_pq_index(spark, root).codes().count() == emb.count()


def test_compact_bounds_files_and_preserves_queries(spark, tmp_path):
    """N appends leave N files in a touched cluster dir; compact folds
    back to 1 with row-identical store and query results."""
    import glob

    emb = load_table(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    _seeded_index(spark, emb, root)
    app = StreamingIndexAppend(spark, root)
    odd = [r.vec_id for r in emb.filter(F.col("vec_id") % 2 == 1).limit(6).collect()]
    for vid in odd:  # six single-row appends
        app.append(emb.filter(F.col("vec_id") == vid))
    idx = load_pq_index(spark, root)
    before = {
        (r.cluster, r.neighbor_id, tuple(r.codes))
        for r in idx.codes().collect()
    }
    queries = emb.filter(F.col("vec_id") < 8)
    kw = dict(k=5, n_probe=2, refine=4)
    want = {tuple(r) for r in pq_index_topk(idx, queries, emb, **kw).collect()}
    counts_before = {
        d: len(glob.glob(f"{d}/*.parquet"))
        for d in glob.glob(f"{root}/codes.parquet/cluster=*")
    }
    assert max(counts_before.values()) > 1
    idx.compact()
    counts_after = {
        d: len(glob.glob(f"{d}/*.parquet"))
        for d in glob.glob(f"{root}/codes.parquet/cluster=*")
    }
    assert max(counts_after.values()) == 1
    after = {
        (r.cluster, r.neighbor_id, tuple(r.codes))
        for r in idx.codes().collect()
    }
    assert after == before
    got = {tuple(r) for r in pq_index_topk(idx, queries, emb, **kw).collect()}
    assert got == want


def test_compact_repairs_concurrent_writer_double_insert(spark, tmp_path):
    """The append family assumes a SINGLE writer (unlocked read -> anti-
    join -> write); if two concurrent writers raced and double-inserted
    ids, compact() is the documented repair path — it dedups
    (cluster, neighbor_id) during the fold, exact because duplicate-id
    rows are bit-identical under the frozen quantizers."""
    emb = load_table(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    _seeded_index(spark, emb, root)
    idx = load_pq_index(spark, root)
    clean = {
        (r.cluster, r.neighbor_id, tuple(r.codes))
        for r in idx.codes().collect()
    }
    # simulate the race: re-append a slice of the existing rows verbatim
    # (exactly what a second writer that saw them as absent would write)
    dup = idx.codes().filter(F.col("neighbor_id") % 5 == 0)
    n_dup = dup.count()
    assert n_dup > 0
    dup.repartition("cluster").write.mode("append").partitionBy(
        "cluster"
    ).parquet(f"{root}/codes.parquet")
    assert idx.codes().count() == len(clean) + n_dup  # corrupted: dup ids
    idx.compact()
    repaired = [
        (r.cluster, r.neighbor_id, tuple(r.codes))
        for r in idx.codes().collect()
    ]
    assert len(repaired) == len(clean)  # uniqueness restored
    assert set(repaired) == clean  # and nothing else changed

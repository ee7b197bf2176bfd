"""Feature-hashing document embeddings (operators/embed.py): DuckDB
bit-parity, totality/zero-vector contract, clone geometry, and
composition with the embedding-side operator family."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.embed import (
    hashed_doc_embeddings,
    hashed_doc_embeddings_oracle_sql,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("l2_normalize", [True, False])
def test_duckdb_bit_parity(spark, l2_normalize):
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        r.doc_id: list(r.embedding)
        for r in hashed_doc_embeddings(
            docs, dim=16, l2_normalize=l2_normalize
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = {
        int(r[0]): list(r[1])
        for r in con.execute(
            hashed_doc_embeddings_oracle_sql(dim=16, l2_normalize=l2_normalize)
        ).fetchall()
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d] == want[d], d  # bit-identical, no tolerance


def test_total_and_zero_vector_contract(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, None),
        (3, "   "),
        (4, "alpha beta gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: list(r.embedding) for r in hashed_doc_embeddings(df, dim=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[2] == [0.0] * 8 and out[3] == [0.0] * 8
    # exact clones -> identical vectors; normalized non-empty -> unit norm
    assert out[1] == out[4]
    assert abs(float(np.linalg.norm(out[1])) - 1.0) < 1e-12


def test_clone_geometry_feeds_semdedup(spark):
    """End-to-end model-free SemDeDup: embed the corpus + exact clones,
    cluster on four pinned vectors — every clone must drop with cosine
    1.0 against its original."""
    from l1dbproto_spark.operators.semdedup import semantic_dedup

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    emb = hashed_doc_embeddings(docs.unionByName(clones)).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    lookup = spark.createDataFrame(
        [(c, v) for c, v in enumerate([0, 123, 251, 377])],
        "cluster int, vec_id long",
    )
    cents = emb.join(F.broadcast(lookup), "vec_id").select(
        "cluster", F.col("embedding").alias("centroid")
    )
    _, dropped = semantic_dedup(emb, cents, eps=0.0001)
    got = {
        r.vec_id: (r.canonical_id, r.cosine_sim) for r in dropped.collect()
    }
    for i in range(20):
        canon, sim = got[1_000_000 + i]
        assert canon == i
        assert sim == pytest.approx(1.0, abs=1e-9)


def test_plan_two_exchanges_no_join(spark):
    """Embedder plan: token explode -> (doc, idx) agg -> per-doc assembly;
    the zero-vector completion joins only the slim id spine."""
    docs = load_table(spark, SF_DIR, "documents")
    df = hashed_doc_embeddings(docs, dim=32, l2_normalize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    assert df.count() == docs.count()


def test_ann_over_hashed_embeddings(spark):
    """The embedding family composes: brute-force top-k over hashed
    vectors finds each injected clone as its original's nearest
    neighbor."""
    from l1dbproto_spark.operators.similarity import brute_force_topk

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    emb = hashed_doc_embeddings(docs.unionByName(clones)).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    q = emb.filter(F.col("vec_id") >= 1_000_000)
    top1 = brute_force_topk(emb, q, k=1).collect()
    for r in top1:
        assert r.neighbor_id == r.query_id - 1_000_000
        assert r.cosine_sim == pytest.approx(1.0, abs=1e-9)


def test_retrieval_pipeline_chunk_embed_ann(spark):
    """RAG-shape composition: sliding-window chunking -> feature-hash
    chunk embeddings -> exact ANN. A passage planted verbatim inside
    another document must retrieve its source chunk at cosine ~1.0."""
    from l1dbproto_spark.operators.packing import chunk_documents
    from l1dbproto_spark.operators.similarity import brute_force_topk

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(50)
    planted = docs.filter(F.col("doc_id") == 7).select(
        F.lit(900_000).alias("doc_id"),
        F.concat(F.lit("unrelated preamble words here "), F.col("text")).alias(
            "text"
        ),
    )
    corpus = docs.unionByName(planted)
    chunks = chunk_documents(corpus, chunk_tokens=12, overlap_tokens=0)
    chunk_vecs = hashed_doc_embeddings(
        chunks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_index")).alias("chunk_id"),
            F.col("chunk_text").alias("text"),
        ),
        dim=64,
        id_col="chunk_id",
    )
    # query with doc 7's own first full-width chunk
    q = chunk_vecs.filter(F.col("chunk_id") == 7000)
    top = brute_force_topk(chunk_vecs, q, k=3, id_col="chunk_id").collect()
    assert top, "query chunk must embed and retrieve"
    # somewhere in the top-3: a chunk of the planted doc at cosine ~1.0
    # (the 4-token preamble shifts the planted doc's chunk grid, but a
    # 12-token window of identical text exists whenever the shift aligns;
    # at minimum the SAME tokens re-hash to a high-cosine neighbor)
    best = top[0]
    assert best.cosine_sim > 0.5, top


def test_doc_embed_ann_query_side_pushdown(spark):
    """The registered doc_embed_ann plan pushes the doc_id<10 query
    predicate below the coordinate aggregation all the way into one of
    the documents scans — the query-side embed subtree reads 10 docs,
    not the corpus."""
    from l1dbproto_spark.queries import load_all

    df = load_all()["doc_embed_ann"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "doc_id" in plan and "< 10)" in plan
    pushed = [
        line for line in plan.splitlines()
        if "FileScan" in line and "< 10)" in line
    ]
    assert pushed, plan

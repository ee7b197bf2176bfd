"""Hybrid retrieval: BM25 (lexical) + hashed-embedding ANN (semantic) fused
by Reciprocal Rank Fusion — python-reference parity for the fusion math and
an end-to-end more-like-this composition over the documents fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.bm25 import bm25_topk, queries_df
from l1dbproto_spark.operators.embed import hashed_doc_embeddings
from l1dbproto_spark.operators.fusion import rrf_fuse
from l1dbproto_spark.operators.similarity import brute_force_topk
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "query_id INT, doc_id INT, rank INT")


def test_rrf_matches_python_reference(spark):
    a = _mk(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)])
    b = _mk(spark, [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)])
    got = {
        (r.query_id, r.doc_id): (r.rrf_score, r.rank)
        for r in rrf_fuse([a, b], k=60).collect()
    }
    want_scores = {}
    for (q, d, rk), src in [((1, 10, 1), 0), ((1, 11, 2), 0), ((1, 12, 3), 0), ((2, 20, 1), 0),
                            ((1, 11, 1), 1), ((1, 13, 2), 1), ((2, 21, 1), 1), ((2, 20, 2), 1)]:
        want_scores[(q, d)] = want_scores.get((q, d), 0.0) + 1.0 / (60 + rk)
    for key, (score, _) in got.items():
        assert abs(score - round(want_scores[key], 9)) < 1e-12
    # doc 11 is in both sources -> beats every single-source doc for query 1
    q1 = sorted(((r, k) for k, (s, r) in got.items() if k[0] == 1))
    assert q1[0][1] == (1, 11)
    # ranks contiguous from 1 per query
    for q in (1, 2):
        ranks = sorted(r for k, (s, r) in got.items() if k[0] == q)
        assert ranks == list(range(1, len(ranks) + 1))


def test_rrf_single_source_and_topk(spark):
    a = _mk(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    out = rrf_fuse([a], k=60, topk=2).collect()
    assert {(r.doc_id, r.rank) for r in out} == {(10, 1), (11, 2)}


def test_hybrid_more_like_this(spark):
    """End-to-end: query docs' own text as the BM25 probe + their hashed
    embedding as the ANN probe, RRF-fused. The two sources rank DIFFERENT
    doc sets in general; fusion returns a single consistent ranking over
    their union, self-hits excluded."""
    docs = load_table(spark, SF_DIR, "documents")
    qmax, k = 5, 10
    probe_rows = [
        (int(r.doc_id), r.text)
        for r in docs.filter(F.col("doc_id") < qmax).select("doc_id", "text").collect()
    ]  # bounded: qmax rows

    lex = (
        bm25_topk(docs, queries_df(spark, probe_rows), k)
        .filter(F.col("query_id") != F.col("doc_id"))  # drop the self-hit
        .select("query_id", "doc_id", "rank")
    )
    emb = hashed_doc_embeddings(docs, dim=64, id_col="doc_id")
    sem = (
        brute_force_topk(emb, emb.filter(F.col("doc_id") < qmax), k=k, id_col="doc_id")
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    )
    fused = rrf_fuse([lex, sem], topk=k)
    rows = fused.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    lex_set = {(r.query_id, r.doc_id) for r in lex.collect()}
    sem_set = {(r.query_id, r.doc_id) for r in sem.collect()}
    assert set(by_q) == set(range(qmax))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.rrf_score for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert (q, r.doc_id) in lex_set | sem_set
            assert r.doc_id != q  # no self-hit survives
    # fusion actually drew from both sources somewhere
    fused_set = {(r.query_id, r.doc_id) for r in rows}
    assert fused_set & (lex_set - sem_set)
    assert fused_set & (sem_set - lex_set)


def test_fused_ranking_through_retrieval_metrics(spark):
    """Composition: a real RRF-fused ranking flows straight into
    operators/evals.retrieval_metrics (the registered retrieval_eval row
    pins the metric ALGEBRA on hash-synthetic rankings; this pins the
    integration — fused (query, doc, rank) triples are directly consumable
    as the results side), checked against hand-computed metrics."""
    import math

    from l1dbproto_spark.operators.evals import macro_metrics, retrieval_metrics

    a = _mk(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)])
    b = _mk(spark, [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)])
    fused = rrf_fuse([a, b], k=60)
    # judged: q1 -> 11 highly relevant, 12 relevant, 99 relevant-but-missed;
    # q2 -> 20 relevant, 21 judged non-relevant
    qrels = spark.createDataFrame(
        [(1, 11, 2), (1, 12, 1), (1, 99, 1), (2, 20, 1), (2, 21, 0)],
        "query_id INT, doc_id INT, rel INT",
    )
    per_q = {
        r.query_id: r for r in retrieval_metrics(fused, qrels, k=3).collect()
    }
    # q1 fused order: 11 (both sources, 1/61+1/62), then the single-source
    # docs by their RRF mass: 10 (1/61), 13 (1/62), 12 (1/63) -> top-3 is
    # [11, 10, 13]; only doc 11 is relevant among them
    d = lambda r: 1.0 / math.log2(r + 1)
    q1 = per_q[1]
    assert (q1.n_retrieved, q1.n_rel, q1.hits) == (3, 3, True)
    assert q1.precision_at_k == 1 / 3
    assert q1.recall_at_k == 1 / 3
    assert q1.rr_at_k == 1.0  # doc 11 at rank 1
    assert abs(q1.dcg_at_k - 3 * d(1)) < 1e-8
    assert abs(q1.idcg_at_k - (3 * d(1) + 1 * d(2) + 1 * d(3))) < 1e-8
    # q2 fused order: 20 (both sources) then 21 -> rel doc first
    q2 = per_q[2]
    assert (q2.precision_at_k, q2.recall_at_k, q2.rr_at_k) == (1 / 3, 1.0, 1.0)
    macro = macro_metrics(retrieval_metrics(fused, qrels, k=3)).collect()[0]
    assert macro.n_queries == 2
    assert abs(macro.mean_rr_at_k - 1.0) < 1e-12


def test_hybrid_pipeline_ends_in_mmr_diversification(spark):
    """The full retrieval chain (driver r10 composition pin): BM25 + ANN
    -> RRF fuse -> min-max normalize per query -> MMR re-rank. At lam=1
    MMR must REPRODUCE the fused relevance order exactly (the identity
    that proves the plumbing is lossless); at lam=0.5 it returns k
    diversified picks drawn from the same candidate set with contiguous
    ranks."""
    from l1dbproto_spark.operators.rerank import mmr_rerank
    from pyspark.sql import Window

    docs = load_table(spark, SF_DIR, "documents")
    qmax, k = 4, 8
    probe_rows = [
        (int(r.doc_id), r.text)
        for r in docs.filter(F.col("doc_id") < qmax).select("doc_id", "text").collect()
    ]
    lex = (
        bm25_topk(docs, queries_df(spark, probe_rows), k)
        .filter(F.col("query_id") != F.col("doc_id"))
        .select("query_id", "doc_id", "rank")
    )
    emb = hashed_doc_embeddings(docs, dim=64, id_col="doc_id")
    sem = brute_force_topk(
        emb, emb.filter(F.col("doc_id") < qmax), k=k, id_col="doc_id"
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse([lex, sem], topk=k)
    # min-max normalize the rrf score per query (mmr_rerank's documented
    # contract for mixed-scale scores) + attach each candidate's vector
    wq = Window.partitionBy("query_id")
    span = F.max("rrf_score").over(wq) - F.min("rrf_score").over(wq)
    cands = (
        fused.withColumn(
            "score",
            F.when(span > 0, (F.col("rrf_score") - F.min("rrf_score").over(wq)) / span)
            .otherwise(F.lit(1.0)),
        )
        .join(emb.select(F.col("doc_id"), F.col("embedding").alias("vec")), "doc_id")
        .select("query_id", "doc_id", "score", "vec", "rank")
    )
    # lam=1: pure relevance — MMR order == fused order, doc for doc
    pure = mmr_rerank(cands.drop("rank"), k=3, lam=1.0)
    fused_order = {
        (r.query_id, r.rank): r.doc_id for r in cands.filter(F.col("rank") <= 3).collect()
    }
    for r in pure.collect():
        assert fused_order[(r.query_id, r.mmr_rank)] == r.doc_id
    # lam=0.5: diversified picks, still from the candidate set, ranks 1..3
    div = mmr_rerank(cands.drop("rank"), k=3, lam=0.5)
    cand_set = {(r.query_id, r.doc_id) for r in cands.collect()}
    by_q = {}
    for r in div.collect():
        by_q.setdefault(r.query_id, []).append(r.mmr_rank)
        assert (r.query_id, r.doc_id) in cand_set
    assert set(by_q) == set(range(qmax))
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())

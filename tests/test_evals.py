"""Retrieval-eval metrics (operators/evals.py): python-reference parity,
loud-NULL conventions, macro averages, and composition with a real
ranking. The registered retrieval_eval row's full DuckDB oracle runs in
test_queries_oracle.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.evals import (
    macro_metrics,
    ranked_results,
    retrieval_metrics,
)

# hand corpus: 2 judged queries + 1 qrels-only query
RESULTS = [
    # q1: ranks 1..4 -> docs 10,11,12,13
    (1, 10, 1),
    (1, 11, 2),
    (1, 12, 3),
    (1, 13, 4),
    # q2: one retrieved doc, unjudged
    (2, 20, 1),
    # q99 retrieved but never judged: excluded from the eval (trec_eval)
    (99, 1, 1),
]
QRELS = [
    (1, 10, 2),  # rel grade 2 at rank 1
    (1, 12, 1),  # rel grade 1 at rank 3
    (1, 14, 3),  # relevant but not retrieved
    (1, 15, 0),  # judged non-relevant
    (2, 21, 0),  # q2: judged, but NO positive grade
    (3, 30, 1),  # q3: judged + relevant, nothing retrieved
]


def _py_dcg(grades_at_ranks: list[tuple[int, int]]) -> float:
    # same definition as the operator: 9dp-rounded terms, exact sum
    return float(
        sum(
            round((2.0**rel - 1.0) * (1.0 / math.log2(r + 1)), 9)
            for r, rel in grades_at_ranks
        )
    )


@pytest.fixture(scope="module")
def per_query(spark):
    results = spark.createDataFrame(
        RESULTS, "query_id INT, doc_id INT, rank INT"
    )
    qrels = spark.createDataFrame(QRELS, "query_id INT, doc_id INT, rel INT")
    out = retrieval_metrics(results, qrels, k=3)
    return {r["query_id"]: r for r in out.collect()}


def test_per_query_values(per_query):
    assert set(per_query) == {1, 2, 3}  # judged queries only

    q1 = per_query[1]
    # cutoff k=3 drops rank-4; retrieved rel grades: r1->2, r2->0, r3->1
    assert q1["n_retrieved"] == 3 and q1["n_rel"] == 3
    assert q1["hits"] is True
    assert q1["precision_at_k"] == 2 / 3.0
    assert q1["recall_at_k"] == 2 / 3.0  # doc 14 relevant but unretrieved
    assert q1["rr_at_k"] == 1.0
    assert q1["dcg_at_k"] == _py_dcg([(1, 2), (3, 1)])
    # ideal ordering of q1 grades (3,2,1) at ranks 1..3
    assert q1["idcg_at_k"] == _py_dcg([(1, 3), (2, 2), (3, 1)])
    assert q1["ndcg_at_k"] == q1["dcg_at_k"] / q1["idcg_at_k"]

    q2 = per_query[2]  # judged with no positive grade: loud NULLs
    assert q2["n_rel"] == 0 and q2["hits"] is False
    assert q2["recall_at_k"] is None and q2["ndcg_at_k"] is None
    assert q2["rr_at_k"] == 0.0 and q2["precision_at_k"] == 0.0

    q3 = per_query[3]  # relevant docs exist, nothing retrieved
    assert q3["n_retrieved"] == 0 and q3["n_rel"] == 1
    assert q3["recall_at_k"] == 0.0 and q3["ndcg_at_k"] == 0.0
    assert q3["idcg_at_k"] == _py_dcg([(1, 1)])


def test_q1_recall_counts_unretrieved(per_query):
    # n_rel counts ALL positively-judged docs (14 included) -> recall 2/3
    q1 = per_query[1]
    assert q1["n_rel"] == 3
    assert q1["recall_at_k"] == 2 / 3.0


def test_macro_metrics(spark, per_query):
    results = spark.createDataFrame(
        RESULTS, "query_id INT, doc_id INT, rank INT"
    )
    qrels = spark.createDataFrame(QRELS, "query_id INT, doc_id INT, rel INT")
    row = macro_metrics(retrieval_metrics(results, qrels, k=3)).collect()[0]
    assert row["n_queries"] == 3
    assert row["hit_rate"] == pytest.approx(1 / 3.0)
    # NULL recall/ndcg (q2) excluded from their means
    q1, q3 = per_query[1], per_query[3]
    assert row["mean_recall_at_k"] == pytest.approx(
        (q1["recall_at_k"] + q3["recall_at_k"]) / 2
    )
    assert row["mean_ndcg_at_k"] == pytest.approx(
        (q1["ndcg_at_k"] + q3["ndcg_at_k"]) / 2
    )
    assert row["mean_precision_at_k"] == pytest.approx(
        (q1["precision_at_k"] + 0.0 + 0.0) / 3
    )


def test_score_ranking_and_linear_gain(spark):
    # score path: ties broken by doc id ascending
    results = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 5.0), (1, 12, 9.0)],
        "query_id INT, doc_id INT, score DOUBLE",
    )
    ranked = {
        r["doc_id"]: r["rank"]
        for r in ranked_results(
            results, k=3, rank_col=None, score_col="score"
        ).collect()
    }
    assert ranked == {12: 1, 10: 2, 11: 3}

    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1)], "query_id INT, doc_id INT, rel INT"
    )
    row = retrieval_metrics(
        results, qrels, k=2, gain="linear", rank_col=None, score_col="score"
    ).collect()[0]
    # linear gains: rank1 rel=1, rank2 rel=2
    want = float(
        round(1 * (1 / math.log2(2)), 9) + round(2 * (1 / math.log2(3)), 9)
    )
    assert row["dcg_at_k"] == want
    assert row["rr_at_k"] == 1.0


def test_errors(spark):
    df = spark.createDataFrame([(1, 2, 1)], "query_id INT, doc_id INT, rank INT")
    with pytest.raises(ValueError, match="k must be"):
        retrieval_metrics(df, df, k=0)
    with pytest.raises(ValueError, match="rank_col / score_col"):
        ranked_results(df, k=1, rank_col=None, score_col=None)
    with pytest.raises(ValueError, match="gain must be"):
        retrieval_metrics(df, df.selectExpr("query_id", "doc_id", "1 as rel"), k=1, gain="bogus").collect()


def test_pair_set_eval_exact_counts(spark):
    """pair_set_eval (r13): canonicalization (orientation, dup rows,
    self-pairs, NULLs) cannot bias the counts; P/R/F1 are exact rational
    arithmetic; undefined ratios are NULL per the empty-side contract."""
    from l1dbproto_spark.operators.evals import pair_set_eval

    pred = spark.createDataFrame(
        [
            (1, 2), (2, 1),          # one unordered pair, twice
            (3, 4),
            (5, 6),                  # false positive
            (7, 7),                  # self-pair -> dropped
            (None, 9), (9, None),    # NULLs -> dropped
        ],
        "a long, b long",
    )
    truth = spark.createDataFrame(
        [(2, 1), (4, 3), (8, 9)], "a long, b long"
    )
    got = pair_set_eval(pred, truth).collect()[0]
    assert (got.n_pred, got.n_truth, got.n_hit) == (3, 3, 2)
    assert got.precision == pytest.approx(2 / 3, abs=1e-9)
    assert got.recall == pytest.approx(2 / 3, abs=1e-9)
    assert got.f1 == pytest.approx(2 / 3, abs=1e-9)
    # empty predictions: precision undefined (NULL), recall 0, f1 NULL
    empty = pred.filter(F.lit(False))
    got = pair_set_eval(empty, truth).collect()[0]
    assert (got.n_pred, got.n_hit) == (0, 0)
    assert got.precision is None and got.recall == 0.0 and got.f1 is None
    # zero hits with both sides non-empty: P=R=0, f1 NULL (0/0 undefined)
    got = pair_set_eval(
        spark.createDataFrame([(100, 101)], "a long, b long"), truth
    ).collect()[0]
    assert got.precision == 0.0 and got.recall == 0.0 and got.f1 is None


def test_pair_set_eval_scores_a_real_detector(spark):
    """Composition: SimHash near-dup pairs over a planted-clone corpus,
    scored against the planted truth — recall 1.0 on exact clones and
    every reported hit is a real planted pair (precision 1.0: distinct
    fixture docs are far apart at 64 bits)."""
    from l1dbproto_spark.operators.dedup import simhash, simhash_near_dup_pairs
    from l1dbproto_spark.operators.evals import pair_set_eval
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 40
    ).select("doc_id", "text")
    clones = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(clones)
    pred = simhash_near_dup_pairs(simhash(corpus), max_bits=3).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    truth = docs.select(
        F.col("doc_id").alias("a"), (F.col("doc_id") + 1000).alias("b")
    )
    got = pair_set_eval(pred, truth).collect()[0]
    assert got.n_truth == 40
    assert got.recall == 1.0  # every exact clone found
    assert got.precision >= 0.9  # near-identical fixture docs may also pair


def test_pair_set_eval_both_sides_empty(spark):
    """Both sides empty: every ratio undefined -> NULL verdicts, zero
    counts, no crash (the empty-side contract end to end)."""
    from l1dbproto_spark.operators.evals import pair_set_eval

    e = spark.createDataFrame([], "a long, b long")
    r = pair_set_eval(e, e).collect()[0]
    assert (r.n_pred, r.n_truth, r.n_hit) == (0, 0, 0)
    assert r.precision is None and r.recall is None and r.f1 is None


def test_bcubed_hand_example_and_duckdb(spark):
    """bcubed_eval (r13): the textbook hand example checked against
    per-item arithmetic, a DuckDB re-derivation of the closed-form
    contingency computation over a documents-derived split, perfect and
    empty edges, and the duplicate-assignment guard."""
    import duckdb

    from l1dbproto_spark.operators.evals import bcubed_eval
    from l1dbproto_spark.sources.catalog import load_table

    # truth {1,2,3},{4,5},{6}; predicted {1,2},{3,4,5},{6}
    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b"), (6, "c")],
        "doc_id long, cluster string",
    )
    truth = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "y"), (6, "z")],
        "doc_id long, cluster string",
    )
    got = bcubed_eval(pred, truth).collect()[0]
    # per-item precision: 1,1,1/3,2/3,2/3,1 -> mean 14/3/6
    # per-item recall:    2/3,2/3,1/3,1,1,1 -> mean 14/3/6
    want = (14 / 3) / 6
    assert got.n_items == 6
    assert got.precision == pytest.approx(want, abs=1e-9)
    assert got.recall == pytest.approx(want, abs=1e-9)
    assert got.f1 == pytest.approx(want, abs=1e-9)

    # DuckDB re-derivation over a documents-derived assignment: truth =
    # doc_id % 25; predicted merges clusters 0 and 1 and splits docs
    # under 40 into their own cluster
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    tr = docs.select("doc_id", (F.col("doc_id") % 25).alias("cluster"))
    pr = docs.select(
        "doc_id",
        F.when(F.col("doc_id") < 40, F.col("doc_id") + 1000)
        .when(F.col("doc_id") % 25 <= 1, F.lit(0))
        .otherwise(F.col("doc_id") % 25)
        .alias("cluster"),
    )
    got = bcubed_eval(pr, tr).toPandas()
    duck = duckdb.connect()
    want = duck.execute(
        """
        WITH d AS (SELECT doc_id FROM '/root/testdata/sf0.001/documents.parquet'),
        a AS (
          SELECT doc_id,
                 CASE WHEN doc_id < 40 THEN doc_id + 1000
                      WHEN doc_id % 25 <= 1 THEN 0
                      ELSE doc_id % 25 END AS pc,
                 doc_id % 25 AS tc
          FROM d
        ),
        cell AS (SELECT pc, tc, COUNT(*) AS n_pt FROM a GROUP BY 1, 2),
        ps AS (SELECT pc, SUM(n_pt) AS n_p FROM cell GROUP BY 1),
        ts AS (SELECT tc, SUM(n_pt) AS n_t FROM cell GROUP BY 1),
        terms AS (
          SELECT CAST(ROUND(CAST(n_pt AS DOUBLE) * n_pt / n_p, 9)
                      AS DECIMAL(28,9)) AS sp,
                 CAST(ROUND(CAST(n_pt AS DOUBLE) * n_pt / n_t, 9)
                      AS DECIMAL(28,9)) AS st,
                 n_pt
          FROM cell JOIN ps USING (pc) JOIN ts USING (tc)
        )
        SELECT CAST(SUM(n_pt) AS BIGINT) AS n_items,
               ROUND(CAST(SUM(sp) AS DOUBLE) / SUM(n_pt), 9) AS precision,
               ROUND(CAST(SUM(st) AS DOUBLE) / SUM(n_pt), 9) AS recall,
               ROUND(2.0 * (CAST(SUM(sp) AS DOUBLE) / SUM(n_pt))
                         * (CAST(SUM(st) AS DOUBLE) / SUM(n_pt))
                     / (CAST(SUM(sp) AS DOUBLE) / SUM(n_pt)
                        + CAST(SUM(st) AS DOUBLE) / SUM(n_pt)), 9) AS f1
        FROM terms
        """
    ).df()
    duck.close()
    from tools.check_correctness import compare

    issues = compare("bcubed_eval", got, want)
    assert not issues, issues
    # the planted split/merge must show: precision < 1 (merge), recall < 1 (split)
    assert got["precision"].iloc[0] < 1.0 and got["recall"].iloc[0] < 1.0

    # perfect assignment: all 1.0; empty universe: 0 items, NULL ratios
    perfect = bcubed_eval(tr, tr).collect()[0]
    assert (perfect.precision, perfect.recall, perfect.f1) == (1.0, 1.0, 1.0)
    none = bcubed_eval(pred.filter(F.lit(False)), truth).collect()[0]
    assert none.n_items == 0 and none.precision is None and none.f1 is None
    with pytest.raises(ValueError, match="multiple clusters"):
        bcubed_eval(
            pred.unionByName(
                spark.createDataFrame([(1, "zz")], "doc_id long, cluster string")
            ),
            truth,
        ).collect()


def test_bcubed_scores_the_image_dedup_row(spark):
    """Cross-family composition: the registered image-dedup row's
    components, scored by bcubed_eval against the planted doc_id % 100
    family truth — a perfect 1.0/1.0/1.0, which is exactly what the
    row's own oracle guarantees, now phrased as the clustering metric a
    dedup pipeline would actually report."""
    from l1dbproto_spark.operators.evals import bcubed_eval
    from l1dbproto_spark.queries.multimodal import image_dedup_families

    clusters = image_dedup_families(spark, "/root/testdata/sf0.001").select(
        F.col("media_id").alias("doc_id"), F.col("component").alias("cluster")
    )
    truth = clusters.select(
        "doc_id", (F.col("doc_id") % 100).alias("cluster")
    )
    got = bcubed_eval(clusters, truth).collect()[0]
    assert got.n_items == 500
    assert (got.precision, got.recall, got.f1) == (1.0, 1.0, 1.0)

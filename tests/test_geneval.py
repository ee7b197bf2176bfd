"""Generation (QA-style) evaluation (operators/evals.py
generation_scores/generation_report): public-metric pins (the SQuAD
normalization + multiset-F1 rules on known values), DuckDB re-derivation
over a documents-synthesized prediction table, no-answer conventions,
and the corpus roll-up's decimal exactness."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.evals import (
    generation_report,
    generation_scores,
    normalize_answer,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
_SCHEMA = "example_id long, prediction string, references array<string>"


def _scores(spark, rows):
    return {
        r.example_id: (r.exact_match, r.f1)
        for r in generation_scores(
            spark.createDataFrame(rows, _SCHEMA)
        ).collect()
    }


def test_squad_metric_pins(spark):
    got = _scores(
        spark,
        [
            (1, "The Eiffel Tower", ["eiffel tower", "La Tour Eiffel"]),
            (2, "Paris, France!", ["paris"]),
            (3, "", []),  # correctly predicted no-answer
            (4, "something", []),  # wrong on a no-answer example
            (5, "the the cat cat", ["cat cat dog"]),  # multiset overlap
            (6, None, ["x"]),  # null prediction = empty
            (7, "a an the", ["the a an"]),  # articles-only == empty == empty
            (8, "It's mid-range", ["its midrange"]),  # punct stripped
        ],
    )
    assert got[1] == (1.0, 1.0)
    assert got[2] == (0.0, pytest.approx(2 / 3))
    assert got[3] == (1.0, 1.0)
    assert got[4] == (0.0, 0.0)
    # "cat cat" vs "cat cat dog": overlap 2 -> F1 = 4/5
    assert got[5] == (0.0, pytest.approx(0.8))
    assert got[6] == (0.0, 0.0)
    assert got[7] == (1.0, 1.0)
    assert got[8] == (1.0, 1.0)


def test_normalization_rule(spark):
    out = spark.range(1).select(
        normalize_answer(F.lit('  The  Quick, "Brown" Fox\'s an answer!  ')).alias("n")
    ).collect()[0].n
    assert out == "quick brown foxs answer"


def test_multi_reference_takes_best(spark):
    got = _scores(
        spark,
        [(1, "blue whale", ["red fish", "blue whale shark", "whale"])],
    )
    # EM: none matches exactly; F1 best = vs "blue whale shark": 2*2/(2+3)
    assert got[1] == (0.0, pytest.approx(0.8))


def test_matches_duckdb(spark):
    """Both engines re-derive normalization, multiset overlap, and the
    best-over-references reduction over predictions synthesized from the
    documents fixture (prediction = first 12 tokens of a doc, reference
    set = [same text with injected punctuation/case noise, a decoy]) —
    every EM must be 1.0 by construction and every F1 exactly 1.0, while
    the decoy-only rows score below."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    head = F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 12), " ")
    preds = docs.select(
        F.col("doc_id").alias("example_id"),
        head.alias("prediction"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.array(F.lit("zz unrelated decoy answer")),
        )
        .otherwise(
            F.array(
                F.concat(F.lit("THE "), F.upper(head), F.lit("!!")),
                F.lit("some other decoy"),
            )
        )
        .alias("references"),
    )
    got = generation_scores(preds).toPandas()
    duck = duckdb.connect()
    want = duck.execute(
        f"""
        WITH docs AS (
          SELECT doc_id,
                 array_to_string(string_split_regex(trim(text), '\\s+')[1:12], ' ')
                   AS head
          FROM '{SF_DIR}/documents.parquet'
        ),
        ex AS (
          SELECT doc_id AS example_id, head AS prediction,
                 CASE WHEN doc_id % 3 = 0
                      THEN ['zz unrelated decoy answer']
                      ELSE ['THE ' || upper(head) || '!!', 'some other decoy']
                 END AS refs
          FROM docs
        ),
        norm AS (
          SELECT example_id,
                 trim(regexp_replace(regexp_replace(regexp_replace(
                   lower(coalesce(prediction, '')),
                   '[!"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{{|}}~]', '', 'g'),
                   '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g')) AS p,
                 list_transform(refs, r ->
                   trim(regexp_replace(regexp_replace(regexp_replace(
                     lower(coalesce(r, '')),
                     '[!"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{{|}}~]', '', 'g'),
                     '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g'))) AS rs
          FROM ex
        ),
        toks AS (
          SELECT example_id,
                 CASE WHEN p = '' THEN [] ELSE string_split(p, ' ') END AS pt,
                 list_transform(rs, r ->
                   CASE WHEN r = '' THEN [] ELSE string_split(r, ' ') END) AS rts,
                 p, rs
          FROM norm
        )
        SELECT example_id,
               CAST(list_contains(rs, p) AS DOUBLE) AS exact_match,
               list_max(list_transform(rts, rt ->
                 CASE WHEN len(pt) = 0 AND len(rt) = 0 THEN 1.0
                      WHEN len(pt) = 0 OR len(rt) = 0 THEN 0.0
                      ELSE round(2.0 * list_sum(list_transform(
                             list_distinct(pt), t -> least(
                               len(list_filter(pt, x -> x = t)),
                               len(list_filter(rt, x -> x = t)))))
                           / (len(pt) + len(rt)), 9)
                 END)) AS f1
        FROM toks
        """
    ).df()
    duck.close()
    g = got.sort_values("example_id", ignore_index=True)
    w = want.sort_values("example_id", ignore_index=True)
    assert (g["example_id"] == w["example_id"]).all()
    assert (g["exact_match"] == w["exact_match"]).all()
    assert (g["f1"] == w["f1"]).all()
    # construction sanity: non-decoy rows are exact matches, decoys are not
    assert set(g[g["example_id"] % 3 != 0]["exact_match"]) == {1.0}
    assert set(g[g["example_id"] % 3 == 0]["exact_match"]) == {0.0}


def test_report_rollup_is_exact(spark):
    rows = [
        (i, "cat cat", ["cat cat dog"] if i % 2 else ["cat cat"])
        for i in range(101)
    ]
    rep = generation_report(spark.createDataFrame(rows, _SCHEMA)).collect()[0]
    n_em = len([i for i in range(101) if i % 2 == 0])
    f1_sum = n_em * 1.0 + (101 - n_em) * 0.8
    assert rep.n_examples == 101
    assert rep.exact_match == pytest.approx(n_em / 101, abs=1e-9)
    assert rep.f1 == pytest.approx(f1_sum / 101, abs=1e-9)


def test_plan_rides_the_scan(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("example_id"),
        F.col("text").alias("prediction"),
        F.array(F.col("text")).alias("references"),
    )
    plan = (
        generation_scores(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan

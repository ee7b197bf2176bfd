"""Preference-pair construction (operators/preferences.py): DuckDB
re-derivation of both pair rules over a documents-synthesized grading
table, strict-preference and tie semantics, deterministic hash-rank cap
properties, and composition with the SFT render."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.preferences import best_worst_pairs, graded_pairs
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

# grading fixture over documents: 50 prompts x ~10 responses, scores
# from modular arithmetic so ties exist within prompts (score domain 13)
_N_PROMPTS = 50


def _responses(spark):
    return load_table(spark, SF_DIR, "documents").select(
        (F.col("doc_id") % _N_PROMPTS).alias("prompt_id"),
        F.col("doc_id").alias("response_id"),
        ((F.col("doc_id") * 7) % 13).cast("double").alias("score"),
    )


_DUCK_RESP = f"""
    SELECT doc_id % {_N_PROMPTS} AS prompt_id,
           doc_id AS response_id,
           CAST((doc_id * 7) % 13 AS DOUBLE) AS score
    FROM '{SF_DIR}/documents.parquet'
"""


@pytest.fixture()
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_best_worst_matches_duckdb(spark, duck):
    got = {
        tuple(r) for r in best_worst_pairs(_responses(spark)).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
        WITH r AS ({_DUCK_RESP}),
        ranked AS (
          SELECT *,
            ROW_NUMBER() OVER (PARTITION BY prompt_id
                               ORDER BY score DESC, response_id) AS rb,
            ROW_NUMBER() OVER (PARTITION BY prompt_id
                               ORDER BY score ASC, response_id) AS rw
          FROM r
        )
        SELECT b.prompt_id, b.response_id AS chosen_id,
               b.score AS chosen_score,
               w.response_id AS rejected_id, w.score AS rejected_score,
               b.score - w.score AS score_gap
        FROM (SELECT * FROM ranked WHERE rb = 1) b
        JOIN (SELECT * FROM ranked WHERE rw = 1) w USING (prompt_id)
        WHERE b.score - w.score > 0
        """
        ).fetchall()
    }
    assert got == want and len(got) == _N_PROMPTS  # every prompt has spread
    for _, c, cs, rj, rs, gap in got:
        assert cs > rs and gap == cs - rs and c != rj


def test_graded_pairs_match_duckdb(spark, duck):
    got = {
        tuple(r)
        for r in graded_pairs(_responses(spark), min_gap=5.0).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
        WITH r AS ({_DUCK_RESP})
        SELECT a.prompt_id, a.response_id AS chosen_id,
               a.score AS chosen_score,
               b.response_id AS rejected_id, b.score AS rejected_score,
               a.score - b.score AS score_gap
        FROM r a JOIN r b USING (prompt_id)
        WHERE a.score - b.score > 0 AND a.score - b.score >= 5.0
        """
        ).fetchall()
    }
    assert got == want and len(got) > _N_PROMPTS


def test_strict_preference_and_tie_semantics(spark):
    rows = [
        (1, 10, 3.0), (1, 11, 3.0),           # all tied -> nothing
        (2, 20, 5.0),                          # single response -> nothing
        (3, 30, 1.0), (3, 31, 4.0), (3, 32, 4.0),  # tie at top -> min id
        (4, 40, None), (4, 41, 2.0), (4, 42, 1.0),  # null score ignored
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, response_id long, score double"
    )
    got = {r.prompt_id: r for r in best_worst_pairs(df).collect()}
    assert set(got) == {3, 4}
    assert (got[3].chosen_id, got[3].rejected_id) == (31, 30)
    assert (got[4].chosen_id, got[4].rejected_id) == (41, 42)
    dense = graded_pairs(df).collect()
    assert all(r.score_gap > 0 for r in dense)
    assert {(r.prompt_id, r.chosen_id, r.rejected_id) for r in dense} == {
        (3, 31, 30), (3, 32, 30), (4, 41, 42),
    }


def test_cap_is_deterministic_uniform_and_exact(spark):
    df = _responses(spark)
    capped1 = graded_pairs(df, max_pairs_per_prompt=3)
    capped2 = graded_pairs(df, max_pairs_per_prompt=3)
    s1 = {tuple(r) for r in capped1.collect()}
    assert s1 == {tuple(r) for r in capped2.collect()}  # reproducible
    per = (
        capped1.groupBy("prompt_id").count().select("count").collect()
    )
    assert all(r["count"] <= 3 for r in per)
    # the cap thins the full set: capped is a subset of uncapped
    full = {
        (r.prompt_id, r.chosen_id, r.rejected_id)
        for r in graded_pairs(df).collect()
    }
    assert {(p, c, rj) for p, c, _, rj, _, _ in s1} <= full
    # a different salt draws a different subset (same sizes)
    other = {
        tuple(r)
        for r in graded_pairs(
            df, max_pairs_per_prompt=3, salt="other"
        ).collect()
    }
    assert other != s1 and len(other) == len(s1)
    with pytest.raises(ValueError, match="max_pairs_per_prompt"):
        graded_pairs(df, max_pairs_per_prompt=0)


def test_composes_with_rendered_conversations(spark):
    """RM assembly end to end: render per-response conversations, then
    attach chosen/rejected texts by pair ids — every pair row carries
    two distinct rendered texts."""
    from l1dbproto_spark.operators.conversations import render_conversations

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 60)
    turns = docs.select(
        F.col("doc_id").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.col("text").alias("content"),
    )
    rendered = render_conversations(turns, max_tokens=64).select(
        F.col("conv_id"), F.col("text")
    )
    pairs = best_worst_pairs(
        docs.select(
            (F.col("doc_id") % 10).alias("prompt_id"),
            F.col("doc_id").alias("response_id"),
            ((F.col("doc_id") * 3) % 7).cast("double").alias("score"),
        )
    )
    out = (
        pairs.join(
            rendered.select(
                F.col("conv_id").alias("chosen_id"),
                F.col("text").alias("chosen_text"),
            ),
            "chosen_id",
        )
        .join(
            rendered.select(
                F.col("conv_id").alias("rejected_id"),
                F.col("text").alias("rejected_text"),
            ),
            "rejected_id",
        )
        .collect()
    )
    assert len(out) == 10
    for r in out:
        assert r.chosen_text and r.rejected_text
        assert r.chosen_text != r.rejected_text

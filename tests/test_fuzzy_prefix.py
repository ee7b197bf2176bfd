"""Lossless Ed-Join-style prefix blocking (operators/fuzzy.py
_rare_prefix): identical output to full token blocking on real and
adversarial fixtures, prefix-size bound, and the worst case where the
edits land on the rare tokens."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.fuzzy import (
    _rare_prefix,
    _tokens,
    fuzzy_join,
    fuzzy_self_join,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.a_name, r.b_name, r.dist) for r in df.collect()}


def test_prefix_blocking_lossless_on_part_names(spark):
    names = load_table(spark, SF_DIR, "part").select("p_name").limit(500)
    full = _pairs(fuzzy_self_join(names, "p_name", max_distance=3))
    pref = _pairs(fuzzy_self_join(names, "p_name", max_distance=3, prefix_blocking=True))
    assert pref == full
    assert len(full) > 0


def test_prefix_blocking_lossless_on_stop_token_corpus(spark):
    """Every name shares the hot token 'inc' — full blocking candidates are
    quadratic in n, the rare prefix drops 'inc' from every name that has
    2d+1 rarer tokens. Output must not change."""
    rows = [(f"entity number{i} group{i % 7} inc",) for i in range(120)] + [
        ("entity number7 group0 incx",),  # near-dup of i=7 (1 edit on 'inc')
        ("entity numbar3 group3 inc",),   # near-dup of i=3 (1 edit mid-token)
    ]
    names = spark.createDataFrame(rows, "name string")
    full = _pairs(fuzzy_self_join(names, "name", max_distance=2))
    pref = _pairs(fuzzy_self_join(names, "name", max_distance=2, prefix_blocking=True))
    assert pref == full
    assert len(full) > 0


def test_prefix_keeps_at_most_2d_plus_1_distinct_tokens(spark):
    names = load_table(spark, SF_DIR, "part").select(
        F.col("p_name").alias("a_name")
    ).distinct().limit(200)
    toks = names.select(
        "a_name",
        F.length("a_name").alias("a_len"),
        F.explode(_tokens(F.col("a_name"))).alias("tok"),
    )
    d = 2
    kept = _rare_prefix(toks, "a_name", d)
    per_name = kept.groupBy("a_name").agg(
        F.count_distinct("tok").alias("n"), F.count(F.lit(1)).alias("rows")
    )
    bad = per_name.filter(
        (F.col("n") > 2 * d + 1) | (F.col("n") != F.col("rows"))
    ).count()
    assert bad == 0


def test_prefix_worst_case_edits_on_rare_tokens(spark):
    """d=1, 5-token names differing in their RAREST token: the shared
    mid-frequency tokens must still block the pair (the lemma's pigeonhole
    at work)."""
    rows = [("aa bb cc dd ee",), ("aa bb cc dd ef",)] + [
        (f"aa bb cc dd x{i}",) for i in range(10)  # make aa..dd frequent
    ]
    names = spark.createDataFrame(rows, "name string")
    pref = _pairs(fuzzy_self_join(names, "name", max_distance=1, prefix_blocking=True))
    assert ("aa bb cc dd ee", "aa bb cc dd ef", 1) in pref
    full = _pairs(fuzzy_self_join(names, "name", max_distance=1))
    assert pref == full


def test_two_sided_prefix_blocking_lossless(spark):
    left = load_table(spark, SF_DIR, "part").select("p_name").limit(250)
    right = (
        load_table(spark, SF_DIR, "part")
        .select(F.concat(F.col("p_name"), F.lit("x")).alias("alt_name"))
        .limit(250)
    )
    full = {
        (r.l_value, r.r_value, r.dist)
        for r in fuzzy_join(left, right, "p_name", "alt_name", max_distance=2).collect()
    }
    pref = {
        (r.l_value, r.r_value, r.dist)
        for r in fuzzy_join(
            left, right, "p_name", "alt_name", max_distance=2, prefix_blocking=True
        ).collect()
    }
    assert pref == full
    assert len(full) > 0

"""Exact phrase search over a positional token stream.

"Which documents contain this benchmark sentence VERBATIM?" is the
query-time analog of exact-substring dedup (`operators/exact_substr.py`,
Lee et al. 2021) and the standard decontamination probe — n-gram overlap
(`operators/contamination.py`) finds near-misses, phrase search finds exact
hits with their occurrence counts.

The classic engine answer is a positional inverted index; the Spark-first
formulation collapses the k-way position join into ONE anchor aggregation:

1. tokenize with positions: ``posexplode`` of the token array — (doc, pos,
   term); project the array as a named column first (codegen method-limit
   rule), and restrict to the phrase vocabulary with a broadcast semi-join
   BEFORE anything shuffles;
2. each phrase is a broadcast (term, offset) table; joining tokens to it
   and computing ``anchor = pos - offset`` turns "the phrase starts at
   anchor a" into "position a+i holds term_i for every i";
3. one uniform shuffle groups by (phrase, doc, anchor): the anchor is a
   real occurrence iff it collected ALL ``len(phrase)`` DISTINCT offsets
   (countDistinct, not count — a phrase with a repeated term matches the
   same token row at several offsets);
4. a second bounded aggregation counts occurrences per (phrase, doc) —
   overlapping occurrences count separately ("a a a" contains "a a"
   twice), which string-search-based counting gets wrong.

Every shuffle keys on uniform (phrase, doc, anchor) tuples; the token
stream that reaches them is only the phrase-vocabulary postings. The
DuckDB oracle (queries/search.py) mirrors the same anchor algebra with a
lateral ``range()`` positional explode — bit-exact integer counts.
"""

from __future__ import annotations

import re as _re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bm25 import TOKEN_PATTERN, tokens


def phrase_rows(phrases: Sequence[tuple[int, str]]) -> list[tuple[int, str, int, int]]:
    """(phrase_id, term, offset, phrase_len) rows, tokenized driver-side
    with the engine token rule. Zero-token phrases are dropped."""
    out: list[tuple[int, str, int, int]] = []
    for pid, text in phrases:
        terms = _re.findall(TOKEN_PATTERN, text.lower())
        out.extend((pid, t, i, len(terms)) for i, t in enumerate(terms))
    return out


def phrase_match(
    docs: DataFrame,
    phrases: Sequence[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(phrase_id, doc_id, n_occurrences) for every doc containing each
    phrase at least once; occurrences may overlap and each counts."""
    spark = docs.sparkSession
    rows = phrase_rows(phrases)
    if not rows:
        return spark.createDataFrame([], "phrase_id INT, doc_id LONG, n_occurrences LONG")
    pterms = spark.createDataFrame(
        rows, "phrase_id INT, term STRING, offset INT, phrase_len INT"
    )
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    positions = (
        toks.select("doc_id", F.posexplode("toks").alias("pos", "term"))
        # only phrase-vocabulary tokens reach the join/shuffle
        .join(F.broadcast(pterms.select("term").distinct()), "term", "left_semi")
    )
    anchored = positions.join(F.broadcast(pterms), "term").select(
        "phrase_id",
        "doc_id",
        (F.col("pos") - F.col("offset")).alias("anchor"),
        "offset",
        "phrase_len",
    )
    occurrences = (
        anchored.filter(F.col("anchor") >= 0)
        .groupBy("phrase_id", "doc_id", "anchor", "phrase_len")
        # DISTINCT offsets: a repeated phrase term matches one token row at
        # several offsets — counting rows would over-credit the anchor
        .agg(F.countDistinct("offset").alias("n_hit"))
        .filter(F.col("n_hit") == F.col("phrase_len"))
    )
    return occurrences.groupBy("phrase_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )

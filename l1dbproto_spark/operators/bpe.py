"""Byte-pair-encoding tokenization (Sennrich et al. 2016) — merge
learning, vocabulary application, and per-document token counting, so
the packing / length-gate layers (operators/packing.py, clean_corpus's
``count_col``) can run on REAL subword counts instead of the whitespace
heuristic.

The scale decomposition mirrors how production tokenizer training
actually works, and it is what makes BPE tractable on a 100 TB corpus:

* the corpus-scale part — word-frequency extraction — is ONE
  distributed scan + one uniform-key aggregation (word TYPES follow
  Heaps' law: a trillion-token corpus has ~10^7-10^8 types, not 10^12);
* merge LEARNING iterates over the (capped) word-frequency table, which
  is vocabulary-sized — it crosses the driver once and runs in plain
  Python, exactly like the KMeans centroid tables in
  operators/semdedup.py (n_merges x vocab work, zero Spark jobs);
* merge APPLICATION is distributed again, but only over DISTINCT word
  types via one Arrow ``mapInPandas`` — Python never touches a word
  occurrence, only the type table; occurrence-level counting is a join
  + sum in pure column algebra.

Pinned algorithm conventions (the paper gives pseudocode; every choice
below is explicit and pinned by an independent Python reference in
tests/test_bpe.py):

* words = whitespace-split (``\\s+``), empties dropped, case preserved;
* base symbols = the word's characters (no end-of-word marker);
* each learning step merges the adjacent symbol pair with the highest
  frequency-weighted count, ties to the lexicographically smallest
  (a, b); learning stops early when the best pair's count falls below
  ``min_pair_count``;
* replacement (learning and application) is left-to-right,
  non-overlapping; application replays merges in learned order, one
  full pass per merge.

This is the hot-path exception the engine's no-Python-UDF rule allows
(SURVEY §2.9): an Arrow-batched ``mapInPandas`` over the bounded type
table — the same dispensation as operators/multimodal.py's byte paths.
No reference analog (the reference engine has no text layer).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus: one scan, one explode, one
    uniform-key aggregation — the only corpus-scale step of training."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair(symbols: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping replacement of (a, b) -> a+b."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def learn_bpe(
    word_freqs: DataFrame,
    n_merges: int = 200,
    max_word_types: int = 65_536,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a word-frequency frame
    (:func:`word_frequencies` output). The frame is capped at the
    ``max_word_types`` most frequent types (ties to the lexicographically
    smaller word) and collected — the deliberate driver-side step: the
    table is vocabulary-sized and the merge loop is inherently
    sequential (each merge changes the pair counts the next one sees);
    running it as n_merges Spark jobs over a tiny table would be pure
    scheduler overhead. Returns merges in learned order."""
    rows = (
        word_freqs.orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_word_types)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]): int(r["freq"]) for r in rows if r["word"]
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], _neg_lex(kv[0])))
        (a, b), count = best
        if count < min_pair_count:
            break
        merges.append((a, b))
        vocab = {
            tuple(_merge_pair(list(syms), a, b)): freq
            for syms, freq in vocab.items()
        }
    return merges


class _neg_lex:
    """Ordering adapter: max() keyed on (count, _neg_lex(pair)) picks the
    LEXICOGRAPHICALLY SMALLEST pair among equal counts."""

    __slots__ = ("pair",)

    def __init__(self, pair: tuple[str, str]):
        self.pair = pair

    def __lt__(self, other: "_neg_lex") -> bool:
        return self.pair > other.pair  # reversed


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges in learned order to one word (driver-side helper and
    the reference the distributed path must match)."""
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = _merge_pair(syms, a, b)
    return syms


def apply_bpe_to_words(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Distributed merge application over a DISTINCT word-type frame
    (one ``word`` column): (word, tokens array<string>, n_tokens). One
    Arrow ``mapInPandas`` — Python cost scales with word TYPES, never
    occurrences; the merge list rides the closure (it is n_merges pairs,
    bytes)."""
    out_schema = T.StructType(
        [
            T.StructField("word", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.StringType()), False),
            T.StructField("n_tokens", T.IntegerType(), False),
        ]
    )

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = [encode_word(w, merges) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return words.select("word").distinct().mapInPandas(apply, out_schema)


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document BPE token count: (id, n_bpe_tokens) — the column
    ``pack_sequences(count_col=...)`` and clean_corpus's length gate
    consume. Plan: explode words -> per-(doc, word) occurrence counts ->
    join the type table's n_tokens -> one per-doc sum. The type table is
    built from THIS corpus's distinct words (or pass a precomputed
    ``vocab`` from :func:`apply_bpe_to_words` to skip the mapInPandas
    pass — the build-once/count-many path). Empty documents count 0."""
    wsplit = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    wc = (
        docs.select(F.col(id_col), F.explode(wsplit).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    if vocab is None:
        vocab = apply_bpe_to_words(wc.select("word"), merges)
    counts = (
        wc.join(vocab.select("word", "n_tokens"), "word")
        .groupBy(id_col)
        .agg(F.sum(F.col("occ") * F.col("n_tokens")).alias("n_bpe_tokens"))
    )
    return (
        docs.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias(
                "n_bpe_tokens"
            ),
        )
    )


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Full token stream per document: (id, tokens array<string>) in
    word order. Same type-table join as :func:`bpe_token_counts`, plus a
    per-doc ordered re-assembly (array_sort on (position, tokens)
    structs, then flatten) — the token explosion happens in column
    algebra, not Python."""
    wsplit = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    pos = docs.select(
        F.col(id_col), F.posexplode(wsplit).alias("pos", "word")
    )
    if vocab is None:
        vocab = apply_bpe_to_words(pos.select("word"), merges)
    assembled = (
        pos.join(vocab.select("word", "tokens"), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tokens"))),
                    lambda s: s["tokens"],
                )
            ).alias("tokens")
        )
    )
    return (
        docs.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "tokens", F.array().cast("array<string>")
            ).alias("tokens"),
        )
    )


def save_bpe(merges: list[tuple[str, str]], spark, path: str) -> None:
    """Persist learned merges in RANK ORDER (order is the model — the
    same merge set applied in a different order tokenizes differently):
    (rank, left, right) parquet, the engine's standard artifact form."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    ).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r.left, r.right) for r in rows]

"""Document quality scoring — the filter stage of corpus preparation.

Two signal families:

* unigram log-probability — the classic cheap LM-quality signal: score
  each document by the mean log-probability of its tokens under the
  corpus's OWN smoothed unigram distribution. Garbled/rare-token documents
  score far below fluent text, with no model to train or ship.
* Gopher-style rule signals (Rae et al. 2021, "Scaling Language Models",
  appendix A1.1) — the published heuristic battery (word count, mean word
  length, symbol-to-word ratio, alphabetic-word fraction, bullet/ellipsis
  line fractions, required-stopword hits) plus the combined pass flag.
* Gopher repetition signals (A1.1's other half) — duplicate-line
  fractions and the most-frequent-n-gram character share, the rules that
  catch boilerplate and template spam rule batteries miss.

Both are pure column algebra over one text scan — no UDFs, no shuffle for
the rule battery (the unigram score needs the corpus distribution: two
uniform-key aggregations and one AQE-decided join). Used standalone
(queries/text.py) and as clean_corpus's optional quality gates
(operators/corpus.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text, shingle_rows


def _words(col: Column) -> Column:
    return F.split(F.trim(col), " +")


def unigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram log-probability:
    ``score(d) = mean over tokens t of ln((count(t) + s) / (N + s*V))``
    with add-s smoothing over the corpus vocabulary (V types, N tokens).
    Output: (``id_col``, mean_logprob, n_tokens).

    Plan shape at 100 TB: the corpus is scanned ONCE — the per-doc tf
    aggregation is the only operator that touches raw text, and both the
    vocabulary counts (``sum(tf)`` per term) and the (N, V) totals derive
    from the tf table, whose shuffle every branch shares — the DAG
    scheduler skips the duplicate map stages at runtime (r4 fix; the
    earlier form aggregated the corpus separately per branch with
    differing projections, which defeated reuse: 3 real scans). The totals are a 1-row
    aggregate joined back by broadcast; the vocab join is AQE-decided
    (a web-scale vocabulary is not bounded). No driver collect anywhere.
    ln() inputs are integer-derived doubles in identical operand order and
    the mean is one division, so a DuckDB oracle matches after a 9-decimal
    round."""
    words = docs.select(
        F.col(id_col), F.explode(_words(F.lower(F.col(text_col)))).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").cast("double").alias("_n_tok"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    logp = F.log(
        (F.col("cnt") + F.lit(smoothing))
        / (F.col("_n_tok") + F.lit(smoothing) * F.col("_v"))
    )
    lp = vocab.crossJoin(F.broadcast(totals)).select("term", logp.alias("lp"))
    return (
        tf.join(lp, "term")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("tf") * F.col("lp")) / F.sum("tf"), 9
            ).alias("mean_logprob"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
    )


# The 8 words Gopher requires at least 2 of — presence, not frequency.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_signals(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher rule battery: appends the per-document signal columns and a
    combined ``passes_gopher`` flag. Thresholds default to the published
    values (Rae et al. 2021 A1.1); real pipelines tune them per source.

    Single projection over one text scan — every signal is a
    codegen-compiled string/array expression, so at 100 TB this costs
    exactly the scan. Ratios are int/int divisions in double and the flag
    is pure comparisons, so a DuckDB oracle reproduces every column
    bit-for-bit (tests/test_pii_quality.py)."""
    words = _words(F.col(text_col))
    words_lower = _words(F.lower(F.col(text_col)))
    n_words = F.size(words)
    # sum of word lengths == chars left after deleting the split separators
    word_chars = F.length(F.regexp_replace(F.trim(F.col(text_col)), " +", ""))
    mean_wl = word_chars.cast("double") / n_words
    n_symbols = F.regexp_count(F.col(text_col), F.lit(r"#|\.\.\.|…")).cast("long")
    sym_ratio = n_symbols.cast("double") / n_words
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = n_alpha.cast("double") / n_words
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    bullet_frac = n_bullet.cast("double") / n_lines
    n_ellipsis = F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
    ellipsis_frac = n_ellipsis.cast("double") / n_lines
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    stop_hits = F.size(F.filter(req, lambda s: F.array_contains(words_lower, s)))
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (sym_ratio <= max_symbol_ratio)
        & (alpha_frac >= min_alpha_frac)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (stop_hits >= min_stop_hits)
    )
    return (
        docs.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", mean_wl)
        .withColumn("symbol_ratio", sym_ratio)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("bullet_line_frac", bullet_frac)
        .withColumn("ellipsis_line_frac", ellipsis_frac)
        .withColumn("stopword_hits", stop_hits.cast("long"))
        .withColumn("passes_gopher", passes)
    )


def repetition_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 2,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_top_ngram_char_frac: float = 0.2,
) -> DataFrame:
    """Gopher repetition battery (Rae et al. 2021 A1.1, repetition rules):

    * ``dup_line_frac`` — fraction of lines that occur more than once;
    * ``dup_line_char_frac`` — fraction of line characters inside such
      duplicated lines;
    * ``top_ngram`` / ``top_ngram_count`` / ``top_ngram_char_frac`` — the
      document's most frequent word n-gram (count ties broken to the
      lexicographically largest gram) and the share of the document's
      word characters its occurrences cover
      (``count * len(gram sans spaces) / total word chars``, over the
      normalized text — the same canonical form the dedup family shingles);
    * ``passes_repetition`` — all three under their thresholds. The
      top-n-gram rule only binds when the gram actually REPEATS
      (``top_ngram_count > 1``): a once-occurring gram covering a large
      character share is a short-document artifact, not repetition —
      Gopher's pipeline orders the <50-word gate before these rules for
      the same reason.

    Plan shape: the line signals are per-row array algebra over the text
    scan — the nested count runs per line pair WITHIN a document (lines
    per doc is small), no shuffle. The n-gram mode needs within-doc
    frequencies, so it reuses dedup's codegen-friendly shingle explode and
    aggregates (doc, gram) counts — both aggregations partial-combine
    map-side and key on (doc_id, gram) / doc_id, so the shuffle is uniform
    and bounded by the distinct-gram count, never the 100 TB scan. The two
    halves meet in one per-doc join (AQE-decided)."""
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    line_chars = F.aggregate(
        F.transform(lines, lambda l: F.length(l)), F.lit(0), lambda a, x: a + x
    )
    dup_lines = F.filter(
        lines, lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1
    )
    dup_line_chars = F.aggregate(
        F.transform(dup_lines, lambda l: F.length(l)), F.lit(0), lambda a, x: a + x
    )
    dup_line_frac = F.size(dup_lines).cast("double") / n_lines
    dup_line_char_frac = F.when(line_chars > 0, dup_line_chars.cast("double") / line_chars).otherwise(F.lit(0.0))
    with_lines = (
        docs.withColumn("n_lines", n_lines.cast("long"))
        .withColumn("dup_line_frac", dup_line_frac)
        .withColumn("dup_line_char_frac", dup_line_char_frac)
        .withColumn(
            "_word_chars",
            F.length(F.regexp_replace(normalize_text(F.col(text_col)), " ", "")),
        )
    )
    # shingle_rows canonicalizes the id column to "doc_id" — rename it back
    # so callers with a custom id_col aggregate and join on their own key
    grams = shingle_rows(docs, ngram_n, text_col, id_col).withColumnRenamed(
        "doc_id", id_col
    )
    top = (
        grams.groupBy(id_col, "shingle")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col)
        .agg(
            F.max_by(F.col("shingle"), F.struct("_cnt", "shingle")).alias("top_ngram"),
            F.max(F.struct("_cnt", "shingle")).getField("_cnt").alias(
                "top_ngram_count"
            ),
        )
    )
    out = with_lines.join(top, id_col, "left")
    top_chars = (
        F.col("top_ngram_count")
        * F.length(F.regexp_replace(F.col("top_ngram"), " ", ""))
    ).cast("double")
    top_frac = F.coalesce(
        F.when(F.col("_word_chars") > 0, top_chars / F.col("_word_chars")),
        F.lit(0.0),
    )
    passes = (
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (
            (F.coalesce(F.col("top_ngram_count"), F.lit(0)) <= 1)
            | (top_frac <= max_top_ngram_char_frac)
        )
    )
    return (
        out.withColumn("top_ngram_char_frac", top_frac)
        .withColumn("passes_repetition", passes)
        .drop("_word_chars")
    )

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

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..checkpoint import pin

from .dedup import normalize_text, shingle_rows


def _words(col: Column) -> Column:
    return F.split(F.trim(col), "[ \t\r\n\f]+")


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


def _position_tf(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document (prev, w) position counts: (id, prev, w, cnt) with
    ``prev`` null exactly at position 1. The token array is materialized
    as a BOUND COLUMN before indexing: an expression referenced inside a
    transform() lambda re-evaluates per element (n element_at calls
    would re-split the text n times — measured 5x slower), while a
    column reference is read once per row."""
    toks = F.col("_toks")
    n = F.size(toks)
    pos_structs = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w"),
            F.when(i > 1, F.element_at(toks, i - 1)).alias("prev"),
        ),
    )
    # guard: sequence(1, 0) would generate a DESCENDING [1, 0]; empty
    # token arrays must contribute no rows instead
    rows = (
        docs.select(
            F.col(id_col),
            _words(F.lower(F.col(text_col))).alias("_toks"),
        )
        .select(
            F.col(id_col),
            F.explode(F.when(n >= 1, pos_structs)).alias("_p"),
        )
        .select(
            id_col, F.col("_p.w").alias("w"), F.col("_p.prev").alias("prev")
        )
    )
    return rows.groupBy(id_col, "prev", "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def bigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document mean log-probability under an INTERPOLATED BIGRAM
    model of the corpus itself — the step up from
    :func:`unigram_logprob_scores` toward CCNet's real LM perplexity
    (Wenzek et al. 2020 score with a trained KenLM; scoring the corpus
    under its own bigram statistics is the shippable no-model analogue,
    and the output is a drop-in for ``perplexity_buckets``).

    Model, pinned: position 1 scores ``ln p_u(w_1)``; positions i >= 2
    score ``ln(lam * p_b(w_i | w_{i-1}) + (1-lam) * p_u(w_i))`` with

    * ``p_u(w) = (c(w) + s) / (N + s*V)`` — add-s unigram (same as the
      unigram scorer);
    * ``p_b(w | v) = c(v w) / c(v ·)`` — bigram MLE over observed pairs
      (every scored pair is observed because the corpus scores itself;
      the unigram interpolation term is what a held-out scorer would
      lean on for unseen pairs).

    Output: (``id_col``, mean_logprob, n_tokens) — mean over ALL n
    positions, rounded to 9 decimals for engine portability.

    Plan shape: ONE corpus scan builds (id, prev, w) position rows via a
    map-side index transform (``element_at`` on the token array — no
    self-join for adjacency). Every model table (unigram counts, totals,
    bigram counts, predecessor totals) derives from a single
    BIGRAM-TYPE-sized (prev, w) pair-count table that is locally
    checkpointed: the four branches prune different columns, which
    defeats exchange reuse (the temperature_rates lesson — verified
    here: without the cut the corpus featurization executed per branch),
    and the pair-count table is vocabulary², not corpus-sized, so the
    materialization is cheap. Net corpus work: the featurize+aggregate
    subtree executes exactly twice (once into the pair counts, once for
    the per-doc scoring join) — the same two-scan shape as the DSIR
    weight pass. Probability tables join back by AQE decision (a
    web-scale vocabulary is not bounded); totals are a 1-row
    broadcast."""
    tf = _position_tf(docs, text_col, id_col)
    pc = (
        tf.groupBy("prev", "w")
        .agg(F.sum("cnt").alias("pcnt"))
        .transform(pin, eager=False)
    )
    uni = pc.groupBy("w").agg(F.sum("pcnt").alias("c_w"))
    totals = uni.agg(
        F.sum("c_w").cast("double").alias("_n_tok"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    p_u = uni.crossJoin(F.broadcast(totals)).select(
        "w",
        (
            (F.col("c_w") + F.lit(smoothing))
            / (F.col("_n_tok") + F.lit(smoothing) * F.col("_v"))
        ).alias("_pu"),
    )
    bi = pc.filter(F.col("prev").isNotNull()).withColumnRenamed(
        "pcnt", "c_vw"
    )
    prev_tot = bi.groupBy("prev").agg(F.sum("c_vw").alias("c_v"))
    p_b = bi.join(prev_tot, "prev").select(
        "prev", "w", (F.col("c_vw") / F.col("c_v")).alias("_pb")
    )
    scored = (
        tf.join(p_u, "w")
        .join(p_b, ["prev", "w"], "left")
        .withColumn(
            "_lp",
            F.log(
                F.when(F.col("prev").isNull(), F.col("_pu")).otherwise(
                    F.lit(lam) * F.coalesce(F.col("_pb"), F.lit(0.0))
                    + F.lit(1.0 - lam) * F.col("_pu")
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(
            F.sum(F.col("cnt") * F.col("_lp")) / F.sum("cnt"), 9
        ).alias("mean_logprob"),
        F.sum("cnt").cast("long").alias("n_tokens"),
    )


@dataclass
class BigramLM:
    """A fitted interpolated-bigram language model — the artifact CCNet
    actually ships (Wenzek et al. 2020 score crawl text under a
    WIKIPEDIA-trained KenLM, not under the crawl's own statistics).

    ``p_u``: (w, _pu) smoothed unigram probabilities over the TRAINING
    vocabulary; ``p_b``: (prev, w, _pb) bigram MLE over training pairs;
    ``oov_pu``: the smoothing floor ``s / (N + s*V)`` an unseen word
    scores (the add-s mass a zero-count word would get); ``lam``/
    ``smoothing``: the interpolation/smoothing constants, carried so
    scoring reproduces training-time math."""

    p_u: DataFrame
    p_b: DataFrame
    oov_pu: float
    lam: float
    smoothing: float


def fit_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    smoothing: float = 0.5,
) -> BigramLM:
    """Fit the interpolated-bigram model on a REFERENCE corpus (the
    CCNet pattern: fit on the high-quality domain, score the crawl).
    Same model math as :func:`bigram_logprob_scores`; the probability
    tables are vocabulary-sized (checkpointed pair counts behind them),
    and the OOV floor is the one scalar that crosses the driver."""
    tf = _position_tf(docs, text_col, id_col)
    pc = (
        tf.groupBy("prev", "w")
        .agg(F.sum("cnt").alias("pcnt"))
        .transform(pin, eager=False)
    )
    uni = pc.groupBy("w").agg(F.sum("pcnt").alias("c_w"))
    totals = uni.agg(
        F.sum("c_w").cast("double").alias("_n_tok"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    ).first()
    n_tok, v = float(totals["_n_tok"] or 0.0), float(totals["_v"] or 0.0)
    denom = n_tok + smoothing * v
    p_u = uni.select(
        "w",
        ((F.col("c_w") + F.lit(smoothing)) / F.lit(denom)).alias("_pu"),
    )
    bi = pc.filter(F.col("prev").isNotNull()).withColumnRenamed(
        "pcnt", "c_vw"
    )
    prev_tot = bi.groupBy("prev").agg(F.sum("c_vw").alias("c_v"))
    p_b = bi.join(prev_tot, "prev").select(
        "prev", "w", (F.col("c_vw") / F.col("c_v")).alias("_pb")
    )
    return BigramLM(
        p_u=p_u,
        p_b=p_b,
        oov_pu=smoothing / denom if denom > 0 else 1.0,
        lam=lam,
        smoothing=smoothing,
    )


def score_with_bigram_lm(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ANY corpus under a fitted :class:`BigramLM`:
    (id, mean_logprob, n_tokens), same contract as
    :func:`bigram_logprob_scores`. Out-of-vocabulary words take the
    model's smoothing floor ``oov_pu``; unseen bigrams fall back to the
    interpolated unigram term, exactly as held-out scoring should.
    Fitting and scoring the SAME corpus reproduces
    ``bigram_logprob_scores`` bit-for-bit (pinned in
    tests/test_text_extras.py). Plan: one corpus scan into the position
    counts, two left joins against the vocabulary-sized model tables
    (AQE-decided), one per-doc aggregation."""
    tf = _position_tf(docs, text_col, id_col)
    scored = (
        tf.join(lm.p_u, "w", "left")
        .join(lm.p_b, ["prev", "w"], "left")
        .withColumn("_pu_eff", F.coalesce("_pu", F.lit(lm.oov_pu)))
        .withColumn(
            "_lp",
            F.log(
                F.when(F.col("prev").isNull(), F.col("_pu_eff")).otherwise(
                    F.lit(lm.lam) * F.coalesce(F.col("_pb"), F.lit(0.0))
                    + F.lit(1.0 - lm.lam) * F.col("_pu_eff")
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(
            F.sum(F.col("cnt") * F.col("_lp")) / F.sum("cnt"), 9
        ).alias("mean_logprob"),
        F.sum("cnt").cast("long").alias("n_tokens"),
    )


def save_bigram_lm(lm: BigramLM, path: str) -> None:
    """Persist the model: p_u / p_b as parquet tables plus a one-row
    meta table (oov_pu, lam, smoothing) — the build-once/score-many
    artifact, same pattern as the persistent PQ index."""
    spark = lm.p_u.sparkSession
    lm.p_u.write.mode("overwrite").parquet(path.rstrip("/") + "/p_u")
    lm.p_b.write.mode("overwrite").parquet(path.rstrip("/") + "/p_b")
    spark.createDataFrame(
        [(lm.oov_pu, lm.lam, lm.smoothing)],
        "oov_pu double, lam double, smoothing double",
    ).write.mode("overwrite").parquet(path.rstrip("/") + "/meta")


def load_bigram_lm(spark, path: str) -> BigramLM:
    meta = spark.read.parquet(path.rstrip("/") + "/meta").first()
    return BigramLM(
        p_u=spark.read.parquet(path.rstrip("/") + "/p_u"),
        p_b=spark.read.parquet(path.rstrip("/") + "/p_b"),
        oov_pu=float(meta["oov_pu"]),
        lam=float(meta["lam"]),
        smoothing=float(meta["smoothing"]),
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
    word_chars = F.length(
        F.regexp_replace(F.trim(F.col(text_col)), "[ \t\r\n\f]+", "")
    )
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


def _dup_unit_signals(col: Column, unit: str) -> list[Column]:
    """Duplicate-line / duplicate-paragraph fractions over an array of text
    units. COUNTING CONVENTION (explicit, oracle-pinned): every occurrence
    of a duplicated unit counts, INCLUDING the first — the stricter of the
    two published readings of Rae et al. A1.1's "fraction of lines that
    are duplicates"; implementations differ, so the engine pins one."""
    n_units = F.size(col)
    unit_chars = F.aggregate(
        F.transform(col, lambda l: F.length(l)), F.lit(0), lambda a, x: a + x
    )
    dups = F.filter(col, lambda l: F.size(F.filter(col, lambda x: x == l)) > 1)
    dup_chars = F.aggregate(
        F.transform(dups, lambda l: F.length(l)), F.lit(0), lambda a, x: a + x
    )
    return [
        n_units.cast("long").alias(f"n_{unit}s"),
        (F.size(dups).cast("double") / n_units).alias(f"dup_{unit}_frac"),
        F.when(unit_chars > 0, dup_chars.cast("double") / unit_chars)
        .otherwise(F.lit(0.0))
        .alias(f"dup_{unit}_char_frac"),
    ]


# Gopher A1.1 published thresholds (Rae et al. 2021, Table A1):
# top-n-gram character share for n=2,3,4; duplicate-n-gram character
# coverage for n=5..10.
TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def repetition_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_dup_par_frac: float = 0.3,
    max_dup_par_char_frac: float = 0.2,
    top_ngram_thresholds: dict[int, float] = TOP_NGRAM_THRESHOLDS,
    dup_ngram_thresholds: dict[int, float] = DUP_NGRAM_THRESHOLDS,
) -> DataFrame:
    """The FULL Gopher repetition battery (Rae et al. 2021 appendix A1.1,
    repetition rules) at the published defaults:

    * ``dup_line_frac`` / ``dup_line_char_frac`` and ``dup_par_frac`` /
      ``dup_par_char_frac`` — fraction of lines (resp. blank-line-separated
      paragraphs) occurring more than once, and the fraction of their
      characters. Counting convention (explicit, oracle-pinned): every
      occurrence of a duplicated unit counts, including the first.
    * ``top_ngram_{n}`` / ``top_ngram_count_{n}`` /
      ``top_ngram_char_frac_{n}`` for n = 2, 3, 4 — the most frequent word
      n-gram (ties to the lexicographically largest gram) and the share of
      the document's word characters its occurrences cover (``count *
      len(gram sans spaces) / total word chars`` over the normalized text,
      the same canonical form the dedup family shingles). The rule binds
      only when the gram REPEATS (count > 1): a once-occurring gram
      covering a large share is a short-document artifact, not repetition.
    * ``dup_ngram_char_frac_{n}`` for n = 5..10 — the fraction of word
      characters covered by ANY occurrence of an n-gram appearing more
      than once, each word position counted once however many duplicated
      grams overlap it (the span-marking definition the published
      reimplementations use).
    * ``passes_repetition`` — every rule under its threshold
      (thresholds: 0.20/0.18/0.16 for top 2/3/4-grams, 0.15 down to 0.10
      for dup 5..10-grams — Table A1's published defaults).

    Plan shape: line/paragraph signals are per-row array algebra over the
    text scan (the nested count runs within a document — units per doc is
    small). All nine n-gram sizes ride ONE tagged explode of the
    materialized word array (the same projection-boundary trick as
    shingle_rows), one (doc, n, gram) count aggregation, one (doc, n)
    roll-up, and one per-doc pivot-join — uniform keys throughout, shuffle
    bounded by the distinct-gram count, never the corpus scan. The ~9x
    gram-row expansion is the battery's intrinsic cost; it runs as an
    optional gate, not in every pipeline."""
    all_ns = sorted(set(top_ngram_thresholds) | set(dup_ngram_thresholds))
    top_ns = sorted(top_ngram_thresholds)
    dup_ns = sorted(dup_ngram_thresholds)

    lines = F.split(F.col(text_col), "\n")
    paragraphs = F.split(F.col(text_col), r"\n{2,}")
    word_chars = F.length(
        F.regexp_replace(normalize_text(F.col(text_col)), " ", "")
    )
    with_units = docs.select(
        "*",
        *_dup_unit_signals(lines, "line"),
        *_dup_unit_signals(paragraphs, "par"),
        word_chars.alias("_word_chars"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
    )

    # one tagged gram explode for every n: rows (id, n, pos, gram); the
    # word array is materialized below the Generate (shingle_rows' boundary
    # trick) so normalize+split runs once per doc, not once per gram row
    base = with_units.select(F.col(id_col), F.col("_w"))
    def _tag(n: int) -> Column:
        # closure helper, NOT a two-arg lambda: F.transform treats a binary
        # lambda as (element, index) and would silently shadow n
        return F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("_w") - F.lit(n - 1), F.lit(1))
            ),
            lambda p: F.struct(F.lit(n).alias("n"), p.alias("pos")),
        )

    tagged_starts = F.flatten(F.array(*[_tag(n) for n in all_ns]))
    exploded = base.select(
        id_col, "_w", F.explode(tagged_starts).alias("s")
    ).select(
        id_col,
        F.col("s.n").alias("n"),
        F.col("s.pos").alias("pos"),
        F.concat_ws(
            " ",
            *[
                F.when(
                    F.lit(i) < F.col("s.n"),
                    F.try_element_at("_w", F.col("s.pos") + F.lit(i)),
                )
                for i in range(max(all_ns))
            ],
        ).alias("gram"),
    )
    counts = exploded.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("_cnt"), F.collect_list("pos").alias("_pos")
    )
    # per (doc, n): the top gram (count ties -> lexicographically largest)
    # and the distinct word positions covered by duplicated grams' spans
    per_n = counts.groupBy(id_col, "n").agg(
        F.max_by(F.col("gram"), F.struct("_cnt", "gram")).alias("_top"),
        F.max(F.struct("_cnt", "gram")).getField("_cnt").alias("_top_cnt"),
        F.array_distinct(
            F.flatten(
                F.flatten(
                    F.collect_list(
                        F.when(
                            F.col("_cnt") > 1,
                            F.transform(
                                F.col("_pos"),
                                lambda p: F.sequence(p, p + F.col("n") - 1),
                            ),
                        ).otherwise(F.array().cast("array<array<int>>"))
                    )
                )
            )
        ).alias("_dup_idx"),
    )
    pivoted = per_n.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("_top"))).alias(f"top_ngram_{n}")
            for n in top_ns
        ],
        *[
            F.max(F.when(F.col("n") == n, F.col("_top_cnt"))).alias(
                f"top_ngram_count_{n}"
            )
            for n in top_ns
        ],
        *[
            F.max(F.when(F.col("n") == n, F.col("_dup_idx"))).alias(f"_didx_{n}")
            for n in dup_ns
        ],
    )
    out = with_units.join(pivoted, id_col, "left")

    def top_frac(n: int) -> Column:
        chars = (
            F.col(f"top_ngram_count_{n}")
            * F.length(F.regexp_replace(F.col(f"top_ngram_{n}"), " ", ""))
        ).cast("double")
        return F.coalesce(
            F.when(F.col("_word_chars") > 0, chars / F.col("_word_chars")),
            F.lit(0.0),
        )

    def dup_frac(n: int) -> Column:
        # sum of word lengths at covered positions; positions never exceed
        # len(_w) by construction (duplicated grams are never truncated)
        covered = F.aggregate(
            F.transform(
                F.coalesce(F.col(f"_didx_{n}"), F.array().cast("array<int>")),
                lambda k: F.length(F.element_at("_w", k)),
            ),
            F.lit(0),
            lambda a, x: a + x,
        )
        return F.coalesce(
            F.when(F.col("_word_chars") > 0, covered.cast("double") / F.col("_word_chars")),
            F.lit(0.0),
        )

    out = out.select(
        "*",
        *[top_frac(n).alias(f"top_ngram_char_frac_{n}") for n in top_ns],
        *[dup_frac(n).alias(f"dup_ngram_char_frac_{n}") for n in dup_ns],
    )
    passes = (
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("dup_par_frac") <= max_dup_par_frac)
        & (F.col("dup_par_char_frac") <= max_dup_par_char_frac)
    )
    for n in top_ns:
        passes = passes & (
            (F.coalesce(F.col(f"top_ngram_count_{n}"), F.lit(0)) <= 1)
            | (F.col(f"top_ngram_char_frac_{n}") <= top_ngram_thresholds[n])
        )
    for n in dup_ns:
        passes = passes & (
            F.col(f"dup_ngram_char_frac_{n}") <= dup_ngram_thresholds[n]
        )
    return out.withColumn("passes_repetition", passes).drop(
        "_word_chars", "_w", *[f"_didx_{n}" for n in dup_ns]
    )


def perplexity_buckets(
    scored: DataFrame,
    score_col: str = "mean_logprob",
    group_col: str | None = "lang",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al. 2020, §4.3):
    rank documents by an LM quality score WITHIN each language (or any
    group), cut at per-group quantiles, and label the thirds — the
    published pipeline keeps head+middle and drops the tail. Works over
    any score column; the natural feed is
    :func:`unigram_logprob_scores`'s ``mean_logprob`` (higher = better,
    so head = top of the score distribution; a perplexity column works
    with the same cuts since bucketing only uses within-group rank).

    Exact quantiles (``percentile``, not the sketch form) so the cut is
    deterministic and engine-reproducible; the per-group cut table is
    group-count-sized and broadcast back onto the scan. Plan: one
    uniform-key aggregation + one broadcast join + a per-row CASE — the
    corpus is scanned once and never shuffled.

    Output: input columns + ``bucket`` in {'head','middle','tail'}
    (ties at a cut go to the better bucket: ``score >= cut``)."""
    lo, hi = sorted(cuts)
    s = F.col(score_col).cast("double")
    if group_col is None:
        grouped = scored.groupBy()
        keys = []
    else:
        grouped = scored.groupBy(group_col)
        keys = [group_col]
    # head cut at the HIGH quantile (top 1-hi fraction scores above it),
    # middle cut at the low one — a prior version swapped these, making
    # "middle" unreachable and "head" the top two-thirds (caught by
    # review; the tail third, and hence CCNet's keep set, was unaffected)
    cuts_df = grouped.agg(
        F.expr(f"percentile({score_col}, {hi})").alias("_cut_head"),
        F.expr(f"percentile({score_col}, {lo})").alias("_cut_mid"),
    )
    joined = (
        scored.join(F.broadcast(cuts_df), keys)
        if keys
        else scored.crossJoin(F.broadcast(cuts_df))
    )
    bucket = (
        F.when(s >= F.col("_cut_head"), F.lit("head"))
        .when(s >= F.col("_cut_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.withColumn("bucket", bucket).drop("_cut_head", "_cut_mid")


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus-wide collocation mining by pointwise mutual information:
    (w1, w2, pair_count, pmi) for adjacent pairs with
    ``pair_count >= min_count``, ``pmi = ln(N * c(w1,w2) / (c(w1)*c(w2)))``
    computed over position counts (N = total bigram positions; unigram
    counts restricted to the same roles so the estimator is the classic
    contingency form). High-PMI pairs are the multiword expressions a
    tokenizer or normalizer wants to know about.

    Same single-scan shape as the bigram scorer: one position-count
    aggregation, a checkpointed bigram-type-sized pair table, role
    marginals derived from it, map-side arithmetic. ``top_k`` returns
    the strongest pairs via TakeOrdered (never a global sort)."""
    tf = _position_tf(docs, text_col, id_col)
    pc = (
        tf.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("w1"), F.col("w").alias("w2"))
        .agg(F.sum("cnt").alias("pair_count"))
        .transform(pin, eager=False)
    )
    left = pc.groupBy("w1").agg(F.sum("pair_count").alias("_c1"))
    right = pc.groupBy("w2").agg(F.sum("pair_count").alias("_c2"))
    tot = pc.agg(F.sum("pair_count").cast("double").alias("_n"))
    out = (
        pc.filter(F.col("pair_count") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log(
                    F.col("_n")
                    * F.col("pair_count")
                    / (F.col("_c1") * F.col("_c2"))
                ),
                9,
            ).alias("pmi"),
        )
    )
    if top_k is not None:
        out = out.orderBy(
            F.desc("pmi"), F.asc("w1"), F.asc("w2")
        ).limit(top_k)
    return out

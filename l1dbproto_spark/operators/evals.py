"""Retrieval evaluation metrics — precision/recall/hit/MRR/nDCG@k over a
(results, qrels) pair, the trec_eval surface the engine's retrieval
family (BM25, ANN, hybrid RRF) is tuned against.

Inputs are two DataFrames:

* ``results``: one row per (query, candidate) with either an explicit
  1-based ``rank`` column or a ``score`` column (ranked descending with
  the doc id as deterministic tiebreak);
* ``qrels``: one row per (query, doc) with an integer relevance grade
  ``rel`` >= 0 (0 = judged non-relevant; absent = unjudged, treated as
  non-relevant like trec_eval does).

Scale shape: one shuffle join of the rank-filtered results against
qrels on the (query, doc) composite key (AQE broadcasts whichever side
is small), then per-query aggregations — uniform keys, map-side
combinable. The per-query frame is |queries| rows; ``macro_metrics``
reduces it to one row.

Determinism contract (the registry's): every metric is either exact
rational arithmetic (counts, 1/rank) or a sum of per-term values rounded
to 9 decimals and accumulated as exact DECIMAL — the metric definition
itself fixes the 9dp term precision, so both engines compute the
identical number regardless of partitioning or sum order. The log2
discount table is Python-computed once and embedded as literals in both
the Spark plan and the SQL oracle (libm log2 is not cross-engine
bit-stable; a rank->discount lookup is).

No reference analog (the reference has no retrieval stack); part of the
beyond-reference completeness surface next to bm25/fusion/similarity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(28,9)"  # exact accumulator for 9dp-rounded terms


def discount_table(k: int) -> list[tuple[int, float]]:
    """(rank, 1/log2(rank+1)) for ranks 1..k — the shared literal table."""
    return [(r, 1.0 / math.log2(r + 1)) for r in range(1, k + 1)]


def _gain_col(rel: F.Column, gain: str) -> F.Column:
    if gain == "exp":
        return F.pow(F.lit(2.0), rel.cast("double")) - F.lit(1.0)
    if gain == "linear":
        return rel.cast("double")
    raise ValueError(f"gain must be 'exp' or 'linear', got {gain!r}")


def ranked_results(
    results: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str | None = "rank",
    score_col: str | None = None,
) -> DataFrame:
    """(query, doc, rank<=k). With ``score_col`` set, ranks are derived
    per query by score desc with doc id as the deterministic tiebreak
    (the ANN/BM25 convention); otherwise ``rank_col`` is trusted."""
    if score_col is not None:
        w = Window.partitionBy(query_col).orderBy(
            F.col(score_col).desc(), F.col(doc_col)
        )
        ranked = results.withColumn("rank", F.row_number().over(w))
    elif rank_col is not None:
        ranked = results.withColumn("rank", F.col(rank_col).cast("int"))
    else:
        raise ValueError("one of rank_col / score_col is required")
    return ranked.filter(F.col("rank") <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        "rank",
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    gain: str = "exp",
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rel_col: str = "rel",
    rank_col: str | None = "rank",
    score_col: str | None = None,
) -> DataFrame:
    """Per-query metrics at cutoff k; one row per query in ``qrels``
    (trec_eval semantics: the judged query set defines the evaluation,
    queries with no retrieved rows score 0). Columns:

    ``(query_id, n_retrieved, n_rel, hits, precision_at_k, recall_at_k,
    rr_at_k, dcg_at_k, idcg_at_k, ndcg_at_k)``

    recall/ndcg are NULL for a query whose qrels hold no positive grade
    (0/0 is a judgment error, not a score — the loud-NULL convention of
    funnel_conversion). nDCG uses the ``gain`` scheme for both DCG and
    the ideal ranking, top-k ideal like trec_eval's ndcg_cut."""
    if k < 1:
        raise ValueError("retrieval_metrics: k must be >= 1")
    spark = results.sparkSession
    disc = spark.createDataFrame(
        discount_table(k), "rank INT, discount DOUBLE"
    )

    ranked = ranked_results(
        results, k, query_col, doc_col, rank_col, score_col
    )
    judged = qrels.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rel_col).cast("int").alias("rel"),
    )

    # retrieved side: unjudged docs count as rel=0 (left join)
    hits = (
        ranked.join(judged, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .join(F.broadcast(disc), "rank")
    )
    term = F.round(_gain_col(F.col("rel"), gain) * F.col("discount"), 9)
    got = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.count(F.when(F.col("rel") > 0, True)).alias("n_rel_ret"),
        F.max(
            F.when(F.col("rel") > 0, F.lit(1.0) / F.col("rank"))
        ).alias("rr_raw"),
        F.sum(term.cast(_DEC)).cast("double").alias("dcg_at_k"),
    )

    # ideal side: per-query top-k of the qrels by grade (doc id tiebreak)
    iw = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id")
    )
    ideal = (
        judged.filter(F.col("rel") > 0)
        .withColumn("rank", F.row_number().over(iw))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(disc), "rank")
    )
    iterm = F.round(_gain_col(F.col("rel"), gain) * F.col("discount"), 9)
    per_q = judged.groupBy("query_id").agg(
        F.count(F.when(F.col("rel") > 0, True)).alias("n_rel")
    )
    ideal_agg = ideal.groupBy("query_id").agg(
        F.sum(iterm.cast(_DEC)).cast("double").alias("idcg_at_k")
    )

    out = (
        per_q.join(ideal_agg, "query_id", "left")
        .join(got, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_retrieved", F.lit(0)).alias("n_retrieved"),
            "n_rel",
            (F.coalesce("n_rel_ret", F.lit(0)) > 0).alias("hits"),
            (F.coalesce("n_rel_ret", F.lit(0)) / F.lit(float(k))).alias(
                "precision_at_k"
            ),
            F.when(
                F.col("n_rel") > 0,
                F.coalesce("n_rel_ret", F.lit(0)) / F.col("n_rel"),
            ).alias("recall_at_k"),
            F.coalesce("rr_raw", F.lit(0.0)).alias("rr_at_k"),
            F.coalesce("dcg_at_k", F.lit(0.0)).alias("dcg_at_k"),
            F.coalesce("idcg_at_k", F.lit(0.0)).alias("idcg_at_k"),
            F.when(
                F.col("idcg_at_k") > 0,
                F.coalesce("dcg_at_k", F.lit(0.0)) / F.col("idcg_at_k"),
            ).alias("ndcg_at_k"),
        )
    )
    return out


def macro_metrics(per_query: DataFrame) -> DataFrame:
    """One-row macro averages over the per-query frame. Each mean is an
    exact-decimal sum of the 9dp-rounded per-query values divided once —
    order-independent like every registry mean. NULL per-query values
    (undefined recall/ndcg) are excluded from their mean, trec_eval
    style."""

    def m(col: str) -> F.Column:
        return (
            F.sum(F.round(F.col(col), 9).cast(_DEC)).cast("double")
            / F.count(F.col(col))
        ).alias(f"mean_{col}")

    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg(F.col("hits").cast("double")).alias("hit_rate"),
        m("precision_at_k"),
        m("recall_at_k"),
        m("rr_at_k"),
        m("ndcg_at_k"),
    )


# --------------------------------------------------------------------------
# Generation (QA-style) evaluation: normalized exact match + token F1 —
# the SQuAD metric pair, computed over a (prediction, references) table
# at corpus scale. Pure column algebra: the normalization is three
# regexes, the multiset token overlap is a nested higher-order
# expression, and the best-over-references reduction is an array_max —
# zero Python, one aggregation for the corpus roll-up.

#: SQuAD answer normalization, applied to predictions and references
#: alike: lowercase, strip punctuation, drop english articles, collapse
#: whitespace. Each step is one RE2-portable regexp so a DuckDB oracle
#: re-derives the same string.
_PUNCT_RE = r"[!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"
_ARTICLE_RE = r"\b(a|an|the)\b"


def normalize_answer(col: F.Column) -> F.Column:
    """SQuAD-normalized answer string (see _PUNCT_RE/_ARTICLE_RE)."""
    lowered = F.lower(F.coalesce(col, F.lit("")))
    no_punct = F.regexp_replace(lowered, _PUNCT_RE, "")
    no_articles = F.regexp_replace(no_punct, _ARTICLE_RE, " ")
    return F.trim(F.regexp_replace(no_articles, r"\s+", " "))


def _answer_tokens(col: F.Column) -> F.Column:
    norm = normalize_answer(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def _token_f1(pred_toks: F.Column, ref_toks: F.Column) -> F.Column:
    """Token-multiset F1 between two token arrays: overlap counts each
    shared token min(count_pred, count_ref) times (the SQuAD rule —
    a repeated gold token must be repeated in the prediction to count
    twice). Both-empty scores 1.0 (correctly predicting 'no answer'),
    one-empty scores 0.0; rounded to 9dp (exact rational otherwise —
    the division is the only float op)."""
    overlap = F.aggregate(
        F.array_distinct(pred_toks),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.least(
            F.size(F.filter(pred_toks, lambda x: x == t)),
            F.size(F.filter(ref_toks, lambda x: x == t)),
        ).cast("long"),
    )
    np_, nr = F.size(pred_toks), F.size(ref_toks)
    return (
        F.when((np_ == 0) & (nr == 0), F.lit(1.0))
        .when((np_ == 0) | (nr == 0), F.lit(0.0))
        .otherwise(
            F.round(
                2.0 * overlap / (np_ + nr),
                9,
            )
        )
    )


def generation_scores(
    preds: DataFrame,
    id_col: str = "example_id",
    pred_col: str = "prediction",
    refs_col: str = "references",
) -> DataFrame:
    """Per-example scores: (example_id, exact_match, f1) where
    ``references`` is an ``array<string>`` of acceptable answers —
    exact_match is 1.0 iff the normalized prediction equals ANY
    normalized reference, f1 is the MAX token-F1 over references (the
    SQuAD multi-reference rule). Examples with an empty/NULL reference
    array score against the single empty reference (no-answer
    convention). Pure per-row expressions — rides the scan."""
    pred_n = normalize_answer(F.col(pred_col))
    refs = F.coalesce(F.col(refs_col), F.array().cast("array<string>"))
    refs_safe = F.when(F.size(refs) == 0, F.array(F.lit(""))).otherwise(refs)
    em = F.exists(
        refs_safe, lambda r: normalize_answer(r) == pred_n
    ).cast("double")
    ptoks = _answer_tokens(F.col(pred_col))
    f1 = F.array_max(
        F.transform(refs_safe, lambda r: _token_f1(ptoks, _answer_tokens(r)))
    )
    return preds.select(
        F.col(id_col).alias("example_id"),
        em.alias("exact_match"),
        f1.alias("f1"),
    )


def generation_report(
    preds: DataFrame,
    id_col: str = "example_id",
    pred_col: str = "prediction",
    refs_col: str = "references",
) -> DataFrame:
    """Corpus roll-up of :func:`generation_scores`: one row
    (n_examples, exact_match, f1) with means computed as exact decimal
    sums over the 9dp per-example terms divided once — engine-identical
    under any partitioning (the evals determinism contract)."""
    scores = generation_scores(preds, id_col, pred_col, refs_col)
    return scores.agg(
        F.count(F.lit(1)).alias("n_examples"),
        (
            F.sum(F.col("exact_match").cast(_DEC))
            / F.count(F.lit(1))
        ).cast("double").alias("exact_match"),
        (F.sum(F.col("f1").cast(_DEC)) / F.count(F.lit(1)))
        .cast("double")
        .alias("f1"),
    )


def pair_set_eval(
    predicted: DataFrame,
    truth: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Pair-level evaluation of a duplicate detector against labeled
    truth — one row (n_pred, n_truth, n_hit, precision, recall, f1).
    The QA report a dedup pipeline runs against a labeled sample (or a
    planted-clone fixture) before trusting a threshold: every metric is
    exact-count arithmetic, so the number is reproducible in any engine.

    Pairs are unordered: each side is canonicalized to (min, max),
    self-pairs dropped, duplicates collapsed — so orientation and
    repetition in either input cannot bias the counts. Empty sides
    follow the drift family's empty-side contract: the undefined ratio
    (precision with no predictions, recall with no truth) is NULL via
    try_divide, and f1 is NULL when undefined — never a silent 0 or a
    divide error.

    Scale shape: two distincts on (a, b) — the inherent key — and one
    equi-join; the three counts reduce map-side, and only 1-row frames
    cross to the final select."""

    def canon(df: DataFrame) -> DataFrame:
        lo = F.least(F.col(a_col), F.col(b_col))
        hi = F.greatest(F.col(a_col), F.col(b_col))
        return (
            df.select(lo.alias("a"), hi.alias("b"))
            .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    p = canon(predicted)
    t = canon(truth)
    n_pred = p.agg(F.count(F.lit(1)).alias("n_pred"))
    n_truth = t.agg(F.count(F.lit(1)).alias("n_truth"))
    n_hit = p.join(t, ["a", "b"]).agg(F.count(F.lit(1)).alias("n_hit"))
    stats = n_pred.crossJoin(n_truth).crossJoin(n_hit)
    prec = F.try_divide(F.col("n_hit").cast("double"), F.col("n_pred"))
    rec = F.try_divide(F.col("n_hit").cast("double"), F.col("n_truth"))
    f1 = F.try_divide(F.lit(2.0) * prec * rec, prec + rec)
    return stats.select(
        "n_pred",
        "n_truth",
        "n_hit",
        F.round(prec, 9).alias("precision"),
        F.round(rec, 9).alias("recall"),
        # 0/0 inside f1 (both ratios zero) is NULL via try_divide; a NULL
        # ratio propagates — both are the undefined-verdict contract
        F.round(f1, 9).alias("f1"),
    )


def bcubed_eval(
    predicted: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """B-cubed clustering evaluation (Bagga & Baldwin 1998 — the
    standard entity-resolution/dedup clustering metric, per-ITEM rather
    than per-pair so big clusters don't drown small ones): one row
    (n_items, precision, recall, f1) comparing a predicted cluster
    assignment against a labeled truth assignment.

    Per item d, precision is |pred(d) ∩ truth(d)| / |pred(d)| and recall
    |pred(d) ∩ truth(d)| / |truth(d)|; the reported numbers are the
    means over items — computed in closed form from the contingency
    table, never per item: mean precision = (1/N) * sum over cells
    n_pt^2 / n_p, mean recall = (1/N) * sum over cells n_pt^2 / n_t.
    Only items labeled on BOTH sides are evaluated (the co-labeled
    universe); each side's assignment must be a function (one cluster
    per item) — duplicate assignments raise rather than silently
    double-count.

    Determinism: the per-cell fractions are double divisions of exact
    longs, 9dp-rounded and DECIMAL-summed (the evals contract); the
    final means are one double division each. Scale shape: one join on
    the item id, a contingency groupBy on (pred, truth) cluster pairs,
    and two cluster-size aggregations derived FROM the contingency
    frame — the exchanges carry cluster-pair counts, never items."""
    p = predicted.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_pc")
    ).filter(F.col("_pc").isNotNull())
    t = truth.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_tc")
    ).filter(F.col("_tc").isNotNull())
    for side, frame in (("predicted", p), ("truth", t)):
        dup = (
            frame.groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                f"bcubed_eval: {side} assigns multiple clusters to at "
                f"least one item — an assignment must be a function"
            )
    from ..checkpoint import pin

    # pin the contingency: it feeds both cluster-size aggregations and
    # the terms join, and it is cluster-pair-sized by construction
    cell = (
        p.join(t, "_id")
        .groupBy("_pc", "_tc")
        .agg(F.count(F.lit(1)).alias("n_pt"))
        .transform(pin, eager=False)
    )
    psize = cell.groupBy("_pc").agg(F.sum("n_pt").alias("n_p"))
    tsize = cell.groupBy("_tc").agg(F.sum("n_pt").alias("n_t"))
    terms = cell.join(psize, "_pc").join(tsize, "_tc")
    sq = F.col("n_pt").cast("double") * F.col("n_pt")
    agg = terms.agg(
        F.sum(F.round(sq / F.col("n_p"), 9).cast(_DEC)).alias("_sp"),
        F.sum(F.round(sq / F.col("n_t"), 9).cast(_DEC)).alias("_st"),
        # empty co-labeled universe -> 0 items (not NULL); the ratios
        # stay NULL via try_divide per the empty-side contract
        F.coalesce(F.sum("n_pt"), F.lit(0).cast("long")).alias("n_items"),
    )
    prec = F.try_divide(F.col("_sp").cast("double"), F.col("n_items"))
    rec = F.try_divide(F.col("_st").cast("double"), F.col("n_items"))
    f1 = F.try_divide(F.lit(2.0) * prec * rec, prec + rec)
    return agg.select(
        "n_items",
        F.round(prec, 9).alias("precision"),
        F.round(rec, 9).alias("recall"),
        F.round(f1, 9).alias("f1"),
    )


# --------------------------------------------------------------------- BLEU


def _ws_tokens(col: F.Column) -> F.Column:
    """Plain whitespace tokens of the raw text — BLEU/ROUGE are
    case- and punctuation-sensitive by convention (unlike the SQuAD
    normalization above); callers tokenize/normalize upstream if their
    metric variant wants it. Empty/NULL text -> empty array."""
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"[ \t\r\n\f]+")
    )


def _ngram_join(toks: F.Column, n: int) -> F.Column:
    """Space-joined word n-grams of a token array (n is plan-time)."""
    if n == 1:
        return toks
    cnt = F.size(toks) - (n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _clipped_overlap(pred_grams: F.Column, refs_grams: F.Column) -> F.Column:
    """Modified (clipped) n-gram matches, Papineni et al. 2002: for each
    DISTINCT prediction n-gram, min(count in prediction, MAX count over
    references) — a prediction cannot farm credit by repeating a gram
    more often than any single reference does."""
    return F.aggregate(
        F.array_distinct(pred_grams),
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.least(
            F.size(F.filter(pred_grams, lambda x: x == g)),
            F.array_max(
                F.transform(
                    refs_grams,
                    lambda rg: F.size(F.filter(rg, lambda x: x == g)),
                )
            ),
        ).cast("long"),
    )


def bleu_ngram_stats(
    preds: DataFrame,
    id_col: str = "example_id",
    pred_col: str = "prediction",
    refs_col: str = "references",
    n_max: int = 4,
) -> DataFrame:
    """Per-example BLEU sufficient statistics — ALL INTEGERS, the exact
    corpus-BLEU decomposition of Papineni et al. 2002: (example_id,
    pred_len, ref_len, match_1..match_{n_max}, total_1..total_{n_max})
    where ``ref_len`` is the effective reference length (closest to the
    prediction length; ties -> the SHORTER, the sacrebleu rule),
    ``match_n`` the clipped n-gram matches over all references, and
    ``total_n = max(pred_len − n + 1, 0)``. Examples with an empty/NULL
    reference array score against one empty reference.

    Integer-only output is deliberate: corpus BLEU is a pure function of
    the column SUMS of this frame (:func:`bleu_report`), so the shuffle-
    order-sensitive float work is deferred to ONE final row and the
    per-example frame is exactly comparable across engines. Pure per-row
    nested HOF algebra — zero shuffle, rides the scan."""
    ptoks = _ws_tokens(F.col(pred_col))
    refs = F.coalesce(F.col(refs_col), F.array().cast("array<string>"))
    refs_safe = F.when(F.size(refs) == 0, F.array(F.lit(""))).otherwise(refs)
    rtoks = F.transform(refs_safe, lambda r: _ws_tokens(r))
    # bind the token arrays once; per-n grams reference the bound columns
    bound = preds.select(
        F.col(id_col), ptoks.alias("_pt"), rtoks.alias("_rts")
    )
    out_cols = [
        F.col(id_col).alias("example_id"),
        F.size("_pt").cast("long").alias("pred_len"),
        # effective reference length: min over refs of (|len−pred_len|, len)
        F.array_min(
            F.transform(
                F.col("_rts"),
                lambda rt: F.struct(
                    F.abs(F.size(rt) - F.size("_pt")).alias("d"),
                    F.size(rt).alias("len"),
                ),
            )
        )["len"].cast("long").alias("ref_len"),
    ]
    def _ref_grams(n: int) -> F.Column:
        # one-parameter lambda on purpose: PySpark counts DEFAULT args
        # toward HOF lambda arity, so `lambda rt, n=n:` would become the
        # (element, index) form and bind n to the index column
        return F.transform(F.col("_rts"), lambda rt: _ngram_join(rt, n))

    for n in range(1, n_max + 1):
        pg = _ngram_join(F.col("_pt"), n)
        rg = _ref_grams(n)
        out_cols.append(
            _clipped_overlap(pg, rg).alias(f"match_{n}")
        )
        out_cols.append(
            F.greatest(F.size("_pt") - (n - 1), F.lit(0))
            .cast("long")
            .alias(f"total_{n}")
        )
    return bound.select(*out_cols)


def bleu_report(
    preds: DataFrame,
    id_col: str = "example_id",
    pred_col: str = "prediction",
    refs_col: str = "references",
    n_max: int = 4,
) -> DataFrame:
    """Corpus BLEU: one row (n_examples, pred_len, ref_len, p_1..p_{n_max},
    brevity_penalty, bleu). Exact integer column sums of
    :func:`bleu_ngram_stats` feed the closed form

        BP = min(1, e^(1 − ref_len/pred_len));
        BLEU = BP · exp(Σ_n ln p_n / n_max)

    — the only float ops are the final exp/ln over ratios of exact
    integers, rounded to 9dp (partition order cannot reach them). A zero
    match count at any n makes bleu 0.0 (the undefined-ln guard; corpus
    BLEU has no smoothing in the original definition)."""
    stats = bleu_ngram_stats(preds, id_col, pred_col, refs_col, n_max)
    aggs = [
        F.count(F.lit(1)).alias("n_examples"),
        F.sum("pred_len").alias("pred_len"),
        F.sum("ref_len").alias("ref_len"),
    ]
    for n in range(1, n_max + 1):
        aggs.append(F.sum(f"match_{n}").alias(f"m{n}"))
        aggs.append(F.sum(f"total_{n}").alias(f"t{n}"))
    row = stats.agg(*aggs)
    # try_divide: a dry n-gram order (t_n = 0) reports p_n NULL instead
    # of raising under ANSI mode; bleu itself is already 0-guarded
    p = [
        F.try_divide(F.col(f"m{n}"), F.col(f"t{n}")).alias(f"p_{n}")
        for n in range(1, n_max + 1)
    ]
    bp = F.when(
        F.col("pred_len") >= F.col("ref_len"), F.lit(1.0)
    ).otherwise(
        F.exp(F.lit(1.0) - F.try_divide(F.col("ref_len"), F.col("pred_len")))
    )
    any_zero = None
    for n in range(1, n_max + 1):
        z = (F.col(f"m{n}") == 0) | (F.col(f"t{n}") == 0)
        any_zero = z if any_zero is None else (any_zero | z)
    log_mean = sum(
        [
            F.log(F.try_divide(F.col(f"m{n}"), F.col(f"t{n}")))
            for n in range(1, n_max + 1)
        ],
        F.lit(0.0),
    ) / F.lit(float(n_max))
    bleu = F.when(any_zero, F.lit(0.0)).otherwise(
        F.round(bp * F.exp(log_mean), 9)
    )
    return row.select(
        "n_examples",
        "pred_len",
        "ref_len",
        *[F.round(pc, 9).alias(f"p_{n}") for n, pc in enumerate(p, 1)],
        F.round(bp, 9).alias("brevity_penalty"),
        bleu.alias("bleu"),
    )


def rouge_n_scores(
    preds: DataFrame,
    n: int = 1,
    id_col: str = "example_id",
    pred_col: str = "prediction",
    refs_col: str = "references",
) -> DataFrame:
    """Per-example ROUGE-N (Lin 2004) against multiple references:
    (example_id, precision, recall, f1) of the BEST reference by F1
    (the multi-reference max rule; ties -> larger precision, then
    recall — struct-max, deterministic). Per-reference overlap is the
    clipped count min(count_pred, count_ref) per distinct gram; empty
    sides follow the engine's convention (both empty -> 1.0, one empty
    -> 0.0). Rational arithmetic rounded 9dp; zero shuffle."""
    ptoks = _ws_tokens(F.col(pred_col))
    refs = F.coalesce(F.col(refs_col), F.array().cast("array<string>"))
    refs_safe = F.when(F.size(refs) == 0, F.array(F.lit(""))).otherwise(refs)
    bound = preds.select(
        F.col(id_col),
        _ngram_join(ptoks, n).alias("_pg"),
        F.transform(
            refs_safe, lambda r: _ngram_join(_ws_tokens(r), n)
        ).alias("_rgs"),
    )

    def per_ref(rg: F.Column) -> F.Column:
        m = F.aggregate(
            F.array_distinct(F.col("_pg")),
            F.lit(0).cast("long"),
            lambda acc, g: acc
            + F.least(
                F.size(F.filter(F.col("_pg"), lambda x: x == g)),
                F.size(F.filter(rg, lambda x: x == g)),
            ).cast("long"),
        )
        np_, nr = F.size(F.col("_pg")), F.size(rg)
        prec = F.when((np_ == 0) & (nr == 0), F.lit(1.0)).when(
            np_ == 0, F.lit(0.0)
        ).otherwise(F.round(m / np_, 9))
        rec = F.when((np_ == 0) & (nr == 0), F.lit(1.0)).when(
            nr == 0, F.lit(0.0)
        ).otherwise(F.round(m / nr, 9))
        f1 = F.when(
            (np_ == 0) & (nr == 0), F.lit(1.0)
        ).when((np_ == 0) | (nr == 0) | (m == 0), F.lit(0.0)).otherwise(
            F.round(2.0 * m / (np_ + nr), 9)
        )
        return F.struct(
            f1.alias("f1"), prec.alias("precision"), rec.alias("recall")
        )

    best = F.array_max(F.transform(F.col("_rgs"), per_ref))
    return bound.select(
        F.col(id_col).alias("example_id"),
        best["precision"].alias("precision"),
        best["recall"].alias("recall"),
        best["f1"].alias("f1"),
    )


# --------------------------------------------------------------------- chrF


def chrf_scores(
    preds: DataFrame,
    id_col: str = "example_id",
    pred_col: str = "prediction",
    refs_col: str = "references",
    n_max: int = 6,
    beta: float = 2.0,
) -> DataFrame:
    """Per-example chrF (Popović 2015) — character-n-gram F-score,
    the third standard generation metric next to BLEU and ROUGE and the
    one robust to tokenization: (example_id, chrf) with chrf in [0, 1]
    of the BEST reference (max score, the multi-reference rule shared
    with ROUGE).

    Definition used (documented because published variants differ in
    edge handling): whitespace is removed entirely (the chrF convention
    — the metric sees morphology, not token boundaries); for each order
    n = 1..n_max, P_n / R_n are the clipped char-n-gram precision /
    recall against the reference; orders where BOTH sides have no
    n-grams are SKIPPED (short-text rule), an order where exactly one
    side is empty scores 0; P and R are the plain means over the
    non-skipped orders accumulated in ascending n (a fixed fold order,
    so the doubles are engine-reproducible); chrF =
    (1+β²)·P·R / (β²·P + R), 0 when the denominator is 0, rounded 9dp.
    Both sides empty across all orders -> 1.0 (the empty-vs-empty
    convention of the family).

    Scale shape: pure per-row nested HOF algebra, zero shuffle — but
    the per-row cost is O(n_max · |text|²) from the distinct-gram
    clipping, so this is an EVAL-SET operator (thousands of rows), not
    a corpus operator; eval sets are bounded by construction."""

    def chars(col: F.Column) -> F.Column:
        return F.regexp_replace(
            F.coalesce(col, F.lit("")), r"[ \t\r\n\f]+", ""
        )

    def char_grams(s: F.Column, n: int) -> F.Column:
        cnt = F.length(s) - (n - 1)
        return F.when(
            cnt >= 1,
            F.transform(
                F.sequence(F.lit(1), cnt), lambda i: s.substr(i, F.lit(n))
            ),
        ).otherwise(F.array().cast("array<string>"))

    def overlap(pg: F.Column, rg: F.Column) -> F.Column:
        return F.aggregate(
            F.array_distinct(pg),
            F.lit(0).cast("long"),
            lambda acc, g: acc
            + F.least(
                F.size(F.filter(pg, lambda x: x == g)),
                F.size(F.filter(rg, lambda x: x == g)),
            ).cast("long"),
        )

    def per_ref(r: F.Column) -> F.Column:
        ps = F.lit(0.0)
        rs = F.lit(0.0)
        k = F.lit(0)
        for n in range(1, n_max + 1):
            pg = char_grams(F.col("_p"), n)
            rg = char_grams(chars(r), n)
            np_, nr = F.size(pg), F.size(rg)
            skip = (np_ == 0) & (nr == 0)
            m = overlap(pg, rg)
            ps = ps + F.when(skip | (np_ == 0), F.lit(0.0)).otherwise(
                m / np_
            )
            rs = rs + F.when(skip | (nr == 0), F.lit(0.0)).otherwise(m / nr)
            k = k + F.when(skip, F.lit(0)).otherwise(F.lit(1))
        p_mean = ps / k
        r_mean = rs / k
        b2 = float(beta) * float(beta)
        f = ((1.0 + b2) * p_mean * r_mean) / (b2 * p_mean + r_mean)
        return (
            F.when(k == 0, F.lit(1.0))  # both sides empty at every order
            .when(
                (p_mean == 0.0) | (r_mean == 0.0), F.lit(0.0)
            )
            .otherwise(F.round(f, 9))
        )

    refs = F.coalesce(F.col(refs_col), F.array().cast("array<string>"))
    refs_safe = F.when(F.size(refs) == 0, F.array(F.lit(""))).otherwise(refs)
    bound = preds.select(
        F.col(id_col), chars(F.col(pred_col)).alias("_p"), refs_safe.alias("_rs")
    )
    best = F.array_max(F.transform(F.col("_rs"), per_ref))
    return bound.select(
        F.col(id_col).alias("example_id"), best.alias("chrf")
    )


# ------------------------------------------------------------------ ROUGE-L


def rouge_l_scores(
    preds: DataFrame,
    id_col: str = "example_id",
    pred_col: str = "prediction",
    refs_col: str = "references",
) -> DataFrame:
    """Per-example ROUGE-L (Lin 2004 §3.2) — longest-common-subsequence
    recall/precision/F1 against multiple references, best reference by
    F1 (struct-max ties to larger precision then recall, like ROUGE-N):
    (example_id, lcs, precision, recall, f1) with F1 the plain harmonic
    mean (β=1; the summarization-weighted β variant is a caller-side
    reweighting of the same P/R columns).

    The LCS dynamic program runs ENTIRELY in column algebra: the outer
    ``aggregate`` folds prediction positions carrying the previous DP
    row as an array accumulator, the inner ``aggregate`` folds reference
    positions extending the new row one cell at a time (cell = max(up,
    left, diag + match)) — no Python, no shuffle, rides the scan. Cost
    is O(|pred|·|ref|) per pair with array builds, so like chrF this is
    an EVAL-SET operator by contract, not a corpus scan.

    Empty-side conventions as everywhere in the family: both sides
    empty -> 1.0, one empty -> 0.0; scores are exact rationals rounded
    9dp."""
    ptoks = _ws_tokens(F.col(pred_col))
    refs = F.coalesce(F.col(refs_col), F.array().cast("array<string>"))
    refs_safe = F.when(F.size(refs) == 0, F.array(F.lit(""))).otherwise(refs)
    bound = preds.select(
        F.col(id_col),
        ptoks.alias("_pt"),
        F.transform(refs_safe, lambda r: _ws_tokens(r)).alias("_rts"),
    )

    def lcs_len(rt: F.Column) -> F.Column:
        np_, nr = F.size("_pt"), F.size(rt)
        init = F.array_repeat(F.lit(0), nr + 1)

        def next_row(prev: F.Column, i: F.Column) -> F.Column:
            return F.aggregate(
                F.sequence(F.lit(1), nr),
                F.array(F.lit(0)),
                lambda acc, j: F.concat(
                    acc,
                    F.array(
                        F.greatest(
                            F.element_at(prev, j + 1),  # up
                            F.element_at(acc, j),  # left (last cell built)
                            F.element_at(prev, j)  # diag + match
                            + F.when(
                                F.element_at(F.col("_pt"), i.cast("int"))
                                == F.element_at(rt, j.cast("int")),
                                F.lit(1),
                            ).otherwise(F.lit(0)),
                        )
                    ),
                ),
            )

        # guards: sequence(1, 0) is DESCENDING in Spark, so empty sides
        # must short-circuit rather than fold
        full = F.aggregate(F.sequence(F.lit(1), np_), init, next_row)
        return (
            F.when((np_ == 0) | (nr == 0), F.lit(0))
            .otherwise(F.element_at(full, -1))
            .cast("long")
        )

    def per_ref(rt: F.Column) -> F.Column:
        m = lcs_len(rt)
        np_, nr = F.size("_pt"), F.size(rt)
        prec = F.when((np_ == 0) & (nr == 0), F.lit(1.0)).when(
            np_ == 0, F.lit(0.0)
        ).otherwise(F.round(m / np_, 9))
        rec = F.when((np_ == 0) & (nr == 0), F.lit(1.0)).when(
            nr == 0, F.lit(0.0)
        ).otherwise(F.round(m / nr, 9))
        f1 = F.when((np_ == 0) & (nr == 0), F.lit(1.0)).when(
            (np_ == 0) | (nr == 0) | (m == 0), F.lit(0.0)
        ).otherwise(F.round(2.0 * m / (np_ + nr), 9))
        # 2PR/(P+R) with P=m/np, R=m/nr simplifies to 2m/(np+nr): the F1
        # is exact rational arithmetic, no intermediate float divisions
        return F.struct(
            f1.alias("f1"),
            prec.alias("precision"),
            rec.alias("recall"),
            m.alias("lcs"),
        )

    best = F.array_max(F.transform(F.col("_rts"), per_ref))
    return bound.select(
        F.col(id_col).alias("example_id"),
        best["lcs"].alias("lcs"),
        best["precision"].alias("precision"),
        best["recall"].alias("recall"),
        best["f1"].alias("f1"),
    )


# -------------------------------------------------------------------- WER


def wer_scores(
    preds: DataFrame,
    id_col: str = "example_id",
    pred_col: str = "prediction",
    refs_col: str = "references",
) -> DataFrame:
    """Per-example word error rate — the standard ASR/transcription
    metric: (example_id, edits, ref_len, wer) with ``edits`` the
    token-level Levenshtein distance to the BEST reference (minimum WER;
    ties -> fewer edits, then shorter reference — struct-min) and
    ``wer = edits / ref_len`` (can exceed 1). Both sides empty -> wer
    0.0 with edits 0; a nonempty prediction against an empty reference
    has no defined rate -> wer NULL (the loud-NULL convention), edits =
    |prediction| (pure insertions).

    Spark's builtin ``levenshtein`` is character-level; WER is
    token-level, so the DP runs in the same nested higher-order folds as
    ROUGE-L's LCS (row accumulator; cell = min(del, ins, diag +
    substitution)) — zero Python, zero shuffle, eval-set cost
    O(|pred|·|ref|) per pair."""
    ptoks = _ws_tokens(F.col(pred_col))
    refs = F.coalesce(F.col(refs_col), F.array().cast("array<string>"))
    refs_safe = F.when(F.size(refs) == 0, F.array(F.lit(""))).otherwise(refs)
    bound = preds.select(
        F.col(id_col),
        ptoks.alias("_pt"),
        F.transform(refs_safe, lambda r: _ws_tokens(r)).alias("_rts"),
    )

    def edit_distance(rt: F.Column) -> F.Column:
        np_, nr = F.size("_pt"), F.size(rt)
        init = F.sequence(F.lit(0), nr)  # row 0: j deletions to reach ref[:j]

        def next_row(prev: F.Column, i: F.Column) -> F.Column:
            return F.aggregate(
                F.sequence(F.lit(1), nr),
                F.array(i.cast("int")),  # column 0: i insertions
                lambda acc, j: F.concat(
                    acc,
                    F.array(
                        F.least(
                            F.element_at(prev, j + 1) + F.lit(1),
                            F.element_at(acc, j) + F.lit(1),
                            F.element_at(prev, j)
                            + F.when(
                                F.element_at(F.col("_pt"), i.cast("int"))
                                == F.element_at(rt, j.cast("int")),
                                F.lit(0),
                            ).otherwise(F.lit(1)),
                        )
                    ),
                ),
            )

        full = F.aggregate(F.sequence(F.lit(1), np_), init, next_row)
        return (
            F.when(np_ == 0, nr)  # also covers the empty-vs-empty 0
            .when(nr == 0, np_)
            .otherwise(F.element_at(full, -1))
            .cast("long")
        )

    def per_ref(rt: F.Column) -> F.Column:
        e = edit_distance(rt)
        nr = F.size(rt)
        wer = (
            F.when((nr == 0) & (e == 0), F.lit(0.0))
            .when(nr == 0, F.lit(None).cast("double"))
            .otherwise(F.round(e / nr, 9))
        )
        # struct-MIN via negation-free ordering: (wer, edits, ref_len);
        # NULL wer must lose to any real wer -> substitute +inf for the
        # comparison key only
        key = F.coalesce(wer, F.lit(float("inf")))
        return F.struct(
            key.alias("k"),
            e.alias("edits"),
            nr.cast("long").alias("ref_len"),
            wer.alias("wer"),
        )

    best = F.array_min(F.transform(F.col("_rts"), per_ref))
    return bound.select(
        F.col(id_col).alias("example_id"),
        best["edits"].alias("edits"),
        best["ref_len"].alias("ref_len"),
        best["wer"].alias("wer"),
    )

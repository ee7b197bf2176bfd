"""Driver-round-13 registered rows for the training-data assembly
surface that round 12 shipped pytest-only: passage chunking
(operators/chunking.py), conversation (SFT) audit + dedup identity
(operators/conversations.py), preference-pair construction for RM/DPO
(operators/preferences.py), and generation (QA) evaluation
(operators/evals.py generation_scores).

Every oracle is the INDEPENDENT DuckDB re-derivation its test file
already proved driver-grade (tests/test_chunking.py,
test_conversations.py, test_preferences.py, test_geneval.py) — lifted
verbatim onto the pre-registered `documents` view. The fixtures are
doc_id arithmetic, so both engines build identical inputs; the rules
(window algebra, role protocol, strict-preference semantics, SQuAD
normalization + multiset F1) are re-derived leg-for-leg, never re-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query

# --------------------------------------------------------------------------
# chunk_fixed_tokens: overlapping fixed-size token windows over the whole
# documents table — the RAG/DPR passage-indexing step. The oracle
# re-derives the window rule (chunk count ceil((n-size)/stride)+1, stride
# grid starts, tail truncation) with DuckDB array slicing over the same
# whitespace-token class.
_CHUNK_SIZE, _CHUNK_STRIDE = 32, 24


@query(
    "chunk_fixed_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(trim(text), '[ \t\r\n\f]+') AS tok
      FROM documents
      WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    sized AS (
      SELECT doc_id, tok,
             CAST(ceil(greatest(len(tok) - {_CHUNK_SIZE}, 0)
                       / CAST({_CHUNK_STRIDE} AS DOUBLE)) AS INT) + 1 AS nc
      FROM toks WHERE len(tok) > 0
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(i * {_CHUNK_STRIDE} AS BIGINT) AS token_start,
           CAST(len(tok[i*{_CHUNK_STRIDE}+1 : i*{_CHUNK_STRIDE}+{_CHUNK_SIZE}])
                AS INT) AS n_tokens,
           array_to_string(
             tok[i*{_CHUNK_STRIDE}+1 : i*{_CHUNK_STRIDE}+{_CHUNK_SIZE}], ' ')
             AS text
    FROM sized, unnest(range(nc)) AS t(i)
    """,
    survey=(
        "ext:chunking (fixed-window passage chunking with overlap + "
        "provenance offsets; operators/chunking.py chunk_fixed_tokens)"
    ),
)
def chunk_fixed_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per passage: (doc_id, chunk_idx, token_start, n_tokens,
    text) — size-32 windows every 24 tokens, tail truncated, empty/null
    docs emit nothing.

    Scale shape: pure per-row column algebra (split + window fold +
    posexplode), ZERO shuffle and zero Python — a 100 TB corpus chunks
    at scan speed (plan-pinned in tests/test_chunking.py)."""
    from ..operators.chunking import chunk_fixed_tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_fixed_tokens(docs, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)


# --------------------------------------------------------------------------
# conversation_audit: the SFT structural report JOINed with the transcript
# dedup fingerprint over a deterministic turn table (conv = doc_id % 40,
# idx = doc_id // 40; conv%5==0 conversations open with a system turn, the
# rest alternate user/assistant from idx parity — some conversations pass
# the protocol, some exercise every failure leg). The oracle re-derives
# the role protocol relationally (lead_sys from the first non-system turn,
# alternation against (idx - lead_sys) parity) and the fingerprint with
# DuckDB's own ordered string_agg over chr(31)/chr(30) separators.
_N_CONV = 40


def _turn_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    conv = F.col("doc_id") % _N_CONV
    idx = (F.col("doc_id") / _N_CONV).cast("long")
    role = (
        F.when((idx == 0) & (conv % 5 == 0), F.lit("system"))
        .when(idx % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    return docs.select(
        conv.alias("conv_id"),
        idx.alias("turn_idx"),
        role.alias("role"),
        F.col("text").alias("content"),
    )


_DUCK_TURNS = f"""
      SELECT doc_id % {_N_CONV} AS conv_id,
             doc_id // {_N_CONV} AS turn_idx,
             CASE WHEN doc_id // {_N_CONV} = 0 AND doc_id % {_N_CONV} % 5 = 0
                  THEN 'system'
                  WHEN (doc_id // {_N_CONV}) % 2 = 0 THEN 'user'
                  ELSE 'assistant' END AS role,
             text AS content
      FROM documents
"""


@query(
    "conversation_audit",
    oracle=f"""
    WITH t AS ({_DUCK_TURNS}),
    lead AS (
      SELECT conv_id,
             COALESCE(MIN(CASE WHEN role <> 'system' THEN turn_idx END),
                      COUNT(*)) AS first_non_sys
      FROM t GROUP BY conv_id
    ),
    per AS (
      SELECT t.conv_id,
             COUNT(*) AS n_turns,
             CAST(SUM(CASE WHEN role = 'system' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_system,
             CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_assistant,
             COUNT(*) FILTER (turn_idx >= first_non_sys) > 0 AS starts_ok,
             COALESCE(bool_and(CASE WHEN turn_idx >= first_non_sys THEN
               role = CASE WHEN (turn_idx - first_non_sys) % 2 = 0
                           THEN 'user' ELSE 'assistant' END END), FALSE)
               AND COUNT(*) FILTER (turn_idx >= first_non_sys) > 0
               AS alternates,
             bool_and(coalesce(trim(content), '') <> '') AS no_empty,
             COUNT(DISTINCT turn_idx) = COUNT(*) AS no_dup_idx
      FROM t JOIN lead USING (conv_id)
      GROUP BY t.conv_id
    ),
    fp AS (
      SELECT conv_id,
             md5(string_agg(
               role || chr(31) ||
               regexp_replace(coalesce(trim(content), ''), '[ \t\r\n\f]+', ' ', 'g'),
               chr(30) ORDER BY turn_idx)) AS fingerprint
      FROM t GROUP BY conv_id
    )
    SELECT conv_id, n_turns, n_system, n_assistant, starts_ok, alternates,
           no_empty, no_dup_idx,
           starts_ok AND alternates AND no_empty AND no_dup_idx AS ok,
           fingerprint
    FROM per JOIN fp USING (conv_id)
    """,
    survey=(
        "ext:conversations (SFT turn-table structural audit + transcript "
        "dedup fingerprint; operators/conversations.py "
        "conversation_report/conversation_fingerprints)"
    ),
)
def conversation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per conversation: the structural report (role protocol,
    emptiness, duplicate indexes, the ok verdict) joined with the
    whitespace-normalized transcript fingerprint that feeds exact dedup.

    Scale shape: TWO groupBys on conv_id (report + fingerprint — the
    inherent key) over one scan each; every per-conversation rule is a
    JVM higher-order fold over the collected turn array, zero Python."""
    from ..operators.conversations import (
        conversation_fingerprints,
        conversation_report,
    )

    turns = _turn_table(spark, sf_dir)
    rep = conversation_report(turns)
    fp = conversation_fingerprints(turns)
    return rep.join(fp, "conv_id").select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_system").cast("long").alias("n_system"),
        F.col("n_assistant").cast("long").alias("n_assistant"),
        "starts_ok",
        "alternates",
        "no_empty",
        "no_dup_idx",
        "ok",
        "fingerprint",
    )


# --------------------------------------------------------------------------
# preference_pairs: both RM/DPO pair rules over a graded-responses table
# synthesized from doc_id arithmetic (50 prompts x ~10 responses, score
# domain 13 so within-prompt ties exist and exercise the strict-preference
# rule). 'best_worst' rows are the classic one-pair-per-prompt rule
# (top vs bottom, ties to smallest id); 'graded' rows are the dense
# strict-preference set thresholded at min_gap=5. The oracle re-derives
# both rules with its own windows/joins.
_N_PROMPTS = 50
_PREF_MIN_GAP = 5.0

_DUCK_RESPONSES = f"""
      SELECT doc_id % {_N_PROMPTS} AS prompt_id,
             doc_id AS response_id,
             CAST((doc_id * 7) % 13 AS DOUBLE) AS score
      FROM documents
"""


@query(
    "preference_pairs",
    oracle=f"""
    WITH r AS ({_DUCK_RESPONSES}),
    ranked AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY prompt_id
                           ORDER BY score DESC, response_id) AS rb,
        ROW_NUMBER() OVER (PARTITION BY prompt_id
                           ORDER BY score ASC, response_id) AS rw
      FROM r
    )
    SELECT 'best_worst' AS rule, b.prompt_id,
           b.response_id AS chosen_id, b.score AS chosen_score,
           w.response_id AS rejected_id, w.score AS rejected_score,
           b.score - w.score AS score_gap
    FROM (SELECT * FROM ranked WHERE rb = 1) b
    JOIN (SELECT * FROM ranked WHERE rw = 1) w USING (prompt_id)
    WHERE b.score - w.score > 0
    UNION ALL
    SELECT 'graded', a.prompt_id,
           a.response_id, a.score, b.response_id, b.score,
           a.score - b.score
    FROM r a JOIN r b USING (prompt_id)
    WHERE a.score - b.score > 0 AND a.score - b.score >= {_PREF_MIN_GAP}
    """,
    survey=(
        "ext:preferences (RM/DPO preference-pair construction — "
        "best-vs-worst and dense graded rules with strict-preference "
        "semantics; operators/preferences.py best_worst_pairs/graded_pairs)"
    ),
)
def preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both pair rules in one frame, keyed by ``rule``: (rule, prompt_id,
    chosen_id, chosen_score, rejected_id, rejected_score, score_gap).
    Ties never pair (no strict preference) and every selection
    tie-breaks to the smallest response id, so the set is deterministic.

    Scale shape: one shuffle on prompt_id per rule (the inherent key);
    the dense join is per-prompt bounded (grading fan-out, not a corpus
    dimension)."""
    from ..operators.preferences import best_worst_pairs, graded_pairs

    resp = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % _N_PROMPTS).alias("prompt_id"),
        F.col("doc_id").alias("response_id"),
        ((F.col("doc_id") * 7) % 13).cast("double").alias("score"),
    )
    bw = best_worst_pairs(resp).select(
        F.lit("best_worst").alias("rule"),
        "prompt_id",
        "chosen_id",
        "chosen_score",
        "rejected_id",
        "rejected_score",
        "score_gap",
    )
    gr = graded_pairs(resp, min_gap=_PREF_MIN_GAP).select(
        F.lit("graded").alias("rule"),
        "prompt_id",
        "chosen_id",
        "chosen_score",
        "rejected_id",
        "rejected_score",
        "score_gap",
    )
    return bw.unionByName(gr)


# --------------------------------------------------------------------------
# generation_scores: the SQuAD-style QA metric (normalization -> exact
# match over any reference + max token-multiset F1) over predictions
# synthesized from documents: prediction = first 12 tokens of a doc;
# doc_id%3!=0 rows carry a case/punct-noised copy of the same text plus a
# decoy (EM 1.0 / F1 1.0 by construction), doc_id%3==0 rows carry only a
# decoy (EM 0.0, F1 below 1). The oracle re-derives the ENTIRE rule —
# normalization regexes, multiset overlap, best-over-references — with
# DuckDB list algebra.


@query(
    "generation_scores",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             array_to_string(string_split_regex(trim(text), '\\s+')[1:12], ' ')
               AS head
      FROM documents
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
               '[!"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g'),
               '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g')) AS p,
             list_transform(refs, r ->
               trim(regexp_replace(regexp_replace(regexp_replace(
                 lower(coalesce(r, '')),
                 '[!"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g'),
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
    """,
    survey=(
        "ext:evals (generation/QA evaluation — SQuAD normalization, "
        "multi-reference exact match, token-multiset F1; "
        "operators/evals.py generation_scores)"
    ),
)
def generation_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per example: (example_id, exact_match, f1) under the
    public SQuAD rule over the planted prediction/reference fixture.

    Scale shape: pure per-row nested HOF algebra — zero shuffle, zero
    Python (plan-pinned in tests/test_geneval.py)."""
    from ..operators.evals import generation_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
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
    return generation_scores(preds)


# ---------------------------------------------------------------------------
# BLEU + ROUGE-N machine-translation/summarization metrics (r14, new
# generation-eval family members next to the SQuAD row above) —
# driver-grade oracle in-suite in tests/test_unregistered_batteries.py
# (r15 promotion candidate).
#
# The fixture plants overlapping word windows from each document:
# prediction = words 1..10, references = [words 1..12, words 3..12]
# (so clipping, the brevity ref-length tie rule, and multi-reference max
# all engage on real repeated-token text), and every doc_id % 5 == 0
# prediction is replaced by a repeated decoy ("zz yy zz zz" — exercises
# the zero-match path and clipped repetition at once). The projection is
# the INTEGER corpus-BLEU sufficient statistics per example plus the
# exact-rational ROUGE-1/-2 F1 (9dp) — no ln/exp anywhere near the
# compared values; corpus BLEU itself is pinned against an independent
# Python reference in tests/test_bleu.py.
BLEU_NGRAM_STATS_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \t\r\n\f]+') AS w
      FROM documents
    ),
    ex AS (
      SELECT doc_id AS example_id,
             CASE WHEN doc_id % 5 = 0 THEN ['zz', 'yy', 'zz', 'zz']
                  ELSE w[1:10] END AS pt,
             [w[1:12], w[3:12]] AS rts
      FROM toks
    ),
    g AS (
      SELECT example_id, pt, rts,
             len(pt) AS plen,
             (list_min(list_transform(rts,
                rt -> abs(len(rt) - len(pt)) * 1000000 + len(rt)))
              % 1000000) AS ref_len
      FROM ex
    )
    SELECT example_id,
           CAST(plen AS BIGINT) AS pred_len,
           CAST(ref_len AS BIGINT) AS ref_len,
           {match_total},
           {rouge}
    FROM g
    """


def _duck_ngrams(src: str, n: int) -> str:
    if n == 1:
        return src
    return (
        f"CASE WHEN len({src}) >= {n} THEN "
        f"list_transform(range(1, len({src}) - {n} + 2), "
        f"i -> array_to_string({src}[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def _duck_clipped(pg: str, rgs: str) -> str:
    return (
        f"CAST(coalesce(list_sum(list_transform(list_distinct({pg}), "
        f"g -> least("
        f"len(list_filter({pg}, x -> x = g)), "
        f"list_max(list_transform({rgs}, "
        f"rg -> len(list_filter(rg, x -> x = g))))"
        f"))), 0) AS BIGINT)"
    )


def _duck_rouge_f1(n: int) -> str:
    pg = _duck_ngrams("pt", n)
    rg = _duck_ngrams("rt", n)
    m = (
        f"coalesce(list_sum(list_transform(list_distinct({pg}), "
        f"g -> least(len(list_filter({pg}, x -> x = g)), "
        f"len(list_filter({rg}, x -> x = g))))), 0)"
    )
    per_ref = (
        f"CASE WHEN len({pg}) = 0 AND len({rg}) = 0 THEN 1.0 "
        f"WHEN len({pg}) = 0 OR len({rg}) = 0 THEN 0.0 "
        f"ELSE round(2.0 * {m} / (len({pg}) + len({rg})), 9) END"
    )
    return f"list_max(list_transform(rts, rt -> {per_ref}))"


def _render_bleu_oracle() -> str:
    mt = ",\n           ".join(
        f"{_duck_clipped(_duck_ngrams('pt', n), 'list_transform(rts, rt -> ' + _duck_ngrams('rt', n) + ')')} AS match_{n},\n"
        f"           CAST(greatest(plen - {n - 1}, 0) AS BIGINT) AS total_{n}"
        for n in range(1, 5)
    )
    rouge = ",\n           ".join(
        f"{_duck_rouge_f1(n)} AS rouge{n}_f1" for n in (1, 2)
    )
    return BLEU_NGRAM_STATS_ORACLE.format(match_total=mt, rouge=rouge)


BLEU_NGRAM_STATS_ORACLE = _render_bleu_oracle()


def bleu_ngram_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-example generation metrics over the planted window fixture:
    the integer corpus-BLEU sufficient statistics (clipped matches +
    totals for n=1..4, prediction length, closest-tie-shorter effective
    reference length) joined with exact-rational ROUGE-1/-2 best-of-
    references F1. Scale shape: pure per-row nested HOF algebra — zero
    shuffle, zero Python; corpus BLEU is one final 1-row aggregation of
    the integer columns (operators/evals.py bleu_report)."""
    from ..operators.evals import bleu_ngram_stats, rouge_n_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim("text"), r"[ \t\r\n\f]+")
    preds = docs.select(
        F.col("doc_id").alias("example_id"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.array(F.lit("zz"), F.lit("yy"), F.lit("zz"), F.lit("zz")),
        )
        .otherwise(F.slice(w, 1, 10))
        .alias("_pt"),
        F.array(F.slice(w, 1, 12), F.slice(w, 3, 10)).alias("_rts"),
    ).select(
        "example_id",
        F.array_join("_pt", " ").alias("prediction"),
        F.transform("_rts", lambda r: F.array_join(r, " ")).alias(
            "references"
        ),
    )
    stats = bleu_ngram_stats(preds)
    r1 = rouge_n_scores(preds, n=1).select(
        "example_id", F.col("f1").alias("rouge1_f1")
    )
    r2 = rouge_n_scores(preds, n=2).select(
        "example_id", F.col("f1").alias("rouge2_f1")
    )
    return stats.join(r1, "example_id").join(r2, "example_id")


# ---------------------------------------------------------------------------
# chrF (r14) — driver-grade oracle in-suite. The fixture slices two
# overlapping char windows from each document (prediction = chars 1..40,
# references = [chars 1..48, chars 9..48]); the oracle re-derives the
# documented chrF rule (whitespace removal, orders 1..6 with
# skip-when-both-empty, clipped overlap, ascending-n accumulation,
# beta=2 F, best-of-references) with IDENTICAL operand order, so the
# doubles match bit-for-bit before the shared 9dp round.


def _duck_chrf_ref(pred: str, ref: str, n_max: int = 6, b2: float = 4.0) -> str:
    def grams(s: str, n: int) -> str:
        return (
            f"CASE WHEN length({s}) >= {n} THEN "
            f"list_transform(range(1, length({s}) - {n} + 2), "
            f"i -> substr({s}, CAST(i AS INT), {n})) "
            f"ELSE [] END"
        )

    ps, rs, k = "0.0", "0.0", "0"
    for n in range(1, n_max + 1):
        pg, rg = grams(pred, n), grams(ref, n)
        m = (
            f"coalesce(list_sum(list_transform(list_distinct({pg}), "
            f"g -> least(len(list_filter({pg}, x -> x = g)), "
            f"len(list_filter({rg}, x -> x = g))))), 0)"
        )
        skip = f"(len({pg}) = 0 AND len({rg}) = 0)"
        ps = (
            f"({ps} + CASE WHEN {skip} OR len({pg}) = 0 THEN 0.0 "
            f"ELSE CAST({m} AS DOUBLE) / len({pg}) END)"
        )
        rs = (
            f"({rs} + CASE WHEN {skip} OR len({rg}) = 0 THEN 0.0 "
            f"ELSE CAST({m} AS DOUBLE) / len({rg}) END)"
        )
        k = f"({k} + CASE WHEN {skip} THEN 0 ELSE 1 END)"
    p_mean, r_mean = f"({ps} / {k})", f"({rs} / {k})"
    f = (
        f"(((1.0 + {b2}) * {p_mean} * {r_mean}) / "
        f"({b2} * {p_mean} + {r_mean}))"
    )
    return (
        f"CASE WHEN {k} = 0 THEN 1.0 "
        f"WHEN {p_mean} = 0.0 OR {r_mean} = 0.0 THEN 0.0 "
        f"ELSE round({f}, 9) END"
    )


def _render_chrf_oracle() -> str:
    body = _duck_chrf_ref("p", "r")
    return f"""
    WITH ex AS (
      SELECT doc_id AS example_id,
             regexp_replace(substr(trim(text), 1, 40),
                            '[ \t\r\n\f]+', '', 'g') AS p,
             list_transform(
               [substr(trim(text), 1, 48), substr(trim(text), 9, 40)],
               r0 -> regexp_replace(r0, '[ \t\r\n\f]+', '', 'g')) AS rs
      FROM documents
    )
    SELECT example_id,
           list_max(list_transform(rs, r -> {body})) AS chrf
    FROM ex
    """


CHRF_SCORES_ORACLE = _render_chrf_oracle()


def chrf_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-example chrF over the planted overlapping char windows —
    (example_id, chrf). Scale shape: per-row HOF algebra, zero shuffle
    (eval-set operator by contract, bounded input)."""
    from ..operators.evals import chrf_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = F.trim("text")
    preds = docs.select(
        F.col("doc_id").alias("example_id"),
        F.substring(t, 1, 40).alias("prediction"),
        F.array(F.substring(t, 1, 48), F.substring(t, 9, 40)).alias(
            "references"
        ),
    )
    return chrf_scores(preds)


# ---------------------------------------------------------------------------
# ROUGE-L (r14) — driver-grade oracle in-suite. The fixture plants
# prediction = words 1..8, references = [words 1..10, REVERSED words
# 1..8] (the reversal forces LCS < multiset overlap, which is exactly
# what separates ROUGE-L from ROUGE-N), and every doc_id % 7 == 0
# prediction is the disjoint decoy 'qq rr' (zero-LCS path). The oracle
# runs the SAME dynamic program in DuckDB — nested list_reduce with a
# list accumulator (list_prepend supplies the initial DP row; positions
# ride as single-element lists so the accumulator and element types
# unify) — and picks the best reference by the same (f1, precision,
# recall, lcs) tuple order. All compared values are integers or exact
# rationals rounded 9dp.

_DUCK_LCS = """list_reduce(
        list_prepend(list_transform(range(0, len({rt}) + 1), z -> 0),
                     list_transform(range(1, len({pt}) + 1),
                                    i -> [CAST(i AS INT)])),
        (prev, x) -> list_reduce(
            list_prepend([0],
                         list_transform(range(1, len({rt}) + 1),
                                        j -> [CAST(j AS INT)])),
            (acc, y) -> list_append(acc, greatest(
                prev[y[1] + 1],
                acc[y[1]],
                prev[y[1]] + CASE WHEN {pt}[x[1]] = {rt}[y[1]]
                             THEN 1 ELSE 0 END))
        )
      )[-1]"""


def _duck_rouge_l_ref(rt: str) -> str:
    lcs = _DUCK_LCS.format(pt="pt", rt=rt)
    # struct keys avoid PRECISION (a reserved word inside struct_pack)
    return f"""struct_pack(
        f1 := CASE WHEN {lcs} = 0 THEN 0.0
                   ELSE round(2.0 * {lcs} / (len(pt) + len({rt})), 9) END,
        prec := round({lcs} / CAST(len(pt) AS DOUBLE), 9),
        rec := round({lcs} / CAST(len({rt}) AS DOUBLE), 9),
        lcs := CAST({lcs} AS BIGINT))"""


ROUGE_L_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \t\r\n\f]+') AS w
      FROM documents
    ),
    ex AS (
      SELECT doc_id AS example_id,
             CASE WHEN doc_id % 7 = 0 THEN ['qq', 'rr']
                  ELSE w[1:8] END AS pt,
             w[1:10] AS r1, list_reverse(w[1:8]) AS r2
      FROM toks
    ),
    scored AS (
      SELECT example_id,
             {_duck_rouge_l_ref("r1")} AS s1,
             {_duck_rouge_l_ref("r2")} AS s2
      FROM ex
    ),
    best AS (
      SELECT example_id,
             CASE WHEN (s1.f1, s1.prec, s1.rec, s1.lcs)
                       >= (s2.f1, s2.prec, s2.rec, s2.lcs)
                  THEN s1 ELSE s2 END AS s
      FROM scored
    )
    SELECT example_id, s.lcs AS lcs, s.prec AS precision,
           s.rec AS recall, s.f1 AS f1
    FROM best
    """


def rouge_l_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-example ROUGE-L over the planted reversed-window fixture:
    (example_id, lcs, precision, recall, f1). Scale shape: the LCS DP is
    nested-HOF column algebra riding the scan — zero shuffle, zero
    Python (eval-set operator by contract)."""
    from ..operators.evals import rouge_l_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim("text"), r"[ \t\r\n\f]+")
    preds = docs.select(
        F.col("doc_id").alias("example_id"),
        F.when(
            F.col("doc_id") % 7 == 0, F.array(F.lit("qq"), F.lit("rr"))
        )
        .otherwise(F.slice(w, 1, 8))
        .alias("_pt"),
        F.array(F.slice(w, 1, 10), F.reverse(F.slice(w, 1, 8))).alias(
            "_rts"
        ),
    ).select(
        "example_id",
        F.array_join("_pt", " ").alias("prediction"),
        F.transform("_rts", lambda r: F.array_join(r, " ")).alias(
            "references"
        ),
    )
    return rouge_l_scores(preds)


# ---------------------------------------------------------------------------
# WER (r14) — driver-grade oracle in-suite. Fixture: prediction = words
# 1..8 with every third word substituted by 'xx' (deterministic planted
# error rate); references = [words 1..8, words 1..10]; doc_id % 9 == 0
# rows shift the prediction window to words 2..9 (insert+delete path).
# The oracle runs the SAME token-level Levenshtein DP via nested
# list_reduce and the same (wer, edits, ref_len) min-tuple choice.

_DUCK_LEV = """list_reduce(
        list_prepend(list_transform(range(0, len({rt}) + 1),
                                    z -> CAST(z AS INT)),
                     list_transform(range(1, len({pt}) + 1),
                                    i -> [CAST(i AS INT)])),
        (prev, x) -> list_reduce(
            list_prepend([x[1]],
                         list_transform(range(1, len({rt}) + 1),
                                        j -> [CAST(j AS INT)])),
            (acc, y) -> list_append(acc, least(
                prev[y[1] + 1] + 1,
                acc[y[1]] + 1,
                prev[y[1]] + CASE WHEN {pt}[x[1]] = {rt}[y[1]]
                             THEN 0 ELSE 1 END))
        )
      )[-1]"""


def _duck_wer_ref(rt: str) -> str:
    e = (
        f"CASE WHEN len(pt) = 0 THEN len({rt}) "
        f"WHEN len({rt}) = 0 THEN len(pt) "
        f"ELSE {_DUCK_LEV.format(pt='pt', rt=rt)} END"
    )
    return f"""struct_pack(
        k := CASE WHEN len({rt}) = 0 AND len(pt) > 0 THEN 1e308
                  WHEN len({rt}) = 0 THEN 0.0
                  ELSE round(CAST({e} AS DOUBLE) / len({rt}), 9) END,
        edits := CAST({e} AS BIGINT),
        ref_len := CAST(len({rt}) AS BIGINT),
        wer := CASE WHEN len({rt}) = 0 AND len(pt) > 0 THEN NULL
                    WHEN len({rt}) = 0 THEN 0.0
                    ELSE round(CAST({e} AS DOUBLE) / len({rt}), 9) END)"""


WER_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \t\r\n\f]+') AS w
      FROM documents
    ),
    ex AS (
      SELECT doc_id AS example_id,
             list_transform(
               CASE WHEN doc_id % 9 = 0 THEN w[2:9] ELSE w[1:8] END,
               (x, i) -> CASE WHEN i % 3 = 0 THEN 'xx' ELSE x END) AS pt,
             w[1:8] AS r1, w[1:10] AS r2
      FROM toks
    ),
    scored AS (
      SELECT example_id,
             {_duck_wer_ref("r1")} AS s1,
             {_duck_wer_ref("r2")} AS s2
      FROM ex
    ),
    best AS (
      SELECT example_id,
             CASE WHEN (s1.k, s1.edits, s1.ref_len)
                       <= (s2.k, s2.edits, s2.ref_len)
                  THEN s1 ELSE s2 END AS s
      FROM scored
    )
    SELECT example_id, s.edits AS edits, s.ref_len AS ref_len, s.wer AS wer
    FROM best
    """


def wer_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-example WER over the planted substitution/shift fixture:
    (example_id, edits, ref_len, wer). Scale shape: the Levenshtein DP
    is nested-HOF column algebra riding the scan — zero shuffle, zero
    Python (eval-set operator by contract)."""
    from ..operators.evals import wer_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim("text"), r"[ \t\r\n\f]+")
    window = F.when(F.col("doc_id") % 9 == 0, F.slice(w, 2, 8)).otherwise(
        F.slice(w, 1, 8)
    )
    # Spark's transform index is 0-based; DuckDB's is 1-based — i % 3 == 2
    # here matches i % 3 == 0 there (positions 3, 6, ... in 1-based terms)
    pt = F.transform(
        window,
        lambda x, i: F.when(i % 3 == 2, F.lit("xx")).otherwise(x),
    )
    preds = docs.select(
        F.col("doc_id").alias("example_id"),
        F.array_join(pt, " ").alias("prediction"),
        F.transform(
            F.array(F.slice(w, 1, 8), F.slice(w, 1, 10)),
            lambda r: F.array_join(r, " "),
        ).alias("references"),
    )
    return wer_scores(preds)

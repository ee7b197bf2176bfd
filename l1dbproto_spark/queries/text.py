"""Text-analysis operators over the documents table (training-data pipeline
extension, SURVEY.md §7.1 extension layer): token counting, quality scoring,
language ID, document fingerprinting.

All are native column expressions (split/regexp/aggregate) — no Python UDFs —
so they stay inside whole-stage codegen and scale linearly over a 100 TB
document corpus with zero shuffles (embarrassingly parallel per-row maps;
the only shuffle is a final aggregation where present)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query

# A compact "BPE-ish" token pattern: alpha runs, digit runs, single punct.
_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

_STOP_EN = ("the", "of", "and", "to", "in", "a", "is")
_STOP_ES = ("el", "la", "de", "que", "y", "los", "es")
_STOP_FR = ("le", "la", "de", "et", "un", "les", "est")


def _words(col):
    # engine-wide whitespace rule: explicit class, identical in Java
    # regex (Spark) and RE2 (DuckDB) — unlike \s, whose \x0b membership
    # differs between the two; space-only '[ \t\r\n\f]+' undercounted tab/newline-
    # delimited docs (review find)
    return F.split(F.trim(col), "[ \t\r\n\f]+")


# Driver round 11: text_stats and language_id rotated out of the 50-slot
# registry (two rows for one text-analysis family; slots to the round-10
# components weighted_topk_sample / bfs_distances / csv_ingest_quarantine)
# — SAME oracles kept in-suite (tests/test_unregistered_batteries.py,
# driver-grade compare); the family keeps the registered tfidf_top_terms
# row plus the quality/langid operator pytest coverage.
TEXT_STATS_ORACLE = f"""
    WITH t AS (
      SELECT
        doc_id,
        length(text) AS n_chars,
        len(string_split_regex(trim(text), '[ \t\r\n\f]+')) AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens,
        len(list_filter(string_split_regex(trim(text), '[ \t\r\n\f]+'),
                        x -> x IN {str(tuple(_STOP_EN))})) AS n_stop,
        length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
      FROM documents
    )
    SELECT
      doc_id,
      n_chars,
      n_tokens,
      n_bpe_tokens,
      CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
      CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
      0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)
        + 0.3 * (CASE WHEN n_tokens >= 20 THEN 1.0 ELSE CAST(n_tokens AS DOUBLE) / 20 END)
        + 0.2 * (1.0 - CAST(n_punct AS DOUBLE) / n_chars) AS quality
    FROM t
"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and heuristic quality score
    (length / stopword ratio / punct ratio) per document, one projection.
    All ratios are int/int divisions in double — deterministic across
    engines; the weighted sum is evaluated in identical operand order."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in _STOP_EN])
    n_chars = F.length("text")
    n_tokens = F.size(words)
    n_stop = F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x)))
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), "[.,!?;:]", ""))
    stop_ratio = n_stop.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / n_chars
    len_score = F.when(n_tokens >= 20, F.lit(1.0)).otherwise(
        n_tokens.cast("double") / F.lit(20)
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        (
            F.lit(0.5) * stop_ratio + F.lit(0.3) * len_score + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
        ).alias("quality"),
    )


LANGUAGE_ID_ORACLE = f"""
    WITH t AS (
      SELECT
        doc_id,
        len(list_filter(string_split_regex(trim(lower(text)), '[ \t\r\n\f]+'),
                        x -> x IN {str(tuple(_STOP_EN))})) AS en_hits,
        len(list_filter(string_split_regex(trim(lower(text)), '[ \t\r\n\f]+'),
                        x -> x IN {str(tuple(_STOP_ES))})) AS es_hits,
        len(list_filter(string_split_regex(trim(lower(text)), '[ \t\r\n\f]+'),
                        x -> x IN {str(tuple(_STOP_FR))})) AS fr_hits
      FROM documents
    )
    SELECT
      doc_id,
      CASE
        WHEN en_hits > es_hits AND en_hits > fr_hits THEN 'en'
        WHEN es_hits > en_hits AND es_hits > fr_hits THEN 'es'
        WHEN fr_hits > en_hits AND fr_hits > es_hits THEN 'fr'
        ELSE 'und'
      END AS lang_pred,
      en_hits, es_hits, fr_hits
    FROM t
"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit-count language ID heuristic (argmax over per-language
    stopword sets, deterministic tie -> 'und')."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.lower(F.col("text")))

    def hits(stops):
        arr = F.array(*[F.lit(w) for w in stops])
        return F.size(F.filter(words, lambda x: F.array_contains(arr, x)))

    en, es, fr = hits(_STOP_EN), hits(_STOP_ES), hits(_STOP_FR)
    pred = (
        F.when((en > es) & (en > fr), F.lit("en"))
        .when((es > en) & (es > fr), F.lit("es"))
        .when((fr > en) & (fr > es), F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return docs.select(
        "doc_id",
        pred.alias("lang_pred"),
        en.cast("long").alias("en_hits"),
        es.cast("long").alias("es_hits"),
        fr.cast("long").alias("fr_hits"),
    )


# Rotated out of the driver registry in round 12 (slot to weburl_dedup_mix;
# the text family keeps bm25_topk/phrase_match/collocations_pmi driver rows).
# SAME oracle, driver-grade compare in tests/test_unregistered_batteries.py.
TFIDF_TOP_TERMS_ORACLE = r"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term
      ) AS rnk FROM scored
    ) t WHERE rnk <= 3
    """


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency x ln(N/df), top-3 terms per document.

    The corpus is scanned ONCE: document frequency derives from the tf
    table (one row per (doc, term), so rows-per-term == distinct docs),
    and both branches share the tf shuffle — the DAG scheduler skips the
    duplicate map stage at runtime (r4 fix; the earlier independent
    ``words.groupBy(term).countDistinct`` branch re-scanned the corpus).
    The df-side join strategy is left to AQE: a web-scale vocabulary
    (URLs, typos, code tokens) is NOT bounded, so a forced broadcast of
    the document-frequency table would OOM at 100 TB — AQE broadcasts it
    when its runtime size is actually small and falls back to a shuffle
    join otherwise (the tf-side shuffle is intrinsic either way). tfidf
    rounded to 6 decimals (ln() may differ by an ulp between libm
    implementations); the top-3 rank uses the rounded value with a term
    tie-break, so ordering is engine-identical."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(_words(F.lower(F.col("text")))).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # plan constant (tiny driver-side count)
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


# Rotated out of the 50-cap registry in driver round 8 (slot to cohort_retention);
# the SAME DuckDB oracle runs in-suite in
# tests/test_unregistered_batteries.py. F13 formatting stays
# driver-covered via json_payload_extract's string surface.
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of normalized text, plus a 16-bit shard prefix
    (the fingerprint doubles as a dedup key and a balanced partition key at
    100 TB: partitioning by the shard prefix gives uniform buckets)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 4).alias("shard")
    )


@query(
    "pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(doc_id % 8 AS INT) AS shard,
             CAST(len(string_split_regex(trim(text), '[ \t\r\n\f]+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    spans AS (
      SELECT *,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS end_tok,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens
               AS start_tok
      FROM toks
    )
    SELECT shard,
           CAST(chunk AS BIGINT) AS chunk,
           doc_id,
           n_tokens,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(least(end_tok, (chunk + 1) * 256)
                - greatest(start_tok, chunk * 256) AS BIGINT) AS tokens_in_chunk
    FROM spans,
         unnest(range(CAST(start_tok // 256 AS BIGINT),
                      CAST((end_tok - 1) // 256 + 1 AS BIGINT))) AS t(chunk)
    """,
    survey="ext:packing (LLM context-window packing map; W-family shard-local cumsum)",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous concat-and-chunk packing map (ctx=256 tokens, 8 shards):
    one row per (document, chunk) overlap with the document's token span.
    Shard-local window cumsum + chunk-range explode — no global sort; shards
    pack independently across the cluster (operators/packing.py)."""
    from ..operators.packing import pack_sequences as _pack

    docs = load_table(spark, sf_dir, "documents")
    return _pack(docs, ctx_len=256, n_shards=8)


def unigram_logprob_score(
    spark: SparkSession, sf_dir: str, smoothing: float = 0.5
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    token distribution — the classic cheap LM-quality signal: documents of
    rare/garbled tokens score far below fluent text, without training a
    model. (Unregistered: the 50-slot registry is full; oracle-checked
    in-suite by tests/test_text_extras.py.)

    score(d) = mean over tokens t of ln((count(t) + s) / (N + s*V))
    with add-s smoothing over the corpus vocabulary (V types, N tokens).

    Plan shape at 100 TB: one corpus token aggregation (uniform keys) for
    the distribution, one tf aggregation per doc, one join threading the
    token log-probs back through the per-doc tf rows — the same
    AQE-decides-broadcast join discipline as tfidf_top_terms. ln() inputs
    are integer-derived doubles evaluated in identical operand order, and
    the per-doc mean is a weighted decimal-free sum/count division, so the
    DuckDB oracle matches after a 9-decimal round. Core in
    operators/quality.py (shared with clean_corpus's quality gate)."""
    from ..operators.quality import unigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob_scores(docs, smoothing=smoothing)


# Rotated out of the 50-cap registry in driver round 13 (slot to the
# r12 training-data families — COVERAGE.md "Registry rotation history");
# the SAME DuckDB oracle (below) runs driver-grade in-suite in
# tests/test_unregistered_batteries.py, and the text family keeps
# bm25_topk / phrase_match / fuzzy_name_match registered.
COLLOCATIONS_PMI_ORACLE = """
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \t\r\n\f]+') AS t
      FROM documents
    ),
    r AS (
      SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos
      FROM d
    ),
    pairs AS (
      SELECT d.t[r.pos - 1] AS w1, r.w AS w2, COUNT(*) AS pair_count
      FROM r JOIN d USING (doc_id) WHERE r.pos > 1 GROUP BY 1, 2
    ),
    m1 AS (SELECT w1, SUM(pair_count) AS c1 FROM pairs GROUP BY 1),
    m2 AS (SELECT w2, SUM(pair_count) AS c2 FROM pairs GROUP BY 1),
    tot AS (SELECT CAST(SUM(pair_count) AS DOUBLE) AS n FROM pairs)
    SELECT p.w1, p.w2, p.pair_count,
           ROUND(ln(tot.n * p.pair_count / (m1.c1 * m2.c2)), 9) AS pmi
    FROM pairs p JOIN m1 USING (w1) JOIN m2 USING (w2), tot
    WHERE p.pair_count >= 3
    """


def collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide collocations by pointwise mutual information over
    adjacent word pairs (min_count=3): the multiword-expression discovery
    pass a tokenizer/normalizer consumes. Single corpus scan into position
    counts, a checkpointed bigram-type-sized pair table, marginals derived
    from it, map-side PMI arithmetic — ln operands are integer-derived in
    identical order on both engines, so a 9-decimal round is bit-stable
    (the unigram-scorer precedent)."""
    from ..operators.quality import collocations

    return collocations(
        load_table(spark, sf_dir, "documents"), min_count=3
    )


# ---------------------------------------------------------------------------
# Trained char-n-gram language ID (r15 promotion candidate, staged in
# COVERAGE.md) — driver-grade oracle in-suite in
# tests/test_unregistered_batteries.py until a registry slot opens.
#
# The stopword heuristic above tops out at "does the doc contain my
# seven function words"; real mixture building (CCNet / RefinedWeb)
# trains a model over character n-grams (langid.py / fastText lid). The
# documents fixture can't exercise that — its `lang` column is
# decoration over one shared token soup — so the builder PLANTS a
# two-language corpus derived arithmetically from doc_id (disjoint
# five-word lexicons, 12 words per doc, word j = lex[(doc_id·7 + j) % 5]),
# trains operators/langid.py's closed-form NB on the doc_id % 3 == 0
# third, and predicts over every document (500 at the oracle SFs, 5000 at
# sf0.1). The oracle re-derives the WHOLE pipeline — synthesis, 3..5-gram extraction, portable md5 bucket
# hashing, smoothed NB fit, scoring, argmax — in DuckDB SQL. Only
# integer/argmax columns are projected (lang_pred, n_grams, correct):
# the decision margins are hundreds of nats, so ulp-level ln and
# sum-order noise cannot flip a prediction, while any real defect
# (wrong gram window, wrong smoothing, train/test leak) flips many.
_LANGID_LEX0 = ("alpha", "bravo", "delta", "gamma", "omega")
_LANGID_LEX1 = ("zulu", "yankee", "xray", "whisky", "victor")
_LANGID_BUCKETS = 512


def _langid_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.langid import LANGID_SALT

    h = portable_hash64_sql("gram", LANGID_SALT)
    lex0 = "[" + ", ".join(f"'{w}'" for w in _LANGID_LEX0) + "]"
    lex1 = "[" + ", ".join(f"'{w}'" for w in _LANGID_LEX1) + "]"
    gram_arms = "\n      UNION ALL\n".join(
        f"""      SELECT doc_id, substr(t, CAST(i AS INT), {n}) AS gram
      FROM txt, unnest(range(1, length(t) - {n} + 2)) AS rs_{n}(i)"""
        for n in (3, 4, 5)
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN {lex0} ELSE {lex1} END AS lex,
             CASE WHEN doc_id % 2 = 0 THEN 'l0' ELSE 'l1' END AS lang_true
      FROM documents
    ),
    txt AS (
      SELECT doc_id, lang_true,
             array_to_string(list_transform(range(0, 12),
               j -> lex[CAST((doc_id * 7 + j) % 5 AS INT) + 1]), ' ') AS t
      FROM base
    ),
    grams AS (
{gram_arms}
    ),
    feats AS (
      SELECT doc_id, {h} % {_LANGID_BUCKETS} AS bucket, COUNT(*) AS cnt
      FROM grams GROUP BY 1, 2
    ),
    lab AS (
      SELECT doc_id, lang_true AS lang FROM txt WHERE doc_id % 3 = 0
    ),
    tf AS (
      SELECT l.lang, f.bucket, SUM(f.cnt) AS c
      FROM feats f JOIN lab l USING (doc_id) GROUP BY 1, 2
    ),
    tot AS (SELECT lang, SUM(c) AS tc FROM tf GROUP BY 1),
    pri AS (
      SELECT lang,
             ln(COUNT(*) / CAST((SELECT COUNT(*) FROM lab) AS DOUBLE))
               AS log_prior
      FROM lab GROUP BY 1
    ),
    stats AS (
      SELECT t.lang, p.log_prior,
             ln(1.0 / (t.tc + {_LANGID_BUCKETS}.0)) AS log_default
      FROM tot t JOIN pri p USING (lang)
    ),
    cond AS (SELECT lang, bucket, ln((c + 1.0) / 1.0) AS delta FROM tf),
    adj AS (
      SELECT f.doc_id, c.lang, SUM(f.cnt * c.delta) AS adj
      FROM feats f JOIN cond c USING (bucket) GROUP BY 1, 2
    ),
    totals AS (SELECT doc_id, SUM(cnt) AS n_grams FROM feats GROUP BY 1),
    scored AS (
      SELECT d.doc_id, d.lang_true, t.n_grams, s.lang,
             t.n_grams * s.log_default + COALESCE(a.adj, 0.0) + s.log_prior
               AS score
      FROM txt d JOIN totals t USING (doc_id) CROSS JOIN stats s
      LEFT JOIN adj a ON a.doc_id = d.doc_id AND a.lang = s.lang
    ),
    ranked AS (
      SELECT doc_id, lang_true, n_grams, lang,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, lang DESC
             ) AS rnk
      FROM scored
    )
    SELECT doc_id, lang AS lang_pred, n_grams, lang_true,
           lang = lang_true AS correct
    FROM ranked WHERE rnk = 1
    """


CHARNGRAM_LANGID_ORACLE = _langid_oracle()


def charngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained language ID over the planted two-lexicon corpus:
    (doc_id, lang_pred, n_grams, lang_true, correct) — NB fit on the
    doc_id % 3 == 0 third, scored over every document.

    Scale shape: synthesis and featurization are zero-shuffle column
    algebra; training is two grouped aggregations over the bounded
    labeled sample; scoring is a broadcast model join + one (id, lang)
    aggregation + argmax. The corpus is never shuffled by anything
    except doc id."""
    from ..operators.langid import langid_scores, train_langid

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    lex0 = F.array(*[F.lit(w) for w in _LANGID_LEX0])
    lex1 = F.array(*[F.lit(w) for w in _LANGID_LEX1])
    is_l0 = F.col("doc_id") % 2 == 0
    planted = docs.select(
        "doc_id",
        F.when(is_l0, F.lit("l0")).otherwise(F.lit("l1")).alias("lang_true"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda j: F.element_at(
                    F.when(is_l0, lex0).otherwise(lex1),
                    (F.pmod(F.col("doc_id") * 7 + j, F.lit(5)) + 1).cast(
                        "int"
                    ),
                ),
            ),
            " ",
        ).alias("text"),
    )
    labeled = planted.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", "text", F.col("lang_true").alias("lang")
    )
    cond, stats = train_langid(labeled, num_buckets=_LANGID_BUCKETS)
    preds = langid_scores(planted, cond, stats, num_buckets=_LANGID_BUCKETS)
    return preds.join(planted.select("doc_id", "lang_true"), "doc_id").select(
        "doc_id",
        "lang_pred",
        "n_grams",
        "lang_true",
        (F.col("lang_pred") == F.col("lang_true")).alias("correct"),
    )

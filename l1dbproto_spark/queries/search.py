"""Lexical search + fuzzy matching queries (training-data pipeline extension):
BM25 top-k retrieval over the documents table and a token-blocked
edit-distance best-match over part names.

Registered round 8 — the retrieval surface previously covered only the
embedding side (`ann_topk_*`, `doc_embed_ann`); BM25 is the lexical half of
hybrid retrieval and the standard decontamination probe, and the fuzzy join
is the entity-resolution member of the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.bm25 import TOKEN_PATTERN, bm25_topk, queries_df
from ..operators.fuzzy import best_fuzzy_match
from ..sources.catalog import load_table
from . import query

# Fixed probe queries for the registered row: common terms plus 'dup'
# (df 25/500 at sf0.01 — the one genuinely rare vocabulary member, so the
# idf spread is exercised, not just the tf/length normalization).
BM25_QUERIES: list[tuple[int, str]] = [
    (1, "dup merge join"),
    (2, "window hash scan"),
    (3, "slow customer filter"),
]
BM25_K = 10
_K1, _B = 1.2, 0.75


def _bm25_oracle() -> str:
    qvalues = ", ".join(f"({qid}, '{text}')" for qid, text in BM25_QUERIES)
    return f"""
    WITH q(query_id, query_text) AS (VALUES {qvalues}),
    qt AS (
      SELECT DISTINCT query_id, unnest(regexp_extract_all(lower(query_text), '{TOKEN_PATTERN}')) AS term
      FROM q
    ),
    dt AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS dl,
             unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, dl, COUNT(*) AS tf
      FROM dt
      WHERE term IN (SELECT term FROM qt)
      GROUP BY doc_id, term, dl
    ),
    stats AS (
      -- indexable (>= 1 token) docs only: the engine-wide BM25 stats rule
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS DOUBLE) / COUNT(*) AS avgdl
      FROM documents
      WHERE len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) > 0
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT qt.query_id, tf.doc_id, tf.term,
             round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 9)
               * (tf.tf * ({_K1} + 1.0)
                  / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * tf.dl / avgdl))) AS contrib
      FROM tf
      JOIN qt USING (term)
      JOIN dfreq USING (term)
      CROSS JOIN stats
    ),
    scores AS (
      SELECT query_id, doc_id, SUM(contrib ORDER BY term) AS score
      FROM contrib GROUP BY query_id, doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id, round(score, 6) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id
             ) AS rank
      FROM scores
    )
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {BM25_K}
    """


@query(
    "bm25_topk",
    oracle=_bm25_oracle(),
    survey="ext:search (BM25 lexical retrieval; Lucene idf variant; salted two-phase top-k)",
)
def bm25_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per probe query under Lucene-BM25 (k1=1.2, b=0.75).

    Plan: explode->broadcast-semi term filter->one tf shuffle; broadcast
    corpus stats + document frequencies; order-deterministic per-term fold;
    salted two-phase top-k (`operators/bm25.py` docstring has the 100 TB
    rationale)."""
    docs = load_table(spark, sf_dir, "documents")
    qterms = queries_df(spark, BM25_QUERIES)
    out = bm25_topk(docs, qterms, BM25_K, k1=_K1, b=_B)
    return out.select("query_id", "doc_id", "score", out["rank"].cast("int").alias("rank"))


@query(
    "fuzzy_name_match",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    tok AS (
      SELECT p_name, length(p_name) AS len,
             unnest(string_split_regex(trim(lower(p_name)), '[ \t\r\n\f]+')) AS tok
      FROM names
    ),
    pairs AS (
      SELECT DISTINCT a.p_name AS a_name, b.p_name AS b_name
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.p_name < b.p_name
      WHERE abs(a.len - b.len) <= 2
    ),
    dists AS (
      SELECT a_name, b_name, levenshtein(a_name, b_name) AS dist
      FROM pairs WHERE levenshtein(a_name, b_name) <= 2
    ),
    sym AS (
      SELECT a_name AS name, b_name AS neighbor, dist FROM dists
      UNION ALL
      SELECT b_name AS name, a_name AS neighbor, dist FROM dists
    ),
    best AS (
      SELECT name, neighbor AS best_match, dist,
             ROW_NUMBER() OVER (PARTITION BY name ORDER BY dist ASC, neighbor ASC) AS rn
      FROM sym
    )
    SELECT name, best_match, CAST(dist AS INT) AS dist FROM best WHERE rn = 1
    """,
    survey="ext:dedup (entity resolution: token-blocked Levenshtein join, argmin canonical probe)",
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closest fuzzy neighbor (edit distance <= 2) for every distinct part
    name: token blocking -> lossless length prune -> banded Levenshtein ->
    deterministic argmin. The blocking predicate is part of the operator
    contract (`operators/fuzzy.py`)."""
    part = load_table(spark, sf_dir, "part")
    out = best_fuzzy_match(part, "p_name", max_distance=2)
    return out.select("name", "best_match", out["dist"].cast("int").alias("dist"))


# Probe phrases: a frequent bigram, a REPEATED-term bigram (exercises the
# countDistinct-offset rule), and a real trigram from the fixture corpus.
PHRASES: list[tuple[int, str]] = [
    (1, "table hash"),
    (2, "small small"),
    (3, "slow hash batch"),
]


def _phrase_oracle() -> str:
    from ..operators.bm25 import TOKEN_PATTERN
    from ..operators.phrase import phrase_rows

    values = ", ".join(
        f"({pid}, '{term}', {off}, {plen})" for pid, term, off, plen in phrase_rows(PHRASES)
    )
    return f"""
    WITH p(phrase_id, term, off, phrase_len) AS (VALUES {values}),
    dt0 AS (
      SELECT doc_id, unnest(lst) AS term, generate_subscripts(lst, 1) - 1 AS pos
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS lst
            FROM documents)
    ),
    dt AS (SELECT * FROM dt0 WHERE term IN (SELECT DISTINCT term FROM p)),
    anchored AS (
      SELECT p.phrase_id, dt.doc_id, dt.pos - p.off AS anchor, p.off, p.phrase_len
      FROM dt JOIN p USING (term)
      WHERE dt.pos - p.off >= 0
    ),
    occ AS (
      SELECT phrase_id, doc_id, anchor
      FROM anchored
      GROUP BY phrase_id, doc_id, anchor, phrase_len
      HAVING COUNT(DISTINCT off) = phrase_len
    )
    SELECT phrase_id, doc_id, COUNT(*) AS n_occurrences
    FROM occ GROUP BY phrase_id, doc_id
    """


# Rotated out of the driver registry in round 14 (slot to one of the r13
# training-data components; retrieval keeps bm25_topk + fuzzy_name_match +
# mmr_rerank_topk driver-checked). SAME oracle, driver-grade compare in
# tests/test_unregistered_batteries.py.
PHRASE_MATCH_ORACLE = _phrase_oracle()


def phrase_match_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim occurrence counts for the probe phrases: posexplode
    positions -> broadcast-semi vocabulary filter -> anchor = pos - offset
    -> one uniform (phrase, doc, anchor) shuffle where countDistinct(offset)
    == phrase_len certifies an occurrence (`operators/phrase.py`)."""
    from ..operators.phrase import phrase_match

    docs = load_table(spark, sf_dir, "documents")
    return phrase_match(docs, PHRASES)

"""BM25 full-text ranking over a document corpus — the lexical-retrieval
counterpart to the embedding ANN family (`operators/similarity.py`).

A large-scale training-data pipeline needs lexical search for three jobs the
vector side can't do alone: decontamination probes ("which training docs
contain these benchmark phrases?"), corpus exploration, and hybrid retrieval
(BM25 candidates re-ranked by embeddings). This module implements the Lucene
BM25 formulation (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond"; the ``+1`` inside the log is Lucene's
always-positive idf variant) as pure DataFrame algebra:

  idf(t)      = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )
  score(q, d) = sum_{t in q} idf(t) * tf_td * (k1 + 1)
                / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

Scale design (the 100 TB story):

* **Query-term pushdown.** The exploded token stream is filtered to the
  query vocabulary BEFORE the tf aggregation, so the one real shuffle
  (``groupBy(doc_id, term)``) carries only postings for query terms — the
  classic inverted-index restriction, expressed declaratively so Catalyst
  pushes the ``isin`` into the scan-side stage.
* **Broadcast statistics.** Corpus size / avgdl is a 1-row aggregate and the
  per-term document frequencies are at most |query vocabulary| rows; both
  join back as broadcasts — no second large shuffle.
* **Salted two-phase top-k.** A window partitioned only by ``query_id``
  funnels every candidate document of a query through one task; with few
  queries over a 100 TB corpus that is THE skew bottleneck. Phase 1 takes a
  local top-k inside ``(query_id, hash(doc) % fanout)`` salt groups (lossless:
  the global top-k is a subset of the union of salt-group top-ks); phase 2
  ranks the surviving ``fanout * k`` rows per query.

Determinism contract with the DuckDB oracle (see ``queries/search.py``):
idf is rounded to 9 decimals on both sides (Java ``Math.log`` and libm
``log`` may differ in the last ulp); per-(query, doc) term contributions are
summed in term order on both sides (Spark: fold over ``array_sort`` of
collected structs; DuckDB: ``SUM(... ORDER BY term)``); the reported score is
rounded to 6 decimals and the ranking key is the rounded score with
``doc_id`` as the deterministic tie-break.

Reference parity: the reference engine has no text retrieval (its J1 cone
search, ``DIA.py:72-77``, is the geometric analog of "find matches for this
probe"); BM25 is part of the training-data extension surface alongside
dedup/ANN.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Word tokens: lowercase alphanumeric runs. Identical semantics in Java regex
# (Spark) and RE2 (DuckDB) — no \w (underscore/unicode membership differs).
TOKEN_PATTERN = "[a-z0-9]+"

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def tokens(col: Column) -> Column:
    """Lowercased word tokens of a text column (array<string>)."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)


def queries_df(spark: SparkSession, queries: Sequence[tuple[int, str]]) -> DataFrame:
    """(query_id, query_text) literals -> exploded (query_id, term) frame.

    Driver-side literal (queries are user input, tiny by construction);
    broadcast at every use site.
    """
    import re as _re

    rows = sorted(
        {
            (qid, term)
            for qid, text in queries
            for term in _re.findall(TOKEN_PATTERN, text.lower())
        }
    )
    # tokenized + deduped driver-side (the queries are literals here anyway) —
    # a distinct on the exploded frame would spend a whole exchange on a
    # <100-row table
    return spark.createDataFrame(rows, "query_id INT, term STRING")


def bm25_scores(
    docs: DataFrame,
    qterms: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """BM25 score for every (query_id, candidate doc) pair.

    ``qterms`` is a (query_id, term) frame (see :func:`queries_df`). A doc is
    a candidate for a query iff it contains >= 1 of the query's terms.
    Returns (query_id, doc_id, score) with the determinism contract from the
    module docstring.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    # 1-row corpus statistics: exact long sum -> one double division.
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("toks")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    postings = (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        # broadcast left-semi: only query-term postings reach the tf shuffle
        # (no distinct on the broadcast side — semi-join semantics dedup)
        .join(F.broadcast(qterms.select("term")), "term", "left_semi")
        .groupBy("doc_id", "term", "dl")  # dl is functionally dependent on doc_id
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))  # <= |vocab| rows

    idf = F.round(
        F.log((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
        9,  # absorb last-ulp ln() differences between JVM and libm
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    )

    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", "term", contrib.alias("contrib"))
    )
    # order-deterministic sum: fold contributions in term order
    return scored.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    qterms: DataFrame,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    fanout: int = 32,
) -> DataFrame:
    """Top-k documents per query by BM25, salted two-phase ranking.

    Returns (query_id, doc_id, score, rank) — score rounded to 6 decimals,
    rank dense over (rounded score desc, doc_id asc).
    """
    scores = bm25_scores(docs, qterms, id_col=id_col, text_col=text_col, k1=k1, b=b)
    key = F.round(F.col("score"), 6)
    # phase 1: lossless local prune inside salt groups (global top-k per query
    # is a subset of the union of per-salt-group top-ks)
    w_local = Window.partitionBy("query_id", F.pmod(F.hash("doc_id"), F.lit(fanout))).orderBy(
        key.desc(), F.col("doc_id").asc()
    )
    pruned = (
        scores.withColumn("rn", F.row_number().over(w_local)).filter(F.col("rn") <= k).drop("rn")
    )
    # phase 2: final rank over <= fanout * k survivors per query
    w = Window.partitionBy("query_id").orderBy(key.desc(), F.col("doc_id").asc())
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", key.alias("score"), "rank")
    )

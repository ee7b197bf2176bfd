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


# ---------------------------------------------------------------------------
# persistent inverted index (build / append / query), mirroring the PQ index
# contract (operators/pq.py build/append/load): artifacts under one root,
# incremental growth encodes ONLY the delta, grown == rebuilt is pinned in
# tests, single-writer appends.

import zlib
from dataclasses import dataclass


@dataclass(frozen=True)
class BM25IndexMeta:
    n_buckets: int


class BM25Index:
    """Directory-backed inverted index:

    * ``postings.parquet`` (hive-partitioned by ``term_bucket``): one row
      per (term, doc) with its tf and the doc's length — the ONLY large
      artifact, and queries read just the partitions holding their terms;
    * ``stats.parquet``: one (n_docs, sum_dl) row PER GENERATION (build +
      each append) — corpus statistics stay mergeable, the query path sums
      them (a bounded aggregate) instead of rewriting a global row;
    * ``meta.parquet``: the bucket count (the write-side and query-side
      bucket function must agree forever).

    Bucketing is ``crc32(term) % n_buckets`` — computed by Spark's
    ``crc32`` at write time and by ``zlib.crc32`` on the driver at query
    time (same CRC-32), so the query plan carries a LITERAL partition
    filter: scanning an index of any size touches only the query terms'
    buckets (PartitionFilters, plan-asserted in tests)."""

    def __init__(self, spark: SparkSession, root: str, meta: BM25IndexMeta):
        self.spark = spark
        self.root = root
        self.meta = meta

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/postings.parquet")

    def stats(self) -> DataFrame:
        """Corpus statistics merged across generations (1-row frame)."""
        gens = self.spark.read.parquet(f"{self.root}/stats.parquet")
        return gens.agg(
            F.sum("n_docs").alias("n_docs"),
            (F.sum("sum_dl").cast("double") / F.sum("n_docs")).alias("avgdl"),
        )


def _doc_postings(docs: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    return (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("term_bucket", F.pmod(F.crc32(F.col("term")), F.lit(n_buckets)).cast("int"))
    )


def _doc_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(tokens(F.col(text_col)).alias("toks")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(F.size("toks")).alias("sum_dl")
    )


def build_bm25_index(
    docs: DataFrame,
    root: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> BM25Index:
    """One corpus scan: tokenize -> tf aggregate -> bucket-partitioned
    postings write, plus the generation-0 stats row and the meta row."""
    spark = docs.sparkSession
    _doc_postings(docs, id_col, text_col, n_buckets).repartition("term_bucket").write.mode(
        "overwrite"
    ).partitionBy("term_bucket").parquet(f"{root}/postings.parquet")
    _doc_stats(docs, id_col, text_col).write.mode("overwrite").parquet(f"{root}/stats.parquet")
    spark.createDataFrame([(n_buckets,)], "n_buckets int").write.mode("overwrite").parquet(
        f"{root}/meta.parquet"
    )
    return BM25Index(spark, root, BM25IndexMeta(n_buckets))


def append_to_bm25_index(
    index: BM25Index,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> BM25Index:
    """Incremental growth: tokenize ONLY the new docs, append their postings
    into the bucket partitions and one new stats generation row. Cost is
    proportional to the delta, never the index. Caller owns id uniqueness
    across generations; single writer assumed (the PQ-index contract)."""
    n_buckets = index.meta.n_buckets
    _doc_postings(new_docs, id_col, text_col, n_buckets).repartition("term_bucket").write.mode(
        "append"
    ).partitionBy("term_bucket").parquet(f"{index.root}/postings.parquet")
    _doc_stats(new_docs, id_col, text_col).write.mode("append").parquet(
        f"{index.root}/stats.parquet"
    )
    return index


def load_bm25_index(spark: SparkSession, root: str) -> BM25Index:
    r = spark.read.parquet(f"{root}/meta.parquet").first()
    return BM25Index(spark, root, BM25IndexMeta(r.n_buckets))


def bm25_index_topk(
    index: BM25Index,
    queries: Sequence[tuple[int, str]],
    k: int = 10,
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    fanout: int = 32,
) -> DataFrame:
    """Top-k per query against the PERSISTED index: the postings scan is
    partition-pruned to the query terms' buckets via a literal filter
    (computed driver-side with the same CRC-32 as the writer), df comes
    from the pruned postings themselves, corpus stats from the mergeable
    generations — no touch of the original corpus."""
    import re as _re

    spark = index.spark
    rows = sorted(
        {
            (qid, term)
            for qid, text in queries
            for term in _re.findall(TOKEN_PATTERN, text.lower())
        }
    )
    if not rows:
        return spark.createDataFrame([], "query_id INT, doc_id LONG, score DOUBLE, rank INT")
    qterms = spark.createDataFrame(rows, "query_id INT, term STRING")
    terms = sorted({t for _, t in rows})
    buckets = sorted({zlib.crc32(t.encode("utf-8")) % index.meta.n_buckets for t in terms})

    postings = (
        index.postings()
        .filter(F.col("term_bucket").isin(buckets))  # literal partition filter
        .filter(F.col("term").isin(terms))
        .select("doc_id", "term", "dl", "tf")
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.round(
        F.log((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
        9,
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(index.stats()))
        .select("query_id", "doc_id", "term", contrib.alias("contrib"))
    )
    scores = scored.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )
    key = F.round(F.col("score"), 6)
    w_local = Window.partitionBy("query_id", F.pmod(F.hash("doc_id"), F.lit(fanout))).orderBy(
        key.desc(), F.col("doc_id").asc()
    )
    pruned = scores.withColumn("rn", F.row_number().over(w_local)).filter(F.col("rn") <= k).drop("rn")
    w = Window.partitionBy("query_id").orderBy(key.desc(), F.col("doc_id").asc())
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", key.alias("score"), "rank")
    )

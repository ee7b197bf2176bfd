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

N and avgdl count INDEXABLE docs only (>= 1 token): zero-token docs carry no
postings, can never match a query, and counting them would make corpus
statistics depend on how much unindexable junk rode along — the batch scan,
the persisted index, and the streaming appender all share this one rule, so
grown == rebuilt holds for corpora containing empty docs.

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
``doc_id`` as the deterministic tie-break. The whole contract lives in ONE
scoring core (:func:`_score_topk`) shared by the corpus-scan and persisted-
index paths, so the pinned indexed == corpus-scan parity cannot drift.

Reference parity: the reference engine has no text retrieval (its J1 cone
search, ``DIA.py:72-77``, is the geometric analog of "find matches for this
probe"); BM25 is part of the training-data extension surface alongside
dedup/ANN.
"""

from __future__ import annotations

import re as _re
import zlib
from dataclasses import dataclass
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


def _query_term_rows(queries: Sequence[tuple[int, str]]) -> list[tuple[int, str]]:
    """Driver-side tokenization + dedup of (query_id, query_text) literals —
    the ONE query-tokenization rule for both retrieval paths."""
    return sorted(
        {
            (qid, term)
            for qid, text in queries
            for term in _re.findall(TOKEN_PATTERN, text.lower())
        }
    )


def queries_df(spark: SparkSession, queries: Sequence[tuple[int, str]]) -> DataFrame:
    """(query_id, query_text) literals -> deduped (query_id, term) frame.

    Tokenized driver-side (the queries are literals here anyway) — a distinct
    on an exploded frame would spend a whole exchange on a <100-row table.
    Broadcast at every use site.
    """
    return spark.createDataFrame(
        _query_term_rows(queries), "query_id INT, term STRING"
    )


def _fold_scores(
    postings: DataFrame,
    qterms: DataFrame,
    stats: DataFrame,
    k1: float,
    b: float,
) -> DataFrame:
    """The ONE scoring definition: (doc_id, term, dl, tf) postings restricted
    to the query vocabulary + a 1-row (n_docs, avgdl) stats frame ->
    (query_id, doc_id, score). Holds the idf/contrib determinism contract
    (9dp idf rounding, term-ordered fold)."""
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


def _score_topk(
    postings: DataFrame,
    qterms: DataFrame,
    stats: DataFrame,
    k: int,
    k1: float,
    b: float,
    fanout: int,
) -> DataFrame:
    """Shared ranking tail over :func:`_fold_scores` (6dp ranking key,
    doc_id tie-break, lossless salted two-phase top-k)."""
    scores = _fold_scores(postings, qterms, stats, k1, b)
    key = F.round(F.col("score"), 6)
    # phase 1: lossless local prune inside salt groups (global top-k per query
    # is a subset of the union of per-salt-group top-ks)
    w_local = Window.partitionBy("query_id", F.pmod(F.hash("doc_id"), F.lit(fanout))).orderBy(
        key.desc(), F.col("doc_id").asc()
    )
    pruned = scores.withColumn("rn", F.row_number().over(w_local)).filter(F.col("rn") <= k).drop("rn")
    # phase 2: final rank over <= fanout * k survivors per query
    w = Window.partitionBy("query_id").orderBy(key.desc(), F.col("doc_id").asc())
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", key.alias("score"), "rank")
    )


def _corpus_postings_and_stats(
    docs: DataFrame, qterms: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Corpus-scan inputs for the scoring core: query-term-restricted
    postings (broadcast left-semi BEFORE the one tf shuffle; no distinct on
    the broadcast side — semi-join semantics dedup) and the 1-row statistics
    frame over INDEXABLE (>= 1 token) docs — one exact long sum, one double
    division (module-docstring rule)."""
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    stats = toks.filter(F.size("toks") > 0).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("toks")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    postings = (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .join(F.broadcast(qterms.select("term")), "term", "left_semi")
        .groupBy("doc_id", "term", "dl")  # dl is functionally dependent on doc_id
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return postings, stats


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
    postings, stats = _corpus_postings_and_stats(docs, qterms, id_col, text_col)
    return _fold_scores(postings, qterms, stats, k1, b)


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
    """Top-k documents per query by BM25 over a corpus scan.

    Returns (query_id, doc_id, score, rank) — score rounded to 6 decimals,
    rank over (rounded score desc, doc_id asc)."""
    postings, stats = _corpus_postings_and_stats(docs, qterms, id_col, text_col)
    return _score_topk(postings, qterms, stats, k, k1, b, fanout)


# ---------------------------------------------------------------------------
# persistent inverted index (build / append / query), mirroring the PQ index
# contract (operators/pq.py build/append/load): artifacts under one root,
# incremental growth costs only the delta, grown == rebuilt is pinned in
# tests, single-writer appends (streaming/bm25_append.py adds the
# crash/retry-safe idempotent variant).


@dataclass(frozen=True)
class BM25IndexMeta:
    n_buckets: int


def doc_bucket_expr(doc_id: Column, n_buckets: int) -> Column:
    """Manifest partition bucket for a doc id (hash, uniform)."""
    return F.pmod(F.crc32(doc_id.cast("string")), F.lit(n_buckets)).cast("int")


class BM25Index:
    """Directory-backed inverted index:

    * ``postings.parquet`` (hive-partitioned by ``term_bucket``): one row
      per (term, doc) with its tf and the doc's length — the ONLY large
      artifact; queries read just the partitions holding their terms.
      Appends may leave duplicate (term, doc) rows after a crash-retry
      (streaming contract) — the query path dedups them and
      ``StreamingBM25Append.compact`` removes them permanently;
    * ``docs.parquet`` (hive-partitioned by ``doc_bucket``): the manifest —
      one (doc_id, dl) row per indexed doc, written LAST by every append
      (the commit point). Presence probes and corpus statistics both read
      it, so a doc "exists" exactly when its append committed;
    * ``stats.parquet``: one (gen_key..., n_docs, sum_dl) row per
      generation — the FAST statistics path (rows = number of appends, not
      corpus size). Generation keys are content-derived (crc-sum of doc
      ids + count + dl sum), so a retried append re-writes the SAME key
      and the reader's dropDuplicates folds it;
    * ``meta.parquet``: the bucket count (write-side and query-side bucket
      functions must agree forever).

    Term bucketing is ``crc32(term) % n_buckets`` — computed by Spark's
    ``crc32`` at write time and ``zlib.crc32`` on the driver at query time
    (same CRC-32), so the query plan carries a LITERAL partition filter:
    scanning an index of any size touches only the query terms' buckets
    (PartitionFilters, plan-asserted in tests)."""

    def __init__(self, spark: SparkSession, root: str, meta: BM25IndexMeta):
        self.spark = spark
        self.root = root
        self.meta = meta

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/postings.parquet")

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/docs.parquet")

    def stats(self) -> DataFrame:
        """Corpus statistics merged across generations (1-row frame).
        Retried-append duplicate generations fold via their content keys."""
        gens = self.spark.read.parquet(f"{self.root}/stats.parquet").dropDuplicates(
            ["crc_sum", "n_docs", "sum_dl"]
        )
        return gens.agg(
            F.sum("n_docs").alias("n_docs"),
            (F.sum("sum_dl").cast("double") / F.sum("n_docs")).alias("avgdl"),
        )


def _doc_postings(docs: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(doc_id, term, dl, tf, term_bucket) rows; zero-token docs produce
    nothing. Input must be unique per doc id (callers dedup)."""
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    return (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("term_bucket", F.pmod(F.crc32(F.col("term")), F.lit(n_buckets)).cast("int"))
    )


def _doc_manifest(docs: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(doc_id, dl, doc_bucket) for the INDEXABLE (>= 1 token) docs."""
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    return (
        toks.select("doc_id", F.size("toks").alias("dl"))
        .filter(F.col("dl") > 0)
        .withColumn("doc_bucket", doc_bucket_expr(F.col("doc_id"), n_buckets))
    )


def _stats_generation(manifest: DataFrame) -> DataFrame:
    """One content-keyed statistics row for a manifest delta: the key
    (crc_sum, n_docs, sum_dl) is deterministic for a given doc set, so a
    crash-retried append reproduces the identical row and readers fold it."""
    return manifest.agg(
        F.coalesce(F.sum(F.crc32(F.col("doc_id").cast("string"))), F.lit(0)).alias("crc_sum"),
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
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
    postings write, plus the doc manifest, the generation-0 stats row and
    the meta row. Caller owns doc-id uniqueness (batch contract)."""
    spark = docs.sparkSession
    _doc_postings(docs, id_col, text_col, n_buckets).repartition("term_bucket").write.mode(
        "overwrite"
    ).partitionBy("term_bucket").parquet(f"{root}/postings.parquet")
    manifest = _doc_manifest(docs, id_col, text_col, n_buckets)
    manifest.repartition("doc_bucket").write.mode("overwrite").partitionBy(
        "doc_bucket"
    ).parquet(f"{root}/docs.parquet")
    _stats_generation(manifest).write.mode("overwrite").parquet(f"{root}/stats.parquet")
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
    """Incremental growth: tokenize ONLY the new docs, append their postings,
    manifest rows (the commit point) and one stats generation. Cost is
    proportional to the delta, never the index. Caller owns id uniqueness
    across generations; single writer (the PQ-index contract) — the
    streaming binding (`streaming/bm25_append.py`) adds the idempotent
    retry-safe variant."""
    n_buckets = index.meta.n_buckets
    _doc_postings(new_docs, id_col, text_col, n_buckets).repartition("term_bucket").write.mode(
        "append"
    ).partitionBy("term_bucket").parquet(f"{index.root}/postings.parquet")
    manifest = _doc_manifest(new_docs, id_col, text_col, n_buckets)
    _stats_generation(manifest).write.mode("append").parquet(f"{index.root}/stats.parquet")
    manifest.repartition("doc_bucket").write.mode("append").partitionBy("doc_bucket").parquet(
        f"{index.root}/docs.parquet"
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
    spark = index.spark
    rows = _query_term_rows(queries)
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
        # crash-retried streaming appends can duplicate a (term, doc) row
        # (rows are bit-identical); dedup the PRUNED set — bounded by the
        # query vocabulary's postings, never the index
        .dropDuplicates(["term", "doc_id"])
    )
    return _score_topk(postings, qterms, index.stats(), k, k1, b, fanout)

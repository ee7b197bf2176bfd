"""Multi-vector (late-interaction) retrieval — the ColBERT scoring
family (Khattab & Zaharia, SIGIR 2020: "ColBERT: Efficient and Effective
Passage Search via Contextualized Late Interaction"): a document is a BAG
of token vectors, a query is a bag of token vectors, and the relevance
score is MaxSim — for each query token, the maximum similarity over the
document's tokens, summed over query tokens. The retrieval quality of
token-level matching at a fraction of cross-encoder cost; the missing
member next to the single-vector family in operators/similarity.py.

Representation: a ``token_vecs`` column of type ``array<array<float>>``
(row-bounded like a document's tokens — the same boundedness every text
operator assumes). Both operators L2-normalize every token vector ONCE
per side (zero-norm/NaN tokens dropped, rows with no usable token
dropped), so the inner products ARE cosines and no per-pair norm is
recomputed.

Scale shape — two stages, like every ANN family here:

* :func:`maxsim_topk` — exact: broadcast queries x one corpus scan, the
  nested max/sum fold entirely in JVM higher-order functions, then the
  engine's per-query top-k window. Per-pair cost is
  |q_tokens| x |d_tokens| x dim, so this is the small-query-set /
  re-rank-quality baseline (the role brute_force_topk plays for single
  vectors).
* :func:`maxsim_rerank` — the production shape: a first-stage retriever
  (pooled-vector ANN — exact_topk/IVF/LSH over mean-pooled embeddings)
  supplies bounded candidate pairs; MaxSim re-scores ONLY those. The
  corpus is never all-pairs scored; candidates x tokens is the bounded
  work, exactly how deployed ColBERT systems run (ANN over token/pooled
  index -> late-interaction re-rank).

Determinism: token dot products are the ordered left fold of
similarity.dot_fold (bit-identical to DuckDB's list_dot_product), scores
rounded to ``round_digits`` before ranking, ties broken by smallest
neighbor id — the registry contract, so the DuckDB re-derivation in
tests/test_multivector.py is driver-grade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread
from .similarity import dot_fold


def _unit_tokens(col: Column) -> Column:
    """array<array<double>> of L2-normalized token vectors; zero-norm /
    NaN tokens dropped (cosine is undefined for them — the
    brute_force_topk degenerate-vector guard applied per token). A bag
    MIXING token dimensions goes NULL as a whole: array_max skips NULL
    elements, so a mixed bag would otherwise be PARTIALLY scored
    (mismatched tokens silently ignored) instead of honouring the
    one-dimension-everywhere family contract — with the guard, every
    pair is either fully scored or fully dropped."""
    def norm2(v: Column) -> Column:
        return F.aggregate(
            v,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )

    normalized = F.transform(
        col,
        lambda v: F.when(
            (norm2(v) > 0) & ~F.isnan(norm2(v)),
            F.transform(
                v, lambda x: x.cast("double") / F.sqrt(norm2(v))
            ),
        ),
    )
    kept = F.filter(normalized, lambda v: v.isNotNull())
    return F.when(
        F.size(F.array_distinct(F.transform(kept, F.size))) <= 1, kept
    )


def _maxsim(qtoks: Column, dtoks: Column, round_digits: int) -> Column:
    """sum over query tokens of max over doc tokens of <t, u> (unit
    vectors -> cosine); per-token maxima rounded before the ordered sum
    so both engines accumulate identical terms."""
    per_q = F.transform(
        qtoks,
        lambda t: F.round(
            F.array_max(F.transform(dtoks, lambda u: dot_fold(t, u))),
            round_digits,
        ),
    )
    return F.aggregate(per_q, F.lit(0.0), lambda acc, x: acc + x)


def maxsim_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vecs_col: str = "token_vecs",
    id_col: str = "doc_id",
    round_digits: int = 9,
) -> DataFrame:
    """Exact late-interaction top-k: (query_id, neighbor_id,
    maxsim_score, rank) — every query token matched against every
    document token, summed, per-query top-k with min-id tie-break.
    Queries are broadcast (small by contract); the corpus is scanned
    once with zero shuffle until the top-k window. Rows whose token bag
    is empty after the degenerate-token guard are dropped on both
    sides."""
    corpus = _spread(corpus, id_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _unit_tokens(F.col(vecs_col)).alias("qtoks"),
    ).filter(F.size("qtoks") > 0)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _unit_tokens(F.col(vecs_col)).alias("dtoks"),
    ).filter(F.size("dtoks") > 0)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _maxsim(F.col("qtoks"), F.col("dtoks"), round_digits),
                round_digits,
            ).alias("maxsim_score"),
        )
        # mismatched token DIMENSIONS across a pair make zip_with pad
        # with NULL and the fold go NULL — drop those pairs explicitly
        # (the family contract is one dimension everywhere, like the
        # single-vector operators) instead of letting NULL rows ride
        # into rank positions
        .filter(F.col("maxsim_score").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("maxsim_score"), F.asc("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def maxsim_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vecs_col: str = "token_vecs",
    id_col: str = "doc_id",
    round_digits: int = 9,
) -> DataFrame:
    """Late-interaction re-rank of first-stage candidates — the
    production two-stage shape: ``candidates`` is (query_id,
    neighbor_id) from any retriever (pooled-vector ANN, BM25, a fusion),
    and ONLY those pairs pay the token-level MaxSim. Returns the same
    schema as :func:`maxsim_topk`, ranked within each query's candidate
    set.

    Scale shape: two broadcast-able joins attach the token bags (the
    query side is small by contract; the candidate frame is
    |queries| x first-stage-k, bounded); the corpus is touched only for
    candidate ids — with a bucketed/partitioned corpus layout that join
    prunes to the candidate partitions. No all-pairs work anywhere."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _unit_tokens(F.col(vecs_col)).alias("qtoks"),
    ).filter(F.size("qtoks") > 0)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _unit_tokens(F.col(vecs_col)).alias("dtoks"),
    ).filter(F.size("dtoks") > 0)
    # first stages may be FUSED (pooled ANN + BM25 + ...) and overlap:
    # a duplicated pair would be scored twice and occupy two adjacent
    # rank slots with identical rows, displacing a real candidate
    pairs = (
        candidates.select("query_id", "neighbor_id")
        .distinct()
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = (
        pairs.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _maxsim(F.col("qtoks"), F.col("dtoks"), round_digits),
                round_digits,
            ).alias("maxsim_score"),
        )
        .filter(F.col("maxsim_score").isNotNull())  # cross-dim pairs (see maxsim_topk)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("maxsim_score"), F.asc("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def token_ivf_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    n_probe: int = 2,
    max_candidates: int | None = None,
    vecs_col: str = "token_vecs",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-level IVF candidate generation — the first stage of scaled
    late interaction (the shape ColBERTv2/PLAID systems use: an ANN index
    over TOKEN vectors, not pooled document vectors, so a document is a
    candidate when ANY of its tokens lives near ANY query token's cell):
    every corpus token is assigned to its nearest centroid (broadcast
    map-side argmax — ``similarity._nearest_centroids`` n=1), every query
    token probes its ``n_probe`` nearest cells, and candidates are the
    distinct (query_id, neighbor_id) pairs sharing a cell — returned with
    ``n_hits`` (the number of query-token x doc-cell co-occurrences, a
    cheap relevance prior). ``max_candidates`` caps each query's
    candidate set by (n_hits desc, neighbor_id asc) through the
    engine's two-phase top-k.

    ``centroids`` is (cluster, centroid) over UNIT vectors (token vectors
    are unit-normalized here, so L2-nearest == cosine-nearest); train
    them once on a token sample and reuse — the cells are the index.

    Scale shape: the exploded token table is |docs| x |tokens| rows —
    the real ColBERT index cardinality — but it is reduced to DISTINCT
    (doc, cell) pairs before the probe join, the centroid table is
    broadcast everywhere, and the probe join shuffles only (id, cell)
    pairs. No vector ever crosses an exchange after assignment."""
    from .similarity import _nearest_centroids

    if n_probe < 1:
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    cents = centroids.select(
        "cluster", F.col("centroid").alias("_cvec")
    )

    # every TOKEN gets its own composite id (doc id, token position):
    # _nearest_centroids groups/partitions by the id, so a plain doc id
    # would collapse a document's whole bag to its single best token —
    # a doc with tokens in different cells must register every cell
    def toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(_unit_tokens(F.col(vecs_col))).alias("_pos", "_tok"),
        ).select(F.struct("_id", "_pos").alias("_vid"), F.col("_tok").alias("_v"))

    doc_cells = (
        _nearest_centroids(toks(corpus), cents, n=1, id_alias="_tid")
        .select(F.col("_tid._id").alias("neighbor_id"), "cluster")
        .distinct()
    )
    probe_cells = _nearest_centroids(
        toks(queries), cents, n=n_probe, id_alias="_tid"
    ).select(F.col("_tid._id").alias("query_id"), "cluster")
    hits = (
        probe_cells.join(doc_cells, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    if max_candidates is None:
        return hits
    if max_candidates < 1:
        raise ValueError(f"max_candidates must be >= 1, got {max_candidates}")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_hits"), F.asc("neighbor_id")
    )
    return (
        hits.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_candidates)
        .drop("_r")
    )


def maxsim_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    max_candidates: int | None = None,
    vecs_col: str = "token_vecs",
    id_col: str = "doc_id",
    round_digits: int = 9,
) -> DataFrame:
    """The assembled two-stage late-interaction retriever:
    :func:`token_ivf_candidates` (token-cell recall) ->
    :func:`maxsim_rerank` (exact MaxSim on the bounded candidate set).
    Same output schema as :func:`maxsim_topk`; recall vs the exact
    operator depends on the centroid grid and ``n_probe`` exactly like
    the single-vector IVF family — measure it with
    ``similarity.ann_recall`` against :func:`maxsim_topk` when tuning."""
    cands = token_ivf_candidates(
        corpus,
        queries,
        centroids,
        n_probe=n_probe,
        max_candidates=max_candidates,
        vecs_col=vecs_col,
        id_col=id_col,
    )
    return maxsim_rerank(
        cands,
        corpus,
        queries,
        k=k,
        vecs_col=vecs_col,
        id_col=id_col,
        round_digits=round_digits,
    )


def pool_tokens(
    df: DataFrame,
    vecs_col: str = "token_vecs",
    id_col: str = "doc_id",
    out_col: str = "embedding",
) -> DataFrame:
    """Mean-pool a token bag into ONE vector (id, out_col) — the bridge
    from the multi-vector representation to the entire single-vector ANN
    family (exact_topk / IVF / LSH / PQ / quantized): pool once, index
    with any of them as the first stage, then :func:`maxsim_rerank` the
    candidates. Tokens are unit-normalized before averaging (so a long
    token doesn't dominate the pool) and the mean is the ordered fold;
    rows with no usable token are dropped. Pure per-row column algebra —
    rides the scan, zero shuffle."""
    t = F.col("_t")
    summed = F.aggregate(
        t,
        F.transform(
            F.sequence(F.lit(1), F.size(F.element_at(t, 1))),
            lambda _: F.lit(0.0),
        ),
        lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x),
    )
    return (
        df.select(F.col(id_col), _unit_tokens(F.col(vecs_col)).alias("_t"))
        .filter(F.size("_t") > 0)
        .select(
            id_col,
            F.transform(summed, lambda x: x / F.size(t)).alias(out_col),
        )
    )

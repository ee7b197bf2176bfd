"""Maximal-marginal-relevance (MMR) diversified re-ranking.

The re-rank stage of a retrieval pipeline: given each query's bounded
candidate set (the top-N of BM25 / ANN / RRF — N is tens-to-hundreds by
construction), greedily select k items maximizing

    mmr(d) = lam * rel(d) - (1 - lam) * max_{s in S} cos(d, s)

(Carbonell & Goldstein 1998). lam=1 reproduces the plain relevance
ranking; smaller lam trades relevance for diversity.

Spark-first shape: the greedy loop is k driver-orchestrated rounds of
pure DataFrame algebra — no Python touches row data:

* argmax per query via ``min_by`` over a (-mmr, doc) struct (one
  uniform-key aggregation; deterministic smaller-doc tiebreak that works
  for ANY orderable doc-id type — strings included — because only the
  double mmr is negated). NaN mmr sorts GREATEST under min_by's struct
  order, so a NaN-scored row loses every round instead of winning them
  (the inverse of the max_by(NaN) hazard brute_force_topk guards);
* the per-round picks frame is |Q| rows -> broadcast back onto the
  candidates to update each survivor's running max-similarity with one
  ``greatest`` (the incremental identity: max over S grows one element
  per round, so no re-scan of S). The cosine is guarded: zero-norm /
  NULL / NaN vectors yield NULL similarity (never an ANSI
  divide-by-zero, never a NaN), and ``greatest`` skips NULLs, so a
  degenerate pick leaves survivors' maxsim unchanged rather than
  poisoning the next round's objective;
* lineage pinned per round (checkpoint.pin) so the plan stays O(1)
  deep — the dedup_clusters/BFS iterative convention.

At 100 TB the frame size is |queries| x N candidates — the corpus never
enters; cost scales with the query load, not the table. Each round is
one shuffle of the shrinking candidate frame plus a broadcast join.

No reference analog; beyond-reference completeness next to
operators/fusion.py (RRF) and operators/evals.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import pin
from .similarity import safe_cosine


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.5,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "vec",
    dim: int | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Greedy MMR selection of k items per query. Returns
    ``(query_col, doc_col, score_col, mmr_score, mmr_rank)`` with
    mmr_rank 1..k in selection order (queries with fewer than k
    candidates return them all).

    ``candidates`` must be one row per (query, doc) with a relevance
    score and the doc's embedding vector; scores should be on a
    comparable scale to cosine (normalize upstream if mixing, e.g.
    min-max per query) — the operator uses them as given.

    ``round_digits`` rounds each pairwise similarity before it enters
    the running max — the engine-order-independence convention
    (queries/__init__.py) that makes the greedy selection reproducible
    bit-for-bit by an ANSI-SQL oracle on another engine. None (default)
    keeps raw doubles.
    """
    if k < 1:
        raise ValueError("mmr_rerank: k must be >= 1")
    if not (0.0 <= lam <= 1.0):
        raise ValueError("mmr_rerank: lam must be in [0, 1]")

    # pin the candidate frame once at entry: round 1's argmax and the
    # survivor-update chain both consume it, and without the cut each
    # embeds the caller's (often expensive — a full ANN retrieval)
    # candidate-generation subtree as its own copy
    cands = candidates.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(score_col).cast("double").alias("rel"),
        F.col(vec_col).alias("vec"),
        F.lit(None).cast("double").alias("maxsim"),
    ).transform(pin, eager=False)
    selected: DataFrame | None = None
    for t in range(1, k + 1):
        # round-t objective; maxsim is NULL until the first pick with a
        # well-defined similarity to this row (degenerate vectors never
        # set it — see similarity.safe_cosine)
        mmr = F.when(
            F.col("maxsim").isNull(), F.lit(lam) * F.col("rel")
        ).otherwise(
            F.lit(lam) * F.col("rel")
            - F.lit(1.0 - lam) * F.col("maxsim")
        )
        scored = cands.withColumn("mmr", mmr)
        # argmax key: -mmr ascending. NULL mmr (NULL relevance score) must
        # LOSE, but NULL sorts SMALLEST in min_by's ascending struct order
        # — coalesce it to +inf so it sorts last (it still fills trailing
        # ranks once every scored candidate is taken). NaN needs no guard
        # here: -NaN is NaN, which sorts GREATEST ascending, i.e. loses.
        negmmr = F.coalesce(-F.col("mmr"), F.lit(float("inf")))
        picks = scored.groupBy("query_id").agg(
            F.min_by(
                F.struct("doc_id", "vec", "rel", "mmr"),
                F.struct(negmmr.alias("negmmr"), F.col("doc_id")),
            ).alias("p")
        )
        round_rows = picks.select(
            "query_id",
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.rel").alias("rel"),
            F.col("p.mmr").alias("mmr_score"),
            F.lit(t).alias("mmr_rank"),
        )
        selected = (
            round_rows
            if selected is None
            else selected.unionByName(round_rows)
        )
        if t == k:
            break
        pvec = picks.select(
            "query_id",
            F.col("p.doc_id").alias("__pdoc"),
            F.col("p.vec").alias("__pvec"),
        )
        cands = (
            cands.join(F.broadcast(pvec), "query_id")
            .filter(F.col("doc_id") != F.col("__pdoc"))
            # greatest() skips NULLs: a degenerate pick (NULL similarity)
            # leaves maxsim as-is, and maxsim stays NULL — "no similarity
            # observed yet", routing mmr to its lam*rel branch — until a
            # real similarity arrives. No -inf sentinel to overflow.
            .withColumn(
                "maxsim",
                F.greatest(
                    F.col("maxsim"),
                    safe_cosine(F.col("vec"), F.col("__pvec"), dim)
                    if round_digits is None
                    else F.round(
                        safe_cosine(F.col("vec"), F.col("__pvec"), dim),
                        round_digits,
                    ),
                ),
            )
            .drop("__pdoc", "__pvec")
        )
        cands = pin(cands, eager=False)
    return selected.select(
        F.col("query_id").alias(query_col),
        F.col("doc_id").alias(doc_col),
        F.col("rel").alias(score_col),
        "mmr_score",
        "mmr_rank",
    )

"""Maximal-marginal-relevance (MMR) diversified re-ranking.

The re-rank stage of a retrieval pipeline: given each query's bounded
candidate set (the top-N of BM25 / ANN / RRF — N is tens-to-hundreds by
construction), greedily select k items maximizing

    mmr(d) = lam * rel(d) - (1 - lam) * max_{s in S} cos(d, s)

(Carbonell & Goldstein 1998). lam=1 reproduces the plain relevance
ranking; smaller lam trades relevance for diversity.

Spark-first shape (r14): ONE aggregation. Because the candidate set is
bounded per query *by construction*, each query's greedy loop is local
computation — so the operator collects each query's candidates into an
array (`groupBy(query_id).agg(collect_list(...))`, map-side combined)
and runs all k greedy rounds inside a single JVM ``aggregate`` fold
over that array: argmax by a (−mmr, doc_id) struct key via
``array_min`` (NaN objectives sort GREATEST and lose; NULL objectives
are coalesced to +inf so they fill only the trailing ranks), then one
``greatest`` update of each survivor's running max-similarity with the
pick (``safe_cosine`` yields NULL for degenerate vectors and
``greatest`` skips NULLs, so a degenerate pick leaves maxsim unchanged
rather than poisoning the next round's objective).

This replaced k driver-orchestrated rounds of DataFrame algebra
(still available as :func:`_mmr_rerank_rounds` — the equivalence
regression test in tests/test_mmr_rerank.py compares the two pick-for-
pick): same IEEE arithmetic in the same order, same argmax key, same
NULL/NaN gates, but one shuffle of the candidate frame instead of k,
and one Spark job instead of ~3 per round. At 100 TB the frame size is
|queries| x N candidates — the corpus never enters; cost scales with
the query load, not the table, and queries parallelize freely across
tasks instead of serializing on k driver round-trips.

No reference analog; beyond-reference completeness next to
operators/fusion.py (RRF) and operators/evals.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import safe_cosine


def _validate(k: int, lam: float) -> None:
    if k < 1:
        raise ValueError("mmr_rerank: k must be >= 1")
    if not (0.0 <= lam <= 1.0):
        raise ValueError("mmr_rerank: lam must be in [0, 1]")


def _let(value: Column, body) -> Column:
    """Single-evaluation let-binding in expression land: bind ``value``
    to a lambda variable via a one-element ``transform`` so ``body`` can
    reference it many times as a cheap variable lookup. The expression
    interpreter has no common-subexpression elimination — without the
    binding, every reference to an O(N) subexpression (e.g. the
    ``array_min`` argmax below) re-evaluates it, and a reference inside
    a per-element lambda re-evaluates it PER ELEMENT, turning one
    greedy round from O(N) into O(N^2) (measured 6x wall on the mmr
    bench shape). ``transform`` maps NULL inputs too, so a NULL value
    still reaches ``body`` for its own NULL handling."""
    return F.element_at(F.transform(F.array(value), body), 1)


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
    _validate(k, lam)

    bags = (
        candidates.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            F.col(score_col).cast("double").alias("rel"),
            F.col(vec_col).alias("vec"),
        )
        .groupBy("query_id")
        .agg(F.collect_list(F.struct("doc_id", "rel", "vec")).alias("cs"))
    )

    def _mmr_of(c: Column) -> Column:
        # round-t objective; maxsim is NULL until the first pick with a
        # well-defined similarity to this row (degenerate vectors never
        # set it — see similarity.safe_cosine)
        return F.when(c["maxsim"].isNull(), F.lit(lam) * c["rel"]).otherwise(
            F.lit(lam) * c["rel"] - F.lit(1.0 - lam) * c["maxsim"]
        )

    def _sim(a: Column, b: Column) -> Column:
        s = safe_cosine(a, b, dim)
        return s if round_digits is None else F.round(s, round_digits)

    # working element: candidate + running maxsim (NULL = "no similarity
    # observed yet", routing mmr to its lam*rel branch)
    remaining0 = F.transform(
        F.col("cs"),
        lambda c: F.struct(
            c["doc_id"].alias("doc_id"),
            c["rel"].alias("rel"),
            c["vec"].alias("vec"),
            F.lit(None).cast("double").alias("maxsim"),
        ),
    )
    # typed empty selection array, derived from the data so doc_id keeps
    # the caller's type (strings included) without a schema literal
    selected0 = F.filter(
        F.transform(
            F.col("cs"),
            lambda c: F.struct(
                c["doc_id"].alias("doc_id"),
                c["rel"].alias("rel"),
                F.lit(None).cast("double").alias("mmr_score"),
                F.lit(0).alias("mmr_rank"),
            ),
        ),
        lambda _c: F.lit(False),
    )

    def _round(acc: Column, t: Column) -> Column:
        rem = acc["remaining"]
        # argmax key: -mmr ascending, smaller-doc tiebreak. NULL mmr
        # (NULL relevance) must LOSE — coalesce it to +inf so it sorts
        # last (still filling trailing ranks once every scored candidate
        # is taken). NaN needs no guard: -NaN is NaN, which sorts
        # GREATEST in Spark's total order, i.e. loses. Any residual tie
        # falls through to the remaining struct fields — irrelevant for
        # well-formed inputs, where doc_id is unique per query.
        keyed = F.transform(
            rem,
            lambda c: F.struct(
                F.coalesce(-_mmr_of(c), F.lit(float("inf"))).alias("negmmr"),
                c["doc_id"].alias("tb"),
                _mmr_of(c).alias("mmr"),
                c.alias("c"),
            ),
        )

        def _apply(best: Column) -> Column:
            new_selected = F.concat(
                acc["selected"],
                F.array(
                    F.struct(
                        best["c"]["doc_id"].alias("doc_id"),
                        best["c"]["rel"].alias("rel"),
                        best["mmr"].alias("mmr_score"),
                        t.cast("int").alias("mmr_rank"),
                    )
                ),
            )
            # greatest() skips NULLs: a degenerate pick (NULL
            # similarity) leaves each survivor's maxsim as-is — no
            # -inf sentinel.
            new_remaining = F.transform(
                F.filter(rem, lambda c: c["doc_id"] != best["c"]["doc_id"]),
                lambda c: F.struct(
                    c["doc_id"].alias("doc_id"),
                    c["rel"].alias("rel"),
                    c["vec"].alias("vec"),
                    F.greatest(
                        c["maxsim"], _sim(c["vec"], best["c"]["vec"])
                    ).alias("maxsim"),
                ),
            )
            return F.when(best.isNull(), acc).otherwise(
                F.struct(
                    new_remaining.alias("remaining"),
                    new_selected.alias("selected"),
                )
            )

        # the argmax is O(N); _let binds it once per round — referencing
        # it directly from the per-element lambdas would re-run it per
        # element (no CSE in the interpreter; see _let)
        return _let(F.array_min(keyed), _apply)

    picked = F.aggregate(
        F.sequence(F.lit(1), F.lit(k)),
        F.struct(remaining0.alias("remaining"), selected0.alias("selected")),
        _round,
        lambda acc: acc["selected"],
    )
    return bags.select("query_id", F.explode(picked).alias("p")).select(
        F.col("query_id").alias(query_col),
        F.col("p.doc_id").alias(doc_col),
        F.col("p.rel").alias(score_col),
        F.col("p.mmr_score").alias("mmr_score"),
        F.col("p.mmr_rank").alias("mmr_rank"),
    )


def _mmr_rerank_rounds(
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
    """The pre-r14 k-driver-round implementation, kept as the reference
    for the equivalence regression test (tests/test_mmr_rerank.py): the
    same greedy selection as :func:`mmr_rerank`, expressed as k rounds
    of DataFrame algebra — argmax per query via ``min_by`` over a
    (-mmr, doc) struct, |Q|-row picks broadcast back onto the
    candidates, lineage pinned per round. Semantically identical; the
    production path folds all rounds into one aggregation."""
    from ..checkpoint import pin

    _validate(k, lam)

    cands = candidates.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(score_col).cast("double").alias("rel"),
        F.col(vec_col).alias("vec"),
        F.lit(None).cast("double").alias("maxsim"),
    ).transform(pin, eager=False)
    selected: DataFrame | None = None
    for t in range(1, k + 1):
        mmr = F.when(
            F.col("maxsim").isNull(), F.lit(lam) * F.col("rel")
        ).otherwise(
            F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("maxsim")
        )
        scored = cands.withColumn("mmr", mmr)
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

"""Fuzzy string matching: edit-distance joins with token blocking.

Entity resolution over a 100 TB catalog (dedup of product names, author
strings, URLs-as-titles) cannot evaluate Levenshtein over the cross product —
the standard industrial shape (Ebraheem 2018 "Distributed Representations of
Tuples for Entity Resolution"; the blocking literature back to Fellegi-Sunter)
is **block, then verify**:

1. **Block**: explode each string into its word tokens and equi-join on the
   token — candidate pairs share at least one exact token. This is the same
   inverted-index move as `operators/dedup.py` n-gram Jaccard, so the plan is
   shuffle-on-token (uniform small keys), never a cartesian.
2. **Prune**: ``abs(len(a) - len(b)) <= d`` is a lossless Levenshtein lower
   bound — applied before the distinct-pair shuffle.
3. **Verify**: ``levenshtein(a, b) <= d`` on the surviving pairs only. Spark's
   thresholded ``levenshtein(l, r, threshold)`` early-exits the DP at
   ``threshold`` (banded O(d * n) instead of O(n^2)).

The blocking predicate is PART OF THE OPERATOR CONTRACT (exactly like
`minhash_lsh_candidates`' banding): a pair is reported iff it shares a word
token AND is within edit distance ``d``. For multi-token strings where edits
are confined to a minority of tokens (the entity-resolution case) this is
equivalent to the unblocked join; `tests/test_fuzzy.py` measures recall vs
the exact cross product on the small fixture. Skew note: a token shared by a
large fraction of the corpus (a stop-word brand like "inc") makes its block
quadratic — ``block_cap`` drops tokens whose block exceeds the cap, the same
hot-key guard as n-gram Jaccard's ``df_cap``.

No Python UDFs: tokenization, blocking, length pruning and Levenshtein are
all native column expressions (whole-stage codegen end to end).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# engine-wide whitespace class (identical in Java regex and RE2; see
# queries/text.py) — \s differs between the engines on \x0b
WHITESPACE = "[ \t\r\n\f]+"


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), WHITESPACE)


def _rare_prefix(
    toks: DataFrame,
    name_col: str,
    max_distance: int,
    freq: Optional[DataFrame] = None,
) -> DataFrame:
    """LOSSLESS Ed-Join-style prefix blocking (Xiao et al. 2008, word-token
    form): keep only each string's ``2*d + 1`` globally RAREST tokens as
    blocking keys.

    Why lossless: one character edit touches at most 2 word tokens (an
    edit at a space merges/splits neighbors), so two strings within edit
    distance ``d`` share all but <= 2d of either side's tokens; under ONE
    global total order (document frequency asc, token asc) the classic
    prefix-filter lemma then guarantees their (2d+1)-prefixes intersect.
    Rare tokens are the discriminative ones, so the survivors of this cut
    are exactly the blocks worth probing — on a skewed vocabulary the
    candidate-pair shuffle shrinks by the frequency of the common tokens
    that no longer block (the "inc"/"corp" problem solved losslessly,
    where ``block_cap`` solves it approximately).

    Cost: one token-frequency aggregation + one per-string window — both
    uniform-key shuffles; the quadratic pair join they shrink dominates
    at any interesting scale. ``toks`` must carry (name_col, *, tok).

    ``freq`` overrides the (tok, _df) order table — two-sided joins MUST
    pass one table spanning both sides, because losslessness requires a
    single global order."""
    k = 2 * max_distance + 1
    # DISTINCT tokens per string: the lemma needs the k rarest distinct
    # tokens — a repeated token must not eat prefix slots
    toks = toks.distinct()
    if freq is None:
        freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy(name_col).orderBy(F.col("_df").asc(), F.col("tok").asc())
    return (
        toks.join(freq, "tok")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_df", "_rn")
    )


def fuzzy_self_join(
    names: DataFrame,
    name_col: str,
    max_distance: int = 2,
    *,
    block_cap: Optional[int] = None,
    prefix_blocking: bool = False,
) -> DataFrame:
    """Unordered pairs (a_name < b_name) of rows within ``max_distance`` edits
    that share >= 1 word token. Input should be distinct on ``name_col``
    (callers dedup first — clone rows are exact-dedup's job, distance 0 here
    only arises for distinct-but-equal-after-lower strings).

    ``prefix_blocking=True`` blocks only on each string's ``2*d+1`` rarest
    tokens — IDENTICAL output (see :func:`_rare_prefix` for the lemma),
    strictly fewer candidate pairs; the default stays off so the simplest
    plan remains the reference shape.

    Returns (a_name, b_name, dist).
    """
    toks = names.select(F.col(name_col).alias("a_name")).distinct()
    toks = toks.select(
        "a_name", F.length("a_name").alias("a_len"), F.explode(_tokens(F.col("a_name"))).alias("tok")
    )
    if block_cap is not None:
        # hot-token guard: drop blocks that would go quadratic (documented
        # approximation knob, same semantics as dedup.py df_cap)
        sizes = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        toks = toks.join(
            F.broadcast(sizes.filter(F.col("n") > block_cap).select("tok")), "tok", "left_anti"
        )
    if prefix_blocking:
        toks = _rare_prefix(toks, "a_name", max_distance)
    other = (
        toks.select(
            F.col("a_name").alias("b_name"), F.col("a_len").alias("b_len"), F.col("tok").alias("tok")
        )
    )
    pairs = (
        toks.join(other, "tok")
        .filter(
            (F.col("a_name") < F.col("b_name"))
            & (F.abs(F.col("a_len") - F.col("b_len")) <= max_distance)  # lossless LB prune
        )
        .select("a_name", "b_name")
        .distinct()
    )
    dist = F.levenshtein(F.col("a_name"), F.col("b_name"), max_distance)
    return (
        pairs.withColumn("dist", dist)
        .filter(F.col("dist") >= 0)  # thresholded levenshtein: -1 == above threshold
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    *,
    block_cap: Optional[int] = None,
    prefix_blocking: bool = False,
) -> DataFrame:
    """Two-sided token-blocked edit-distance join over the DISTINCT values
    of the two string columns. ``prefix_blocking`` as in
    :func:`fuzzy_self_join` (lossless; the global token order spans BOTH
    sides via one shared frequency table).

    Returns (l_value, r_value, dist) — every distinct value pair sharing a
    word token with ``levenshtein <= max_distance``. Value-level by design
    (string matching is independent of row identity, so verifying once per
    distinct pair is strictly cheaper); callers re-attach their rows with an
    equi-join on the matched value.
    """
    l = left.select(F.col(left_col).alias("l_value")).distinct()
    r = right.select(F.col(right_col).alias("r_value")).distinct()
    lt = l.select("l_value", F.length("l_value").alias("l_len"), F.explode(_tokens(F.col("l_value"))).alias("tok"))
    rt = r.select("r_value", F.length("r_value").alias("r_len"), F.explode(_tokens(F.col("r_value"))).alias("tok"))
    if block_cap is not None:
        sizes = rt.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        hot = F.broadcast(sizes.filter(F.col("n") > block_cap).select("tok"))
        lt = lt.join(hot, "tok", "left_anti")
        rt = rt.join(hot, "tok", "left_anti")
    if prefix_blocking:
        freq = (
            lt.select("l_value", "tok").distinct().select("tok")
            .unionAll(rt.select("r_value", "tok").distinct().select("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("_df"))
        )
        lt = _rare_prefix(lt, "l_value", max_distance, freq)
        rt = _rare_prefix(rt, "r_value", max_distance, freq)
    pairs = (
        lt.join(rt, "tok")
        .filter(F.abs(F.col("l_len") - F.col("r_len")) <= max_distance)
        .select("l_value", "r_value")
        .distinct()
    )
    dist = F.levenshtein(F.col("l_value"), F.col("r_value"), max_distance)
    return pairs.withColumn("dist", dist).filter(F.col("dist") >= 0)


def best_fuzzy_match(
    names: DataFrame,
    name_col: str,
    max_distance: int = 2,
    *,
    block_cap: Optional[int] = None,
    prefix_blocking: bool = False,
) -> DataFrame:
    """For every distinct name, its single closest fuzzy neighbor (min edit
    distance, ties broken by lexicographically smallest neighbor) — the
    canonical entity-resolution probe ("what is this probably a variant
    of?"). Names with no neighbor within ``max_distance`` are omitted.

    Returns (name, best_match, dist). Deterministic: the argmin is a
    row_number window over (dist asc, neighbor asc).
    """
    pairs = fuzzy_self_join(
        names,
        name_col,
        max_distance,
        block_cap=block_cap,
        prefix_blocking=prefix_blocking,
    )
    # symmetric closure WITHOUT a self-union: explode each pair into its two
    # directed views in one pass (a union would re-plan the whole blocking
    # subtree — 2x the scans in the static plan)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("a_name").alias("name"), F.col("b_name").alias("neighbor")),
                F.struct(F.col("b_name").alias("name"), F.col("a_name").alias("neighbor")),
            )
        ).alias("e"),
        "dist",
    ).select("e.name", "e.neighbor", "dist")
    w = Window.partitionBy("name").orderBy(F.col("dist").asc(), F.col("neighbor").asc())
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name", F.col("neighbor").alias("best_match"), "dist")
    )

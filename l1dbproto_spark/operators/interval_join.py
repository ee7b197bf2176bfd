"""Interval-overlap join — the temporal analog of the pixel-envelope range
join (SURVEY.md J5; reference `apdb.py` region scans refine a coarse pixel
envelope the same way this refines a coarse time bucket).

Spark has no native band/range join, and the naive formulation
(``a.start <= b.end AND b.start <= a.end``) plans as a broadcast
nested-loop or cartesian product — quadratic at scale. The standard
distributed strategy implemented here:

1. quantize time into fixed-width buckets; each interval explodes to the
   buckets it covers (explode factor = interval length / bucket width,
   bounded by construction — pick the width near the MEDIAN interval
   length so most intervals land in 1-2 buckets);
2. hash-join on bucket (+ any extra equi keys: tenant, region, nation) —
   a plain shuffled equi-join Catalyst/AQE can size and skew-handle;
3. refine with the exact overlap predicate;
4. de-duplicate WITHOUT a distinct shuffle: a pair overlapping k shared
   buckets is emitted only from the canonical bucket containing
   ``greatest(l_start, r_start)`` — the overlap's first instant — which
   both sides compute locally, so exactly one bucket survives per pair.

At 100 TB the win over the naive plan is the usual envelope-join
argument: the shuffle carries each row O(len/width) times instead of
pairing everything with everything, and AQE handles hot buckets (a
bucket holding a majority of intervals) with skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucketed(
    df: DataFrame,
    start: str,
    end: str,
    width: float,
    side: str,
) -> DataFrame:
    """Explode one side to its covered bucket ids (inclusive bounds)."""
    lo = F.floor(F.col(start) / F.lit(width)).cast("long")
    hi = F.floor(F.col(end) / F.lit(width)).cast("long")
    # explicit step=1: without it Spark generates a DESCENDING sequence
    # for an inverted interval (end < start), silently bucketing garbage;
    # with it the executor raises "Illegal sequence boundaries" — loud
    # failure inside the scan task, no extra validation job
    return df.withColumn(
        f"_{side}bucket", F.explode(F.sequence(lo, hi, F.lit(1)))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: float,
    extra_on: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Join rows whose CLOSED intervals ``[l_start, l_end]`` and
    ``[r_start, r_end]`` overlap (touching endpoints count), using the
    bucket-join + canonical-bucket dedup strategy above.

    Interval bounds are numeric (cast timestamps to epoch seconds first —
    see :func:`overlapping_order_windows` for the pattern); ``extra_on``
    adds equi-key pairs ``(left_col, right_col)`` that co-partition the
    bucket join. Output: all left columns + all right columns (names must
    not collide), one row per overlapping pair.

    Inverted intervals (end < start) fail the executing task loudly (the
    step-1 sequence raises) instead of silently joining nothing — at
    100 TB a silent no-match reads as data loss, and a validation
    pre-scan would cost two extra jobs. NULL bounds, by contrast, are an
    UNDEFINED interval: the null sequence explodes to no buckets and the
    row joins nothing (pinned by test) — the usual SQL null-predicate
    semantics, not an error."""
    lb = _bucketed(left, l_start, l_end, bucket_width, "l")
    rb = _bucketed(right, r_start, r_end, bucket_width, "r")
    on: Column = lb["_lbucket"] == rb["_rbucket"]
    for lcol, rcol in extra_on or []:
        on = on & (lb[lcol] == rb[rcol])
    overlap = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    canonical = F.col("_lbucket") == F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / F.lit(bucket_width)
    ).cast("long")
    return (
        lb.join(rb, on)
        .filter(overlap & canonical)
        .drop("_lbucket", "_rbucket")
    )


def overlapping_order_windows(
    orders: DataFrame,
    window_days: int = 14,
    bucket_days: int = 14,
) -> DataFrame:
    """Demonstration analytic on the orders table: pairs of DIFFERENT
    customers in the same order-priority class whose ``window_days``
    attention windows ``[o_orderdate, o_orderdate + window_days]``
    overlap — the co-active-customers question every campaign-attribution
    pipeline asks.

    Output: ``a_orderkey, b_orderkey, a_custkey, b_custkey, priority,
    overlap_days`` with ``a_orderkey < b_orderkey`` (each pair once)."""
    day = 86400.0
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.unix_timestamp("o_orderdate").cast("double").alias("w_start"),
        (F.unix_timestamp("o_orderdate") + F.lit(window_days * day)).alias("w_end"),
    )
    a = base.select(
        F.col("o_orderkey").alias("a_orderkey"),
        F.col("o_custkey").alias("a_custkey"),
        F.col("o_orderpriority").alias("a_priority"),
        F.col("w_start").alias("a_start"),
        F.col("w_end").alias("a_end"),
    )
    b = base.select(
        F.col("o_orderkey").alias("b_orderkey"),
        F.col("o_custkey").alias("b_custkey"),
        F.col("o_orderpriority").alias("b_priority"),
        F.col("w_start").alias("b_start"),
        F.col("w_end").alias("b_end"),
    )
    joined = interval_overlap_join(
        a,
        b,
        "a_start",
        "a_end",
        "b_start",
        "b_end",
        bucket_width=bucket_days * day,
        extra_on=[("a_priority", "b_priority")],
    )
    return (
        joined.filter(
            (F.col("a_orderkey") < F.col("b_orderkey"))
            & (F.col("a_custkey") != F.col("b_custkey"))
        )
        .select(
            "a_orderkey",
            "b_orderkey",
            "a_custkey",
            "b_custkey",
            F.col("a_priority").alias("priority"),
            (
                (
                    F.least(F.col("a_end"), F.col("b_end"))
                    - F.greatest(F.col("a_start"), F.col("b_start"))
                )
                / F.lit(day)
            )
            .cast("long")
            .alias("overlap_days"),
        )
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    p_col: str,
    i_start: str,
    i_end: str,
    bucket_width: float,
    extra_on: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Join each point to every CLOSED interval containing it
    (``i_start <= p <= i_end``) — temporal containment, the complement of
    :func:`interval_overlap_join` (as-of join answers "latest before";
    this answers "which windows cover t").

    Same bucket strategy, simpler dedup: only the INTERVAL side explodes
    (a point has exactly one bucket), so each (point, interval) pair
    meets in exactly one bucket and needs no canonical-bucket filter.
    ``extra_on`` adds ``(point_col, interval_col)`` equi keys. Output:
    all point columns + all interval columns (names must not collide)."""
    pb = points.withColumn(
        "_pbucket", F.floor(F.col(p_col) / F.lit(bucket_width)).cast("long")
    )
    ib = _bucketed(intervals, i_start, i_end, bucket_width, "i")
    on: Column = pb["_pbucket"] == ib["_ibucket"]
    for pcol, icol in extra_on or []:
        on = on & (pb[pcol] == ib[icol])
    contained = (F.col(i_start) <= F.col(p_col)) & (F.col(p_col) <= F.col(i_end))
    return pb.join(ib, on).filter(contained).drop("_pbucket", "_ibucket")

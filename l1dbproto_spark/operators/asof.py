"""As-of join — the temporal join Spark lacks natively (SURVEY.md §2.3 notes
the reference has none either; it's table stakes for a time-series engine).

Implemented with the union + window trick rather than per-group
``pd.merge_asof``: tag both sides, union, and carry the right side's payload
forward with ``last(..., ignorenulls=True)`` over a rows-unbounded-preceding
window per key. Fully shuffle-based (one partitionBy(key) sort), no Python —
scales to arbitrarily large sides, unlike a broadcast/merge_asof approach.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right.ts <= left.ts`` and equal ``by`` keys (inclusive as-of backward
    join). Right rows sort before left rows at equal timestamps, so an
    exactly-simultaneous right row matches.

    ``tie_break``: extra right-side ordering column — among equal-ts right
    rows the one with the greatest tie_break wins (deterministic).

    NULL semantics follow SQL equality: a right row with a NULL key or
    NULL timestamp can never match (it is excluded from the union — the
    window partition would otherwise group null keys TOGETHER, silently
    matching them, which SQL's `l.key = r.key` never does). Left rows
    with NULL keys/ts are preserved with NULL payloads.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    for c in payload_cols:
        l = l.withColumn(f"_p_{c}", F.lit(None).cast(right.schema[c].dataType))
    # tie_break must be aliased out of the ORIGINAL right (it is usually not
    # a by/ts/payload column, so selecting it after the narrowing select
    # would silently yield NULL — non-deterministic equal-ts resolution).
    rsel = [
        *by,
        ts_col,
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        F.lit(0).alias("_side"),
    ]
    if tie_break is not None:
        rsel.append(F.col(tie_break).alias("_tb"))
        l = l.withColumn("_tb", F.lit(None).cast(right.schema[tie_break].dataType))
    # SQL-equality null semantics: un-matchable right rows out up front
    unmatchable = [F.col(c).isNull() for c in [*by, ts_col]]
    matchable = ~unmatchable[0]
    for cond in unmatchable[1:]:
        matchable = matchable & ~cond
    r = right.filter(matchable).select(*rsel)
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if tie_break is not None:
        # nulls LAST: left rows (_tb is NULL) must sort after equal-ts right
        # rows or the inclusive as-of contract breaks; among equal-ts right
        # rows ascending _tb makes the greatest tie_break win via last().
        order.insert(1, F.col("_tb").asc_nulls_last())
    u = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *lcols,
        F.col("_side"),
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")

"""Event-analytics operators — sequential funnels, cohort retention, and
rolling-window anomaly scoring over an event stream.

These are the classic product-analytics queries a warehouse engine is asked
to run over the same event tables the training-data pipeline ingests
(reference analog: the per-visit counting/aggregation family, SURVEY.md
A1-A6, generalized from one visit cadence to arbitrary user timelines).

Scale shape: every operator here is one shuffle on the entity key (user,
customer) followed by driver-tiny aggregation — the per-entity windows all
share the single partitionBy exchange, so adding stages/offsets widens the
plan, not the shuffle count. Nothing collects more than the final
per-stage / per-cohort summary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user sequential funnel timestamps: one ``t{i}`` column per stage,
    where ``t0 = min ts of stage 0`` and ``t{i} = min ts of stage i that is
    STRICTLY AFTER t{i-1}`` — the standard ordered-funnel semantics (a
    purchase before the first click does not count).

    All stage columns ride ONE unordered per-user window partition (chained
    ``min(when(...))`` over the same partitionBy), so the whole funnel costs
    a single hash exchange regardless of stage count."""
    w = Window.partitionBy(user_col)
    df = events
    prev: Column | None = None
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        df = df.withColumn(f"t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(f"t{i}")
    tcols = [f"t{i}" for i in range(len(stages))]
    return df.groupBy(user_col).agg(*[F.min(c).alias(c) for c in tcols])


def funnel_conversion(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: one row per stage with the number of users who
    reached it in order and the conversion rate vs the first stage.

    Output: ``stage_idx int, stage string, n_users long, pct_of_first
    double`` (rate rounded to 6dp; exact long counts divided once in
    double, so both engines agree bit-for-bit)."""
    per_user = funnel_times(events, stages, user_col, ts_col, type_col)
    counts = per_user.agg(
        *[F.count(f"t{i}").alias(f"c{i}") for i in range(len(stages))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col(f"c{i}").alias("n_users"),
            )
            for i, stage in enumerate(stages)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r"), F.col("c0"))
        .select(
            F.col("r.stage_idx").alias("stage_idx"),
            F.col("r.stage").alias("stage"),
            F.col("r.n_users").alias("n_users"),
            # c0=0 guard: an empty first stage must yield NULL rates, not
            # an ANSI divide-by-zero task failure
            F.when(
                F.col("c0") > 0, F.round(F.col("r.n_users") / F.col("c0"), 6)
            ).alias("pct_of_first"),
        )
    )


def cohort_retention(
    orders: DataFrame,
    user_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Monthly cohort retention: cohort = month of the user's first event;
    for each (cohort, month offset) count the distinct cohort users active
    in that month and their share of the cohort.

    Output: ``cohort_month timestamp, month_offset long, n_active long,
    retention_rate double`` (offset-0 row is the cohort size, rate 1.0).

    Plan: one per-user window min (hash exchange on user) -> one
    (cohort, offset) distinct-count aggregation; the offset-0 sizes frame
    is months-count tiny and broadcast back for the rate division.

    ``approx=True`` swaps the exact distinct count for HLL
    (``approx_count_distinct`` at relative std dev ``rsd``): the exact
    form's distinct expansion re-shuffles every (cohort, offset, user)
    triple, the sketch form map-side-combines to one fixed-size register
    set per (cohort, offset) — at 100 TB that is the difference between
    a user-cardinality shuffle and a few KB per group. Rates then carry
    the same ~rsd error (tested <= 3*rsd on the fixture)."""
    w = Window.partitionBy(user_col)
    acts = (
        orders.withColumn("_first_ts", F.min(ts_col).over(w))
        .select(
            F.col(user_col).alias("_user"),
            F.date_trunc("month", F.col("_first_ts")).alias("cohort_month"),
            (
                F.months_between(
                    F.date_trunc("month", F.col(ts_col)),
                    F.date_trunc("month", F.col("_first_ts")),
                )
            )
            .cast("long")
            .alias("month_offset"),
        )
        .groupBy("cohort_month", "month_offset")
        .agg(
            (
                F.approx_count_distinct(F.col("_user"), rsd)
                if approx
                else F.count_distinct(F.col("_user"))
            ).alias("n_active")
        )
    )
    sizes = acts.filter(F.col("month_offset") == 0).select(
        "cohort_month", F.col("n_active").alias("_cohort_size")
    )
    return (
        acts.join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("_cohort_size"), 6).alias(
                "retention_rate"
            ),
        )
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    n_prev: int = 10,
    min_n: int = 5,
    z_thresh: float = 2.0,
) -> DataFrame:
    """Rolling-window anomaly score: for each row, z-score of ``val_col``
    against the mean/std of the previous ``n_prev`` rows of the same key
    (strictly preceding — the row never scores against itself), flagged
    when ``|z| > z_thresh``. Rows with fewer than ``min_n`` predecessors or
    zero variance get a NULL score.

    Determinism: the window sums are exact DECIMAL(18,2) accumulations
    (value and value^2), so mean/variance come out of ONE double division
    each — engine-order-independent, DuckDB-matchable to the rounded 6dp.
    The frame is rows-based over (ts, id) so ties order identically."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-n_prev, -1)
    )
    d = F.col(val_col).cast("decimal(18,2)")
    n = F.count(val_col).over(w)
    s1 = F.sum(d).over(w).cast("double")
    s2 = F.sum(d * d).over(w).cast("double")
    nn = n.cast("double")
    mean = s1 / nn
    # sample variance from exact sums; guarded against n<min_n and the
    # zero-variance window (constant history) where z is undefined
    var = (s2 - (s1 * s1) / nn) / (nn - F.lit(1.0))
    z = F.when(
        (n >= min_n) & (var > 0),
        F.round((F.col(val_col) - mean) / F.sqrt(var), 6),
    )
    return df.select(
        id_col,
        key_col,
        ts_col,
        val_col,
        z.alias("zscore"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(z_thresh)).alias("is_anomaly"),
    )

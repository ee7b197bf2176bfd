"""Skew-mitigation operators: salting for hot keys.

At 100 TB a handful of hot keys (a popular user, a stop-phrase shingle, a
dense sky region) can pin a shuffle partition. AQE's skew-join handles the
join case at runtime; these helpers cover the *aggregation* case and the
explicit-salt join when AQE is unavailable (e.g. bucketed tables).

Semantics are exactly those of the unsalted operation — the salt is an
internal partial-aggregation key, removed by the final combine. The oracle
query in queries/relational2.py pins this equivalence.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation with an explicit salt: stage 1 aggregates on
    (keys + salt) — hot keys spread over n_salts reducers — stage 2 combines
    partials on the true keys.

    ``aggs`` maps output column name -> stage-1 aggregate expression. Stage 2
    re-combines with SUM for sums/counts and MIN/MAX for min/max; callers
    needing averages combine sum+count themselves (the decomposable-aggregate
    contract every distributed combiner has)."""
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    # recombine: sums/counts add; min/min, max/max — infer from the name
    combos = []
    for name in aggs:
        if name.startswith("min_"):
            combos.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            combos.append(F.max(name).alias(name))
        else:
            combos.append(F.sum(name).alias(name))
    return stage1.groupBy(*keys).agg(*combos)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side
    n_salts times, join on (key, salt). Use when the dim side is small-ish
    but above the broadcast threshold and the fact side has hot keys."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts)
    fact_salted = facts.withColumn("_salt", F.spark_partition_id() % n_salts)
    return fact_salted.join(dim_rep, [key, "_salt"]).drop("_salt")


def skew_report(
    df: DataFrame,
    keys: Sequence[str],
    top_k: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Diagnose key skew before choosing a strategy: one aggregation pass
    over (keys) producing the ``top_k`` heaviest keys each annotated with
    the distribution context —

    ``keys..., n_rows, share`` (fraction of all rows), ``skew_ratio``
    (this key's count / mean key count), and ``suggested_salts`` (how many
    salt partitions bring the key under ``target_rows_per_task`` rows per
    task — 1 means salting buys nothing).

    Scale shape: the per-key count is the same single shuffle the real
    aggregation would pay; totals ride along as window-free scalar
    aggregates re-broadcast through a 1-row join, and the top-k is a
    TakeOrdered, so the report costs one exchange + one broadcast however
    many keys exist. Run it on a SAMPLE at 100 TB — shares and ratios are
    scale-free, and ``suggested_salts`` accepts the sample factor through
    ``target_rows_per_task``."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("_total")).alias("share"),
            (
                F.col("n_rows")
                / (F.col("_total") / F.col("_n_keys"))
            ).alias("skew_ratio"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("n_rows") / F.lit(target_rows_per_task)),
            ).cast("int").alias("suggested_salts"),
        )
        .orderBy(F.desc("n_rows"), *keys)
        .limit(top_k)
    )

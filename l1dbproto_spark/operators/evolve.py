"""Schema evolution for long-lived corpus tables: conform a frame to a
TARGET schema with an explicit, auditable action plan — the migration
step every 100 TB backfill runs when a producer added, dropped, retyped,
or reordered columns across snapshot generations.

Philosophy matches the ingest contract (sources/jsonl.py): nothing
silent. Every column gets a declared action (``pass`` / ``cast`` /
``add_null`` / ``drop`` / ``error``), casts are ``try_cast`` (a value
that cannot convert becomes NULL — one bad value costs one cell, never
the task), and ``cast_loss_report`` counts exactly how many non-NULL
values each cast nulled, per column, in ONE scan — so a retype that
silently zeroes a column is a number in a report, not a surprise three
pipelines later.

Scale: ``evolve_schema`` is a pure projection (rides the scan, zero
shuffle); the loss report is one aggregation over the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ON_EXTRA = ("drop", "keep", "error")


def _target(schema: T.StructType | str) -> T.StructType:
    return T.StructType.fromDDL(schema) if isinstance(schema, str) else schema


def evolve_schema(
    df: DataFrame,
    target: T.StructType | str,
    on_extra: str = "drop",
) -> tuple[DataFrame, list[dict]]:
    """(conformed frame, action plan). The frame has exactly the target
    columns in target order (plus the source's extra columns appended
    when ``on_extra='keep'``); the plan is one dict per column:
    ``{"column", "action", "from", "to"}`` with action in ``pass``
    (name+type match), ``cast`` (try_cast — lossy values become NULL,
    measure with :func:`cast_loss_report`), ``add_null`` (missing in the
    source), ``drop``/``keep`` (extra in the source). ``on_extra='error'``
    raises on the first extra column — the strict-producer contract."""
    if on_extra not in _ON_EXTRA:
        raise ValueError(f"on_extra must be one of {_ON_EXTRA}, got {on_extra!r}")
    tgt = _target(target)
    src_types = {f.name: f.dataType for f in df.schema.fields}
    plan: list[dict] = []
    cols = []
    for f in tgt.fields:
        if f.name not in src_types:
            plan.append(
                {"column": f.name, "action": "add_null", "from": None,
                 "to": f.dataType.simpleString()}
            )
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif src_types[f.name] == f.dataType:
            plan.append(
                {"column": f.name, "action": "pass",
                 "from": f.dataType.simpleString(),
                 "to": f.dataType.simpleString()}
            )
            cols.append(F.col(f.name))
        else:
            plan.append(
                {"column": f.name, "action": "cast",
                 "from": src_types[f.name].simpleString(),
                 "to": f.dataType.simpleString()}
            )
            cols.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
    extras = [c for c in df.columns if c not in {f.name for f in tgt.fields}]
    if extras and on_extra == "error":
        raise ValueError(
            f"source has columns not in the target schema: {extras} "
            "(on_extra='error')"
        )
    for name in extras:
        plan.append(
            {"column": name, "action": on_extra,
             "from": src_types[name].simpleString(), "to": None}
        )
        if on_extra == "keep":
            cols.append(F.col(name))
    return df.select(*cols), plan


def cast_loss_report(
    df: DataFrame, target: T.StructType | str
) -> DataFrame:
    """(column, n_values, n_lost, loss_ratio) for every column the
    evolution would CAST: n_lost counts source values that are non-NULL
    but try_cast to NULL — the exact rows a lossy retype damages. One
    aggregation over one scan, no shuffle beyond the final 1-row-per-
    column reduce; run it BEFORE committing a backfill."""
    tgt = _target(target)
    src_types = {f.name: f.dataType for f in df.schema.fields}
    casts = [
        f
        for f in tgt.fields
        if f.name in src_types and src_types[f.name] != f.dataType
    ]
    if not casts:
        return df.sparkSession.createDataFrame(
            [], "column string, n_values long, n_lost long, loss_ratio double"
        )
    aggs = []
    for f in casts:
        src = F.col(f.name)
        lost = src.isNotNull() & src.try_cast(f.dataType).isNull()
        aggs.append(F.count(src).alias(f"_n_{f.name}"))
        aggs.append(
            F.sum(lost.cast("long")).alias(f"_l_{f.name}")
        )
    wide = df.agg(*aggs)
    # Unpivot the 1-row wide aggregate with ONE explode — a union of
    # per-column selects over `wide` would re-plan the scan+aggregation
    # subtree once per cast column (verified: no ReusedExchange), turning
    # a 20-column retype into 20 corpus scans.
    rows = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f.name).alias("column"),
                        F.col(f"_n_{f.name}").alias("n_values"),
                        F.col(f"_l_{f.name}").alias("n_lost"),
                    )
                    for f in casts
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        "column",
        "n_values",
        "n_lost",
        F.when(
            F.col("n_values") > 0,
            F.col("n_lost").cast("double") / F.col("n_values"),
        )
        .otherwise(F.lit(0.0))
        .alias("loss_ratio"),
    )

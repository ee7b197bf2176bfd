"""Declarative data-quality checks — a Deequ-style constraint suite that
verifies a table in ONE aggregation pass and returns the verdicts as a
DataFrame (so at 100 TB the whole suite costs a single scan, not a scan
per check).

A suite is a list of named constraints, each contributing one metric
expression (a ratio or a count) and a [lo, hi] acceptance band. ``run``
computes every metric in one ``agg`` over the table, unpivots the 1-row
result with ``stack``, joins the (tiny, broadcast) constraint-band table,
and emits ``(check, metric, lo, hi, passed)``. Referential-integrity
checks need a second relation, so they run as their own join-backed
aggregation and union into the same report — still one job per referenced
table, never one per check.

The ingest gate for a training pipeline: run the suite on each new data
drop, fail the drop if ``failures(report)`` is non-empty, keep the report
rows as the drop's audit record (the attribute-store pattern of
operators/attributes.py applies unchanged).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class _Constraint:
    name: str
    metric: Column
    lo: float
    hi: float


def _ratio(pred: Column) -> Column:
    """Fraction of rows satisfying pred — avg over an indicator, null-safe
    (a NULL predicate counts as unsatisfied). 0-row tables yield NULL,
    which ``run`` maps to a failed check rather than a silent pass."""
    return F.avg(F.when(pred, 1.0).otherwise(0.0))


class CheckSuite:
    """Accumulate constraints, then ``run(df)`` -> report DataFrame."""

    def __init__(self) -> None:
        self._constraints: list[_Constraint] = []
        self._referential: list[tuple[str, str, DataFrame, str, float]] = []
        self._schema_expected: dict[str, str] | None = None

    # -- constraint builders (all return self for chaining) ----------------

    def _add(self, name: str, metric: Column, lo: float, hi: float):
        if any(c.name == name for c in self._constraints):
            raise ValueError(f"duplicate check name: {name}")
        self._constraints.append(_Constraint(name, metric, lo, hi))
        return self

    def completeness(self, col: str, min_ratio: float = 1.0):
        """Fraction of rows with ``col`` non-null."""
        return self._add(
            f"completeness({col})",
            _ratio(F.col(col).isNotNull()),
            min_ratio,
            1.0,
        )

    def uniqueness(self, *cols: str, min_ratio: float = 1.0, approx: bool = False):
        """distinct(cols) / count — 1.0 means a perfect key. ``approx=True``
        swaps the exact distinct for HLL (approx_count_distinct): at 100 TB
        the exact form is a full distinct shuffle on the key, the HLL form
        is fixed-size registers merged map-side — use it with a min_ratio
        slightly under the intended bound (HLL rsd defaults to 5%)."""
        name = f"uniqueness({','.join(cols)})"
        d = (
            F.approx_count_distinct(F.struct(*[F.col(c) for c in cols]))
            if approx
            else F.count_distinct(*[F.col(c) for c in cols])
        )
        # HLL can overestimate past 1.0, so only the approx form opens the
        # upper bound; the exact form keeps the tight [min_ratio, 1] band
        hi = float("inf") if approx else 1.0
        return self._add(name, d / F.count(F.lit(1)), min_ratio, hi)

    def in_range(self, col: str, lo: float, hi: float, min_ratio: float = 1.0):
        """Fraction of non-null values inside [lo, hi]."""
        return self._add(
            f"in_range({col})",
            _ratio(F.col(col).between(lo, hi)),
            min_ratio,
            1.0,
        )

    def matches(self, col: str, pattern: str, min_ratio: float = 1.0):
        """Fraction of rows whose ``col`` matches the regex."""
        return self._add(
            f"matches({col})",
            _ratio(F.col(col).rlike(pattern)),
            min_ratio,
            1.0,
        )

    def in_set(self, col: str, values, min_ratio: float = 1.0):
        """Fraction of rows whose ``col`` is one of ``values``."""
        return self._add(
            f"in_set({col})",
            _ratio(F.col(col).isin(list(values))),
            min_ratio,
            1.0,
        )

    def satisfies(self, name: str, predicate: Column, min_ratio: float = 1.0):
        """Arbitrary row predicate satisfaction rate under a caller name."""
        return self._add(f"satisfies({name})", _ratio(predicate), min_ratio, 1.0)

    def row_count(self, min_rows: int = 1, max_rows: float = math.inf):
        return self._add(
            "row_count",
            F.count(F.lit(1)).cast("double"),
            float(min_rows),
            float(max_rows),
        )

    def mean_between(self, col: str, lo: float, hi: float):
        return self._add(f"mean({col})", F.avg(F.col(col)), lo, hi)

    def schema(self, expected: dict[str, str]):
        """Expected columns present with expected Spark SQL types — pure
        metadata (evaluated from df.schema at ``run`` time, NO scan).
        Metric = fraction of expected (name, type) pairs satisfied."""
        if self._schema_expected is not None:
            raise ValueError("duplicate check name: schema")
        self._schema_expected = dict(expected)
        return self

    def referential(
        self,
        col: str,
        ref: DataFrame,
        ref_col: str,
        min_ratio: float = 1.0,
        name: str | None = None,
    ):
        """Fraction of non-null ``col`` values present in ``ref.ref_col``.
        Runs as its own aggregation (needs the second relation); the
        reference key set is deduplicated before the join so a fat
        dimension cannot multiply rows."""
        nm = name or f"referential({col})"
        if any(n == nm for n, *_ in self._referential):
            raise ValueError(f"duplicate check name: {nm}")
        self._referential.append((nm, col, ref, ref_col, min_ratio))
        return self

    # -- execution ----------------------------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        """(check, metric, lo, hi, passed) — one scan for all single-table
        constraints plus one join-aggregation per referential check. A NULL
        metric (empty table) fails the check explicitly."""
        if (
            not self._constraints
            and not self._referential
            and self._schema_expected is None
        ):
            raise ValueError("empty check suite")
        spark = df.sparkSession
        parts: list[DataFrame] = []
        if self._schema_expected is not None:
            actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            ok = sum(
                1
                for name, typ in self._schema_expected.items()
                if actual.get(name) == typ
            )
            metric = ok / len(self._schema_expected)
            parts.append(
                spark.createDataFrame(
                    [("schema", float(metric), 1.0, 1.0)],
                    "check STRING, metric DOUBLE, lo DOUBLE, hi DOUBLE",
                )
            )
        if self._constraints:
            wide = df.agg(
                *[
                    c.metric.cast("double").alias(f"m{i}")
                    for i, c in enumerate(self._constraints)
                ]
            )
            stack_args = ", ".join(
                f"'{c.name.replace(chr(39), '')}', m{i}"
                for i, c in enumerate(self._constraints)
            )
            long = wide.select(
                F.expr(
                    f"stack({len(self._constraints)}, {stack_args}) "
                    "AS (check, metric)"
                )
            )
            bands = spark.createDataFrame(
                [
                    (c.name.replace("'", ""), float(c.lo), float(min(c.hi, 1e308)))
                    for c in self._constraints
                ],
                "check STRING, lo DOUBLE, hi DOUBLE",
            )
            parts.append(long.join(F.broadcast(bands), "check"))
        for nm, col, ref, ref_col, min_ratio in self._referential:
            keys = ref.select(F.col(ref_col).alias("__ref_key")).distinct()
            hit = (
                df.filter(F.col(col).isNotNull())
                .join(keys, F.col(col) == F.col("__ref_key"), "left")
                .agg(
                    _ratio(F.col("__ref_key").isNotNull())
                    .cast("double")
                    .alias("metric")
                )
                .select(
                    F.lit(nm).alias("check"),
                    "metric",
                    F.lit(float(min_ratio)).alias("lo"),
                    F.lit(1.0).alias("hi"),
                )
            )
            parts.append(hit)
        report = parts[0]
        for p in parts[1:]:
            report = report.unionByName(p)
        return report.withColumn(
            "passed",
            F.coalesce(
                F.col("metric").between(F.col("lo"), F.col("hi")), F.lit(False)
            ),
        )


def failures(report: DataFrame) -> DataFrame:
    """The failed rows of a ``CheckSuite.run`` report (ingest-gate form:
    fail the drop when this is non-empty)."""
    return report.filter(~F.col("passed"))

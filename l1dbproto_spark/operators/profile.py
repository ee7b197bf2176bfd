"""One-pass column profiler — the discovery half of the data-quality story.

``operators/checks.py`` verifies a table against constraints you already
know; ``profile`` is how you learn them: one aggregation pass over the
table emits a long-format stats frame with a row per column
(completeness, distinct cardinality, numeric min/max/mean, string length
stats), the Deequ ``ColumnProfiler`` shape re-expressed as pure Spark
column algebra.

Scale contract (the part that matters at 100 TB):

* ``approx=False`` computes exact distinct counts. Spark plans multiple
  ``count(DISTINCT ...)`` aggregates over one input via an ``Expand``
  node — one SCAN, but the scanned rows are replicated once per distinct
  aggregate before the shuffle. Exact mode on k columns therefore
  shuffles ~(k+1)x the table. That is the honest price of
  hash-checkable cardinalities and it is the mode the registered oracle
  row pins.
* ``approx=True`` swaps every distinct for ``approx_count_distinct``
  (HyperLogLog): fixed-size registers merged map-side, a plain
  single-Exchange aggregation regardless of column count. This is the
  100 TB default; rsd defaults to 5%.
* Everything else (counts, min/max, exact-decimal means, length stats)
  is a plain partial-aggregable expression — map-side combine, one
  1-row result, no second job. The long format is produced by
  ``stack`` over the 1-row wide aggregate, so reshaping costs nothing.

Determinism: means are exact-decimal sums divided once in double
(the registry's determinism contract), min/max are exact picks, so every
emitted metric is order-independent and oracle-hashable. Mean uses
DECIMAL(38,9) accumulation — exact for |x| < 1e29, which every
analytics column here satisfies; a column beyond that range should be
profiled with ``mean=False``.

Reference parity: generalizes the per-table stats the reference prints in
its monitoring path (l1dbproto's mon/metrics counters) to arbitrary
tables; no reference analog computes column profiles — this is part of
the beyond-reference engine-completeness surface next to CheckSuite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# long-format output: one row per profiled column
_OUT_FIELDS = (
    "col_name",  # string
    "dtype",  # string (Spark simpleString)
    "n_nonnull",  # long
    "n_distinct",  # long (exact or HLL per `approx`)
    "min_num",  # double (numeric/timestamp columns; NULL otherwise)
    "max_num",  # double
    "mean_num",  # double (exact-decimal mean; NULL for non-numeric)
    "min_len",  # long (string columns; NULL otherwise)
    "max_len",  # long
    "avg_len",  # double (exact integer-sum mean length)
)


def _is_fractional(dt: T.DataType) -> bool:
    return isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType))


def _sql_str(s: str, raw_literals: bool) -> str:
    """``s`` as a Spark SQL string literal. Column NAMES and type
    simpleStrings both reach the stack() expression as literals; quoting
    is what keeps a quote-bearing column name or struct-field type from
    breaking out of the string (expression injection). Backslash escapes
    hold only in the parser's default mode — under
    ``spark.sql.parser.escapedStringLiterals=true`` (Hive-style raw
    strings) a quote cannot be escaped at all, so quote-bearing values
    are REJECTED there instead of mis-parsed."""
    if raw_literals:
        if "'" in s:
            raise ValueError(
                "profile: column/type names containing ' are not "
                "representable under spark.sql.parser.escapedStringLiterals"
                f"=true: {s!r}"
            )
        return "'" + s + "'"
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _num_col(name: str, dt: T.DataType) -> F.Column | None:
    """A double-valued view of the column for min/max/mean, or None."""
    c = F.col(name)
    if isinstance(dt, T.NumericType):
        return c.cast("double")
    if isinstance(dt, T.BooleanType):
        return c.cast("double")
    if isinstance(dt, T.DateType):
        return c.cast("timestamp").cast("double")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # epoch seconds incl. fraction; NTZ goes via TIMESTAMP, a numeric
        # identity under the engine's UTC sessions (catalog.py contract)
        return c.cast("timestamp").cast("double")
    return None


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column stats in one aggregation pass; see module docstring.

    Returns ``(col_name, dtype, n_rows, n_nonnull, n_distinct, min_num,
    max_num, mean_num, min_len, max_len, avg_len)`` with one row per
    profiled column, ordered by ``col_name`` on read-out (the frame
    itself is unordered like any DataFrame).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    missing = [c for c in columns if c not in fields]
    if missing:
        raise ValueError(f"profile: no such columns: {missing}")
    if not columns:
        raise ValueError("profile: columns must be non-empty")
    raw = (
        df.sparkSession.conf.get(
            "spark.sql.parser.escapedStringLiterals", "false"
        ).lower()
        == "true"
    )

    aggs: list[F.Column] = [F.count(F.lit(1)).alias("n_rows")]
    per_col_exprs: list[str] = []
    for i, name in enumerate(columns):
        dt = fields[name]
        c = F.col(name)
        aggs.append(F.count(c).alias(f"nn{i}"))
        nd = (
            F.approx_count_distinct(c, rsd) if approx else F.count_distinct(c)
        )
        aggs.append(nd.cast("long").alias(f"nd{i}"))
        num = _num_col(name, dt)
        if num is not None:
            aggs.append(F.min(num).alias(f"mn{i}"))
            aggs.append(F.max(num).alias(f"mx{i}"))
            if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
                # calendar columns: min/max are meaningful, a mean is not
                aggs.append(F.lit(None).cast("double").alias(f"me{i}"))
            else:
                # exact-decimal sum straight FROM THE SOURCE TYPE — routing
                # integral columns through the double view would quantize
                # bigints above 2^53 before the "exact" sum (r8 advice);
                # only the final quotient is a double
                if _is_fractional(dt):
                    sum_src = c.cast("decimal(38,9)")
                elif isinstance(dt, T.BooleanType):
                    sum_src = c.cast("long").cast("decimal(38,0)")
                else:
                    sum_src = c.cast("decimal(38,0)")
                aggs.append(
                    (F.sum(sum_src).cast("double") / F.count(c)).alias(
                        f"me{i}"
                    )
                )
        else:
            for suf in ("mn", "mx", "me"):
                aggs.append(F.lit(None).cast("double").alias(f"{suf}{i}"))
        if isinstance(dt, T.StringType):
            ln = F.length(c)
            aggs.append(F.min(ln).cast("long").alias(f"nl{i}"))
            aggs.append(F.max(ln).cast("long").alias(f"xl{i}"))
            aggs.append(
                (F.sum(ln.cast("long")).cast("double") / F.count(c)).alias(
                    f"al{i}"
                )
            )
        else:
            aggs.append(F.lit(None).cast("long").alias(f"nl{i}"))
            aggs.append(F.lit(None).cast("long").alias(f"xl{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"al{i}"))
        per_col_exprs.append(
            f"{_sql_str(name, raw)}, {_sql_str(dt.simpleString(), raw)}, "
            f"nn{i}, nd{i}, mn{i}, mx{i}, me{i}, nl{i}, xl{i}, al{i}"
        )

    wide = df.agg(*aggs)
    stack = (
        f"stack({len(columns)}, {', '.join(per_col_exprs)}) "
        f"AS ({', '.join(_OUT_FIELDS)})"
    )
    out = wide.select(F.col("n_rows"), F.expr(stack))
    return out.select(
        "col_name",
        "dtype",
        "n_rows",
        *[f for f in _OUT_FIELDS if f not in ("col_name", "dtype")],
    )


def top_values(
    df: DataFrame, columns: list[str], k: int = 5
) -> DataFrame:
    """Top-k most frequent values per column — the profiler's second
    (opt-in) pass. One groupBy per column (each a uniform-key count
    aggregation with map-side combine), unioned into
    ``(col_name, value, cnt, rank)``; values are stringified so mixed
    column types share one frame. Rank ties break on the string value,
    so the output is deterministic and oracle-hashable.

    At scale: each branch's shuffle carries (column cardinality)
    pre-combined rows, and the top-k selection is ``orderBy().limit(k)``
    — a TakeOrdered over the aggregated counts (per-partition heaps, no
    global sort, no single-partition window over the cardinality). The
    rank column is then a window over the already-selected <=k rows,
    which is driver-trivial by construction.
    """
    if k < 1:
        raise ValueError("top_values: k must be >= 1")
    if not columns:
        raise ValueError("top_values: columns must be non-empty")
    fields = {f.name for f in df.schema.fields}
    missing = [c for c in columns if c not in fields]
    if missing:
        raise ValueError(f"top_values: no such columns: {missing}")
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("value"))
    parts = []
    for name in columns:
        counted = (
            df.filter(F.col(name).isNotNull())
            .groupBy(F.col(name).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("value"))
            .limit(k)
        )
        parts.append(
            counted.withColumn("rank", F.row_number().over(w)).select(
                F.lit(name).alias("col_name"), "value", "cnt", "rank"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

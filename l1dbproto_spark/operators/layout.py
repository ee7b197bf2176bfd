"""Z-order (Morton) layout clustering — multi-dimensional data skipping.

At 100 TB the scan you never do is the fastest operator in the engine. Parquet
row-group min/max statistics prune scans for predicates on the SORT column,
but a linear sort helps exactly one dimension. Interleaving the bits of
several key columns (Morton order; the technique behind Delta Lake's
``OPTIMIZE ZORDER BY`` and the classic UB-tree literature) makes row-group
min/max envelopes tight in EVERY interleaved dimension at once, so a
conjunctive predicate on any subset of them skips most of the file.

The reference engine's analog is its pixel-bucketed spatial layout
(`apdb.py` sorts DiaObject by pixelId so region scans prune row groups —
SURVEY §2 S5/P3); Z-order generalizes that hand-built 1-D locality trick to
arbitrary key tuples.

Everything here is pure column algebra (shift/mask/or — whole-stage codegen;
no UDFs) plus one ``repartitionByRange`` shuffle whose sampled range bounds
become the file boundaries:

* :func:`zorder_key` — the interleaved key as a Column.
* :func:`normalize_to_bits` — rescale an arbitrary numeric column into the
  ``bits``-wide unsigned domain the interleave expects.
* :func:`cluster_by_zorder` — range-partition + locally sort by the key
  (the write-side half; pair with a parquet write).
* :func:`zorder_key_sql` — the SAME expression as ANSI SQL, the single
  source of truth for the DuckDB oracle in the test suite.

Scale notes: the key is computed map-side; ``repartitionByRange`` does one
sampled shuffle (AQE-compatible); file count is the caller's explicit
``num_files`` so executors never see more than ``rows / num_files`` rows per
task. Skew in the key domain translates to skew in range buckets — the
sampler handles it (range bounds equalize row counts, not key spans).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def normalize_to_bits(col: Column, lo: float, hi: float, bits: int = DEFAULT_BITS) -> Column:
    """Rescale ``col`` from [lo, hi] into the integer domain [0, 2**bits).

    Bounds are caller-supplied constants (table stats or domain knowledge) so
    the expression stays a pure map — no stats pass at plan time. Values
    outside [lo, hi] clamp to the domain edges.
    """
    if hi <= lo:
        raise ValueError(f"normalize_to_bits: need lo < hi, got [{lo}, {hi}]")
    top = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(top))
    clamped = F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top))
    # NULL propagates (greatest/least SKIP nulls, which would silently clamp
    # a NULL key to bucket 0 and pile every null row at the domain edge);
    # a NULL component makes the whole z-key NULL and the range partitioner
    # groups those rows together explicitly
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(clamped)


def zorder_key(cols: Sequence[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave ``bits`` low bits of each column into one long.

    Bit ``j`` of column ``i`` lands at position ``j * n_cols + i``; inputs
    must already be in [0, 2**bits) (see :func:`normalize_to_bits`).
    ``n_cols * bits`` must fit a signed long (<= 62).
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    if n * bits > 62:
        raise ValueError(f"zorder_key: {n} cols x {bits} bits exceeds a signed long")
    longs = [c.cast("long") for c in cols]
    parts = [
        F.shiftleft(F.shiftright(c, j).bitwiseAND(F.lit(1)), j * n + i)
        for j in range(bits)
        for i, c in enumerate(longs)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_key_sql(col_names: Sequence[str], bits: int = DEFAULT_BITS) -> str:
    """The :func:`zorder_key` expression as ANSI SQL (DuckDB-compatible) —
    single source of truth for the in-suite oracle."""
    n = len(col_names)
    parts = [
        f"((({c} >> {j}) & 1) << {j * n + i})"
        for j in range(bits)
        for i, c in enumerate(col_names)
    ]
    return " | ".join(parts)


def cluster_by_zorder(
    df: DataFrame,
    key: Column,
    num_files: int,
) -> DataFrame:
    """Range-partition on the Z-key and sort within partitions — write the
    result with ``.write.parquet`` and every output file covers a compact
    Morton range, so parquet min/max stats prune on every interleaved
    dimension. One sampled shuffle; file sizes balanced by row count."""
    # project the key as a named column first (generator/codegen hygiene:
    # range partitioning re-evaluates the expression otherwise)
    tagged = df.withColumn("__zkey", key)
    return (
        tagged.repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )

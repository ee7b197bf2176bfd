"""Round-11 registered row: the one-pass column profiler.

``column_profile`` drives operators/profile.py over the full orders
table — every column type the engine profiles (bigint, double, string,
timestamp_ntz) in one aggregation pass — against a full ANSI-SQL oracle
that recomputes each column's stats independently.

The registered row pins the EXACT-distinct mode (hash-checkable
cardinalities; Spark plans the multi-distinct via one scan + Expand).
The HLL mode that replaces the Expand with map-side registers at 100 TB
is pinned by tests/test_profile.py against the exact counts within rsd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.profile import profile
from ..sources.catalog import load_table



def _col_sql(
    name: str,
    dtype: str,
    num: str | None = None,
    mean_dec: str | None = None,
    is_str: bool = False,
) -> str:
    """One column's profile row. ``num`` is the double-valued view used
    for min/max (NULL when absent); ``mean_dec`` the decimal type for the
    exact mean (NULL mean when absent); ``is_str`` adds length stats."""
    if num is None:
        mn = mx = "CAST(NULL AS DOUBLE)"
    else:
        mn, mx = f"CAST(MIN({num}) AS DOUBLE)", f"CAST(MAX({num}) AS DOUBLE)"
    # DuckDB's DECIMAL->DOUBLE cast computes int128/10^scale in two
    # roundings and can land 1 ulp off the correctly-rounded double that
    # Java produces; routing through VARCHAR (fast_float parse, correctly
    # rounded) restores bit parity with Spark's decimal->double cast.
    if mean_dec is None:
        me = "CAST(NULL AS DOUBLE)"
    else:
        me = (
            f"CAST(CAST(SUM(CAST({name} AS {mean_dec})) AS VARCHAR) AS DOUBLE)"
            f" / COUNT({name})"
        )
    if is_str:
        nl = f"CAST(MIN(length({name})) AS BIGINT)"
        xl = f"CAST(MAX(length({name})) AS BIGINT)"
        al = (
            f"CAST(CAST(SUM(CAST(length({name}) AS BIGINT)) AS VARCHAR) AS DOUBLE)"
            f" / COUNT({name})"
        )
    else:
        nl = xl = "CAST(NULL AS BIGINT)"
        al = "CAST(NULL AS DOUBLE)"
    return f"""
    SELECT '{name}' AS col_name, '{dtype}' AS dtype,
      COUNT(*) AS n_rows, COUNT({name}) AS n_nonnull,
      COUNT(DISTINCT {name}) AS n_distinct,
      {mn} AS min_num, {mx} AS max_num, {me} AS mean_num,
      {nl} AS min_len, {xl} AS max_len, {al} AS avg_len
    FROM orders"""


_PROFILE_ORACLE = " UNION ALL ".join(
    [
        _col_sql("o_orderkey", "bigint", num="o_orderkey", mean_dec="DECIMAL(38,0)"),
        _col_sql("o_custkey", "bigint", num="o_custkey", mean_dec="DECIMAL(38,0)"),
        _col_sql("o_orderstatus", "string", is_str=True),
        _col_sql(
            "o_totalprice", "double", num="o_totalprice", mean_dec="DECIMAL(38,9)"
        ),
        _col_sql("o_orderdate", "timestamp_ntz", num="epoch(o_orderdate)"),
        _col_sql("o_orderpriority", "string", is_str=True),
    ]
)


# Rotated out of the driver registry in round 12 (slot to contrastive_pairs;
# profiling keeps the data_quality_report driver row). SAME oracle
# (_PROFILE_ORACLE, exported below), driver-grade compare in
# tests/test_unregistered_batteries.py.
COLUMN_PROFILE_ORACLE = _PROFILE_ORACLE


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile every orders column in one aggregation pass — completeness,
    exact distinct cardinality, numeric min/max and exact-decimal mean,
    string length stats. The oracle recomputes each column's stats as an
    independent SQL aggregate; every metric is order-independent (exact
    picks, integer counts, decimal-exact means) so the value hash holds.

    Scale shape: one FileScan; exact multi-distinct costs an Expand
    (documented, pinned by test_profile's plan assertions); approx=True is
    the 100 TB mode with a plain single-Exchange aggregate."""
    return profile(load_table(spark, sf_dir, "orders"))

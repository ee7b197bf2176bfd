"""Window-function operators: latest-version-per-key, SCD-2 validity close-out,
deterministic per-partition ID allocation (SURVEY.md §2.5 W1-W4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query


@query(
    "latest_version_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders
    ) t
    WHERE rn = 1
    """,
    survey="W1",
    headline=True,
)
def latest_version_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DiaObjectLast semantics: most-recent version of each object
    (reference maintains a materialized table, README.md:118-121 /
    metrics.md:55-56; the batch formulation is row_number()==1 over a
    validityStart-descending window)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# Rotated out of the 50-cap registry in driver round 8 (slot to q10_returned_items);
# the SAME DuckDB oracle runs in-suite in tests/test_unregistered_batteries.py
# and W3/W4 keep their id-formula pytest coverage.
def partitioned_source_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-partition ID allocation: the reference's
    ``diaSourceId = (visit*n_detectors+detector)*1e6 + 1..n``
    (``_executors.py:426-428``) — row_number over a stable ordering plus an
    arithmetic offset (deterministic, unlike monotonically_increasing_id)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") * F.lit(1000000) + F.row_number().over(w)).alias(
            "dia_source_id"
        ),
    )


def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — generalization of the reference's min/max-key
    selection (log2csv.py:335,341) to ranked selection.

    De-registered r8 (slot went to phrase_match — W1 stays driver-checked
    via latest_version_per_key, W7 via q3_top_orders; the registered BM25
    top-k rows exercise the same ranked-selection window). Oracle kept in
    tests/test_unregistered_batteries.py."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )

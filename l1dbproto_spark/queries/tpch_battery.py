"""TPC-H completion battery — the remaining classic decision-support query
shapes (Q4, Q9, Q10, Q12-Q19, Q21, Q22) adapted to the synthetic schema.

The reference's relational surface (filters/joins/aggregations per SURVEY.md
§2 A/J/P families) is already driver-covered; this battery demonstrates the
*compositions* a warehouse user actually runs: exists/not-exists correlation,
multi-level aggregation, outer-join distributions, share-of-total, correlated
scalar thresholds, disjunctive join predicates, and sole-max-per-group
selection.  Two signature members (`q10_returned_items`,
`q18_large_orders`) hold driver-registry slots; the rest keep DuckDB oracles
in-suite (tests/test_tpch_battery.py).

Adaptations forced by the synthetic schema (no partsupp table, no
l_commitdate / l_receiptdate / l_shipmode / c_phone / s_comment columns):

* Q4's "late delivery" is `l_shipdate > o_orderdate + 60 days`.
* Q9's part-supplier cost uses `p_retailprice * l_quantity / 10` as the
  cost term (no ps_supplycost).
* Q12 groups by `l_linestatus` (no l_shipmode).
* Q16's "complaint suppliers" are those with negative `s_acctbal`.
* Q21's "kept orders waiting" = the order's sole latest shipper
  (`l_shipdate` = per-order max, no other supplier matching it).
* Q22's "no orders in 7 years" is "no orders since 1999-01-01" and the
  country-code grouping is `c_nationkey`.
* Q2 / Q11 / Q20 need partsupp quantities/costs and have no faithful
  adaptation — deliberately out of scope (documented, not silently skipped).

Every money aggregate follows the engine-order-independence contract from
queries/__init__.py: exact DECIMAL sums cast to double after aggregation,
averages as decimal-sum / count in one double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query

_PRICE = "decimal(12,2)"
_FRAC = "decimal(4,2)"


def _dec(c, t=_PRICE):
    return F.col(c).cast(t)


def _revenue():
    """Exact-decimal l_extendedprice * (1 - l_discount) term (q1/q7 pattern)."""
    one = F.lit(1).cast(_FRAC)
    return _dec("l_extendedprice") * (one - _dec("l_discount", _FRAC))


@query(
    "q10_returned_items",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                  AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, n_name AS nation, c_acctbal, revenue
    FROM rev
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    survey="J2,A5,W7 composition (TPC-H Q10 shape: returned-item ranking)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter.

    Scale shape: the only shuffled join is lineitem('R') ⋈ orders(quarter) on
    the order key; revenue is reduced to one row per customer *before* the
    broadcast joins against customer/nation, and the final top-20 is a
    TakeOrdered (no global sort).  Ties broken by c_custkey so LIMIT is
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )
    return (
        rev.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            "c_acctbal",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    survey="A5,J3,W7 composition (TPC-H Q18 shape: large-volume orders)",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 250, with their customers, top-100
    by order value.

    Scale shape: the HAVING reduces lineitem to a tiny key set map-side
    (partial sum) before any join; orders joins that reduced set (AQE turns
    it into a broadcast at these cardinalities), customer is an explicit
    broadcast, and the top-100 is TakeOrdered with o_orderkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > F.lit(250).cast(_PRICE))
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("sum_qty"))
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# In-suite members (DuckDB oracles in tests/test_tpch_battery.py — no
# registry slot spent; the join/agg strategies are already driver-covered).
# ---------------------------------------------------------------------------


def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in 1996-H1 with at least one late-shipped line
    (EXISTS → left-semi join), counted per priority.  The semi-join carries
    the correlated `l_shipdate > o_orderdate + 60 days` predicate as a join
    condition, so no pre-join materialization of the lineitem side."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product family by supplier nation and
    year — a five-table star where part/supplier/nation broadcast and
    lineitem ⋈ orders is the one shuffled join.  Cost term adapted to
    p_retailprice * l_quantity / 10 (no ps_supplycost; exact decimal)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # exact multiplication only (decimal DIVISION rounds differently between
    # Spark and DuckDB; * 0.1 at scale 1 is exact in both)
    cost = _dec("p_retailprice") * _dec("l_quantity") * F.lit(0.1).cast("decimal(2,1)")
    amount = _revenue() - cost
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_linestatus standing in for l_shipmode): lines
    shipped in 1997 classified by order priority — one join, one aggregation
    with conditional counts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer — LEFT
    OUTER join (customers with zero qualifying orders must appear with
    c_count = 0) followed by a second aggregation over the first's result."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share for one month — numerator
    and denominator from ONE aggregation (sum(when)/sum), part broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
    total = F.sum(rev).cast("double")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * promo / total).alias("promo_revenue_pct"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue — the
    revenue view aggregated once, its max taken as a 1-row broadcast, and
    the equality join returning every tied supplier (TPC-H semantics).
    Both sides of the equality come from the same exact-decimal sum, so the
    double comparison is bit-safe."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("rev_dec"))
        .select("l_suppkey", F.col("rev_dec").cast("double").alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each qualifying
    (brand, type, size) bucket — the part-supplier relation reconstructed
    from lineitem (no partsupp table), complaint suppliers (negative
    s_acctbal) removed by broadcast anti-join before the distinct count."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand —
    the correlated per-part average quantity expressed as a window over the
    already-filtered join (the filter is on part attributes, so restricting
    to the brand's part keys leaves each per-part average unchanged).
    Average = exact-decimal sum / count in double (order-independent)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = F.sum(_dec("l_quantity")).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    branches — a single equi-join on the part key with the disjunction as a
    post-join predicate Catalyst can still push into both scans partially
    (p_size bounds, l_quantity bounds)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 15)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 45)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(b1 | b2 | b3)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted to available columns: for finished ('F')
    multi-supplier orders, find the orders whose latest shipment came from
    exactly ONE supplier (the sole laggard) and count such orders per
    supplier — the exists / not-exists double correlation expressed as
    window aggregates over one pass of the joined lines:

      * max l_shipdate per order (the correlated scalar),
      * distinct-supplier count per order (the EXISTS),
      * distinct count of suppliers achieving the max (the NOT EXISTS:
        sole laggard ⇔ that count is 1)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.partitionBy("l_orderkey")
    df = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("l_shipdate") == F.col("max_ship"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
    )
    waiting = df.filter(
        (F.col("n_supp") > 1)
        & (F.col("n_late_supp") == 1)
        & (F.col("l_shipdate") == F.col("max_ship"))
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q22_global_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape adapted: positive-balance customers above the global
    positive-balance average (scalar subquery → 1-row broadcast) with no
    order since 1999 (NOT EXISTS → broadcast anti-join on the recent-order
    customer keys), counted per nation."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey").distinct()
    pos_avg = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )

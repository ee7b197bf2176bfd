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
* Q2 / Q11 / Q20 need a partsupp table the synthetic schema lacks:
  ``partsupp_table`` synthesizes it DETERMINISTICALLY from part x supplier
  (dbgen's 4-suppliers-per-part pattern with a collision-free stride, the
  engine-portable md5 hash for availqty/supplycost), so both engines build
  the identical table and the three queries are oracle-checkable like the
  rest. Q2's region/size/type predicates, Q11's "important stock" threshold
  (above the per-part average, which self-scales with SF), and Q20's
  surplus factor are adapted to the synthetic value ranges.

Every money aggregate follows the engine-order-independence contract from
queries/__init__.py: exact DECIMAL sums cast to double after aggregation,
averages as decimal-sum / count in one double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_PRICE = "decimal(12,2)"
_FRAC = "decimal(4,2)"


def _dec(c, t=_PRICE):
    return F.col(c).cast(t)


def _revenue():
    """Exact-decimal l_extendedprice * (1 - l_discount) term (q1/q7 pattern)."""
    one = F.lit(1).cast(_FRAC)
    return _dec("l_extendedprice") * (one - _dec("l_discount", _FRAC))


# Rotated out of the 50-cap registry in driver round 13 along with
# q18_large_orders (slots to the r12 training-data families —
# COVERAGE.md "Registry rotation history"); the SAME DuckDB oracles run
# driver-grade in-suite in tests/test_unregistered_batteries.py, the
# whole battery keeps its 13 oracles in tests/test_tpch_battery.py, and
# TPC-H stays driver-checked via q1_pricing_summary / q3_top_orders /
# q5_region_revenue.
Q10_RETURNED_ITEMS_ORACLE = """
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
    """


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


Q18_LARGE_ORDERS_ORACLE = """
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
    """


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


# ---------------------------------------------------------------------------
# partsupp synthesis + Q2 / Q11 / Q20 (driver round 10). The synthetic
# schema has no partsupp table; partsupp_table derives one DETERMINISTICALLY
# from part x supplier so DuckDB reconstructs the identical rows (the
# PARTSUPP_SQL constant is the oracle-side rendering used by
# tests/test_tpch_battery.py):
#   * 4 suppliers per part (dbgen's pattern), ps_suppkey =
#     (p_partkey + i * max(1, S // 4)) % S for i in 0..3 — the stride keeps
#     the 4 keys distinct for any supplier count S >= 4 (3 * (S//4) < S),
#     where dbgen's own (p-1)/S term collides at small S;
#   * ps_availqty = h % 9999 + 1 and ps_supplycost = (h % 1000 + 1) whole
#     dollars as DECIMAL(12,2), h = portable md5 hash of 'ps:<part>:<i>' —
#     exact integers on both engines, no decimal-division portability trap.
# ---------------------------------------------------------------------------


def partsupp_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic synthesized partsupp (see block comment). The
    supplier count enters as a 1-row broadcast (crossJoin of a bounded
    aggregate, the q22/bm25 scalar pattern), never a driver collect."""
    from ..functions.hashing import portable_hash64

    part = load_table(spark, sf_dir, "part").select("p_partkey")
    n_supp = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("_s")
    )
    h = portable_hash64(
        F.concat(F.lit("ps:"), F.col("p_partkey"), F.lit(":"), F.col("_i"))
    )
    stride = F.greatest(F.lit(1), F.floor(F.col("_s") / 4).cast("long"))
    return (
        part.crossJoin(F.broadcast(n_supp))
        .select(
            "p_partkey",
            "_s",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("_i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("_i") * stride) % F.col("_s")).alias(
                "ps_suppkey"
            ),
            (h % 9999 + 1).alias("ps_availqty"),
            (h % 1000 + 1).cast(_PRICE).alias("ps_supplycost"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for STANDARD parts of size >= 15, the EUROPE
    supplier(s) offering the region's minimum supply cost for that part —
    the correlated-min scalar subquery re-expressed as a window min over
    the region-scoped (part, supplier) frame (one pass, no re-join), top
    100 by account balance. nation/region/supplier are broadcast dims;
    partsupp is the only shuffled side at scale."""
    ps = partsupp_table(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") >= 15)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eligible = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("_min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey"),
            "p_brand",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value (sum of supplycost * availqty,
    exact decimal) held by EUROPE suppliers, keeping parts whose value
    exceeds the scoped AVERAGE per-part value — the scalar-subquery
    threshold self-scales with SF where dbgen's fixed fraction would pin
    to one data size. One aggregation feeds both sides: the threshold is
    a 1-row broadcast of a second aggregate over the SAME grouped frame
    (AQE reuses the exchange), never a re-scan of partsupp."""
    ps = partsupp_table(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    scoped = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    per_part = scoped.groupBy("ps_partkey").agg(
        F.sum(F.col("ps_supplycost") * F.col("ps_availqty")).alias("_v")
    )
    threshold = per_part.agg(
        (F.sum("_v").cast("double") / F.count(F.lit(1))).alias("_avg")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("_v").cast("double") > F.col("_avg"))
        .select("ps_partkey", F.col("_v").cast("double").alias("value"))
    )


def q20_surplus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: EUROPE suppliers holding surplus stock of a widget
    part — ps_availqty above 200x the (part, supplier) quantity actually
    shipped in 1997 (factor adapted to the synthetic availqty range;
    pairs with no 1997 shipments disqualify, as in the spec). The
    correlated quantity subquery is one (part, supplier) aggregation of
    the filtered lineitem joined back to partsupp; the supplier IN
    becomes a left-semi join."""
    ps = partsupp_table(spark, sf_dir)
    widget = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_qty")
    )
    surplus = (
        ps.join(F.broadcast(widget), ps.ps_partkey == widget.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(
            F.col("ps_availqty").cast("double")
            > F.lit(200.0) * F.col("_qty").cast("double")
        )
        .select("ps_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(surplus, supp.s_suppkey == surplus.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )

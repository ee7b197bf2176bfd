"""Second relational batch: multi-level aggregation (rollup/grouping sets),
set operations, scalar subqueries, exact percentiles, as-of join, and
string/date function batteries — rounding out the engine surface beyond the
reference's own operator list (SURVEY.md §2.3/§2.4 'not present' items that a
drop-in engine should still provide)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.catalog import load_table


def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level totals with grouping id: every grouping-set combination
    (CUBE, whose result is a superset of ROLLUP's) in one pass — map-side
    partial aggregation handles all levels.

    Unregistered in round 4 (50-slot registry cap): its slot went to
    ``semdedup_drops``. Oracle kept in
    tests/test_unregistered_batteries.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation battery: customers active in both 1996 and 1997
    (INTERSECT) and customers active in 1996 but never after (EXCEPT) — one
    tagged result. subtract (not exceptAll) keeps SQL set semantics.

    Unregistered in round 5 (50-slot registry cap): its slot went to
    ``frequent_items_per_group`` — the sketch family's one exact,
    hash-oracle-able member (VERDICT r4 item 5). Oracle kept in
    tests/test_unregistered_batteries.py."""
    orders = load_table(spark, sf_dir, "orders")

    def year_range(lo: str, hi: str | None):
        cond = F.col("o_orderdate") >= F.lit(lo).cast("timestamp")
        if hi is not None:
            cond = cond & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        return orders.filter(cond).select("o_custkey")

    y96 = year_range("1996-01-01", "1997-01-01")
    y97 = year_range("1997-01-01", "1998-01-01")
    repeat = y96.intersect(y97).select("o_custkey", F.lit("repeat").alias("tag"))
    # set semantics (EXCEPT DISTINCT) — exceptAll is bag difference and would
    # keep a customer whose 1996 order count merely exceeds their later count
    churned = y96.subtract(year_range("1997-01-01", None)).select(
        "o_custkey", F.lit("churned").alias("tag")
    )
    return repeat.unionByName(churned)


def above_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: compare each row against a global aggregate
    (broadcast of a 1-row DataFrame; the exact-decimal avg keeps the
    threshold engine-identical).

    De-registered r8 (slot went to fuzzy_name_match — this battery maps to
    no SURVEY §2 id; the broadcast-scalar pattern stays driver-checked via
    bm25_topk's corpus-stats crossJoin). Oracle kept in
    tests/test_unregistered_batteries.py."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use the same
    linear-interpolation definition; rounded to 6 decimals to absorb
    last-ulp interpolation-order differences).

    De-registered r5 (slot went to collocations_pmi — this battery maps
    to no SURVEY §2 id); the oracle lives on in
    tests/test_unregistered_batteries.py."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


# Rotated out of the 50-cap registry in driver round 13 (slot to the
# r12 training-data families — COVERAGE.md "Registry rotation history");
# the SAME DuckDB oracle (below) runs driver-grade in-suite in
# tests/test_unregistered_batteries.py and the as-of operator keeps its
# tie-break/semantics pytest (tests/test_advice_fixes.py, the interval/
# window family rows stay registered).
ASOF_LAST_CLICK_ORACLE = """
    SELECT
      p.event_id,
      p.user_id,
      (SELECT c.value FROM events c
       WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
       ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_value
    FROM events p
    WHERE p.event_type = 'purchase'
    """


def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase picks up the user's latest
    click value at-or-before its timestamp — union+window implementation
    (one shuffle, no merge_asof UDF). Oracle: correlated subquery."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    out = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        ts_col="ts",
        payload_cols=["value"],
        tie_break="event_id",
    )
    return out.select("event_id", "user_id", F.col("asof_value").alias("asof_value"))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + global aggregate — the single-row result shape (all filters
    pushed to the scan; no shuffle at all, just a partial/final agg).

    De-registered r8 (slot went to gap_fill_resample — the filtered global
    decimal aggregate stays driver-checked via q1_pricing_summary /
    filtered_counts; this is the thinnest relational row). Oracle kept in
    tests/test_unregistered_batteries.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# Rotated out of the 50-cap registry in driver round 8 (slot to
# part_copurchase_triangles); the SAME DuckDB oracle (below) runs in-suite
# in tests/test_unregistered_batteries.py and max_by keeps its other
# pytest coverage (q3/top-k selection family).
ARGMAX_ORDER_ORACLE = """
    SELECT
      o_custkey,
      arg_max(o_orderkey,
              CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
        AS best_orderkey,
      CAST(MAX(o_totalprice) AS DOUBLE) AS best_price
    FROM orders
    GROUP BY o_custkey
    """


def argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer: the key of their most expensive order. The ordering key
    is an exact integer composite (price-cents * 1e7 + orderkey) so ties
    break identically in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    key = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(10_000_000)
        + F.col("o_orderkey")
    )
    return orders.groupBy("o_custkey").agg(
        F.max_by(F.col("o_orderkey"), key).alias("best_orderkey"),
        F.max("o_totalprice").cast("double").alias("best_price"),
    )


# Unregistered in driver round 10 (50-slot registry cap): slot went to the
# round-9 serving components. The oracle stays here as a constant so the
# in-suite battery test and the SQL-surface test share one definition.
SALTED_SKEW_ORACLE = """
SELECT
  l_suppkey,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_suppkey
"""


def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation over the (skewed: 10 suppliers for the
    whole lineitem table) supplier key — results must equal the plain
    aggregation, which is exactly what the oracle pins.

    Unregistered in driver round 10 (50-slot registry cap): its slot went
    to the round-9 serving components; the SAME oracle
    (SALTED_SKEW_ORACLE) is checked driver-grade in
    tests/test_unregistered_batteries.py, and the salting operator keeps
    its operators/skew.py pytest coverage."""
    from ..operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_suppkey"],
        aggs={
            "sum_qty_dec": F.sum(F.col("l_quantity").cast("decimal(12,2)")),
            "n": F.count(F.lit(1)),
        },
        n_salts=8,
    )
    return out.select(
        "l_suppkey",
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        "n",
    )


def date_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic + null-semantics battery in one per-order projection:
    extract/interval/datediff/last_day (F9/F10) plus the lead()-derived
    next-order gap with coalesce / nullif / CASE / IS NULL handling.

    Unregistered in round 3 (50-slot registry cap): its slot went to
    ``pack_sequences``; F9/F10 stay oracle-covered by
    ``forced_photometry_eligibility`` and pytest (test_timeutil), and its
    lead()-derived validity semantics moved into ``window_frames_battery``
    (W2 SCD-2 close-out). Kept for API use and tests."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v = orders.select("o_orderkey", d, F.lead(d).over(w).alias("next_date"))
    gap = F.datediff(F.col("next_date").cast("date"), d.cast("date"))
    gap_self = F.datediff(
        F.coalesce(F.col("next_date"), d).cast("date"), d.cast("date")
    )
    return v.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        (F.dayofweek(d) - 1).cast("long").alias("dow"),  # Spark 1=Sun -> 0=Sun like DuckDB
        F.date_add(d.cast("date"), 90).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_eoy"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.col("next_date").isNull().alias("is_latest"),
        F.coalesce(
            F.col("next_date"), F.lit("2199-12-31 00:00:00").cast("timestamp")
        ).alias("next_or_max"),
        F.when(F.col("next_date").isNull(), F.lit(-1))
        .otherwise(gap)
        .cast("long")
        .alias("gap_days"),
        F.nullif(gap_self.cast("long"), F.lit(0)).alias("gap_or_null"),
    )


# Multi-way-join battery (r9, in-suite oracles in
# tests/test_unregistered_batteries.py): the TPC-H q7/q8 join shapes on
# the synthetic tables — two-role dimension joins (nation as supplier
# nation AND customer nation), star joins over five tables, conditional
# share-of-total aggregation. Broadcast every dimension; only
# lineitem x orders shuffles.


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between a nation pair by year (TPC-H Q7 shape):
    lineitem -> orders (the one shuffled join, both big) with supplier /
    customer / nation x2 broadcast. Exact-decimal revenue sum cast to
    double after aggregation (engine-order-independent)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | (
        (F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3")
    )
    rev = F.sum(
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        )
    ).cast("double")
    return (
        li.filter(
            F.col("l_shipdate").between("1995-01-01", "1998-12-31 23:59:59")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(rev.alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of NATION_3 suppliers in EUROPE customers' revenue for one
    part type by year (TPC-H Q8 shape): five-table star with conditional
    share-of-total — both the numerator and denominator come out of ONE
    aggregation (sum(when)/sum), no second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # customer-side region restriction
    cregion = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("c_nk"))
    )
    nsupp = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    ptype = part.filter(F.col("p_type") == "STANDARD").select("p_partkey")
    vol = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    df = (
        li.join(F.broadcast(ptype), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderdate").between("1995-01-01", "1997-12-31 23:59:59"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cregion), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nsupp), F.col("s_nationkey") == F.col("s_nk"))
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)).cast("double")
    den = F.sum(vol).cast("double")
    return (
        df.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            num.alias("nation_volume"),
            den.alias("total_volume"),
            F.when(den > 0, F.round(num / den, 6)).alias("mkt_share"),
        )
    )

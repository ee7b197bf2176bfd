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
from . import query


@query(
    "rollup_pricing",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      GROUPING(l_returnflag, l_linestatus) AS gid,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey="A-agg beyond reference (rollup / grouping sets)",
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals with grouping id — subtotals + grand total in one
    pass (map-side partial aggregation handles all levels)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")


@query(
    "repeat_customers_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
    survey="set ops beyond reference (intersect)",
)
def repeat_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def year(y):
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return year(1996).intersect(year(1997))


@query(
    "churned_customers_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
    survey="set ops beyond reference (except)",
)
def churned_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    b = orders.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    ).select("o_custkey")
    # set semantics (EXCEPT DISTINCT) — exceptAll is bag difference and would
    # keep a customer whose 1996 order count merely exceeds their 1997 count
    return a.subtract(b)


@query(
    "above_average_customers",
    oracle="""
    WITH s AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer
    )
    SELECT c_custkey, c_name, c_acctbal
    FROM customer, s
    WHERE c_acctbal > s.avg_bal
    """,
    survey="scalar subquery (not in reference)",
)
def above_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: compare each row against a global aggregate
    (broadcast of a 1-row DataFrame; the exact-decimal avg keeps the
    threshold engine-identical)."""
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


@query(
    "price_percentiles",
    oracle="""
    SELECT
      o_orderstatus,
      round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
      round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
      CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
      CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY o_orderstatus
    """,
    survey="exact percentiles (not in reference; Spark percentile == quantile_cont)",
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use the same
    linear-interpolation definition; rounded to 6 decimals to absorb
    last-ulp interpolation-order differences)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


@query(
    "asof_last_click_before_purchase",
    oracle="""
    SELECT
      p.event_id,
      p.user_id,
      (SELECT c.value FROM events c
       WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
       ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_value
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    survey="as-of join (temporal join beyond reference; operators/asof.py)",
)
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


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    survey="global aggregate without grouping (TPC-H Q6 shape)",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + global aggregate — the single-row result shape (all filters
    pushed to the scan; no shuffle at all, just a partial/final agg)."""
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


@query(
    "argmax_order_per_customer",
    oracle="""
    SELECT
      o_custkey,
      arg_max(o_orderkey,
              CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
        AS best_orderkey,
      CAST(MAX(o_totalprice) AS DOUBLE) AS best_price
    FROM orders
    GROUP BY o_custkey
    """,
    survey="argmax aggregate (max_by / arg_max) with deterministic tie-break",
)
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


@query(
    "salted_skew_agg",
    oracle="""
    SELECT
      l_suppkey,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY l_suppkey
    """,
    survey="skew mitigation (salted two-stage aggregation; operators/skew.py)",
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation over the (skewed: 10 suppliers for the
    whole lineitem table) supplier key — results must equal the plain
    aggregation, which is exactly what the oracle pins."""
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


@query(
    "string_functions",
    oracle="""
    SELECT
      c_custkey,
      upper(c_name) AS up,
      substr(c_name, 10, 5) AS mid,
      replace(c_name, 'Customer', 'C') AS repl,
      lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
      concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS segkey,
      length(c_name) AS name_len,
      CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos
    FROM customer
    """,
    survey="F13 string battery",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.substring("c_name", 10, 5).alias("mid"),
        F.regexp_replace(F.col("c_name"), "Customer", "C").alias("repl"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")
        ).alias("segkey"),
        F.length("c_name").cast("long").alias("name_len"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT
      o_orderkey,
      EXTRACT(year FROM o_orderdate) AS yr,
      EXTRACT(month FROM o_orderdate) AS mo,
      EXTRACT(dow FROM o_orderdate) AS dow,
      CAST(CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS TIMESTAMP) AS due_date,
      date_diff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS days_to_eoy,
      CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
    FROM orders
    """,
    survey="F9,F10 date battery",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        (F.dayofweek(d) - 1).cast("long").alias("dow"),  # Spark 1=Sun -> 0=Sun like DuckDB
        F.date_add(d.cast("date"), 90).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_eoy"),
        F.last_day(d).cast("timestamp").alias("month_end"),
    )

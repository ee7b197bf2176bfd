"""Core relational operators: scans, filters, equi-joins, aggregations.

Covers SURVEY.md §2 operators: A2-A7 (counting / filtered counts / per-group
means), J2 (left-join match with default + increment), J3 (semi-join by ID
list + time bound), P2-P7 (filters/projections), plus the anti-join the
reference describes but never implements (README.md:30).

Reference citations are in each docstring; the implementations are Spark-native
plans (no UDFs), designed so Catalyst pushes filters into the parquet scan and
broadcasts the small build sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query

# Exact-decimal casts used on both the Spark and DuckDB side so that sums are
# order-independent (see queries/__init__.py docstring).
_PRICE = "decimal(12,2)"  # l_extendedprice / o_totalprice <= ~5e5
_FRAC = "decimal(4,2)"  # discount / tax in [0, 1)


def _dec(c, t=_PRICE):
    return F.col(c).cast(t)


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
               * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
        AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A5,A6,P2,F10",
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the per-visit mean/sum aggregation
    pattern (reference log2csv.py:62-96,126-132; log2influx.py:244-294)."""
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(_FRAC)
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", _FRAC))
    charge = disc_price * (one + _dec("l_tax", _FRAC))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(_dec("l_discount", _FRAC)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q3_top_orders",
    oracle="""
    SELECT
      o.o_orderkey,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    survey="J2,A5,W7",
    headline=True,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + deterministic top-k (revenue is an exact decimal sum,
    so the top-10 set is engine-independent)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(_FRAC)
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount", _FRAC))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT
      n.n_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    survey="J2,A5,P7",
    headline=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join with broadcast dimensions — the star-join shape a 100 TB
    fact table needs: small dims broadcast, one shuffle on the fact keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast(_FRAC)
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount", _FRAC))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@query(
    "source_object_match",
    oracle="""
    WITH known AS (
      SELECT o_custkey, COUNT(*) AS n_prior
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY o_custkey
    )
    SELECT
      o.o_orderkey,
      o.o_custkey,
      COALESCE(k.n_prior, 0) + 1 AS n_dia_sources
    FROM orders o
    LEFT JOIN known k ON o.o_custkey = k.o_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
    """,
    survey="J2,A1",
)
def source_object_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's source-to-object match: a hash join with default-0 plus
    increment (``_executors.py:315-323`` builds ``nDiaSources = get(id,0)+1``
    with a dict; here it is a left join + coalesce — the same semantics as a
    broadcast hash join against the known-object catalog)."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-07-01 00:00:00").cast("timestamp")
    known = (
        orders.filter(F.col("o_orderdate") < cutoff)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_prior"))
    )
    new = orders.filter(F.col("o_orderdate") >= cutoff)
    return new.join(known, "o_custkey", "left").select(
        "o_orderkey",
        "o_custkey",
        (F.coalesce(F.col("n_prior"), F.lit(0)) + F.lit(1)).alias("n_dia_sources"),
    )


@query(
    "history_semi_join",
    oracle="""
    SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_shipdate
    FROM lineitem l
    WHERE l.l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
    )
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
    survey="J3,S6",
)
def history_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History read by matched-ID list + time bound: the reference's
    ``getDiaSources(region, object_ids, visit_time)`` (``_executors.py:207-215``,
    months bound ``README.md:139-151``) = broadcast left-semi join + range
    filter; the time filter prunes temporal partitions at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    ids = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(ids), li.l_orderkey == ids.o_orderkey, "left_semi")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_shipdate")
    )


def exists_anti_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS battery: the 'objects without match' anti-join the reference
    describes (README.md:30) plus the correlated-EXISTS semi-join with an
    inner predicate — Spark left_anti / left_semi joins, tagged union.

    De-registered r8 (slot went to bm25_topk — the anti/semi join OPERATORS
    stay under driver rows via history_semi_join, semdedup_drops and
    contamination_report; this battery carries no §2 id of its own). The
    oracle lives on in tests/test_unregistered_batteries.py."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    big = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    cols = ["c_custkey", "c_name", "c_acctbal"]
    anti = cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti").select(
        *cols, F.lit("no_recent_order").alias("tag")
    )
    semi = cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        *cols, F.lit("big_spender").alias("tag")
    )
    return anti.unionByName(semi)


# Rotated out of the 50-cap registry in driver round 8 (slot to funnel_conversion);
# the SAME DuckDB oracle runs in-suite in
# tests/test_unregistered_batteries.py. A2-A4 stay driver-covered via
# q1_pricing_summary (counts) and the funnel/cohort aggregations.
def filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counting + max-ID recovery: the reference counts transients
    with ``sum(diaObjectId >= 1e9)`` (``_executors.py:327-328``) and recovers
    the ID high-water mark with a max (``ap_proto.py:286-291``)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 300000).alias("n_large"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.max("o_orderkey").alias("last_order_id"),
    )


@query(
    "forced_photometry_eligibility",
    oracle="""
    WITH obj AS (
      SELECT
        o_custkey,
        COUNT(*) AS n_dia_sources,
        MAX(o_orderdate) AS last_non_forced
      FROM orders
      GROUP BY o_custkey
    )
    SELECT o_custkey, n_dia_sources, last_non_forced
    FROM obj
    WHERE n_dia_sources > 1
      AND last_non_forced > TIMESTAMP '1998-08-02 00:00:00' - INTERVAL 30 DAY
    """,
    survey="P4,F10",
)
def forced_photometry_eligibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forced-photometry eligibility predicate (``_executors.py:353-357``,
    ``config.py:50-53``): nDiaSources > 1 AND last detection within a 30-day
    cutoff window — date arithmetic + filter after aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    visit_time = F.lit("1998-08-02 00:00:00").cast("timestamp")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_dia_sources"),
            F.max("o_orderdate").alias("last_non_forced"),
        )
        .filter(
            (F.col("n_dia_sources") > 1)
            & (F.col("last_non_forced") > visit_time - F.expr("INTERVAL 30 DAYS"))
        )
    )

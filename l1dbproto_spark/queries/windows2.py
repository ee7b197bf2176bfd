"""Window frames, ranking, unpivot, array and cube batteries — rounding out
the analytic-SQL surface (SURVEY §2.5 'not present' items: frame specs,
ranking beyond row_number; §2.7 'not present': array functions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query


@query(
    "running_totals",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_spend,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
      ) AS DOUBLE)
      / COUNT(*) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
      ) AS moving_avg_3
    FROM orders
    """,
    survey="window frames (running sum, moving average)",
)
def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windows: cumulative spend + 3-row moving average per
    customer (exact-decimal sums inside the frame keep both engines equal)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(cum).cast("double").alias("running_spend"),
        (
            F.sum(dec).over(mov).cast("double")
            / F.count(F.lit(1)).over(mov)
        ).alias("moving_avg_3"),
    )


@query(
    "ranking_battery",
    oracle="""
    SELECT
      c_custkey,
      c_nationkey,
      DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drank,
      NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile,
      PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS prank
    FROM customer
    """,
    survey="ranking beyond row_number (dense_rank / ntile / percent_rank)",
)
def ranking_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
    )


@query(
    "unpivot_order_metrics",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS value FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
    """,
    survey="unpivot / stack (inverse of A9)",
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long unpivot via stack() — the inverse of the metrics pivot."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', CAST(o_totalprice AS DOUBLE),"
            " 'custkey', CAST(o_custkey AS DOUBLE)) AS (metric, value)"
        ),
    )


@query(
    "array_functions",
    oracle="""
    SELECT
      vec_id,
      len(embedding) AS dim,
      CAST(embedding[1] AS DOUBLE) AS first_dim,
      CAST(list_max(embedding) AS DOUBLE) AS max_dim,
      CAST(list_min(embedding) AS DOUBLE) AS min_dim,
      len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
    survey="array function battery (size / element_at / max / min / filter)",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(v).cast("long").alias("dim"),
        F.element_at(v, 1).cast("double").alias("first_dim"),
        F.array_max(v).cast("double").alias("max_dim"),
        F.array_min(v).cast("double").alias("min_dim"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "cube_counts",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      GROUPING(l_returnflag, l_linestatus) AS gid,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey="cube (all grouping-set combinations)",
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n"))
        .select("l_returnflag", "l_linestatus", "gid", "n")
    )

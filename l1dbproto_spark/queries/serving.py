"""Serving-layer queries — the round-9 storage/maintenance components
surfaced for the driver's correctness gate: the continuous-aggregate
rollup (streaming/rollup.py) and the bucketed-table layout
(sources/bucketed.py).

Both builders do their table-maintenance work EAGERLY (merge jobs /
bucketed writes into a fresh temp store) and return the SERVING read —
the DataFrame the driver collects scans the maintained store, proving
end-to-end that incremental maintenance reconstructs exactly what the
one-pass ANSI SQL over the raw tables computes."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query


@query(
    "rollup_hourly_serve",
    oracle="""
    SELECT
      date_trunc('hour', ts) AS bucket_start,
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_val,
      CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
        AS avg_val,
      MIN(CAST(value AS DOUBLE)) AS min_val,
      MAX(CAST(value AS DOUBLE)) AS max_val
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
    survey="ext:rollup (continuous aggregate / hypertable rollup; streaming/rollup.py)",
)
def rollup_hourly_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly continuous aggregate over the events table, maintained as
    TWO incremental merges (the user_id-parity halves of the table as
    epochs 0 and 1) into a fresh day-partitioned store, then served via
    ``finalize()``. The oracle is the ONE-PASS GROUP BY over the raw
    events — equality proves the mergeable-partials algebra (count /
    non-null count / exact DECIMAL(38,6) sum / min / max, avg as the one
    deterministic division sum/n_val) is batching-invariant, not just
    the happy single-batch path. The HLL user sketch is served too but
    excluded here: a merged DataSketches estimate is not
    ANSI-reproducible (tests pin it to the documented relative error).

    Scale shape under test: both the state read and the dynamic
    overwrite inside each merge are scoped to the touched bucket_day
    partitions, so maintenance cost is bounded by lateness, never by
    table age (streaming/rollup.py module docstring)."""
    from ..streaming.rollup import ContinuousAggregate

    ev = load_table(spark, sf_dir, "events")
    agg = ContinuousAggregate(
        spark,
        tempfile.mkdtemp(prefix="rollup_serve_"),
        3600,
        group_cols=["event_type"],
    )
    # null-safe complement split: `% 2 != 0` alone would silently drop
    # NULL-user rows from BOTH epochs (NULL %-> NULL -> both predicates
    # false) while the one-pass oracle counts them
    even = F.col("user_id") % 2 == 0
    agg.merge(ev.filter(even), epoch_id=0)
    agg.merge(ev.filter(~F.coalesce(even, F.lit(False))), epoch_id=1)
    return agg.finalize().drop("approx_users")


@query(
    "bucketed_join_agg",
    oracle="""
    SELECT
      c_mktsegment,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    survey="ext:bucketed layout (shuffle-elided co-located join; sources/bucketed.py)",
)
def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment computed over BUCKETED copies of orders
    and customer (both written with ``write_bucketed`` on the customer
    key, 8 buckets) — the join reads co-located, pre-sorted buckets and
    plans a SortMergeJoin with zero Exchange on either side
    (plan-pinned by tests/test_bucketed_join.py; this registered row
    pins result parity against the plain oracle join over the raw
    parquet). At 100 TB the bucketed write moves the fact-fact join
    shuffle to write time, once, amortized across every later join on
    the key."""
    from ..sources.bucketed import write_bucketed

    base = tempfile.mkdtemp(prefix="bucketed_query_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    write_bucketed(orders, "bjq_orders", "o_custkey", 8, path=f"{base}/orders")
    write_bucketed(
        customer, "bjq_customer", "c_custkey", 8, path=f"{base}/customer"
    )
    joined = spark.table("bjq_orders").join(
        spark.table("bjq_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue"),
    )

"""Bucketed-table co-located join: pre-bucketing both sides on the join key
removes the shuffle entirely — the 100 TB fact-fact join technique
(SURVEY §2 'Partitioning & shuffle'). Verified by plan inspection: no
Exchange above either scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.sources.catalog import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path_factory):
    # warehouse.dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped at the end
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("ord_b")
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        # and it computes the right thing
        expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")

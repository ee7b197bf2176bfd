"""Bucketed-table layout (sources/bucketed.py): the write-once shuffle
contract. Plans are pinned, not assumed: a both-sides-bucketed equi-join
and a bucket-key aggregation must contain ZERO Exchange operators, a
one-side-bucketed join exactly one (the unbucketed side), and an equality
predicate on the bucket key must scan 1-of-N buckets. Results always
checked against the plain (unbucketed) plan."""

from __future__ import annotations

import os
import re

import pytest

from pyspark.sql import functions as F

from l1dbproto_spark.sources.bucketed import (
    assert_same_buckets,
    bucket_spec,
    forced_bucketed_scan,
    write_bucketed,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    """orders + customer written bucketed by custkey (shared key name so
    the join is a USING join), plus a 4-bucket variant for the contract
    test."""
    base = str(tmp_path_factory.mktemp("bucketed"))
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(
        orders, "tb_orders", "o_custkey", N_BUCKETS,
        sort_extra=["o_orderkey"], path=os.path.join(base, "o"),
    )
    write_bucketed(
        cust, "tb_cust", "o_custkey", N_BUCKETS, path=os.path.join(base, "c")
    )
    write_bucketed(
        cust, "tb_cust4", "o_custkey", 4, path=os.path.join(base, "c4")
    )
    yield orders, cust
    for t in ("tb_orders", "tb_cust", "tb_cust4"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_both_sides_bucketed_join_is_shuffle_free(spark, tables, no_broadcast):
    orders, cust = tables
    j = (
        spark.table("tb_orders").select("o_custkey", "o_orderkey")
        .join(spark.table("tb_cust").select("o_custkey", "c_name"), "o_custkey")
    )
    plan = _plan(j)
    assert plan.count("Exchange") == 0, plan
    assert "SortMergeJoin" in plan
    got = sorted((r.o_custkey, r.o_orderkey, r.c_name) for r in j.collect())
    want = sorted(
        (r.o_custkey, r.o_orderkey, r.c_name)
        for r in orders.join(cust, "o_custkey")
        .select("o_custkey", "o_orderkey", "c_name")
        .collect()
    )
    assert got == want and len(got) > 0


def test_one_side_bucketed_join_shuffles_only_other_side(
    spark, tables, no_broadcast
):
    orders, cust = tables
    j = spark.table("tb_orders").join(cust, "o_custkey")
    plan = _plan(j)
    # exactly one Exchange, and it must sit above the UNBUCKETED side
    assert plan.count("Exchange") == 1, plan
    assert j.count() == orders.join(cust, "o_custkey").count()


def test_bucket_key_aggregation_is_shuffle_free(spark, tables):
    a = spark.table("tb_orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert _plan(a).count("Exchange") == 0
    orders, _ = tables
    want = {
        (r.o_custkey, r.n)
        for r in orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r.o_custkey, r.n) for r in a.collect()} == want


def test_bucket_pruning_point_lookup(spark, tables):
    orders, _ = tables
    key = orders.select("o_custkey").first().o_custkey
    with forced_bucketed_scan(spark):
        f = spark.table("tb_orders").filter(F.col("o_custkey") == key)
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", _plan(f))
        assert m, "no bucket pruning in plan"
        assert (int(m.group(1)), int(m.group(2))) == (1, N_BUCKETS)
        assert f.count() == orders.filter(F.col("o_custkey") == key).count()


def test_sorted_within_buckets(spark, tables):
    """sortBy contract: within every bucket file, rows are ordered by
    (key, sort_extra) — the property parquet min/max pruning and the
    legacy sort-elision flag both rely on."""
    files = spark.table("tb_orders").select(
        F.input_file_name().alias("f"), "o_custkey", "o_orderkey"
    ).collect()
    by_file: dict = {}
    for r in files:
        by_file.setdefault(r.f, []).append((r.o_custkey, r.o_orderkey))
    assert len(by_file) == N_BUCKETS  # one file per bucket
    for rows in by_file.values():
        assert rows == sorted(rows)


def test_bucket_spec_and_contract(spark, tables):
    assert bucket_spec(spark, "tb_orders") == (["o_custkey"], N_BUCKETS)
    assert assert_same_buckets(spark, "tb_orders", "tb_cust") == N_BUCKETS
    with pytest.raises(ValueError, match="mismatch"):
        assert_same_buckets(spark, "tb_orders", "tb_cust4")


def test_unbucketed_table_detected(spark, tables, tmp_path):
    orders, _ = tables
    p = str(tmp_path / "plain")
    orders.write.mode("overwrite").option("path", p).saveAsTable("tb_plain")
    try:
        assert bucket_spec(spark, "tb_plain") is None
        with pytest.raises(ValueError, match="not bucketed"):
            assert_same_buckets(spark, "tb_orders", "tb_plain")
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_plain")


def test_write_validation(spark, tables):
    orders, _ = tables
    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(orders, "tb_bad", "o_custkey", 0)
    with pytest.raises(ValueError, match="non-empty"):
        write_bucketed(orders, "tb_bad", [], 4)

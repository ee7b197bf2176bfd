"""Bloom-prefiltered join (operators/bloom.py bloom_prefilter_join):
result identical to the plain join, measured pre-shuffle pruning, and
the outer-join refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_prefilter_join,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _small(spark, n=20):
    return (
        load_table(spark, SF_DIR, "customer")
        .filter(F.col("c_custkey") % 75 == 0)
        .limit(n)
        .select("c_custkey", "c_name")
    )


def test_inner_join_identical(spark):
    orders = load_table(spark, SF_DIR, "orders")
    small = _small(spark)
    plain = orders.join(
        small, orders.o_custkey == small.c_custkey
    ).select("o_orderkey", "c_custkey")
    pre = bloom_prefilter_join(
        orders, small, "o_custkey", "c_custkey"
    ).select("o_orderkey", "c_custkey")
    a = sorted((r.o_orderkey, r.c_custkey) for r in plain.collect())
    b = sorted((r.o_orderkey, r.c_custkey) for r in pre.collect())
    assert a == b and len(a) > 0


def test_left_semi_identical(spark):
    orders = load_table(spark, SF_DIR, "orders")
    small = _small(spark)
    plain = orders.join(small, orders.o_custkey == small.c_custkey, "left_semi")
    pre = bloom_prefilter_join(orders, small, "o_custkey", "c_custkey", how="left_semi")
    a = sorted(r.o_orderkey for r in plain.collect())
    b = sorted(r.o_orderkey for r in pre.collect())
    assert a == b and len(a) > 0


def test_prefilter_prunes_most_rows(spark):
    """With 20 of ~1500 customers on the small side, the maybe-matching
    fraction entering the join shuffle must be close to the true match
    fraction + fpr, far below the full table."""
    orders = load_table(spark, SF_DIR, "orders")
    small = _small(spark)
    n_small = small.count()
    m_bits, k = bloom_params(n_small, 0.01)
    bloom = bloom_build(small.select("c_custkey"), "c_custkey", m_bits, k)
    flagged = bloom_might_contain(orders, bloom, "o_custkey", m_bits, k)
    total = orders.count()
    kept = flagged.filter(F.col("might_contain")).count()
    matches = orders.join(
        small, orders.o_custkey == small.c_custkey, "left_semi"
    ).count()
    assert kept < 0.2 * total, (kept, total)
    # no false negatives: everything that truly matches survives
    assert kept >= matches


def test_outer_join_refused(spark):
    orders = load_table(spark, SF_DIR, "orders")
    small = _small(spark)
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prefilter_join(orders, small, "o_custkey", "c_custkey", how="left")


def test_empty_small_side(spark):
    orders = load_table(spark, SF_DIR, "orders")
    small = _small(spark).filter(F.lit(False))
    out = bloom_prefilter_join(orders, small, "o_custkey", "c_custkey")
    assert out.count() == 0

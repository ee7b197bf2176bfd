"""Sketch operators (operators/sketches.py): estimates checked against
EXACT answers within the published error bounds (estimates are
implementation-defined, so no cross-engine value-hash oracle — the bound
IS the contract), plus the re-aggregation property that justifies storing
sketches at all."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from l1dbproto_spark.operators.sketches import (
    approx_distinct_per_group,
    approx_quantiles_per_group,
    frequent_items_per_group,
    hll_estimate,
    hll_rollup,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _exact_distinct(col, group):
    return {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT {group}, COUNT(DISTINCT {col}) FROM"
            f" '{SF_DIR}/lineitem.parquet' GROUP BY 1"
        ).fetchall()
    }


def test_approx_distinct_within_rsd(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    got = {
        r.l_returnflag: r.approx_distinct
        for r in approx_distinct_per_group(
            li, "l_returnflag", "l_orderkey", rsd=0.02
        ).collect()
    }
    exact = _exact_distinct("l_orderkey", "l_returnflag")
    assert set(got) == set(exact)
    for k in exact:
        # 5 standard deviations of slack on the 2% rsd
        assert abs(got[k] - exact[k]) <= max(5, 0.1 * exact[k]), (k, got[k], exact[k])


def test_hll_rollup_and_union_reaggregation(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    per_flag = hll_rollup(li, "l_returnflag", "l_orderkey").cache()
    try:
        got = {r.l_returnflag: r.approx_distinct for r in per_flag.collect()}
        exact = _exact_distinct("l_orderkey", "l_returnflag")
        for k in exact:
            assert abs(got[k] - exact[k]) <= max(5, 0.1 * exact[k])
        # the point of storing sketches: the global estimate from MERGING
        # per-group sketches equals (within bound) the direct global count
        merged = hll_estimate(per_flag).collect()[0].approx_distinct
        total_exact = duckdb.sql(
            f"SELECT COUNT(DISTINCT l_orderkey) FROM '{SF_DIR}/lineitem.parquet'"
        ).fetchone()[0]
        assert abs(merged - total_exact) <= max(5, 0.1 * total_exact)
        # and merging is associative over any regrouping: estimate per
        # linestatus-coarsened key from flag-level sketches
        li2 = li.withColumn("coarse", F.lit("all"))
        direct = hll_rollup(li2, "coarse", "l_orderkey").collect()[0].approx_distinct
        assert abs(merged - direct) <= max(5, 0.02 * direct)
    finally:
        per_flag.unpersist()


def test_approx_quantiles_rank_bound(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    probs = [0.25, 0.5, 0.75, 0.95]
    got = {
        r.l_returnflag: r.quantiles
        for r in approx_quantiles_per_group(
            li, "l_returnflag", "l_extendedprice", probs, accuracy=10_000
        ).collect()
    }
    for flag, qs in got.items():
        vals = sorted(
            r[0]
            for r in duckdb.sql(
                f"SELECT l_extendedprice FROM '{SF_DIR}/lineitem.parquet'"
                f" WHERE l_returnflag = '{flag}'"
            ).fetchall()
        )
        n = len(vals)
        for p, q in zip(probs, qs):
            # the returned value must be an actual element whose rank is
            # within 1/accuracy (+1 element of slack) of the target rank
            import bisect

            lo = bisect.bisect_left(vals, q)
            hi = bisect.bisect_right(vals, q) - 1
            target = p * (n - 1)
            tol = n / 10_000 + 1
            assert lo - tol <= target <= hi + tol, (flag, p, q, lo, hi, target)


def test_frequent_items_exact_support(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    got = {
        (r.l_returnflag, r.item): (r.item_count, r.group_count)
        for r in frequent_items_per_group(
            li, "l_returnflag", "l_quantity", min_support=0.015
        ).collect()
    }
    want = {
        (row[0], row[1]): (row[2], row[3])
        for row in duckdb.sql(
            f"""
            WITH c AS (
              SELECT l_returnflag, l_quantity AS item, COUNT(*) AS item_count
              FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1, 2
            ),
            t AS (
              SELECT l_returnflag, COUNT(*) AS group_count
              FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1
            )
            SELECT c.l_returnflag, c.item, c.item_count, t.group_count
            FROM c JOIN t USING (l_returnflag)
            WHERE CAST(c.item_count AS DOUBLE) / t.group_count > 0.015
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_sketch_aggs_partial_aggregate(spark):
    """The sketch aggregations must partial-combine map-side: one exchange,
    with a partial aggregate below it — the property that bounds the
    shuffle at O(groups) regardless of input size."""
    import re

    li = load_table(spark, SF_DIR, "lineitem")
    for df in (
        approx_distinct_per_group(li, "l_returnflag", "l_orderkey"),
        hll_rollup(li, "l_returnflag", "l_orderkey"),
    ):
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hash", plan)) == 1, plan
        assert "partial" in plan.lower(), plan


def test_frequent_items_single_scan(spark):
    """Heavy hitters must scan the corpus ONCE: the group totals window
    over the aggregated counts, never a second FileScan of the input."""
    li = load_table(spark, SF_DIR, "lineitem")
    df = frequent_items_per_group(li, "l_returnflag", "l_quantity", 0.015)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan


def test_hll_sketch_parquet_roundtrip(spark, tmp_path):
    """The sketch column survives a parquet write/read and still merges —
    the store-now-aggregate-later contract a metrics layer relies on."""
    li = load_table(spark, SF_DIR, "lineitem")
    per_flag = hll_rollup(li, "l_returnflag", "l_orderkey")
    path = str(tmp_path / "sketches")
    per_flag.select("l_returnflag", "hll_sketch").write.parquet(path)
    reloaded = spark.read.parquet(path)
    merged = hll_estimate(reloaded).collect()[0].approx_distinct
    direct = hll_estimate(per_flag).collect()[0].approx_distinct
    assert merged == direct

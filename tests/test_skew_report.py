"""skew_report vs a DuckDB oracle on the deliberately-skewed lineitem
supplier key, plus the salt-suggestion arithmetic and the one-exchange
plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.skew import skew_report
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_matches_duckdb_oracle(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    got = skew_report(li, ["l_suppkey"], top_k=5).toPandas()
    want = duckdb.sql(
        f"""
        WITH c AS (
          SELECT l_suppkey, COUNT(*) AS n_rows
          FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1
        ),
        t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c)
        SELECT l_suppkey, n_rows,
               n_rows * 1.0 / total AS share,
               n_rows / (total * 1.0 / n_keys) AS skew_ratio,
               GREATEST(1, CAST(CEIL(n_rows / 1000000.0) AS INT))
                 AS suggested_salts
        FROM c, t
        ORDER BY n_rows DESC, l_suppkey
        LIMIT 5
        """
    ).df()
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_suggested_salts_arithmetic(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") < 990).cast("int").alias("k")  # hot key: 990 rows
    )
    rows = {
        r.k: r for r in skew_report(df, ["k"], target_rows_per_task=100).collect()
    }
    assert rows[1].n_rows == 990 and rows[1].suggested_salts == 10
    assert rows[0].n_rows == 10 and rows[0].suggested_salts == 1
    assert rows[1].share == pytest.approx(0.99)
    # mean key count is 500 -> hot key ratio 1.98
    assert rows[1].skew_ratio == pytest.approx(990 / 500)


def test_one_scan_one_shuffle_then_topk(spark):
    """The counts subtree feeds both the per-key rows and the totals; AQE
    must REUSE that exchange (one FileScan, one key shuffle at runtime),
    the totals ride a broadcast, and the top-k is TakeOrdered — no global
    sort exchange. Post-collect plan per the AQE final-plan contract."""
    li = load_table(spark, SF_DIR, "lineitem")
    df = skew_report(li, ["l_suppkey"])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
    assert "ReusedExchange" in final
    assert "TakeOrderedAndProject" in final

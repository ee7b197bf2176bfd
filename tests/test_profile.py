"""Column profiler (operators/profile.py): exact-vs-approx modes, plan
shapes, top-k values oracle, and edge cases. The registered
``column_profile`` row's full DuckDB oracle also runs in
test_queries_oracle.py like every registry entry."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from l1dbproto_spark.operators.profile import profile, top_values
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exact_profile_values(spark):
    rows = {
        r["col_name"]: r
        for r in profile(load_table(spark, SF_DIR, "orders")).collect()
    }
    con = duckdb.connect()
    n, nd, mn, mx, me = con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT o_totalprice), MIN(o_totalprice),"
        " MAX(o_totalprice),"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(38,9))) AS DOUBLE)/COUNT(*)"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()
    con.close()
    tp = rows["o_totalprice"]
    assert tp["n_rows"] == n and tp["n_distinct"] == nd
    assert tp["min_num"] == mn and tp["max_num"] == mx
    assert tp["mean_num"] == me  # decimal-exact: bit-equal, not approx
    assert tp["min_len"] is None and tp["avg_len"] is None
    st = rows["o_orderstatus"]
    assert st["min_len"] == 1 and st["max_len"] == 1 and st["avg_len"] == 1.0
    assert st["min_num"] is None and st["mean_num"] is None
    # timestamp_ntz column gets epoch-seconds min/max, no mean
    od = rows["o_orderdate"]
    assert od["min_num"] is not None and od["max_num"] > od["min_num"]
    assert od["mean_num"] is None


def test_approx_mode_within_rsd_and_no_expand(spark):
    df = load_table(spark, SF_DIR, "orders")
    exact = {
        r["col_name"]: r["n_distinct"] for r in profile(df).collect()
    }
    approx_df = profile(df, approx=True, rsd=0.05)
    plan = _plan(approx_df)
    # the 100 TB mode: HLL registers, plain aggregation — no Expand
    assert "Expand" not in plan
    assert plan.count("FileScan") == 1
    for r in approx_df.collect():
        got, want = r["n_distinct"], exact[r["col_name"]]
        assert abs(got - want) <= max(3, 0.15 * want), (r["col_name"], got, want)
    # exact multi-distinct pays the documented Expand over ONE scan
    exact_plan = _plan(profile(df))
    assert "Expand" in exact_plan
    assert exact_plan.count("FileScan") == 1


def test_top_values_oracle_and_plan(spark):
    df = load_table(spark, SF_DIR, "orders")
    tv = top_values(df, ["o_orderstatus", "o_orderpriority"], k=3)
    plan = _plan(tv)
    assert "TakeOrdered" in plan  # top-k over counts, not a global sort
    got = (
        tv.toPandas()
        .sort_values(["col_name", "rank"], ignore_index=True)
        .reindex(sorted(["col_name", "value", "cnt", "rank"]), axis=1)
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH u AS (
          SELECT 'o_orderstatus' AS col_name, o_orderstatus AS value
          FROM '{SF_DIR}/orders.parquet'
          UNION ALL
          SELECT 'o_orderpriority', o_orderpriority
          FROM '{SF_DIR}/orders.parquet'
        ),
        c AS (
          SELECT col_name, value, COUNT(*) AS cnt,
                 ROW_NUMBER() OVER (
                   PARTITION BY col_name ORDER BY COUNT(*) DESC, value
                 ) AS rank
          FROM u WHERE value IS NOT NULL GROUP BY col_name, value
        )
        SELECT * FROM c WHERE rank <= 3
        """
    ).df()
    con.close()
    want = want.sort_values(["col_name", "rank"], ignore_index=True).reindex(
        sorted(want.columns), axis=1
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_profile_empty_and_errors(spark):
    df = load_table(spark, SF_DIR, "orders").filter("o_orderkey < 0")
    rows = {r["col_name"]: r for r in profile(df, columns=["o_custkey"]).collect()}
    r = rows["o_custkey"]
    assert r["n_rows"] == 0 and r["n_nonnull"] == 0 and r["n_distinct"] == 0
    assert r["min_num"] is None and r["mean_num"] is None
    with pytest.raises(ValueError, match="no such columns"):
        profile(df, columns=["nope"])
    with pytest.raises(ValueError, match="no such columns"):
        top_values(df, ["nope"])
    with pytest.raises(ValueError, match="k must be"):
        top_values(df, ["o_custkey"], k=0)
    with pytest.raises(ValueError, match="non-empty"):
        profile(df, columns=[])
    with pytest.raises(ValueError, match="non-empty"):
        top_values(df, [])


def test_quote_bearing_names_and_types_escaped(spark):
    """Names AND type simpleStrings reach the stack() SQL as quoted
    literals — quote/backslash-bearing column names and struct-field
    names must profile correctly, not parse as SQL (expression
    injection). Covers the r9-review case: the type string of
    struct<a'b:bigint> is interpolated too."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id").alias("a'b"),
        F.col("id").alias("c\\"),
        F.struct(F.col("id").alias("x'y")).alias("s"),
    )
    rows = {r["col_name"]: r for r in profile(df).collect()}
    assert set(rows) == {"a'b", "c\\", "s"}
    assert rows["a'b"]["n_nonnull"] == 3 and rows["a'b"]["mean_num"] == 1.0
    assert rows["s"]["dtype"] == "struct<x'y:bigint>"


def test_exact_mean_beyond_double_precision(spark):
    """Bigints above 2^53: the exact-decimal mean must NOT route through a
    double intermediate (2^53+1 and 2^53+3 are both 2^53+2.0 as doubles —
    a double-pathed sum would land on a different mean than the decimal
    truth, which here is exactly representable)."""
    base = 1 << 53
    df = spark.createDataFrame([(base + 1,), (base + 3,)], "v long")
    r = profile(df, columns=["v"]).collect()[0]
    assert r["mean_num"] == float(base + 2)
    import duckdb

    want = duckdb.sql(
        f"SELECT CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) / 2 "
        f"FROM (VALUES ({base + 1}), ({base + 3})) t(v)"
    ).fetchone()[0]
    assert r["mean_num"] == want

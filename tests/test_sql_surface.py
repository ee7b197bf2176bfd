"""The plain-SQL face of the engine: the ANSI-portable subset of the
registry's oracle strings runs UNCHANGED through ``spark.sql`` over
`sql.register_views` and returns the same rows as the DataFrame builders —
one logical algebra, two front-ends. (DuckDB-dialect oracles — list
functions, ``string_split_regex``, ``generate_series`` — are excluded by
construction; they are oracle-side only.)"""

from __future__ import annotations

import pandas as pd

from l1dbproto_spark.queries import load_all
from l1dbproto_spark.sql import register_views, run_sql

SF_DIR = "/root/testdata/sf0.001"

# registry queries whose oracle SQL is ANSI-portable to Spark SQL verbatim
# (probed: DuckDB-isms like arg_max / list functions / generate_series
# exclude the rest)
PORTABLE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "latest_version_per_key",
    "session_window_agg",
    "visit_window_agg",
    "metrics_pivot_wide",
    "salted_skew_agg",
    "frequent_items_per_group",
    "q10_returned_items",
    "q18_large_orders",
    "part_copurchase_triangles",
    "pixel_histogram",
    "forced_photometry_eligibility",
    "history_semi_join",
    "funnel_conversion",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_portable_oracles_run_in_spark_sql(spark):
    specs = load_all()
    register_views(spark, SF_DIR)
    checked = 0
    for name in PORTABLE:
        sql = specs[name].oracle
        assert sql is not None, name
        got = _norm(spark.sql(sql).toPandas())
        want = _norm(specs[name].builder(spark, SF_DIR).toPandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name)
        checked += 1
    assert checked == len(PORTABLE)


def test_run_sql_helper(spark):
    out = run_sql(spark, SF_DIR, "SELECT COUNT(*) AS n FROM lineitem").collect()
    assert out[0].n > 0

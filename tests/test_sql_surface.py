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
    "visit_window_agg",
    "part_copurchase_triangles",
    "pixel_histogram",
    "forced_photometry_eligibility",
    "history_semi_join",
    # round-10 serving components: both oracles are ANSI-portable
    "rollup_hourly_serve",
    "bucketed_join_agg",
    # round-11 ingest row: the oracle predicts the quarantine contract
    # from `documents` with plain arithmetic, so Spark SQL runs it
    # verbatim against the builder's actual fixture round-trip. (The
    # other r11 rows are NOT verbatim-portable: weighted_topk_sample's
    # hex-literal CAST parses only in DuckDB, and bfs_distances needs a
    # recursive UNION-distinct CTE where Spark 4 supports UNION ALL
    # only.)
    "csv_ingest_quarantine",
    # round-12 rows: the image-family window oracle and the evolution
    # plan/loss oracle are ANSI-portable (named WINDOW, TRY_CAST, VALUES
    # all parse in Spark 4); weburl_dedup_mix (bare VARCHAR casts) and
    # contrastive_pairs (list_dot_product) stay DuckDB-side only.
    "image_dedup_families",
    "evolve_cast_loss",
]


def _rotated_portable():
    """Portable (builder, oracle) pairs for queries rotated out of the
    50-cap driver registry — they stay part of the two-front-end contract
    even without a registry slot."""
    from l1dbproto_spark.queries.events import (
        FREQUENT_ITEMS_ORACLE,
        METRICS_PIVOT_WIDE_ORACLE,
        frequent_items_per_group_days,
        metrics_pivot_wide,
    )
    from l1dbproto_spark.queries.analytics import (
        FUNNEL_CONVERSION_ORACLE,
        funnel_conversion as _funnel_q,
    )
    from l1dbproto_spark.queries.misc import (
        SESSION_WINDOW_ORACLE,
        session_window_agg,
    )
    from l1dbproto_spark.queries.relational2 import (
        ASOF_LAST_CLICK_ORACLE,
        SALTED_SKEW_ORACLE,
        asof_last_click_before_purchase,
        salted_skew_agg,
    )
    from l1dbproto_spark.queries.tpch_battery import (
        Q10_RETURNED_ITEMS_ORACLE,
        Q18_LARGE_ORDERS_ORACLE,
        q10_returned_items,
        q18_large_orders,
    )

    return {
        "metrics_pivot_wide": (metrics_pivot_wide, METRICS_PIVOT_WIDE_ORACLE),
        "salted_skew_agg": (salted_skew_agg, SALTED_SKEW_ORACLE),
        "frequent_items_per_group": (
            frequent_items_per_group_days,
            FREQUENT_ITEMS_ORACLE,
        ),
        "session_window_agg": (session_window_agg, SESSION_WINDOW_ORACLE),
        # r13 rotations: still ANSI-portable, still part of the
        # two-front-end contract without a registry slot. The correlated
        # scalar subquery in the as-of oracle parses in Spark 4 too.
        "q10_returned_items": (q10_returned_items, Q10_RETURNED_ITEMS_ORACLE),
        "q18_large_orders": (q18_large_orders, Q18_LARGE_ORDERS_ORACLE),
        "asof_last_click_before_purchase": (
            asof_last_click_before_purchase,
            ASOF_LAST_CLICK_ORACLE,
        ),
        # r14 rotation: funnel_conversion lost its slot to the r13
        # promotion queue but its oracle is ANSI-portable, so it stays in
        # the two-front-end contract from here.
        "funnel_conversion": (_funnel_q, FUNNEL_CONVERSION_ORACLE),
    }


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_portable_oracles_run_in_spark_sql(spark):
    specs = load_all()
    rotated = _rotated_portable()
    assert not set(PORTABLE) & set(rotated), "query listed on both sides"
    register_views(spark, SF_DIR)
    pairs = {n: (specs[n].builder, specs[n].oracle) for n in PORTABLE}
    pairs.update(rotated)
    checked = 0
    for name, (builder, sql) in pairs.items():
        assert sql is not None, name
        got = _norm(spark.sql(sql).toPandas())
        want = _norm(builder(spark, SF_DIR).toPandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name)
        checked += 1
    assert checked == len(PORTABLE) + len(rotated)


def test_run_sql_helper(spark):
    out = run_sql(spark, SF_DIR, "SELECT COUNT(*) AS n FROM lineitem").collect()
    assert out[0].n > 0

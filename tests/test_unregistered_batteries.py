"""The date/null and array batteries lost their driver-registry slots in
round 3 (50-cap: replaced by pack_sequences / quantized_topk) but remain API
surface — this keeps them under the SAME DuckDB oracles in-suite."""

from __future__ import annotations

import duckdb
import pandas as pd

from l1dbproto_spark.queries.relational2 import date_null_battery
from l1dbproto_spark.queries.windows2 import array_functions

SF_DIR = "/root/testdata/sf0.001"

DATE_NULL_ORACLE = f"""
WITH orders AS (SELECT * FROM '{SF_DIR}/orders.parquet'),
v AS (
  SELECT
    o_orderkey, o_orderdate,
    LEAD(o_orderdate) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ) AS next_date
  FROM orders
)
SELECT
  o_orderkey,
  EXTRACT(year FROM o_orderdate) AS yr,
  EXTRACT(month FROM o_orderdate) AS mo,
  EXTRACT(dow FROM o_orderdate) AS dow,
  CAST(CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS TIMESTAMP) AS due_date,
  date_diff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS days_to_eoy,
  CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
  next_date IS NULL AS is_latest,
  COALESCE(next_date, TIMESTAMP '2199-12-31 00:00:00') AS next_or_max,
  CASE WHEN next_date IS NULL THEN -1
       ELSE date_diff('day', o_orderdate, next_date) END AS gap_days,
  NULLIF(date_diff('day', o_orderdate, COALESCE(next_date, o_orderdate)), 0)
    AS gap_or_null
FROM v
"""

ARRAY_ORACLE = f"""
SELECT
  vec_id,
  len(embedding) AS dim,
  CAST(embedding[1] AS DOUBLE) AS first_dim,
  CAST(list_max(embedding) AS DOUBLE) AS max_dim,
  CAST(list_min(embedding) AS DOUBLE) AS min_dim,
  len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM '{SF_DIR}/embeddings.parquet'
"""


def _normalize(df: pd.DataFrame, sort_key: str) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(sort_key, ignore_index=True)


def test_date_null_battery_matches_oracle(spark):
    got = _normalize(date_null_battery(spark, SF_DIR).toPandas(), "o_orderkey")
    want = _normalize(duckdb.sql(DATE_NULL_ORACLE).df(), "o_orderkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_array_functions_matches_oracle(spark):
    got = _normalize(array_functions(spark, SF_DIR).toPandas(), "vec_id")
    want = _normalize(duckdb.sql(ARRAY_ORACLE).df(), "vec_id")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

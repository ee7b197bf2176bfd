"""Batteries that lost their driver-registry slots (50-cap) but remain API
surface — this keeps them under the SAME DuckDB oracles in-suite.
Round 3: date/null + array (slots to pack_sequences / quantized_topk).
Round 4: schema_fill + string/pattern/rank (slots to ivf_pq_topk /
sample_mixture)."""

from __future__ import annotations

import duckdb
import pandas as pd

from l1dbproto_spark.queries.relational2 import date_null_battery
from l1dbproto_spark.queries.synthesis import schema_fill
from l1dbproto_spark.queries.windows2 import array_functions, string_pattern_rank_battery

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


_HASH = "CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)"
_HASH2 = (
    "CAST(concat('0x', substr(md5(concat('sample:', CAST(o_orderkey AS VARCHAR))), 1, 15))"
    " AS BIGINT)"
)

SCHEMA_FILL_ORACLE = f"""
WITH h AS (
  SELECT o_orderkey, {_HASH} AS hv, {_HASH2} AS hs
  FROM '{SF_DIR}/orders.parquet'
)
SELECT
  o_orderkey,
  CAST(hv AS DOUBLE) / 1152921504606846976.0 AS f64,
  CAST(hv % 1000 AS INTEGER) AS i32,
  CAST(hv % 2 = 0 AS BOOLEAN) AS flag,
  substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS s8,
  make_timestamp(hv % 31536000000000) AS ts
FROM h
WHERE hs % 10 < 9
"""

STRING_PATTERN_RANK_ORACLE = f"""
SELECT
  p_partkey,
  upper(p_name) AS up,
  substr(p_name, 5, 6) AS mid,
  replace(p_name, ' ', '_') AS repl,
  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded,
  concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brandsize,
  length(p_name) AS name_len,
  CAST(strpos(p_name, 'o') AS BIGINT) AS o_pos,
  p_name LIKE '%widget%' AS has_widget,
  p_name LIKE 'cold%' AS starts_cold,
  p_brand LIKE 'Brand#1_' AS brand_1x,
  regexp_matches(p_type, '^(ECONOMY|STANDARD)$') AS simple_type,
  DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS drank,
  NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS quartile,
  PERCENT_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS prank
FROM '{SF_DIR}/part.parquet'
WHERE p_name LIKE '%o%'
"""


def test_schema_fill_matches_oracle(spark):
    got = _normalize(schema_fill(spark, SF_DIR).toPandas(), "o_orderkey")
    want = _normalize(duckdb.sql(SCHEMA_FILL_ORACLE).df(), "o_orderkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_string_pattern_rank_matches_oracle(spark):
    got = _normalize(
        string_pattern_rank_battery(spark, SF_DIR).toPandas(), "p_partkey"
    )
    want = _normalize(duckdb.sql(STRING_PATTERN_RANK_ORACLE).df(), "p_partkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Round 4: unpivot + cube (slots to contamination_report / semdedup_drops)

UNPIVOT_ORACLE = f"""
WITH orders AS (SELECT * FROM '{SF_DIR}/orders.parquet')
SELECT o_orderkey, 'totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS value FROM orders
UNION ALL
SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
"""

CUBE_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  GROUPING(l_returnflag, l_linestatus) AS gid,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n
FROM '{SF_DIR}/lineitem.parquet'
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def test_unpivot_order_metrics_matches_oracle(spark):
    from l1dbproto_spark.queries.windows2 import unpivot_order_metrics

    got = (
        unpivot_order_metrics(spark, SF_DIR)
        .toPandas()
        .sort_values(["o_orderkey", "metric"], ignore_index=True)
    )
    want = (
        duckdb.sql(UNPIVOT_ORACLE)
        .df()
        .sort_values(["o_orderkey", "metric"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cube_pricing_matches_oracle(spark):
    from l1dbproto_spark.queries.relational2 import cube_pricing

    keys = ["gid", "l_returnflag", "l_linestatus"]
    got = (
        cube_pricing(spark, SF_DIR)
        .toPandas()
        .sort_values(keys, ignore_index=True)
    )
    want = duckdb.sql(CUBE_ORACLE).df().sort_values(keys, ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


SET_OPS_ORACLE = f"""
WITH orders AS (SELECT * FROM '{SF_DIR}/orders.parquet')
SELECT o_custkey, 'repeat' AS tag FROM (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  INTERSECT
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
UNION ALL
SELECT o_custkey, 'churned' AS tag FROM (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  EXCEPT
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
)
"""


def test_set_ops_customers_matches_oracle(spark):
    """Round 5: set_ops_customers lost its registry slot to
    frequent_items_per_group; same oracle, now in-suite."""
    from l1dbproto_spark.queries.relational2 import set_ops_customers

    got = set_ops_customers(spark, SF_DIR).toPandas()
    got["key"] = got.o_custkey.astype(str) + ":" + got.tag
    want = duckdb.sql(SET_OPS_ORACLE).df()
    want["key"] = want.o_custkey.astype(str) + ":" + want.tag
    assert sorted(got.key) == sorted(want.key)


def test_simhash_fingerprints_matches_oracle(spark):
    """Round 5 (late): simhash_fingerprints lost its registry slot to
    dsir_log_weights; same oracle, now in-suite (the registered
    simhash_near_dup_pairs query still exercises the fingerprint formula
    as its candidate-generation prefix)."""
    from l1dbproto_spark.queries.dedup import (
        _SIMHASH_SIG_CTE,
        simhash_fingerprints,
    )

    got = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = {
        int(d): int(s)
        for d, s in con.sql(
            f"WITH {_SIMHASH_SIG_CTE} SELECT doc_id, simhash FROM sim"
        ).fetchall()
    }
    con.close()
    assert got == want


PRICE_PCT_ORACLE = f"""
SELECT
  o_orderstatus,
  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
  round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
  CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
  CAST(MAX(o_totalprice) AS DOUBLE) AS hi
FROM '{SF_DIR}/orders.parquet'
GROUP BY o_orderstatus
"""


def test_price_percentiles_matches_oracle(spark):
    """Round 5 (late): price_percentiles lost its registry slot to
    collocations_pmi; same oracle, now in-suite."""
    from l1dbproto_spark.queries.relational2 import price_percentiles

    got = {
        r.o_orderstatus: (r.p50, r.p90, r.lo, r.hi)
        for r in price_percentiles(spark, SF_DIR).collect()
    }
    want = {
        s: (float(a), float(b), float(c), float(d))
        for s, a, b, c, d in duckdb.sql(PRICE_PCT_ORACLE).fetchall()
    }
    assert got == want


# Round 6: window_frames_battery (slot to dedup_corpus_lines; W2 stays
# driver-covered via latest_version_per_key + the SCD-2 pytest suite)

WINDOW_FRAMES_ORACLE = f"""
WITH orders AS (SELECT * FROM '{SF_DIR}/orders.parquet')
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS running_spend,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
  ) AS DOUBLE)
  / COUNT(*) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
  ) AS moving_avg_3,
  o_orderdate AS validity_start,
  LEAD(o_orderdate) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ) AS validity_end,
  (o_orderdate <= TIMESTAMP '1997-06-01 00:00:00'
   AND (LEAD(o_orderdate) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ) IS NULL
        OR LEAD(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) > TIMESTAMP '1997-06-01 00:00:00')) AS active_at_t
FROM orders
"""


def test_window_frames_battery_matches_oracle(spark):
    from l1dbproto_spark.queries.windows2 import window_frames_battery

    got = _normalize(
        window_frames_battery(spark, SF_DIR).toPandas(), "o_orderkey"
    )
    want = _normalize(duckdb.sql(WINDOW_FRAMES_ORACLE).df(), "o_orderkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Round 7: blob_metadata rotated out (slot to doc_embed_ann). The
# multimodal family stays driver-checked via media_byte_histogram and
# media_chunk_fingerprints; the metadata oracle lives on here.
def test_blob_metadata_matches_oracle(spark):
    from l1dbproto_spark.queries.multimodal import (
        BLOB_METADATA_ORACLE,
        blob_metadata_q,
    )

    got = _normalize(blob_metadata_q(spark, SF_DIR).toPandas(), "media_id")
    want = _normalize(
        duckdb.sql(
            BLOB_METADATA_ORACLE.replace(
                "FROM documents", f"FROM '{SF_DIR}/documents.parquet'"
            )
        ).df(),
        "media_id",
    )
    pd.testing.assert_frame_equal(got, want)


# Round 8: exists_anti_semi + above_average_customers (slots to bm25_topk /
# fuzzy_name_match; anti/semi joins stay driver-covered via history_semi_join,
# semdedup_drops and contamination_report, the broadcast-scalar pattern via
# bm25_topk's corpus-stats crossJoin)

EXISTS_ANTI_SEMI_ORACLE = f"""
WITH customer AS (SELECT * FROM '{SF_DIR}/customer.parquet'),
orders AS (SELECT * FROM '{SF_DIR}/orders.parquet')
SELECT c.c_custkey, c.c_name, c.c_acctbal, 'no_recent_order' AS tag
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
)
UNION ALL
SELECT c.c_custkey, c.c_name, c.c_acctbal, 'big_spender' AS tag
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


def test_exists_anti_semi_matches_oracle(spark):
    from l1dbproto_spark.queries.relational import exists_anti_semi

    got = _normalize(exists_anti_semi(spark, SF_DIR).toPandas(), "c_custkey")
    got = got.sort_values(["c_custkey", "tag"], ignore_index=True)
    want = _normalize(duckdb.sql(EXISTS_ANTI_SEMI_ORACLE).df(), "c_custkey")
    want = want.sort_values(["c_custkey", "tag"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


ABOVE_AVERAGE_ORACLE = f"""
WITH customer AS (SELECT * FROM '{SF_DIR}/customer.parquet'),
s AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer
)
SELECT c_custkey, c_name, c_acctbal
FROM customer, s
WHERE c_acctbal > s.avg_bal
"""


def test_above_average_customers_matches_oracle(spark):
    from l1dbproto_spark.queries.relational2 import above_average_customers

    got = _normalize(above_average_customers(spark, SF_DIR).toPandas(), "c_custkey")
    want = _normalize(duckdb.sql(ABOVE_AVERAGE_ORACLE).df(), "c_custkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Round 8 (late): q6_forecast_revenue (slot to gap_fill_resample; the
# filtered global decimal aggregate stays driver-checked via
# q1_pricing_summary / filtered_counts)

Q6_ORACLE = f"""
WITH lineitem AS (SELECT * FROM '{SF_DIR}/lineitem.parquet')
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def test_q6_forecast_revenue_matches_oracle(spark):
    from l1dbproto_spark.queries.relational2 import q6_forecast_revenue

    got = q6_forecast_revenue(spark, SF_DIR).collect()[0]
    want = duckdb.sql(Q6_ORACLE).fetchall()[0]
    assert (got.revenue, got.n) == (want[0], want[1])


# Round 8 (late): top_k_per_group (slot to phrase_match; W1 stays
# driver-checked via latest_version_per_key, W7 via q3_top_orders)

TOP_K_ORACLE = f"""
WITH customer AS (SELECT * FROM '{SF_DIR}/customer.parquet')
SELECT c_nationkey, c_custkey, c_acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
         ) AS rn
  FROM customer
) t
WHERE rn <= 3
"""


def test_top_k_per_group_matches_oracle(spark):
    from l1dbproto_spark.queries.windows import top_k_per_group

    got = _normalize(top_k_per_group(spark, SF_DIR).toPandas(), "c_custkey")
    want = _normalize(duckdb.sql(TOP_K_ORACLE).df(), "c_custkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Round 9: catalog_union / filtered_counts / doc_fingerprint (slots to
# hamming_topk / funnel_conversion / cohort_retention) — the three thinnest
# registered rows; same oracles, same compare, in-suite.

CATALOG_UNION_ORACLE = f"""
WITH orders AS (SELECT * FROM '{SF_DIR}/orders.parquet')
SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 350000
UNION
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
"""


def test_catalog_union_matches_oracle(spark):
    from l1dbproto_spark.queries.apdb_domain import catalog_union

    got = _normalize(catalog_union(spark, SF_DIR).toPandas(), "o_orderkey")
    want = _normalize(duckdb.sql(CATALOG_UNION_ORACLE).df(), "o_orderkey")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


FILTERED_COUNTS_ORACLE = f"""
WITH orders AS (SELECT * FROM '{SF_DIR}/orders.parquet')
SELECT
  o_orderstatus,
  COUNT(*) AS n_orders,
  COUNT(*) FILTER (WHERE o_totalprice > 300000) AS n_large,
  COUNT(DISTINCT o_custkey) AS n_customers,
  MAX(o_orderkey) AS last_order_id
FROM orders
GROUP BY o_orderstatus
"""


def test_filtered_counts_matches_oracle(spark):
    from l1dbproto_spark.queries.relational import filtered_counts

    got = _normalize(filtered_counts(spark, SF_DIR).toPandas(), "o_orderstatus")
    want = _normalize(duckdb.sql(FILTERED_COUNTS_ORACLE).df(), "o_orderstatus")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


DOC_FINGERPRINT_ORACLE = f"""
WITH documents AS (SELECT * FROM '{SF_DIR}/documents.parquet')
SELECT
  doc_id,
  md5(lower(trim(text))) AS fingerprint,
  substr(md5(lower(trim(text))), 1, 4) AS shard
FROM documents
"""


def test_doc_fingerprint_matches_oracle(spark):
    from l1dbproto_spark.queries.text import doc_fingerprint

    got = _normalize(doc_fingerprint(spark, SF_DIR).toPandas(), "doc_id")
    want = _normalize(duckdb.sql(DOC_FINGERPRINT_ORACLE).df(), "doc_id")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Round 9: multi-way-join battery (TPC-H q7/q8 shapes — in-suite only,
# no registry slot spent; the join strategies are already driver-covered)

Q7_ORACLE = f"""
WITH li AS (SELECT * FROM '{SF_DIR}/lineitem.parquet'
            WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01'
                                 AND TIMESTAMP '1998-12-31 23:59:59'),
o AS (SELECT * FROM '{SF_DIR}/orders.parquet'),
c AS (SELECT * FROM '{SF_DIR}/customer.parquet'),
s AS (SELECT * FROM '{SF_DIR}/supplier.parquet'),
n AS (SELECT * FROM '{SF_DIR}/nation.parquet')
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM li
JOIN o ON l_orderkey = o_orderkey
JOIN s ON l_suppkey = s_suppkey
JOIN c ON o_custkey = c_custkey
JOIN n n1 ON s_nationkey = n1.n_nationkey
JOIN n n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3
"""


def test_q7_volume_shipping_matches_oracle(spark):
    from l1dbproto_spark.queries.relational2 import q7_volume_shipping

    keys = ["supp_nation", "cust_nation", "l_year"]
    got = (
        _normalize(q7_volume_shipping(spark, SF_DIR).toPandas(), "l_year")
        .sort_values(keys)
        .reset_index(drop=True)
    )
    want = (
        _normalize(duckdb.sql(Q7_ORACLE).df(), "l_year")
        .sort_values(keys)
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


Q8_ORACLE = f"""
WITH li AS (SELECT l.* FROM '{SF_DIR}/lineitem.parquet' l
            JOIN '{SF_DIR}/part.parquet' ON l_partkey = p_partkey
            WHERE p_type = 'STANDARD'),
o AS (SELECT * FROM '{SF_DIR}/orders.parquet'
      WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                            AND TIMESTAMP '1997-12-31 23:59:59'),
c AS (SELECT c_custkey FROM '{SF_DIR}/customer.parquet'
      JOIN '{SF_DIR}/nation.parquet' ON c_nationkey = n_nationkey
      JOIN '{SF_DIR}/region.parquet' ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
s AS (SELECT s_suppkey, n_name AS supp_nation FROM '{SF_DIR}/supplier.parquet'
      JOIN '{SF_DIR}/nation.parquet' ON s_nationkey = n_nationkey),
vols AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year, supp_nation,
         CAST(l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS vol
  FROM li JOIN o ON l_orderkey = o_orderkey
  JOIN c ON o_custkey = c_custkey
  JOIN s ON l_suppkey = s_suppkey
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol END) AS DOUBLE)
         AS nation_volume,
       CAST(SUM(vol) AS DOUBLE) AS total_volume,
       CASE WHEN CAST(SUM(vol) AS DOUBLE) > 0
            THEN round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol END)
                            AS DOUBLE) / CAST(SUM(vol) AS DOUBLE), 6)
       END AS mkt_share
FROM vols
GROUP BY 1
"""


def test_q8_market_share_matches_oracle(spark):
    from l1dbproto_spark.queries.relational2 import q8_market_share

    got = _normalize(q8_market_share(spark, SF_DIR).toPandas(), "o_year")
    want = _normalize(duckdb.sql(Q8_ORACLE).df(), "o_year")
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Round 10: partitioned_source_ids / media_byte_histogram (slots to
# q10_returned_items / q18_large_orders) — same oracles, same compare,
# in-suite. W3/W4 keep their id-formula pytest; multimodal keeps the
# registered media_chunk_fingerprints row.

PARTITIONED_SOURCE_IDS_ORACLE = f"""
SELECT
  l_orderkey,
  l_linenumber,
  l_orderkey * 1000000 + ROW_NUMBER() OVER (
    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
  ) AS dia_source_id
FROM '{SF_DIR}/lineitem.parquet'
"""


def test_partitioned_source_ids_matches_oracle(spark):
    from l1dbproto_spark.queries.windows import partitioned_source_ids

    got = _normalize(
        partitioned_source_ids(spark, SF_DIR).toPandas(),
        ["l_orderkey", "l_linenumber"],
    )
    want = _normalize(
        duckdb.sql(PARTITIONED_SOURCE_IDS_ORACLE).df(),
        ["l_orderkey", "l_linenumber"],
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_media_byte_histogram_matches_oracle(spark):
    from l1dbproto_spark.queries.multimodal import (
        MEDIA_BYTE_HISTOGRAM_ORACLE,
        media_byte_histogram,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    got = _normalize(media_byte_histogram(spark, SF_DIR).toPandas(), "media_id")
    want = _normalize(con.execute(MEDIA_BYTE_HISTOGRAM_ORACLE).df(), "media_id")
    con.close()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Round 10 (cont.): argmax_order_per_customer / json_payload_extract
# (slots to part_copurchase_triangles / data_quality_report) — same
# oracles, same compare, in-suite.


def test_argmax_order_per_customer_matches_oracle(spark):
    from l1dbproto_spark.queries.relational2 import (
        ARGMAX_ORDER_ORACLE,
        argmax_order_per_customer,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    got = _normalize(
        argmax_order_per_customer(spark, SF_DIR).toPandas(), "o_custkey"
    )
    want = _normalize(con.execute(ARGMAX_ORDER_ORACLE).df(), "o_custkey")
    con.close()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_json_payload_extract_matches_oracle(spark):
    from l1dbproto_spark.queries.events import (
        JSON_PAYLOAD_EXTRACT_ORACLE,
        json_payload_extract,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    got = _normalize(json_payload_extract(spark, SF_DIR).toPandas(), "event_type")
    want = _normalize(con.execute(JSON_PAYLOAD_EXTRACT_ORACLE).df(), "event_type")
    con.close()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Round 10 (cont.): hopping-window aggregation — each event in exactly
# window/slide = 4 epoch-aligned buckets; the oracle reconstructs the
# bucket expansion with generate_series (DuckDB-dialect, oracle-side only).

HOPPING_WINDOW_ORACLE = f"""
WITH expanded AS (
  -- time_bucket's default origin (2000-01-01) is a multiple of 900 s, so
  -- buckets align with Spark's epoch-aligned windows; it returns a NAIVE
  -- timestamp (to_timestamp would come back tz-aware and break the compare)
  SELECT e.event_type, e.value, ts,
         unnest(generate_series(
           time_bucket(INTERVAL '15 minutes', ts) - INTERVAL 45 MINUTE,
           time_bucket(INTERVAL '15 minutes', ts),
           INTERVAL 15 MINUTE)) AS window_start
  FROM '{SF_DIR}/events.parquet' e
)
SELECT window_start, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM expanded
WHERE ts >= window_start AND ts < window_start + INTERVAL 60 MINUTE
GROUP BY 1, 2
"""


def test_hopping_window_agg_matches_oracle(spark):
    from l1dbproto_spark.queries.events import hopping_window_agg

    keys = ["window_start", "event_type"]
    got = _normalize(hopping_window_agg(spark, SF_DIR).toPandas(), keys)
    want = _normalize(duckdb.sql(HOPPING_WINDOW_ORACLE).df(), keys)
    assert len(got) > 0
    # every event appears in exactly 4 buckets
    n_events = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert got["n"].sum() == 4 * n_events
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Round 11: pixelization_ids (slot to column_profile) — same oracle,
# same compare, in-suite. J5/§4 stay driver-checked via pixel_range_scan.


def test_pixelization_ids_matches_oracle(spark):
    from l1dbproto_spark.queries.geo import (
        PIXELIZATION_IDS_ORACLE,
        pixelization_ids,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    got = _normalize(pixelization_ids(spark, SF_DIR).toPandas(), "o_orderkey")
    want = _normalize(con.execute(PIXELIZATION_IDS_ORACLE).df(), "o_orderkey")
    con.close()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_metrics_pivot_wide_matches_oracle(spark):
    from l1dbproto_spark.queries.events import (
        METRICS_PIVOT_WIDE_ORACLE,
        metrics_pivot_wide,
    )
    from l1dbproto_spark.sources.catalog import load_table

    con = duckdb.connect()
    load_table(spark, SF_DIR, "events").toPandas().pipe(
        lambda pdf: con.register("events", pdf)
    )
    got = _normalize(metrics_pivot_wide(spark, SF_DIR).toPandas(), "day")
    want = _normalize(con.execute(METRICS_PIVOT_WIDE_ORACLE).df(), "day")
    con.close()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# Driver round 10: salted_skew_agg / frequent_items_per_group /
# session_window_agg lost their slots to the round-9 serving components
# (rollup_hourly_serve / bucketed_join_agg / mmr_rerank_topk) — SAME
# oracles (shared constants in their query modules), driver-grade compare
# (tools.check_correctness), in-suite.


def _driver_grade(spark, builder, oracle, name):
    from tools.check_correctness import compare, duck_connection

    con = duck_connection(SF_DIR)
    got = builder(spark, SF_DIR).toPandas()
    want = con.execute(oracle).df()
    con.close()
    assert len(got) > 0
    issues = compare(name, got, want)
    assert not issues, f"{name}: {issues}"


def test_salted_skew_agg_matches_oracle(spark):
    from l1dbproto_spark.queries.relational2 import (
        SALTED_SKEW_ORACLE,
        salted_skew_agg,
    )

    _driver_grade(spark, salted_skew_agg, SALTED_SKEW_ORACLE, "salted_skew_agg")


def test_frequent_items_per_group_matches_oracle(spark):
    from l1dbproto_spark.queries.events import (
        FREQUENT_ITEMS_ORACLE,
        frequent_items_per_group_days,
    )

    _driver_grade(
        spark,
        frequent_items_per_group_days,
        FREQUENT_ITEMS_ORACLE,
        "frequent_items_per_group",
    )


def test_session_window_agg_matches_oracle(spark):
    from l1dbproto_spark.queries.misc import (
        SESSION_WINDOW_ORACLE,
        session_window_agg,
    )

    _driver_grade(
        spark, session_window_agg, SESSION_WINDOW_ORACLE, "session_window_agg"
    )


# Driver round 11: dedup_corpus_lines / text_stats / language_id lost their
# slots to the round-10 components (weighted_topk_sample / bfs_distances /
# csv_ingest_quarantine) — SAME oracles (shared constants in their query
# modules), driver-grade compare, in-suite. The C4 family keeps its
# operator pytest coverage; text analysis keeps the registered
# tfidf_top_terms row.


def test_dedup_corpus_lines_query_matches_oracle(spark):
    from l1dbproto_spark.queries.dedup import (
        DEDUP_CORPUS_LINES_ORACLE,
        dedup_corpus_lines,
    )

    _driver_grade(
        spark, dedup_corpus_lines, DEDUP_CORPUS_LINES_ORACLE, "dedup_corpus_lines"
    )


def test_text_stats_matches_oracle(spark):
    from l1dbproto_spark.queries.text import TEXT_STATS_ORACLE, text_stats

    _driver_grade(spark, text_stats, TEXT_STATS_ORACLE, "text_stats")


def test_language_id_matches_oracle(spark):
    from l1dbproto_spark.queries.text import LANGUAGE_ID_ORACLE, language_id

    _driver_grade(spark, language_id, LANGUAGE_ID_ORACLE, "language_id")


# Driver round 12: tfidf_top_terms / column_profile /
# media_chunk_fingerprints / cohort_retention lost their slots to the
# round-11 components (image_dedup_families / weburl_dedup_mix /
# contrastive_pairs / evolve_cast_loss) — SAME oracles (shared constants
# in their query modules), driver-grade compare, in-suite. Text keeps
# bm25/phrase/collocations driver rows, profiling keeps
# data_quality_report, multimodal trades up to the real decode->dhash->
# cluster row, event analytics keeps funnel_conversion.


def test_tfidf_top_terms_matches_oracle(spark):
    from l1dbproto_spark.queries.text import (
        TFIDF_TOP_TERMS_ORACLE,
        tfidf_top_terms,
    )

    _driver_grade(spark, tfidf_top_terms, TFIDF_TOP_TERMS_ORACLE, "tfidf_top_terms")


def test_column_profile_matches_oracle(spark):
    from l1dbproto_spark.queries.profiling import (
        COLUMN_PROFILE_ORACLE,
        column_profile,
    )

    _driver_grade(spark, column_profile, COLUMN_PROFILE_ORACLE, "column_profile")


def test_media_chunk_fingerprints_matches_oracle(spark):
    from l1dbproto_spark.queries.multimodal import (
        MEDIA_CHUNK_FINGERPRINTS_ORACLE,
        media_chunk_fingerprints,
    )

    _driver_grade(
        spark,
        media_chunk_fingerprints,
        MEDIA_CHUNK_FINGERPRINTS_ORACLE,
        "media_chunk_fingerprints",
    )


def test_cohort_retention_query_matches_oracle(spark):
    from l1dbproto_spark.queries.analytics import (
        COHORT_RETENTION_ORACLE,
        cohort_retention,
    )

    _driver_grade(
        spark, cohort_retention, COHORT_RETENTION_ORACLE, "cohort_retention"
    )


# Driver round 13: gap_fill_resample / asof_last_click_before_purchase /
# q18_large_orders / q10_returned_items / embedding_near_dup_pairs /
# collocations_pmi lost their slots to the round-12 training-data
# families (chunk_fixed_tokens / conversation_audit / preference_pairs /
# generation_scores / snapshot_drift_report / wav_decode_meta) — SAME
# oracles (shared constants in their query modules), driver-grade
# compare, in-suite. The timeseries and as-of operators keep their
# semantics pytests, TPC-H stays driver-checked via q1/q3/q5 (plus the
# 13-oracle battery in test_tpch_battery), the similarity family keeps
# seven registered rows, text keeps bm25/phrase/fuzzy.


def test_gap_fill_resample_matches_oracle(spark):
    from l1dbproto_spark.queries.events import (
        GAP_FILL_RESAMPLE_ORACLE,
        gap_fill_resample,
    )

    _driver_grade(
        spark, gap_fill_resample, GAP_FILL_RESAMPLE_ORACLE, "gap_fill_resample"
    )


def test_asof_last_click_matches_oracle(spark):
    from l1dbproto_spark.queries.relational2 import (
        ASOF_LAST_CLICK_ORACLE,
        asof_last_click_before_purchase,
    )

    _driver_grade(
        spark,
        asof_last_click_before_purchase,
        ASOF_LAST_CLICK_ORACLE,
        "asof_last_click_before_purchase",
    )


def test_q10_returned_items_matches_oracle(spark):
    from l1dbproto_spark.queries.tpch_battery import (
        Q10_RETURNED_ITEMS_ORACLE,
        q10_returned_items,
    )

    _driver_grade(
        spark, q10_returned_items, Q10_RETURNED_ITEMS_ORACLE, "q10_returned_items"
    )


def test_q18_large_orders_matches_oracle(spark):
    from l1dbproto_spark.queries.tpch_battery import (
        Q18_LARGE_ORDERS_ORACLE,
        q18_large_orders,
    )

    _driver_grade(
        spark, q18_large_orders, Q18_LARGE_ORDERS_ORACLE, "q18_large_orders"
    )


def test_embedding_near_dup_pairs_matches_oracle(spark):
    from l1dbproto_spark.queries.similarity import (
        EMBEDDING_NEAR_DUP_ORACLE,
        embedding_near_dup_pairs,
    )

    _driver_grade(
        spark,
        embedding_near_dup_pairs,
        EMBEDDING_NEAR_DUP_ORACLE,
        "embedding_near_dup_pairs",
    )


def test_collocations_pmi_matches_oracle(spark):
    from l1dbproto_spark.queries.text import (
        COLLOCATIONS_PMI_ORACLE,
        collocations_pmi,
    )

    _driver_grade(
        spark, collocations_pmi, COLLOCATIONS_PMI_ORACLE, "collocations_pmi"
    )


# Driver round 14: funnel_conversion / sample_mixture / phrase_match lost
# their slots to the round-13 components (maxsim_token_topk /
# avi_video_meta / quantile_drift_planted — the promotion queue staged in
# COVERAGE.md) — SAME oracles (shared constants in their query modules),
# driver-grade compare, in-suite. Event analytics keeps visit_window_agg
# driver-checked (cohort_retention already in-suite since r12), sampling
# keeps weighted_topk_sample + pack_sequences, retrieval keeps bm25_topk +
# fuzzy_name_match + mmr_rerank_topk.


def test_funnel_conversion_matches_oracle(spark):
    from l1dbproto_spark.queries.analytics import (
        FUNNEL_CONVERSION_ORACLE,
        funnel_conversion,
    )

    _driver_grade(
        spark, funnel_conversion, FUNNEL_CONVERSION_ORACLE, "funnel_conversion"
    )


def test_sample_mixture_query_matches_oracle(spark):
    from l1dbproto_spark.queries.sampling import (
        SAMPLE_MIXTURE_ORACLE,
        sample_mixture,
    )

    _driver_grade(spark, sample_mixture, SAMPLE_MIXTURE_ORACLE, "sample_mixture")


def test_phrase_match_query_matches_oracle(spark):
    from l1dbproto_spark.queries.search import (
        PHRASE_MATCH_ORACLE,
        phrase_match_query,
    )

    _driver_grade(spark, phrase_match_query, PHRASE_MATCH_ORACLE, "phrase_match")


# --- r15 promotion candidates (staged in COVERAGE.md): driver-grade
# in-suite until a registry slot opens --------------------------------------


def test_webdataset_shard_verify_matches_oracle(spark):
    from l1dbproto_spark.queries.multimodal import (
        WEBDATASET_SHARD_VERIFY_ORACLE,
        webdataset_shard_verify,
    )

    _driver_grade(
        spark,
        webdataset_shard_verify,
        WEBDATASET_SHARD_VERIFY_ORACLE,
        "webdataset_shard_verify",
    )


def test_charngram_langid_matches_oracle(spark):
    from l1dbproto_spark.queries.text import (
        CHARNGRAM_LANGID_ORACLE,
        charngram_langid,
    )

    _driver_grade(
        spark, charngram_langid, CHARNGRAM_LANGID_ORACLE, "charngram_langid"
    )


def test_bleu_ngram_stats_matches_oracle(spark):
    from l1dbproto_spark.queries.training import (
        BLEU_NGRAM_STATS_ORACLE,
        bleu_ngram_stats_q,
    )

    _driver_grade(
        spark, bleu_ngram_stats_q, BLEU_NGRAM_STATS_ORACLE, "bleu_ngram_stats"
    )


def test_chrf_scores_matches_oracle(spark):
    from l1dbproto_spark.queries.training import (
        CHRF_SCORES_ORACLE,
        chrf_scores_q,
    )

    _driver_grade(spark, chrf_scores_q, CHRF_SCORES_ORACLE, "chrf_scores")


def test_image_quality_gate_matches_oracle(spark):
    from l1dbproto_spark.queries.multimodal import (
        IMAGE_QUALITY_GATE_ORACLE,
        image_quality_gate,
    )

    _driver_grade(
        spark, image_quality_gate, IMAGE_QUALITY_GATE_ORACLE, "image_quality_gate"
    )


def test_rouge_l_matches_oracle(spark):
    from l1dbproto_spark.queries.training import (
        ROUGE_L_ORACLE,
        rouge_l_scores_q,
    )

    _driver_grade(spark, rouge_l_scores_q, ROUGE_L_ORACLE, "rouge_l_scores")


def test_wer_matches_oracle(spark):
    from l1dbproto_spark.queries.training import WER_ORACLE, wer_scores_q

    _driver_grade(spark, wer_scores_q, WER_ORACLE, "wer_scores")

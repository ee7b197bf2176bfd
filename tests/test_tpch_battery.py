"""TPC-H completion battery vs DuckDB oracles (in-suite members of
l1dbproto_spark/queries/tpch_battery.py; the registered members
q10_returned_items / q18_large_orders are driver-checked and re-run by
test_queries_oracle.py).

Each oracle is an independent SQL re-statement of the adapted query (the
adaptations are documented in the module docstring), following the
exact-decimal determinism contract so frames compare bit-for-bit on the
money columns."""

from __future__ import annotations

import duckdb
import pandas as pd

from l1dbproto_spark.queries import tpch_battery as B

SF_DIR = "/root/testdata/sf0.001"
LI = f"'{SF_DIR}/lineitem.parquet'"
ORD = f"'{SF_DIR}/orders.parquet'"
CUST = f"'{SF_DIR}/customer.parquet'"
SUPP = f"'{SF_DIR}/supplier.parquet'"
PART = f"'{SF_DIR}/part.parquet'"
NAT = f"'{SF_DIR}/nation.parquet'"

REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _normalize(df: pd.DataFrame, sort_keys) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(sort_keys, ignore_index=True)


def _check(spark, fn, oracle: str, sort_keys, min_rows: int = 1):
    got = _normalize(fn(spark, SF_DIR).toPandas(), sort_keys)
    want = _normalize(duckdb.sql(oracle).df(), sort_keys)
    assert len(got) >= min_rows
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


Q4_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM {ORD} o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM {LI} l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
"""


def test_q4_priority_check(spark):
    _check(spark, B.q4_priority_check, Q4_ORACLE, "o_orderpriority")


Q9_ORACLE = f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM({REV}
                - CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))
                  * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE) AS sum_profit
FROM {LI}
JOIN {PART} ON l_partkey = p_partkey
JOIN {SUPP} ON l_suppkey = s_suppkey
JOIN {NAT} ON s_nationkey = n_nationkey
JOIN {ORD} ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def test_q9_product_profit(spark):
    _check(spark, B.q9_product_profit, Q9_ORACLE, ["nation", "o_year"])


Q12_ORACLE = f"""
SELECT l_linestatus,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS low_line_count
FROM {LI} JOIN {ORD} ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def test_q12_priority_lines(spark):
    _check(spark, B.q12_priority_lines, Q12_ORACLE, "l_linestatus")


Q13_ORACLE = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM {CUST} LEFT JOIN {ORD}
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY 1
"""


def test_q13_customer_distribution(spark):
    _check(spark, B.q13_customer_distribution, Q13_ORACLE, "c_count")


Q14_ORACLE = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV} END) AS DOUBLE)
       / CAST(SUM({REV}) AS DOUBLE) AS promo_revenue_pct
FROM {LI} JOIN {PART} ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""


def test_q14_promo_revenue(spark):
    _check(spark, B.q14_promo_revenue, Q14_ORACLE, "promo_revenue_pct")


Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({REV}) AS DOUBLE) AS total_revenue
  FROM {LI}
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN {SUPP} ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


def test_q15_top_supplier(spark):
    _check(spark, B.q15_top_supplier, Q15_ORACLE, "s_suppkey")


Q16_ORACLE = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM {LI} JOIN {PART} ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM {SUPP} WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def test_q16_supplier_part_counts(spark):
    _check(
        spark,
        B.q16_supplier_part_counts,
        Q16_ORACLE,
        ["p_brand", "p_type", "p_size"],
    )


Q17_ORACLE = f"""
WITH t AS (
  SELECT l_quantity, l_extendedprice,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                OVER (PARTITION BY l_partkey) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM {LI} JOIN {PART} ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
  AS avg_yearly
FROM t WHERE l_quantity < 0.2 * avg_qty
"""


def test_q17_small_qty_revenue(spark):
    _check(spark, B.q17_small_qty_revenue, Q17_ORACLE, "avg_yearly")


Q19_ORACLE = f"""
SELECT CAST(SUM({REV}) AS DOUBLE) AS revenue
FROM {LI} JOIN {PART} ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 45)
"""


def test_q19_disjunctive_revenue(spark):
    _check(spark, B.q19_disjunctive_revenue, Q19_ORACLE, "revenue")


Q21_ORACLE = f"""
WITH l AS (
  SELECT l_orderkey, l_suppkey, l_shipdate FROM {LI}
  WHERE l_orderkey IN (SELECT o_orderkey FROM {ORD} WHERE o_orderstatus = 'F')
),
m AS (
  SELECT l_orderkey, MAX(l_shipdate) AS max_ship,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM l GROUP BY 1
),
late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM l JOIN m USING (l_orderkey)
  WHERE l.l_shipdate = m.max_ship AND m.n_supp > 1
),
sole AS (
  SELECT l_orderkey FROM late GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) = 1
)
SELECT s_name, COUNT(DISTINCT l_orderkey) AS numwait
FROM late JOIN sole USING (l_orderkey)
JOIN {SUPP} ON l_suppkey = s_suppkey
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def test_q21_waiting_supplier(spark):
    _check(spark, B.q21_waiting_supplier, Q21_ORACLE, "s_name")


Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS v
  FROM {CUST} WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM {CUST}, avg_bal
WHERE c_acctbal > v
  AND NOT EXISTS (SELECT 1 FROM {ORD} o
                  WHERE o.o_custkey = c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
"""


def test_q22_global_opportunity(spark):
    _check(spark, B.q22_global_opportunity, Q22_ORACLE, "c_nationkey")


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q20 over the deterministic synthesized partsupp (driver round
# 10; see the block comment in queries/tpch_battery.py). PARTSUPP_SQL is the
# oracle-side rendering of partsupp_table — a parity test pins the two
# engines building the identical table before the queries use it.
# ---------------------------------------------------------------------------

REG = f"'{SF_DIR}/region.parquet'"

PARTSUPP_SQL = f"""
  SELECT ps_partkey, ps_suppkey,
         h % 9999 + 1 AS ps_availqty,
         CAST(h % 1000 + 1 AS DECIMAL(12,2)) AS ps_supplycost
  FROM (
    SELECT p_partkey AS ps_partkey,
           (p_partkey + i.i * GREATEST(1, s // 4)) % s AS ps_suppkey,
           CAST(concat('0x', substr(md5(concat('ps:',
             CAST(p_partkey AS VARCHAR), ':', CAST(i.i AS VARCHAR))), 1, 15))
             AS BIGINT) AS h
    FROM {PART}, (SELECT COUNT(*) AS s FROM {SUPP}),
         unnest([0, 1, 2, 3]) AS i(i)
  )
"""


def test_partsupp_synthesis_parity(spark):
    got = _normalize(
        B.partsupp_table(spark, SF_DIR).toPandas(), ["ps_partkey", "ps_suppkey"]
    )
    want = _normalize(
        duckdb.sql(PARTSUPP_SQL).df(), ["ps_partkey", "ps_suppkey"]
    )
    assert len(got) == 800  # 200 parts x 4 suppliers
    # 4 DISTINCT suppliers per part (the collision-free stride contract)
    assert (
        got.groupby("ps_partkey")["ps_suppkey"].nunique() == 4
    ).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


Q2_ORACLE = f"""
WITH ps AS ({PARTSUPP_SQL}),
eligible AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost,
         MIN(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
  FROM ps
  JOIN {PART} ON ps_partkey = p_partkey
    AND p_type = 'STANDARD' AND p_size >= 15
  JOIN {SUPP} ON ps_suppkey = s_suppkey
  JOIN {NAT} ON s_nationkey = n_nationkey
  JOIN {REG} ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM eligible WHERE ps_supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def test_q2_min_cost_supplier(spark):
    _check(spark, B.q2_min_cost_supplier, Q2_ORACLE, ["p_partkey", "s_name"])


Q11_ORACLE = f"""
WITH ps AS ({PARTSUPP_SQL}),
scoped AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM ps
  JOIN {SUPP} ON ps_suppkey = s_suppkey
  JOIN {NAT} ON s_nationkey = n_nationkey
  JOIN {REG} ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
),
per_part AS (SELECT ps_partkey, SUM(v) AS v FROM scoped GROUP BY 1),
thr AS (SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) AS avg_v FROM per_part)
SELECT ps_partkey, CAST(v AS DOUBLE) AS value
FROM per_part, thr
WHERE CAST(v AS DOUBLE) > avg_v
"""


def test_q11_important_stock(spark):
    got = _normalize(
        B.q11_important_stock(spark, SF_DIR).toPandas(), ["ps_partkey"]
    )
    want = _normalize(duckdb.sql(Q11_ORACLE).df(), ["ps_partkey"])
    # above-average threshold: a real subset, never empty / never everything
    n_scoped = duckdb.sql(
        f"SELECT COUNT(DISTINCT ps_partkey) FROM ({PARTSUPP_SQL}) ps "
        f"JOIN {SUPP} ON ps_suppkey = s_suppkey "
        f"JOIN {NAT} ON s_nationkey = n_nationkey "
        f"JOIN {REG} ON n_regionkey = r_regionkey AND r_name = 'EUROPE'"
    ).fetchone()[0]
    assert 0 < len(got) < n_scoped
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


Q20_ORACLE = f"""
WITH ps AS ({PARTSUPP_SQL}),
shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM {LI}
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
),
surplus AS (
  SELECT DISTINCT ps_suppkey
  FROM ps
  JOIN {PART} ON ps_partkey = p_partkey AND p_name LIKE '%widget'
  JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  WHERE CAST(ps_availqty AS DOUBLE) > 200.0 * CAST(qty AS DOUBLE)
)
SELECT s_suppkey, s_name, n_name
FROM {SUPP}
JOIN {NAT} ON s_nationkey = n_nationkey
JOIN {REG} ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE s_suppkey IN (SELECT ps_suppkey FROM surplus)
"""


def test_q20_surplus_suppliers(spark):
    _check(spark, B.q20_surplus_suppliers, Q20_ORACLE, ["s_suppkey"])

"""Driver-round-13 registered row for distribution drift
(operators/drift.py): snapshot-to-snapshot KS + chi-square/TVD over a
planted corpus shift, under the hard oracle signal.

The 'new' snapshot is derived from `documents` by doc_id/n_chars
arithmetic (drop short docs, re-source every third), so both engines
build identical sides; the oracle re-derives the statistics leg for leg
— the full-outer count join, the ECDF window walk, pooled-marginal
expected frequencies, 9dp-rounded DECIMAL-summed chi-square/TVD terms —
never re-running the Spark expressions.

PSI is deliberately NOT in the registered projection: its terms go
through libm ``ln`` and the engines' float libraries are not pinned to
each other bit-for-bit (the chi-square/TVD/KS legs are pure
integer-derived divisions and 9dp-rounded decimal sums — engine-exact,
the registry determinism contract). PSI keeps its exact Python-reference
pytest in tests/test_drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query


@query(
    "snapshot_drift_report",
    oracle="""
    WITH o AS (
      SELECT n_chars AS k, COUNT(*) AS n_old
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    ),
    n AS (
      SELECT n_chars AS k, COUNT(*) AS n_new
      FROM documents WHERE n_chars >= 120 GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(o.k, n.k) AS k,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      FROM o FULL OUTER JOIN n ON o.k = n.k
    ),
    t AS (
      SELECT CAST(SUM(n_old) AS BIGINT) AS t_old,
             CAST(SUM(n_new) AS BIGINT) AS t_new
      FROM j
    ),
    e AS (
      SELECT CAST(SUM(n_old) OVER w AS DOUBLE) / t.t_old AS f_old,
             CAST(SUM(n_new) OVER w AS DOUBLE) / t.t_new AS f_new
      FROM j, t WINDOW w AS (ORDER BY k ROWS UNBOUNDED PRECEDING)
    ),
    ks AS (
      SELECT 'n_chars' AS col_name, 'ks' AS kind,
             MAX(ABS(f_old - f_new)) AS statistic,
             CAST(NULL AS DOUBLE) AS tvd,
             CAST(NULL AS VARCHAR) AS top_mover,
             (SELECT t_old FROM t) AS n_old,
             (SELECT t_new FROM t) AS n_new
      FROM e
    ),
    co AS (
      SELECT source AS k, COUNT(*) AS n_old
      FROM documents WHERE source IS NOT NULL GROUP BY 1
    ),
    cn AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'refetch' ELSE source END AS k,
             COUNT(*) AS n_new
      FROM documents WHERE n_chars >= 120 GROUP BY 1
    ),
    cj AS (
      SELECT COALESCE(co.k, cn.k) AS k,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      FROM co FULL OUTER JOIN cn ON co.k = cn.k
    ),
    ct AS (
      SELECT CAST(SUM(n_old) AS BIGINT) AS t_old,
             CAST(SUM(n_new) AS BIGINT) AS t_new
      FROM cj
    ),
    terms AS (
      SELECT k,
             CAST(ROUND(
               ((n_old - CAST(n_old + n_new AS DOUBLE) * ct.t_old
                           / (ct.t_old + ct.t_new))
                * (n_old - CAST(n_old + n_new AS DOUBLE) * ct.t_old
                             / (ct.t_old + ct.t_new)))
                 / (CAST(n_old + n_new AS DOUBLE) * ct.t_old
                      / (ct.t_old + ct.t_new))
               + ((n_new - CAST(n_old + n_new AS DOUBLE) * ct.t_new
                             / (ct.t_old + ct.t_new))
                  * (n_new - CAST(n_old + n_new AS DOUBLE) * ct.t_new
                               / (ct.t_old + ct.t_new)))
                 / (CAST(n_old + n_new AS DOUBLE) * ct.t_new
                      / (ct.t_old + ct.t_new)),
               9) AS DECIMAL(28,9)) AS chi,
             CAST(ROUND(ABS(CAST(n_old AS DOUBLE) / ct.t_old
                            - CAST(n_new AS DOUBLE) / ct.t_new),
                        9) AS DECIMAL(28,9)) AS shift
      FROM cj, ct
    ),
    chi2 AS (
      SELECT 'source' AS col_name, 'chi2' AS kind,
             CAST(SUM(chi) AS DOUBLE) AS statistic,
             -- halve in DOUBLE: /2 is an exponent shift (exact), so
             -- double(sum)/2 == double(sum/2) == Spark's exact decimal
             -- halving cast to double; DuckDB's scale-9 decimal division
             -- would drop the 10th decimal instead
             CAST(SUM(shift) AS DOUBLE) / 2 AS tvd,
             (SELECT k FROM terms ORDER BY shift DESC, k LIMIT 1)
               AS top_mover,
             (SELECT t_old FROM ct) AS n_old,
             (SELECT t_new FROM ct) AS n_new
      FROM terms
    )
    SELECT * FROM ks UNION ALL SELECT * FROM chi2
    """,
    survey=(
        "ext:drift (two-sample KS + chi-square/TVD distribution drift "
        "between corpus snapshots; operators/drift.py "
        "ks_drift/categorical_drift — streaming monitor in "
        "streaming/drift_stream.py)"
    ),
)
def snapshot_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rows — (col_name, kind, statistic, tvd, top_mover, n_old,
    n_new): the exact-mode KS D over n_chars (bounded-distinct by
    fixture construction, well under the enforced cap) and the
    chi-square/TVD/top-mover over source, between `documents` and its
    planted drifted snapshot (short docs dropped, every third doc
    re-sourced 'refetch').

    Scale shape: each statistic reduces both sides to (key, n_old,
    n_new) COUNTS before any exchange (the counts frame is pinned so the
    totals aggregate and the statistic walk share one materialization);
    the ECDF walk is a window over the bounded distinct values; nothing
    row-sized ever crosses."""
    from ..operators.drift import categorical_drift, ks_drift

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("n_chars") >= 120).withColumn(
        "source",
        F.when(F.col("doc_id") % 3 == 0, F.lit("refetch")).otherwise(
            F.col("source")
        ),
    )
    ks = ks_drift(docs, new, "n_chars").select(
        F.col("column").alias("col_name"),
        "kind",
        "statistic",
        F.lit(None).cast("double").alias("tvd"),
        F.lit(None).cast("string").alias("top_mover"),
        "n_old",
        "n_new",
    )
    cat = categorical_drift(docs, new, "source").select(
        F.col("column").alias("col_name"),
        "kind",
        "statistic",
        "tvd",
        "top_mover",
        "n_old",
        "n_new",
    )
    return ks.unionByName(cat)


# ---------------------------------------------------------------------------
# quantile_drift_planted (r14 promotion candidate — declared in
# COVERAGE.md; NOT yet registered): reference-quantile binned drift made
# fully oracle-able by CONSTRUCTION. The reference side is doc_id % 7
# over the contiguous 0..499 ids, so the residue histogram is known
# (cumulative 72/144/216/287/358/429/500) and q=4's target ranks
# (~125/250/375) land MID-BLOCK — at least 16 rows from every block
# boundary, so percentile_approx's edges are the exact order statistics
# (1.0, 3.0, 5.0) under ANY of the sketch's rank conventions. The oracle
# therefore hard-codes the provable edges and re-derives the entire
# chi-square/TVD machinery over the four bins; the drifted side remaps
# every value up two residues (capped at 6) and drops each fifth doc.
QUANTILE_DRIFT_PLANTED_ORACLE = """
    WITH o AS (
      SELECT CAST(doc_id % 7 AS DOUBLE) AS v FROM documents
    ),
    n AS (
      SELECT CAST(LEAST(doc_id % 7 + 2, 6) AS DOUBLE) AS v
      FROM documents WHERE doc_id % 5 <> 0
    ),
    ob AS (
      SELECT CAST(CASE WHEN v > 1 THEN 1 ELSE 0 END
                  + CASE WHEN v > 3 THEN 1 ELSE 0 END
                  + CASE WHEN v > 5 THEN 1 ELSE 0 END AS VARCHAR) AS k,
             COUNT(*) AS n_old
      FROM o GROUP BY 1
    ),
    nb AS (
      SELECT CAST(CASE WHEN v > 1 THEN 1 ELSE 0 END
                  + CASE WHEN v > 3 THEN 1 ELSE 0 END
                  + CASE WHEN v > 5 THEN 1 ELSE 0 END AS VARCHAR) AS k,
             COUNT(*) AS n_new
      FROM n GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(ob.k, nb.k) AS k,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      FROM ob FULL OUTER JOIN nb ON ob.k = nb.k
    ),
    t AS (
      SELECT CAST(SUM(n_old) AS BIGINT) AS t_old,
             CAST(SUM(n_new) AS BIGINT) AS t_new
      FROM j
    ),
    terms AS (
      SELECT k,
             CAST(ROUND(
               ((n_old - CAST(n_old + n_new AS DOUBLE) * t.t_old
                           / (t.t_old + t.t_new))
                * (n_old - CAST(n_old + n_new AS DOUBLE) * t.t_old
                             / (t.t_old + t.t_new)))
                 / (CAST(n_old + n_new AS DOUBLE) * t.t_old
                      / (t.t_old + t.t_new))
               + ((n_new - CAST(n_old + n_new AS DOUBLE) * t.t_new
                             / (t.t_old + t.t_new))
                  * (n_new - CAST(n_old + n_new AS DOUBLE) * t.t_new
                               / (t.t_old + t.t_new)))
                 / (CAST(n_old + n_new AS DOUBLE) * t.t_new
                      / (t.t_old + t.t_new)),
               9) AS DECIMAL(28,9)) AS chi,
             CAST(ROUND(ABS(CAST(n_old AS DOUBLE) / t.t_old
                            - CAST(n_new AS DOUBLE) / t.t_new),
                        9) AS DECIMAL(28,9)) AS shift
      FROM j, t
    )
    SELECT 'qv' AS col_name, 'chi2' AS kind,
           CAST(SUM(chi) AS DOUBLE) AS statistic,
           CAST(SUM(shift) AS DOUBLE) / 2 AS tvd,
           (SELECT k FROM terms ORDER BY shift DESC, k LIMIT 1)
             AS top_mover,
           (SELECT t_old FROM t) AS n_old,
           (SELECT t_new FROM t) AS n_new
    FROM terms
    """


@query(
    "quantile_drift_planted",
    oracle=QUANTILE_DRIFT_PLANTED_ORACLE,
    survey="ext:monitoring (reference-quantile binned drift with provable "
    "percentile_approx edges; operators/drift.py quantile_drift — promoted "
    "r14 per the staged queue)",
)
def quantile_drift_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row — reference-quantile (q=4) binned drift over the planted
    residue shift (block comment above): (col_name, kind, statistic,
    tvd, top_mover, n_old, n_new); PSI excluded from the projection for
    the same libm reason as snapshot_drift_report."""
    from ..operators.drift import quantile_drift

    docs = load_table(spark, sf_dir, "documents")
    old = docs.select((F.col("doc_id") % 7).cast("double").alias("qv"))
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.least(F.col("doc_id") % 7 + 2, F.lit(6)).cast("double").alias("qv")
    )
    return quantile_drift(old, new, "qv", q=4).select(
        F.col("column").alias("col_name"),
        "kind",
        "statistic",
        "tvd",
        "top_mover",
        "n_old",
        "n_new",
    )

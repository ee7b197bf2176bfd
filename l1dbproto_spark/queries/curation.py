"""Driver-round-12 registered rows for the corpus-curation extension
surface: web-URL canonicalization/dedup/mix (operators/weburl.py) and
schema evolution with the cast-loss audit (operators/evolve.py).

Both oracles are INDEPENDENT derivations, not re-runs of the Spark
expressions: the URL fixture is synthesized from ``doc_id`` arithmetic so
the oracle can predict every canonical form, domain, host and share by
the same arithmetic — it never parses a URL; the evolution oracle
re-derives the action plan as literals and the loss counts with DuckDB's
own TRY_CAST. A normalization rule regression, a denominator mix-up, a
silently-lossy cast — each lands as a value-hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query

# --------------------------------------------------------------------------
# weburl_dedup_mix: the crawl-curation pass (normalize -> URL dedup ->
# domain mix report) over URLs synthesized from doc_id so every messy
# variant FOLDS to an arithmetically-predictable canonical form:
#   * scheme 'HTTP' (doc_id%2=0) vs 'https'... both lowercase; the https
#     rows carry the non-default :8080 sometimes? No — keep one scheme
#     family ('HTTP'/'http') so default-port stripping is exercised.
#   * host 'W{doc_id%7}.ExAmple.{com|CO.UK}' — case folds, co.uk hits the
#     second-level-suffix rule;
#   * ':80' on doc_id%4=0 — the default port strips;
#   * userinfo 'u:p@' on doc_id%17=0 — strips (the blocklist-dodge fix);
#   * three query spellings — param order, a tracking utm_source, plain —
#     all fold to '?a=1&b=2';
#   * '#frag' on doc_id%5=0 — drops;
#   * doc_id%13=0 rows are NOT URLs at all — excluded from dedup, counted
#     as __unparsed__ in the mix with the all-rows denominator.
# Canonical form: http://w{doc_id%7}.example.{com|co.uk}/p/{doc_id%50}?a=1&b=2
_W_SUFFIX = "CASE WHEN doc_id % 11 = 0 THEN 'co.uk' ELSE 'com' END"
_W_DOMAIN = (
    "CASE WHEN doc_id % 11 = 0 THEN 'example.co.uk' ELSE 'example.com' END"
)
_W_HOST = f"'w' || CAST(doc_id % 7 AS VARCHAR) || '.example.' || ({_W_SUFFIX})"
_W_NORM = (
    f"'http://' || ({_W_HOST}) || '/p/' || CAST(doc_id % 50 AS VARCHAR)"
    " || '?a=1&b=2'"
)


@query(
    "weburl_dedup_mix",
    oracle=f"""
    WITH rows_ AS (
      SELECT doc_id,
             doc_id % 13 = 0 AS unparsed,
             {_W_NORM} AS url_norm,
             {_W_HOST} AS host,
             {_W_DOMAIN} AS domain
      FROM documents
    ),
    per AS (
      SELECT CASE WHEN unparsed THEN '__unparsed__' ELSE domain END AS key,
             COUNT(*) AS m1,
             COUNT(DISTINCT CASE WHEN unparsed THEN NULL ELSE host END) AS m2
      FROM rows_ GROUP BY 1
    ),
    tot AS (
      SELECT SUM(CASE WHEN key <> '__unparsed__' THEN m1 END) AS parseable,
             SUM(m1) AS all_rows
      FROM per
    )
    SELECT 'group' AS kind, url_norm AS key,
           MIN(doc_id) AS m1, COUNT(*) AS m2, CAST(NULL AS DOUBLE) AS share
    FROM rows_ WHERE NOT unparsed GROUP BY url_norm
    UNION ALL
    SELECT 'domain', key, m1, m2,
           CAST(m1 AS DOUBLE)
             / CASE WHEN key = '__unparsed__' THEN all_rows ELSE parseable END
    FROM per, tot
    """,
    survey=(
        "ext:weburl (canonical-URL normalization + URL dedup + domain mix "
        "report; operators/weburl.py normalize_url/url_dedup_groups/"
        "domain_mix_report)"
    ),
)
def weburl_dedup_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-curation pass in one result frame: 'group' rows are
    the canonical-URL dedup groups (key=url_norm, m1=keep_doc_id,
    m2=n_copies, share NULL), 'domain' rows are the mix report
    (key=domain incl. __unparsed__, m1=n_docs, m2=n_hosts, share with
    the parseable/all-rows denominator split).

    Scale shape: normalization is one regexp parse + native string/array
    exprs riding the scan; dedup is one uniform-key groupBy; the mix is
    one aggregation + a 1-row broadcast for the shares."""
    from ..operators.weburl import domain_mix_report, url_dedup_groups

    i = F.col("doc_id")
    messy = F.concat(
        F.when(i % 2 == 0, F.lit("HTTP")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(i % 17 == 0, F.lit("u:p@")).otherwise(F.lit("")),
        F.lit("W"),
        (i % 7).cast("string"),
        F.lit(".ExAmple."),
        F.when(i % 11 == 0, F.lit("CO.UK")).otherwise(F.lit("com")),
        F.when(i % 4 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"),
        (i % 50).cast("string"),
        F.when(i % 3 == 0, F.lit("?b=2&a=1"))
        .when(i % 3 == 1, F.lit("?a=1&utm_source=x&b=2"))
        .otherwise(F.lit("?a=1&b=2")),
        F.when(i % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    url = F.when(
        i % 13 == 0, F.format_string("corrupt line %d no scheme", "doc_id")
    ).otherwise(messy)
    urls = load_table(spark, sf_dir, "documents").select(
        "doc_id", url.alias("url")
    )
    groups = url_dedup_groups(urls).select(
        F.lit("group").alias("kind"),
        F.col("url_norm").alias("key"),
        F.col("keep_doc_id").alias("m1"),
        F.col("n_copies").alias("m2"),
        F.lit(None).cast("double").alias("share"),
    )
    mix = domain_mix_report(urls).select(
        F.lit("domain").alias("kind"),
        F.col("domain").alias("key"),
        F.col("n_docs").alias("m1"),
        F.col("n_hosts").alias("m2"),
        "share",
    )
    return groups.unionByName(mix)


# --------------------------------------------------------------------------
# evolve_cast_loss: evolve `documents` to a shifted target schema — one
# lossless retype (doc_id -> int), one LOSSY retype (n_chars -> tinyint:
# every value > 127 nulls), one added column (n_tokens), two dropped
# extras (text, source), one pass-through (lang) — and return the action
# plan, the per-column cast-loss audit, and one aggregate over the
# CONFORMED frame proving the projection actually applied. The oracle
# re-derives the plan as literals and the loss counts with DuckDB's own
# TRY_CAST over the same parquet.
_EVOLVE_TARGET = "doc_id int, lang string, n_chars tinyint, n_tokens bigint"


@query(
    "evolve_cast_loss",
    oracle="""
    WITH loss AS (
      SELECT 'doc_id' AS col_name,
             COUNT(doc_id) AS n_values,
             CAST(COALESCE(SUM(CASE WHEN doc_id IS NOT NULL
                       AND TRY_CAST(doc_id AS INT) IS NULL
                       THEN 1 END), 0) AS BIGINT) AS n_lost
      FROM documents
      UNION ALL
      SELECT 'n_chars', COUNT(n_chars),
             CAST(COALESCE(SUM(CASE WHEN n_chars IS NOT NULL
                       AND TRY_CAST(n_chars AS TINYINT) IS NULL
                       THEN 1 END), 0) AS BIGINT)
      FROM documents
    )
    SELECT col_name, 'cast_loss' AS action, n_values, n_lost,
           CASE WHEN n_values > 0
                THEN CAST(n_lost AS DOUBLE) / n_values ELSE 0.0 END AS ratio
    FROM loss
    UNION ALL
    SELECT col_name, action, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM (VALUES ('doc_id', 'cast'), ('lang', 'pass'), ('n_chars', 'cast'),
                 ('n_tokens', 'add_null'), ('text', 'drop'),
                 ('source', 'drop')) t(col_name, action)
    UNION ALL
    SELECT '__conformed__', 'aggregate', COUNT(*),
           CAST(SUM(TRY_CAST(n_chars AS TINYINT)) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM documents
    """,
    survey=(
        "ext:evolve (schema evolution + cast-loss audit; "
        "operators/evolve.py evolve_schema/cast_loss_report)"
    ),
)
def evolve_cast_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three row kinds in one frame, keyed by (col_name, action):
    'cast_loss' rows from cast_loss_report (n_values, n_lost, ratio —
    the audit a backfill reads before committing), one literal row per
    evolution-plan action, and the '__conformed__' aggregate
    (n_values=row count, n_lost=SUM(n_chars) AFTER the lossy tinyint
    retype — proving the conformed frame's try_cast really applied).

    Scale shape: the loss report is ONE scan/aggregation (plan-pinned in
    test_evolve); the conformed frame is a pure projection; the plan
    rows are driver-side literals."""
    from ..operators.evolve import cast_loss_report, evolve_schema

    docs = load_table(spark, sf_dir, "documents")
    conformed, plan = evolve_schema(docs, _EVOLVE_TARGET, on_extra="drop")
    loss = cast_loss_report(docs, _EVOLVE_TARGET).select(
        F.col("column").alias("col_name"),
        F.lit("cast_loss").alias("action"),
        "n_values",
        "n_lost",
        F.col("loss_ratio").alias("ratio"),
    )
    plan_rows = spark.createDataFrame(
        [(p["column"], p["action"]) for p in plan],
        "col_name string, action string",
    ).select(
        "col_name",
        "action",
        F.lit(None).cast("long").alias("n_values"),
        F.lit(None).cast("long").alias("n_lost"),
        F.lit(None).cast("double").alias("ratio"),
    )
    agg = conformed.agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum(F.col("n_chars").cast("long")).alias("n_lost"),
    ).select(
        F.lit("__conformed__").alias("col_name"),
        F.lit("aggregate").alias("action"),
        "n_values",
        "n_lost",
        F.lit(None).cast("double").alias("ratio"),
    )
    return loss.unionByName(plan_rows).unionByName(agg)

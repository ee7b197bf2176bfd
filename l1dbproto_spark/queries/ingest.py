"""Driver-round-11 registered row: the quarantined-CSV ingest contract
(sources/jsonl.py read_csv_quarantined — the S10 read side) under the hard
oracle signal.

The builder renders the documents table to a CSV fixture with PLANTED
corruption (every doc_id divisible by 97 becomes a malformed line) plus
mid-file header lines in two foreign styles (exact and quoted+spaced — the
r10 review find), reads it back through the quarantine contract, and
returns per-language clean aggregates plus the quarantine count. The
oracle never touches the fixture: it predicts the contract's outcome from
the documents table with count arithmetic — an INDEPENDENT derivation of
what a one-bad-line-costs-one-row reader must produce, so a header
mislabeled as data, a corrupt line silently dropped, or a clean line
mis-parsed all hash-mismatch.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..sources.jsonl import read_csv_quarantined
from . import query


@query(
    "csv_ingest_quarantine",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
    FROM documents WHERE doc_id % 97 <> 0
    GROUP BY lang
    UNION ALL
    SELECT '__quarantined__',
           COUNT(*),
           CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM documents WHERE doc_id % 97 = 0
    """,
    survey="S10 read side / ext:ingest (quarantined CSV: schema-required, one bad line costs one row, normalized header drop; sources/jsonl.py read_csv_quarantined)",
)
def csv_ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the documents table through a deliberately-messy CSV
    export and summarize what the quarantine contract recovers: per-lang
    (n_rows, sum_doc_id, sum_n_chars) over the CLEAN frame plus one
    '__quarantined__' count row. Malformed lines (wrong arity + type
    mismatch) are planted at doc_id % 97 == 0; two header lines — the
    exact style and the quoted+space-padded foreign style — are planted
    mid-file and must vanish entirely (neither clean nor quarantined).

    Scale shape: the render is a zero-shuffle projection, the read-back
    is the text-scan + from_csv contract (splittable, no inference pass),
    and the summary is one uniform-key aggregation; the quarantine count
    is a scalar aggregate. The sums verify parse INTEGRITY, not just the
    clean/quarantine split."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    is_bad = F.col("doc_id") % 97 == 0
    line = F.when(
        is_bad, F.format_string("BROKEN|%d|%s", "doc_id", "lang")
    ).otherwise(F.format_string("%d,%s,%d", "doc_id", "lang", "n_chars"))
    lines = docs.select(line.alias("value"))
    headers = spark.createDataFrame(
        [("doc_id,lang,n_chars",), ('"doc_id", "lang", "n_chars"',)],
        "value string",
    )
    # fixture path is deterministic per sf_dir (re-runs overwrite); the
    # oracle never reads it, so builder/oracle execution order is free
    path = os.path.join(
        tempfile.gettempdir(),
        "l1db_csvq_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    lines.unionByName(headers).write.mode("overwrite").text(path)
    clean, quarantine = read_csv_quarantined(
        spark, path, "doc_id BIGINT, lang STRING, n_chars BIGINT", header=True
    )
    summary = clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_chars").alias("sum_n_chars"),
    )
    qrow = quarantine.agg(F.count(F.lit(1)).alias("n_rows")).select(
        F.lit("__quarantined__").alias("lang"),
        "n_rows",
        F.lit(None).cast("long").alias("sum_doc_id"),
        F.lit(None).cast("long").alias("sum_n_chars"),
    )
    return summary.unionByName(qrow)

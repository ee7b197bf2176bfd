"""Deterministic sampling queries over the documents table — the
training-mix construction layer (operators/sampling.py), registered under
the driver oracle to pin the 48-bit-hash determinism contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query

# DuckDB rendering of operators.sampling._unit_hash (same md5/substr/conv)
_U = (
    "CAST(concat('0x', substr(md5(concat('mix-v1', CAST(doc_id AS VARCHAR))), 1, 12))"
    " AS BIGINT) / CAST(281474976710656 AS DOUBLE)"
)


@query(
    "sample_mixture",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {_U} < CASE lang WHEN 'en' THEN 0.8 WHEN 'es' THEN 0.25
                 ELSE 0.05 END
    """,
    survey="ext:sampling (deterministic weighted mixture; F18 generalization to per-source rates)",
)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-mixture subsample of the documents corpus (en 0.8 / es 0.25
    / default 0.05): one per-row 48-bit-hash threshold comparison — zero
    shuffles, append-stable, bit-reproducible in DuckDB via the shared
    md5/substr/conv formula (operators/sampling.py). The plan is a pure
    scan+filter; at 100 TB the scan IS the cost."""
    from ..operators.sampling import sample_mixture as _mix

    docs = load_table(spark, sf_dir, "documents")
    return _mix(
        docs, {"en": 0.8, "es": 0.25}, source_col="lang", default_rate=0.05
    ).select("doc_id", "lang")

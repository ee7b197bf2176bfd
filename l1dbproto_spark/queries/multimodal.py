"""Multimodal-column queries: binary payloads synthesized deterministically
from the documents table (encode(text)), so blob metadata is oracle-checkable
in DuckDB; the mapInPandas feature/chunk paths are rows-only checks (genuinely
non-SQL-expressible — the driver records the weaker check)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import byte_histogram_features, chunk_fingerprints
from ..sources.catalog import load_table
from . import query


def _as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


@query(
    "blob_metadata",
    oracle="""
    SELECT
      doc_id AS media_id,
      octet_length(encode(text)) AS n_bytes,
      md5(text) AS fingerprint
    FROM documents
    """,
    survey="ext:multimodal (opaque binary + typed metadata)",
)
def blob_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata without decode: byte length + md5 fingerprint of the payload
    (UTF-8 text bytes — md5(blob) == md5(text) for this encoding on both
    engines)."""
    media = _as_media(spark, sf_dir)
    return media.select(
        "media_id",
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("fingerprint"),
    )


@query(
    "media_byte_histogram",
    oracle=None,  # mapInPandas path; rows-only check
    survey="ext:multimodal (feature extraction via mapInPandas)",
)
def media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bin byte-histogram features per blob through the Arrow batch path."""
    return byte_histogram_features(_as_media(spark, sf_dir))


@query(
    "media_chunk_fingerprints",
    oracle=None,  # mapInPandas path; rows-only check
    survey="ext:multimodal (frame sampling via mapInPandas)",
)
def media_chunk_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample stand-in: 4 chunk fingerprints per blob."""
    return chunk_fingerprints(_as_media(spark, sf_dir), n_chunks=4)

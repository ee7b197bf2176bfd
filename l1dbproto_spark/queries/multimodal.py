"""Multimodal-column queries: binary payloads synthesized deterministically
from the documents table (encode(text) — the corpus is pure ASCII, verified:
length(text) == octet_length(encode(text)) for every row, so DuckDB's
character-indexed substr/ord are byte-accurate). That makes even the
mapInPandas feature/chunk paths fully oracle-checkable in SQL: the Spark side
runs the real Arrow-batch Python path a media decoder would use, the oracle
recomputes the same bytes-level features relationally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import byte_histogram_features, chunk_fingerprints
from ..sources.catalog import load_table
from . import query

_N_BINS = 32


def _as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


# Rotated OUT of the driver registry in round 7 (slot to doc_embed_ann —
# the registry is capped at 50; COVERAGE.md "Registry rotation history").
# The DuckDB oracle below stays live in-suite via
# tests/test_unregistered_batteries.py.
BLOB_METADATA_ORACLE = """
    SELECT
      doc_id AS media_id,
      octet_length(encode(text)) AS n_bytes,
      md5(text) AS fingerprint
    FROM documents
    """


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


_HIST_COLS = ",\n      ".join(
    f"CAST(COALESCE(SUM(CASE WHEN bin = {k} THEN n END), 0) AS DOUBLE)"
    f" / ANY_VALUE(total) AS f{k}"
    for k in range(_N_BINS)
)


# Rotated out of the 50-cap registry in driver round 8 (slot to q18_large_orders); the
# SAME DuckDB oracle (below, view-name form) runs in-suite in
# tests/test_unregistered_batteries.py and the multimodal family keeps the
# registered media_chunk_fingerprints row.
MEDIA_BYTE_HISTOGRAM_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id AS media_id, text, length(text) AS total FROM documents
    ),
    pos AS (
      SELECT media_id, ord(substr(text, CAST(i AS INT), 1)) // 8 AS bin
      FROM docs, unnest(range(1, total + 1)) AS t(i)
    ),
    agg AS (SELECT media_id, bin, COUNT(*) AS n FROM pos GROUP BY 1, 2)
    SELECT
      d.media_id,
      {_HIST_COLS}
    FROM docs d LEFT JOIN agg a ON a.media_id = d.media_id
    GROUP BY d.media_id
    """


def media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bin normalized byte-histogram features per blob through the Arrow
    mapInPandas batch path (numpy per batch — the exact plumbing a real
    decoder/featurizer uses), projected to one column per bin so the DuckDB
    oracle checks every value bit-for-bit (counts and the count/total double
    division are engine-exact)."""
    feats = byte_histogram_features(_as_media(spark, sf_dir))
    return feats.select(
        "media_id",
        *[F.element_at(F.col("features"), k + 1).alias(f"f{k}") for k in range(_N_BINS)],
    )


@query(
    "media_chunk_fingerprints",
    oracle="""
    WITH docs AS (
      SELECT doc_id AS media_id, text,
             greatest(length(text) // 4, 1) AS step
      FROM documents
    )
    SELECT
      media_id,
      CAST(i AS INT) AS chunk_idx,
      md5(substr(text, CAST(i * step + 1 AS INT), CAST(step AS INT))) AS chunk_hash
    FROM docs, unnest(range(4)) AS t(i)
    """,
    survey="ext:multimodal (frame sampling via mapInPandas, SQL-oracled)",
)
def media_chunk_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample stand-in: 4 equal byte chunks per blob, md5 per chunk,
    through mapInPandas; the oracle reproduces the identical chunking
    arithmetic (step = max(len//4, 1), remainder bytes dropped) with
    substr/md5 over the ASCII payload."""
    return chunk_fingerprints(_as_media(spark, sf_dir), n_chunks=4)

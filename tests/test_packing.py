"""Sequence packing (operators/packing.py): DuckDB oracle equivalence on the
documents table plus the packing invariants."""

from __future__ import annotations

import duckdb
import pandas as pd

from l1dbproto_spark.operators.packing import pack_chunk_stats, pack_sequences
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
CTX = 128
SHARDS = 4

ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(doc_id % {SHARDS} AS INT) AS shard,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
  FROM '{SF_DIR}/documents.parquet'
),
spans AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS end_tok,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens
           AS start_tok
  FROM toks
)
SELECT shard, CAST(chunk AS BIGINT) AS chunk, doc_id, n_tokens, start_tok,
       least(end_tok, (chunk + 1) * {CTX})
         - greatest(start_tok, chunk * {CTX}) AS tokens_in_chunk
FROM spans,
     unnest(range(CAST(start_tok // {CTX} AS BIGINT),
                  CAST((end_tok - 1) // {CTX} + 1 AS BIGINT))) AS t(chunk)
"""


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["shard", "chunk", "doc_id"])
        .reset_index(drop=True)
        .astype("int64")
    )


def test_pack_sequences_matches_oracle(spark):
    got = pack_sequences(
        load_table(spark, SF_DIR, "documents"), ctx_len=CTX, n_shards=SHARDS
    ).toPandas()
    want = duckdb.sql(ORACLE).df()
    pd.testing.assert_frame_equal(_normalize(got), _normalize(want[got.columns]))


def test_packing_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents")
    packed = pack_sequences(docs, ctx_len=CTX, n_shards=SHARDS).cache()
    try:
        pdf = packed.toPandas()
        # every document's tokens are fully and exactly assigned
        per_doc = pdf.groupby("doc_id").agg(
            assigned=("tokens_in_chunk", "sum"), n=("n_tokens", "first")
        )
        assert (per_doc.assigned == per_doc.n).all()
        # chunks are contiguous per shard from 0 and every non-tail chunk is full
        stats = pack_chunk_stats(packed, ctx_len=CTX).toPandas()
        for shard, g in stats.groupby("shard"):
            chunks = sorted(g.chunk)
            assert chunks == list(range(len(chunks)))
            full = g.sort_values("chunk").iloc[:-1]
            assert (full.filled_tokens == CTX).all()
            assert g.filled_tokens.iloc[-1] <= CTX
        # fill ratio bounded
        assert ((stats.fill_ratio > 0) & (stats.fill_ratio <= 1.0)).all()
    finally:
        packed.unpersist()

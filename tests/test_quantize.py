"""int8 embedding quantization (operators/quantize.py): DuckDB oracle
equivalence of the quantization and integer dot, plus pre-filter/re-rank
recall against exact brute force."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from l1dbproto_spark.operators.quantize import quantize_embeddings, quantized_topk
from l1dbproto_spark.operators.similarity import brute_force_topk
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_quantization_matches_oracle(spark):
    got = (
        quantize_embeddings(load_table(spark, SF_DIR, "embeddings"))
        .select("vec_id", "qscale", F.col("qvec").cast("array<long>").alias("qvec"))
        .toPandas()
    )
    want = duckdb.sql(
        f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
                   AS amax
          FROM '{SF_DIR}/embeddings.parquet'
        )
        SELECT vec_id, amax / 127.0 AS qscale,
               CASE WHEN amax = 0
                    THEN list_transform(v, x -> CAST(0 AS BIGINT))
                    ELSE list_transform(
                      v, x -> CAST(floor(x / (amax / 127.0) + 0.5) AS BIGINT))
               END AS qvec
        FROM e
        """
    ).df()
    got = got.sort_values("vec_id").reset_index(drop=True)
    want = want.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_series_equal(got.qscale, want.qscale)
    assert [list(a) for a in got.qvec] == [list(a) for a in want.qvec]
    # int8 range respected
    assert all(-127 <= x <= 127 for a in got.qvec for x in a)


def test_quantized_topk_recall_vs_brute(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in quantized_topk(emb, queries, k=5, refine=4).collect()
    }
    # int8 with 4x refine margin keeps essentially-full recall on this data
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, recall
    # the re-rank stage reports EXACT cosine: wherever the pair sets agree,
    # the similarity values agree bit-for-bit with brute force
    exact_sims = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    for r in quantized_topk(emb, queries, k=5, refine=4).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact_sims:
            assert r.cosine_sim == exact_sims[key]

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
         CAST(len(string_split_regex(trim(text), '[ \t\r\n\f]+')) AS BIGINT) AS n_tokens
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


def test_chunk_documents_matches_oracle(spark):
    from l1dbproto_spark.operators.packing import chunk_documents

    got = {
        (r.doc_id, r.chunk_index): (r.start_tok, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(
            load_table(spark, SF_DIR, "documents"), chunk_tokens=16, overlap_tokens=4
        ).collect()
    }
    want = {
        (row[0], row[1]): (row[2], row[3], row[4])
        for row in duckdb.sql(
            rf"""
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '[ \t\r\n\f]+') AS w
              FROM '{SF_DIR}/documents.parquet'
            ),
            e AS (
              SELECT doc_id, w, CAST(i AS BIGINT) AS start_tok
              FROM t, unnest(range(1, greatest(len(w) - 16 + 12, 1) + 1, 12)) AS u(i)
            )
            SELECT doc_id, CAST((start_tok - 1) / 12 AS BIGINT) AS chunk_index,
              start_tok,
              CAST(len(w[start_tok:start_tok+15]) AS BIGINT) AS n_chunk_tokens,
              array_to_string(w[start_tok:start_tok+15], ' ') AS chunk_text
            FROM e
            """
        ).fetchall()
    }
    assert got == want
    # coverage + shape invariants
    import collections

    per_doc = collections.defaultdict(list)
    for (d, ci), (st, ntok, _) in got.items():
        per_doc[d].append((ci, st, ntok))
    for d, chunks in per_doc.items():
        chunks.sort()
        # chunk indices dense from 0, starts follow the stride
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        assert all(c[1] == 1 + c[0] * 12 for c in chunks)
        # every chunk but the last is full-width; windows overlap by 4
        assert all(c[2] == 16 for c in chunks[:-1])
        last = chunks[-1]
        assert 1 <= last[2] <= 16
    # multi-chunk docs exist and single-chunk (short) docs exist
    sizes = {len(v) for v in per_doc.values()}
    assert max(sizes) > 1


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from l1dbproto_spark.operators.packing import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(load_table(spark, SF_DIR, "documents"), 16, 16)


CUSTOM_COUNT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(doc_id % {SHARDS} AS INT) AS shard,
         CAST(1 + (doc_id * 37) % 300 AS BIGINT) AS n_tokens
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


def test_pack_sequences_custom_count_col(spark):
    """Pluggable token counts (VERDICT r4 item 6): a pre-computed count
    column (simulating BPE counts — deterministic 1 + (doc_id*37) % 300,
    deliberately unrelated to the whitespace count) drives the packing map;
    the DuckDB oracle re-derives the identical map from the same counts,
    and the capacity invariants hold over the custom budgets."""
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "bpe_tokens", (F.lit(1) + (F.col("doc_id") * 37) % 300).cast("long")
    )
    packed = pack_sequences(
        docs, ctx_len=CTX, n_shards=SHARDS, count_col="bpe_tokens"
    )
    got = _normalize(packed.toPandas())
    want = _normalize(duckdb.sql(CUSTOM_COUNT_ORACLE).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # n_tokens is the CUSTOM count, not the whitespace count
    per_doc = got.groupby("doc_id").agg(
        n=("n_tokens", "first"), s=("tokens_in_chunk", "sum")
    )
    assert (per_doc.n == per_doc.s).all()
    assert (per_doc.n == 1 + (per_doc.index.to_series() * 37) % 300).all()
    # capacity: every chunk except each shard's last is exactly full
    stats = pack_chunk_stats(packed, ctx_len=CTX).toPandas()
    tail = stats.groupby("shard").chunk.max()
    non_tail = stats[stats.chunk < stats.shard.map(tail)]
    assert (non_tail.filled_tokens == CTX).all()
    assert (stats.filled_tokens <= CTX).all()
    # text_col untouched: the plan must not read the text column at all
    plan = packed._jdf.queryExecution().executedPlan().toString()
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and all("text" not in ln for ln in rs), rs


def test_clean_corpus_custom_count_col(spark):
    """clean_corpus's length gate honors count_col: a 2-whitespace-token
    doc with a custom count of 5 survives min_tokens=3, and a long text
    with a custom count of 1 is dropped as too_short."""
    from l1dbproto_spark.operators.corpus import clean_corpus

    docs = spark.createDataFrame(
        [
            (1, "short text", 5),
            (2, "this one is long in whitespace terms", 1),
            (3, "normal document body here", 4),
        ],
        ["doc_id", "text", "bpe_tokens"],
    )
    res = clean_corpus(docs, min_tokens=3, count_col="bpe_tokens")
    kept = {r.doc_id for r in res.cleaned.collect()}
    dropped = {r.doc_id: r.reason for r in res.dropped.collect()}
    assert kept == {1, 3}
    assert dropped == {2: "too_short"}


def test_pack_sequences_custom_shard_and_order(spark):
    """shard_col/order_col replace the id%n assignment and doc_id order:
    start_tok is monotone in the custom order, token conservation holds,
    and the default path is unchanged by the new parameters."""
    rows = [
        # (doc_id, n-token text, shard, rank) — ranks deliberately invert ids
        (0, "w " * 9 + "w", 0, 3),
        (1, "w " * 4 + "w", 0, 1),
        (2, "w " * 6 + "w", 0, 2),
        (3, "w " * 7 + "w", 1, 1),
        (4, "w " * 2 + "w", 1, 2),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, my_shard int, my_rank long"
    )
    got = (
        pack_sequences(
            docs, ctx_len=8, shard_col="my_shard", order_col="my_rank"
        )
        .toPandas()
        .sort_values(["shard", "start_tok"])
    )
    assert set(got["shard"]) == {0, 1}
    # within shard 0 the stream order is rank order: 1 (5 tok), 2 (7), 0 (10)
    s0 = got[got["shard"] == 0].drop_duplicates("doc_id")
    assert list(s0.sort_values("start_tok")["doc_id"]) == [1, 2, 0]
    per_doc = got.groupby("doc_id").agg(
        assigned=("tokens_in_chunk", "sum"), n=("n_tokens", "first")
    )
    assert (per_doc.assigned == per_doc.n).all()


def test_contextual_pack_order_clusters_contiguous(spark):
    """Pinned-centroid contextual order keeps cluster-mates contiguous
    within each shard, whole clusters in one shard, and ranks a dense
    1..n permutation; composed with pack_sequences the packed stream
    preserves that adjacency."""
    import numpy as np

    from l1dbproto_spark.operators.packing import contextual_pack_order

    rng = np.random.default_rng(7)
    centers = np.eye(4)
    rows = []
    for i in range(40):
        c = i % 4
        v = centers[c] + 0.05 * rng.standard_normal(4)
        rows.append((i, [float(x) for x in v]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(c, [float(x) for x in centers[c]]) for c in range(4)],
        "cluster int, centroid array<double>",
    )
    order = contextual_pack_order(
        vecs, n_shards=2, centroids=cents
    ).toPandas()
    assert len(order) == 40
    # whole clusters in one shard: cluster c == id%4 -> shard c%2
    assert ((order["vec_id"] % 4 % 2) == order["ctx_shard"]).all()
    for _, grp in order.groupby("ctx_shard"):
        ranks = sorted(grp["ctx_rank"])
        assert ranks == list(range(1, len(grp) + 1))
        # cluster-mates contiguous: cluster id (vec_id%4) changes at most
        # n_clusters_in_shard - 1 times along the rank order
        seq = list(grp.sort_values("ctx_rank")["vec_id"] % 4)
        changes = sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        assert changes == len(set(seq)) - 1
    # composition: pack on the contextual order; adjacency survives
    docs = vecs.join(
        spark.createDataFrame(
            [(i, "w " * 5 + "w") for i in range(40)], "vec_id long, text string"
        ),
        "vec_id",
    ).join(spark.range(40).withColumnRenamed("id", "vec_id"), "vec_id")
    packed = pack_sequences(
        docs.join(
            spark.createDataFrame(
                order, "vec_id long, ctx_shard int, ctx_rank long"
            ),
            "vec_id",
        ),
        ctx_len=16,
        id_col="vec_id",
        shard_col="ctx_shard",
        order_col="ctx_rank",
    ).toPandas()
    for _, grp in packed.drop_duplicates("doc_id").groupby("shard"):
        seq = list(grp.sort_values("start_tok")["doc_id"] % 4)
        changes = sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        assert changes == len(set(seq)) - 1


def test_contextual_pack_order_trained_path(spark):
    """KMeans-trained centroids: output is a valid dense ranking with all
    ids present (values depend on the fit; structure must not)."""
    from l1dbproto_spark.operators.packing import contextual_pack_order
    from l1dbproto_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(100)
    order = contextual_pack_order(emb, n_shards=4, n_clusters=8).toPandas()
    assert len(order) == 100
    assert order["vec_id"].is_unique
    for _, grp in order.groupby("ctx_shard"):
        assert sorted(grp["ctx_rank"]) == list(range(1, len(grp) + 1))


def test_contextual_pack_order_excludes_degenerate_vectors(spark):
    """NULL / NaN-element / (dim-checked) wrong-size vectors never enter
    the contextual order — a NaN affinity would otherwise sort to a
    cluster's core under desc()."""
    from l1dbproto_spark.operators.packing import contextual_pack_order

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, None),
        (3, [float("nan"), 0.5]),
        (4, [1.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cluster int, centroid array<double>"
    )
    order = contextual_pack_order(
        vecs, n_shards=1, centroids=cents, dim=2
    ).toPandas()
    assert set(order["vec_id"]) == {0, 1}

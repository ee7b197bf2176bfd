"""Sequence packing for LLM training data.

Pretraining pipelines concatenate documents and chunk the token stream into
fixed-length context windows ("packing"); the map of which document
contributes which token span to which training chunk is what the data
loader consumes. This operator family computes that map Spark-side.

Scale design: packing is SHARD-LOCAL, matching how real loaders operate
(each data-parallel worker packs its own shard) — the running token offset
is a window cumsum partitioned by shard, so there is no global sort and no
single serial stream; shards pack independently across the cluster. One
shuffle (the per-shard window), then a per-row chunk-range explode.

Everything is closed-form column algebra (cumsum + integer chunk
arithmetic), so a DuckDB oracle reproduces it exactly
(tests/test_packing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Whitespace tokenization — the same counting rule as queries/text.py
# token_stats (n_tokens), so packed token budgets agree with the token
# statistics the rest of the pipeline reports.
def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r" +"))


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    count_col: str | None = None,
) -> DataFrame:
    """Contiguous (concat-and-chunk) packing map.

    Documents are assigned round-robin to ``n_shards`` shards (``doc_id %
    n_shards``), concatenated in doc_id order within each shard, and the
    token stream is cut into ``ctx_len``-token chunks. Output: one row per
    (document, chunk) overlap —

    ``shard, chunk, doc_id, n_tokens, start_tok, tokens_in_chunk``

    where ``start_tok`` is the document's offset in its shard's token
    stream and ``tokens_in_chunk`` is how many of its tokens land in that
    chunk (a long document spans several chunks; a chunk typically holds
    several documents). Invariant: ``sum(tokens_in_chunk) over a doc ==
    n_tokens``; every chunk except possibly each shard's last holds exactly
    ``ctx_len`` tokens.

    At 100 TB, choose ``n_shards`` >> cluster parallelism: each shard's
    window is an independent sort of ~corpus/n_shards rows and shards pack
    concurrently (the real loader topology, not an artifact).

    Token counting is PLUGGABLE: pass ``count_col`` naming a pre-computed
    per-document token-count column (e.g. BPE counts from an upstream
    tokenizer pass) and the packing map is computed over those budgets —
    ``text_col`` is then never touched, so the plan reads only (id,
    count). Default is the whitespace rule shared with queries/text.py.
    A NULL count excludes that document from the packing map without
    perturbing its shard-mates' offsets (window sums skip nulls) — the
    caller's token-count pass owes every packable doc a count."""
    n_tok = (
        F.col(count_col).cast("long")
        if count_col is not None
        else whitespace_token_count(F.col(text_col)).cast("long")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % F.lit(n_shards)).cast("int").alias("shard"),
        n_tok.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    spans = toks.withColumn("end_tok", F.sum("n_tokens").over(w)).withColumn(
        "start_tok", F.col("end_tok") - F.col("n_tokens")
    )
    first_chunk = F.floor(F.col("start_tok") / F.lit(ctx_len))
    last_chunk = F.floor((F.col("end_tok") - 1) / F.lit(ctx_len))
    exploded = spans.select(
        "shard",
        "doc_id",
        "n_tokens",
        "start_tok",
        "end_tok",
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk"),
    )
    chunk_start = F.col("chunk") * F.lit(ctx_len)
    chunk_end = chunk_start + F.lit(ctx_len)
    tokens_in_chunk = F.least(F.col("end_tok"), chunk_end) - F.greatest(
        F.col("start_tok"), chunk_start
    )
    return exploded.select(
        "shard",
        F.col("chunk").cast("long").alias("chunk"),
        "doc_id",
        "n_tokens",
        "start_tok",
        tokens_in_chunk.alias("tokens_in_chunk"),
    )


def pack_chunk_stats(packed: DataFrame, ctx_len: int = 512) -> DataFrame:
    """Per-chunk fill statistics over a :func:`pack_sequences` map:
    documents per chunk, filled tokens, fill ratio. All chunks except each
    shard's tail chunk are exactly full — the aggregate that validates a
    packing run (and the number a training-efficiency dashboard reports)."""
    return (
        packed.groupBy("shard", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens_in_chunk").alias("filled_tokens"),
        )
        .withColumn(
            "fill_ratio", F.col("filled_tokens") / F.lit(float(ctx_len))
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document sliding-window chunking — the passage extraction an
    eval / retrieval pipeline runs (stride = chunk - overlap), as opposed
    to :func:`pack_sequences`' cross-document concat-and-chunk.

    Output: one row per (document, window) —
    ``id_col, chunk_index, start_tok (1-based), n_chunk_tokens,
    chunk_text`` — where ``chunk_text`` re-joins the whitespace tokens
    (chunks are whitespace-normalized by construction). Start positions
    are ``1, 1+stride, ...`` up to ``max(n_words - chunk + stride, 1)``:
    every token is covered, the final window may be short, and a document
    shorter than ``chunk_tokens`` yields exactly one window.

    Plan shape: tokenize once per document below the Generate (the same
    projection-boundary trick as dedup's shingle explode), then a per-row
    ``sequence`` explode and one ``slice``/``array_join`` per window — no
    shuffle at all; the 100 TB pass is the text scan plus the ~1/stride
    row expansion."""
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    tokenized = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), " +").alias("_w")
    )
    n = F.size("_w")
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(chunk_tokens) + F.lit(stride), F.lit(1)),
        F.lit(stride),
    )
    exploded = tokenized.select(
        F.col(id_col), F.col("_w"), F.explode(starts).alias("start_tok")
    )
    piece = F.slice(F.col("_w"), F.col("start_tok"), chunk_tokens)
    return exploded.select(
        F.col(id_col),
        ((F.col("start_tok") - 1) / stride).cast("long").alias("chunk_index"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )

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
    # explicit whitespace class — see queries/text.py _words for why not \s
    return F.size(F.split(F.trim(text), r"[ \t\r\n\f]+"))


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    count_col: str | None = None,
    shard_col: str | None = None,
    order_col: str | None = None,
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
    A NULL count — including the default rule over NULL text — excludes
    that document from the packing map without perturbing its
    shard-mates' offsets (window sums skip nulls); the caller's
    token-count pass owes every packable doc a count, and clean_corpus
    upstream logs null-text docs as too_short so they never reach
    packing unaccounted.

    Shard assignment and within-shard order are ALSO pluggable:
    ``shard_col`` / ``order_col`` name pre-computed columns replacing the
    ``id % n_shards`` assignment and the doc_id order (order ties break
    by doc_id). This is how :func:`contextual_pack_order` implements
    in-context pretraining (pack topically-related documents adjacently);
    any curriculum (quality-ascending, time-ordered) drops in the same
    way. The plan is unchanged — one per-shard window cumsum."""
    n_tok = (
        F.col(count_col).cast("long")
        if count_col is not None
        else whitespace_token_count(F.col(text_col)).cast("long")
    )
    shard_expr = (
        F.col(shard_col).cast("int")
        if shard_col is not None
        else (F.col(id_col) % F.lit(n_shards)).cast("int")
    )
    sel = [
        F.col(id_col).alias("doc_id"),
        shard_expr.alias("shard"),
        n_tok.alias("n_tokens"),
    ]
    if order_col is not None:
        sel.append(F.col(order_col).alias("_ord"))
    toks = docs.select(*sel)
    order_keys = ["_ord", "doc_id"] if order_col is not None else ["doc_id"]
    w = Window.partitionBy("shard").orderBy(*order_keys)
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


def bin_pack_documents(
    docs: DataFrame,
    ctx_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    count_col: str | None = None,
    oversize: str = "truncate",
) -> DataFrame:
    """Whole-document best-fit packing — the NO-SPLIT alternative to
    :func:`pack_sequences` for pipelines where cross-document attention
    contamination matters (SFT, long-context finetuning; "Fewer Truncations
    Improve Language Modeling", Ding et al. 2024 motivates exactly this
    best-fit construction over concat-and-chunk).

    Each document is placed WHOLE into one ``ctx_len``-capacity bin by
    Best-Fit-Decreasing within its shard (sort by descending token count,
    place each doc in the fullest bin that still fits, open a new bin
    otherwise). Documents longer than ``ctx_len`` are either truncated to
    ``ctx_len`` (``oversize="truncate"``, flagged) or dropped
    (``oversize="drop"``). Output: one row per packed document —

    ``shard, bin, doc_id, n_tokens, tokens_packed, truncated``

    with ``sum(tokens_packed) <= ctx_len`` per (shard, bin) and every bin
    holding only whole (or head-truncated oversize) documents.

    Scale shape: bin packing is inherently sequential per bin stream, so
    this is the engine's documented Arrow-batch exception (COVERAGE §2.9,
    same rule as BPE): ONE ``applyInPandas`` over shard groups, each shard
    packed by bisect search over the sorted bin-remainder list (log-time
    search; the list insert is a memmove, so worst-case quadratic in bins
    but allocation-free and fast at real shard sizes — size shards via
    ``n_shards``, which is the actual scale knob).
    Shards pack independently across the cluster — choose ``n_shards`` >>
    parallelism and per-task memory holds ~corpus/n_shards (id, count)
    pairs, never text: when ``count_col`` is given the plan reads only
    (id, count), exactly like :func:`pack_sequences`. Determinism: shard
    assignment is ``id % n_shards``, the BFD scan orders by (-count,
    doc_id), and equal-remainder bins tie to the lowest bin id — output
    is independent of partitioning and run order. Null and non-positive
    counts are excluded (the caller's token-count pass owes every
    packable doc a positive count; a negative count would otherwise
    CREDIT bin capacity in the remainder arithmetic)."""
    if oversize not in ("truncate", "drop"):
        raise ValueError("oversize must be 'truncate' or 'drop'")
    n_tok = (
        F.col(count_col).cast("long")
        if count_col is not None
        else whitespace_token_count(F.col(text_col)).cast("long")
    )
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col) % F.lit(n_shards)).cast("int").alias("shard"),
        n_tok.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    drop_oversize = oversize == "drop"

    def _pack(pdf):
        import bisect

        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        # bins kept as a list of (remaining, bin_id) tuples sorted by that
        # tuple; best-fit = smallest remaining that still fits, remainder
        # ties to the LOWEST bin id (bisect on (take, -1) lands on it) —
        # the deterministic rule the parity test re-derives independently.
        bins: list = []  # sorted (remaining, bin_id)
        next_bin = 0
        out_bin, out_packed, out_trunc = [], [], []
        for nt in pdf["n_tokens"].to_numpy():
            take = int(min(nt, ctx_len))
            truncated = nt > ctx_len
            if truncated and drop_oversize:
                out_bin.append(-1)
                out_packed.append(0)
                out_trunc.append(True)
                continue
            i = bisect.bisect_left(bins, (take, -1))
            if i < len(bins):
                rem, b = bins.pop(i)
            else:
                rem, b = ctx_len, next_bin
                next_bin += 1
            rem -= take
            bisect.insort(bins, (rem, b))
            out_bin.append(b)
            out_packed.append(take)
            out_trunc.append(bool(truncated))
        res = pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                "bin": out_bin,
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "tokens_packed": out_packed,
                "truncated": out_trunc,
            }
        )
        if drop_oversize:
            res = res[res["bin"] >= 0]
        return res

    schema = (
        "shard int, bin long, doc_id long, n_tokens long, "
        "tokens_packed long, truncated boolean"
    )
    return toks.groupBy("shard").applyInPandas(_pack, schema=schema)


def bin_pack_stats(packed: DataFrame, ctx_len: int = 512) -> DataFrame:
    """Per-bin fill statistics over a :func:`bin_pack_documents` map —
    docs per bin, filled tokens, fill ratio. The aggregate a packing-
    efficiency dashboard reports (BFD's promise is a fill ratio near 1
    with zero document splits)."""
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens_packed").alias("filled_tokens"),
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
        F.col(id_col), F.split(F.trim(F.col(text_col)), "[ \t\r\n\f]+").alias("_w")
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


def contextual_pack_order(
    vectors: DataFrame,
    n_shards: int = 8,
    n_clusters: int | None = None,
    centroids: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """In-context pretraining order (Shi et al. 2023, "In-Context
    Pretraining: Language Modeling Beyond Document Boundaries"): make
    topically-RELATED documents adjacent in the packing stream, so each
    training context window holds coherent documents instead of random
    ones. Returns ``(id_col, ctx_shard, ctx_rank)`` — feed straight into
    :func:`pack_sequences` as ``shard_col`` / ``order_col``.

    Construction: assign each vector to its nearest centroid (pinned
    ``centroids`` table, or KMeans-trained when ``n_clusters`` is given —
    the same coarse quantizer as the IVF family), keep whole clusters in
    one shard (``cluster % n_shards``), and rank within the shard by
    (cluster, centroid affinity desc, id) — cluster-mates are contiguous
    and flow from core to periphery of the topic. The paper's exact
    traveling-salesman document chain is approximated by the
    affinity-descending order within each cluster (documented
    approximation: same adjacency structure, cheaper construction).

    Degenerate vectors (NULL, wrong dimension, NULL/NaN elements) are
    EXCLUDED — unguarded, a NaN affinity sorts first under desc() and
    plants the garbage vector at a cluster's core (the cosine family's
    standard guard; pinned in test_packing).

    Scale shape: the IVF assignment machinery reused — a bounded
    broadcast centroid crossJoin collapsing map-side into one uniform
    id-keyed aggregation, then one per-shard window for the rank (two
    exchanges total). Cluster sizes bound shard skew: choose
    n_clusters >> n_shards so shards get many clusters each."""
    from .similarity import _nearest_centroids, ivf_index

    well_formed = F.col(vec_col).isNotNull() & ~F.exists(
        vec_col, lambda x: x.isNull() | F.isnan(x)
    )
    if dim is not None:
        well_formed = well_formed & (F.size(F.col(vec_col)) == dim)
    vectors = vectors.filter(well_formed)
    if centroids is None:
        if n_clusters is None:
            raise ValueError("pass centroids or n_clusters")
        assigned_raw, model = ivf_index(
            vectors, n_clusters=n_clusters, vec_col=vec_col, seed=seed
        )
        cent_rows = [
            (int(i), [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ]
        cent = vectors.sparkSession.createDataFrame(
            cent_rows, "cluster int, _cvec array<double>"
        )
    else:
        cent = centroids.select(
            F.col("cluster").cast("int").alias("cluster"),
            F.col("centroid").alias("_cvec"),
        )
    from .similarity import centroid_score

    assigned = _nearest_centroids(
        vectors.select(
            F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")
        ),
        cent,
        n=1,
        id_alias=id_col,
        dim=dim,
    )
    # re-join the centroid to score affinity (assignment drops the score)
    scored = assigned.join(F.broadcast(cent), "cluster").select(
        F.col(id_col),
        "cluster",
        (F.col("cluster") % F.lit(n_shards)).cast("int").alias("ctx_shard"),
        centroid_score(F.col("_v"), F.col("_cvec"), dim).alias("_aff"),
    )
    w = Window.partitionBy("ctx_shard").orderBy(
        "cluster", F.desc("_aff"), F.col(id_col)
    )
    return scored.select(
        F.col(id_col),
        "ctx_shard",
        F.row_number().over(w).cast("long").alias("ctx_rank"),
    )

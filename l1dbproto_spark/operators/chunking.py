"""Passage chunking — the document->passage step every RAG/retrieval
indexing pipeline runs before embedding or BM25 (LangChain/LlamaIndex
"text splitters", DPR's 100-word passages, the passage granularity of
every dense-retrieval paper): fixed-size sliding token windows with
overlap, and sentence-boundary greedy packing under a token budget.
Chunks carry provenance (token/sentence offsets into the source doc) so
a retrieval hit maps back to its exact span.

Reference parity: the reference has no text layer; this is extension
surface like the rest of the LLM-pipeline family, and it composes
directly with it — ``chunk_fixed_tokens(docs) -> hashed_doc_embeddings
-> brute_force_topk`` is the model-free passage-retrieval index, and the
chunk frame feeds ``bm25.build_index`` / ``pack_sequences`` unchanged
(chunks are just short documents keyed by (doc_id, chunk_idx)).

Conventions shared with the rest of the engine: tokens are the explicit
whitespace class of ``packing.whitespace_token_count`` (never ``\\s`` —
see queries/text.py _words); sentences are terminal-punctuation runs
like the C4 family counts them, extracted with ``regexp_extract_all``
(RE2-portable: no lookbehind, so a DuckDB oracle can re-derive the rule
verbatim).

Scale: both operators are pure per-row column algebra — split /
higher-order folds / posexplode, all JVM-side, ZERO shuffle and zero
Python (plan-pinned in tests/test_chunking.py). The fan-out is bounded
by document length exactly like the engine's other explodes; a 100 TB
corpus chunks at scan speed and the output partitioning inherits the
input's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the engine's whitespace-token class (packing.whitespace_token_count)
_WS = r"[ \t\r\n\f]+"

#: one sentence = a maximal run of non-terminal chars plus its trailing
#: terminal-punctuation run ('.', '!', '?'); trailing unpunctuated text
#: is its own sentence. RE2-compatible (no lookbehind/backrefs).
_SENT_RE = r"[^.!?]+[.!?]*"


def _tokens(text: Column) -> Column:
    """Whitespace tokens; empty/blank/null text -> empty array."""
    return F.when(
        F.trim(F.coalesce(text, F.lit(""))) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), _WS))


def split_sentences(text: Column) -> Column:
    """Array of trimmed sentences (terminal punctuation kept); null or
    blank text -> empty array."""
    return F.filter(
        F.transform(
            F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(_SENT_RE), 0),
            lambda s: F.trim(s),
        ),
        lambda s: F.length(s) > 0,
    )


def chunk_fixed_tokens(
    docs: DataFrame,
    size: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding token windows: one row per chunk — ``(id, chunk_idx,
    token_start, n_tokens, text)`` with chunk i covering tokens
    ``[i*stride, i*stride + size)`` (the last window may be shorter,
    never empty). ``size - stride`` tokens of overlap give retrieval
    recall at window boundaries; ``stride == size`` tiles exactly (the
    concatenation of non-overlapping chunks reconstructs the
    whitespace-normalized document — pinned in tests). Documents with
    NULL/blank text emit zero chunks.

    n_chunks = ceil(max(n_tokens - size, 0) / stride) + 1 — every token
    is covered and no window starts at or past the end."""
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, got {size}/{stride}")
    if stride > size:
        raise ValueError(
            f"stride {stride} > size {size} would skip tokens between windows"
        )
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.ceil(F.greatest(n - size, F.lit(0)) / stride).cast("int") + 1
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.alias("_n"),
        n_chunks.alias("_nc"),
    ).filter(F.col("_n") > 0)
    start = F.col("chunk_idx") * stride
    window = F.slice(F.col("_toks"), start + 1, size)
    return base.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias(
            "chunk_idx", "_i"
        ),
        "_toks",
    ).select(
        F.col(id_col),
        F.col("chunk_idx"),
        start.cast("long").alias("token_start"),
        F.size(window).alias("n_tokens"),
        F.array_join(window, " ").alias("text"),
    )


def chunk_by_sentences(
    docs: DataFrame,
    max_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sentence packing under a token budget: sentences are
    accumulated in order and a chunk closes when adding the next
    sentence would exceed ``max_tokens`` — so chunks never split a
    sentence, and a single sentence longer than the budget gets its own
    (oversize) chunk rather than being dropped or truncated. One row per
    chunk: ``(id, chunk_idx, sent_start, n_sentences, n_tokens, text)``
    with provenance in sentence coordinates. NULL/blank text emits zero
    chunks.

    The greedy scan is inherently sequential per document, so it runs as
    ONE ``aggregate`` fold over the sentence array (JVM higher-order
    function — not a Python UDF, not a window over an exploded frame):
    state = (closed spans, current start, current token count)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    sents = split_sentences(F.col(text_col))
    stoks = F.transform(
        sents, lambda s: F.size(F.split(s, _WS)).cast("long")
    )
    base = docs.select(
        F.col(id_col), sents.alias("_sents"), stoks.alias("_toks")
    ).filter(F.size("_sents") > 0)

    init = F.struct(
        F.array().cast("array<struct<s:int,e:int>>").alias("spans"),
        F.lit(0).alias("cur_s"),
        F.lit(0).cast("long").alias("cur_t"),
    )

    def step(state: Column, i: Column) -> Column:
        t = F.element_at(F.col("_toks"), i + 1)
        close = (state["cur_t"] > 0) & (state["cur_t"] + t > max_tokens)
        return F.struct(
            F.when(
                close,
                F.concat(
                    state["spans"],
                    F.array(
                        F.struct(
                            state["cur_s"].alias("s"), (i - 1).alias("e")
                        )
                    ),
                ),
            )
            .otherwise(state["spans"])
            .alias("spans"),
            F.when(close, i).otherwise(state["cur_s"]).alias("cur_s"),
            F.when(close, t).otherwise(state["cur_t"] + t).alias("cur_t"),
        )

    def finish(state: Column) -> Column:
        return F.concat(
            state["spans"],
            F.array(
                F.struct(
                    state["cur_s"].alias("s"),
                    (F.size(F.col("_sents")) - 1).alias("e"),
                )
            ),
        )

    spans = F.aggregate(
        F.sequence(F.lit(0), F.size("_sents") - 1).cast("array<int>"),
        init,
        step,
        finish,
    )
    piece = F.slice(
        F.col("_sents"), F.col("span.s") + 1, F.col("span.e") - F.col("span.s") + 1
    )
    return (
        base.select(
            F.col(id_col),
            "_sents",
            "_toks",
            F.posexplode(spans).alias("chunk_idx", "span"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.col("span.s").alias("sent_start"),
            (F.col("span.e") - F.col("span.s") + 1).alias("n_sentences"),
            F.aggregate(
                F.slice(
                    F.col("_toks"),
                    F.col("span.s") + 1,
                    F.col("span.e") - F.col("span.s") + 1,
                ),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).alias("n_tokens"),
            F.array_join(piece, " ").alias("text"),
        )
    )

"""Benchmark-contamination detection — n-gram overlap between a training
corpus and an evaluation set.

Before a corpus ships, the pipeline must answer "which training documents
contain verbatim chunks of the eval benchmarks?" (the GPT-3 paper's 13-gram
and Gopher's 8-gram decontamination checks). The shape here is the same
inverted-index join the Jaccard near-dup family uses (operators/dedup.py):
explode both sides into distinct word n-grams, join on the n-gram, and
aggregate per (train doc, eval doc) pair — pairs are only materialized for
documents that actually share a shingle, never all-pairs.

Scale shape at 100 TB: the eval side is tiny (benchmarks are MBs), so the
shingle join is a broadcast of the eval shingle set against one pass over
the corpus shingles — no shuffle of the corpus side at all until the
per-pair aggregation, whose key space is bounded by (matching corpus docs
x eval docs). A df-cap on pathologically common shingles (mirroring
jaccard's) is unnecessary under a broadcast eval side but available via
``min_shingle_len`` pre-filtering of trivial n-grams.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import pin

from .dedup import word_shingles


@dataclass
class EvalIndex:
    """Precomputed eval-side state for contamination checks: the distinct
    (eval_id, shingle) rows and the per-eval-doc shingle counts. Build it
    ONCE (``build_eval_index``) and reuse across corpus partitions or
    streaming micro-batches — the eval side is static by construction."""

    shingles: DataFrame  # (eval_id, shingle)
    sizes: DataFrame  # (eval_id, eval_ngrams)


def build_eval_index(
    eval_set: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache: bool = True,
    min_shingle_len: int | None = None,
) -> EvalIndex:
    """Shingle the eval set once. With ``cache=True`` both frames are
    Spark-cached — they are MBs by construction (benchmarks are small), and
    every subsequent contamination check broadcasts them without
    re-scanning the eval parquet.

    ``min_shingle_len`` (characters) drops trivial short n-grams from the
    index — the eval side defines which shingles can match at all, so
    filtering here prunes the corpus side of the join too; the per-doc
    ``eval_ngrams`` denominator counts only indexed shingles, keeping the
    contamination fraction consistent with what can be matched."""
    e = word_shingles(eval_set, n, text_col, id_col).withColumnRenamed(
        "doc_id", "eval_id"
    )
    if min_shingle_len is not None:
        e = e.filter(F.length("shingle") >= min_shingle_len)
    sizes = e.groupBy("eval_id").agg(F.count(F.lit(1)).alias("eval_ngrams"))
    if cache:
        e = e.cache()
        sizes = sizes.cache()
    return EvalIndex(shingles=e, sizes=sizes)


def ngram_contamination(
    corpus: DataFrame,
    eval_set: DataFrame | None = None,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    index: EvalIndex | None = None,
    min_shingle_len: int | None = None,
) -> DataFrame:
    """Per (corpus doc, eval doc) contamination report:

    (``doc_id``, ``eval_id``, ``n_shared`` distinct shared n-grams,
    ``eval_ngrams`` = eval doc's distinct n-gram count, ``contamination`` =
    n_shared / eval_ngrams) for pairs with ``n_shared >= min_overlap``.

    A contamination of 1.0 means every n-gram of the eval document appears
    in the training document (verbatim inclusion); the usual policy drops
    or flags training docs above a small threshold. Eval shingles are
    broadcast (benchmarks are small by construction); corpus shingles
    stream through the join map-side. Pass a prebuilt ``index``
    (:func:`build_eval_index`) to skip re-shingling the eval side — the
    streaming gate's per-micro-batch path."""
    if index is None:
        if eval_set is None:
            raise ValueError("pass eval_set or a prebuilt index")
        index = build_eval_index(
            eval_set, n, text_col, id_col, cache=False,
            min_shingle_len=min_shingle_len,
        )
    c = word_shingles(corpus, n, text_col, id_col)
    shared = (
        c.join(F.broadcast(index.shingles), "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )
    return shared.join(F.broadcast(index.sizes), "eval_id").select(
        "doc_id",
        "eval_id",
        "n_shared",
        "eval_ngrams",
        (F.col("n_shared").cast("double") / F.col("eval_ngrams")).alias(
            "contamination"
        ),
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame | None = None,
    n: int = 8,
    max_contamination: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    index: EvalIndex | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Drop corpus documents whose contamination against ANY eval document
    exceeds ``max_contamination`` (0.0 = any shared n-gram disqualifies).
    Returns (clean corpus, drop log of (doc_id, eval_id, contamination)
    keeping each dropped doc's WORST eval match). The drop set is built
    from :func:`ngram_contamination` and removed with an anti-join that
    carries NO broadcast hint: how many corpus docs touch an eval shingle
    is data-dependent (a template leak can flag a large corpus fraction),
    so a mandatory broadcast would OOM executors at scale. AQE broadcasts
    when the drop set is genuinely small and shuffles otherwise
    (plan-asserted in test_contamination.py)."""
    report = ngram_contamination(
        corpus, eval_set, n, 1, text_col, id_col, index=index
    )
    flagged = report.filter(F.col("contamination") > max_contamination)
    # the drop log is id-sized but feeds BOTH outputs (returned directly
    # and anti-joined into the clean corpus) — checkpoint it so the
    # corpus-scale shingle join behind it runs once, not once per output.
    # localCheckpoint blocks are executor-resident (job fails rather than
    # recomputes on executor loss); see clean_corpus's docstring for the
    # trade-off and the reliable-checkpoint alternative
    worst = flagged.groupBy("doc_id").agg(
        F.max_by("eval_id", F.struct("contamination", "eval_id")).alias("eval_id"),
        F.max("contamination").alias("contamination"),
    ).transform(pin, eager=False)
    clean = corpus.join(
        worst.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )
    return clean, worst


def semantic_contamination(
    corpus_vecs: DataFrame,
    eval_vecs: DataFrame,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    dim: int | None = None,
    round_digits: int = 9,
) -> DataFrame:
    """Embedding-space eval-set leakage: (id_col, eval_id, cosine_sim)
    for every corpus/eval pair with cosine >= ``threshold``. Catches the
    paraphrased and re-rendered benchmark copies the n-gram detector
    (:func:`ngram_contamination`) cannot see — the two reports compose
    (run both, union the drop sets), the same way SemDeDup complements
    token-level dedup.

    With ``centroids`` (the scale path): corpus vectors assign to their
    nearest centroid (one scan, map-side argmax), eval vectors to their
    ``n_probe`` nearest (boundary-straddling pairs are caught the same
    way IVF query probing catches them), and the cosine join runs on the
    cluster key against the BROADCAST eval side — per-corpus-row work is
    |eval-in-probed-clusters|, not |eval|, and nothing quadratic in the
    corpus exists anywhere. Recall is n_probe-tunable exactly like
    ``ann_topk_ivf``. Without ``centroids``: a broadcast cross join
    against the full eval table — exact, for bounded corpora and oracle
    tests. Degenerate vectors (zero-norm/NULL/NaN) are excluded on both
    sides, the cosine family's standard guard."""
    from .similarity import _spread, dot, l2_norm
    from .semdedup import assign_clusters

    def _guard(df, ident, alias_v, alias_n):
        out = df.select(
            F.col(ident),
            F.col(vec_col).alias(alias_v),
            l2_norm(F.col(vec_col), dim).alias(alias_n),
            *([c for c in df.columns if c == "cluster"]),
        )
        return out.filter((F.col(alias_n) > 0) & ~F.isnan(alias_n))

    if centroids is not None:
        corpus_a = assign_clusters(
            _spread(corpus_vecs, id_col), centroids, vec_col, id_col, dim
        )
        from .similarity import _nearest_centroids

        cent = centroids.select("cluster", F.col("centroid").alias("_cvec"))
        eval_a = _nearest_centroids(
            eval_vecs.select(
                F.col(eval_id_col).alias("_vid"), F.col(vec_col).alias("_v")
            ),
            cent,
            n=n_probe,
            id_alias=eval_id_col,
            dim=dim,
        ).select(
            F.col(eval_id_col), F.col("_v").alias(vec_col), "cluster"
        )
        left = _guard(corpus_a, id_col, "_va", "_na")
        right = _guard(eval_a, eval_id_col, "_vb", "_nb")
        joined = left.join(F.broadcast(right), "cluster")
    else:
        left = _guard(corpus_vecs, id_col, "_va", "_na")
        right = _guard(eval_vecs, eval_id_col, "_vb", "_nb")
        joined = left.crossJoin(F.broadcast(right))
    sim = F.round(
        dot(F.col("_va"), F.col("_vb"), dim) / (F.col("_na") * F.col("_nb")),
        round_digits,
    )
    return (
        joined.select(F.col(id_col), F.col(eval_id_col), sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= F.lit(threshold))
    )


def decontaminate_semantic(
    corpus: DataFrame,
    corpus_vecs: DataFrame,
    eval_vecs: DataFrame,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Drop corpus documents semantically contaminated against ANY eval
    document. Returns (clean corpus, drop log (id_col, eval_id,
    cosine_sim) keeping each doc's WORST match) — the embedding-side
    twin of :func:`decontaminate`, same no-hint anti-join rule (the drop
    set is a data-dependent corpus fraction; AQE sizes the join)."""
    report = semantic_contamination(
        corpus_vecs,
        eval_vecs,
        threshold,
        centroids,
        n_probe,
        vec_col,
        id_col,
        eval_id_col,
        dim,
    )
    worst = report.groupBy(id_col).agg(
        F.max_by(
            F.col(eval_id_col), F.struct("cosine_sim", F.col(eval_id_col))
        ).alias(eval_id_col),
        F.max("cosine_sim").alias("cosine_sim"),
    ).transform(pin, eager=False)
    clean = corpus.join(worst.select(id_col), id_col, "left_anti")
    return clean, worst

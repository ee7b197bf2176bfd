"""Negative mining for contrastive / embedding-model training: per
anchor, the top-k most-similar corpus documents that are NOT positives
("hard" negatives — the pairs that actually move a contrastive loss),
plus deterministically-drawn uniform "easy" negatives. This is the
training-pair construction step of every retrieval/embedding pipeline
(DPR, SimCSE, E5-style); the engine's ANN family finds neighbors, this
module turns them into LABELED training pairs with the positives
excluded exactly.

Exclusion semantics are exact, not overfetch-and-hope: positives are
removed BEFORE the ranking, so every anchor gets its true top-k
non-positive neighbors (an overfetch heuristic under-fills anchors whose
near neighborhood is dense with positives — precisely the anchors hard
negatives matter most for).

Scale shape: anchors are bounded (broadcast) like every query frame in
the similarity family; scoring is the expression fold on the corpus
scan; positives join in as a broadcast anti join; the per-anchor top-k is
the engine's two-phase exact window (partition-local cut, then final
rank) so no anchor's candidate set ever sorts in one task. Easy
negatives are hash-rank draws — pure functions of (anchor, doc, salt),
reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _spread, l2_norm, dot


def _pos_pairs(positives: DataFrame, id_type) -> DataFrame:
    """Positive pairs cast to the CORPUS id type — a hardcoded long cast
    nulled out string ids and silently stopped excluding anything (r11
    review find); casting to the actual id type keeps the anti-join keyed
    correctly for any id column."""
    return positives.select(
        F.col("anchor_id").cast(id_type).alias("anchor_id"),
        F.col("neighbor_id").cast(id_type).alias("neighbor_id"),
    ).distinct()


def _two_phase_topk(scored: DataFrame, order: list, k: int) -> DataFrame:
    """Exact per-anchor top-k with partition-bounded window frames."""
    wloc = Window.partitionBy("anchor_id", "_pid").orderBy(*order)
    w = Window.partitionBy("anchor_id").orderBy(*order)
    return (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(wloc))
        .filter(F.col("_lr") <= k)
        .drop("_pid", "_lr")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def mine_hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    label_col: str | None = None,
    positives: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
    dim: int | None = None,
) -> DataFrame:
    """(anchor_id, neighbor_id, cosine_sim, rank<=k): each anchor's k
    most-cosine-similar corpus docs that are not positives.

    Positives excluded exactly, before ranking: the anchor itself; any
    corpus doc sharing the anchor's ``label_col`` value (the "same class
    = positive" convention; NULL labels match nothing); and any
    (anchor_id, doc_id) pair in ``positives`` (explicit positive pairs,
    e.g. click or duplicate logs — a bounded frame, broadcast anti
    join). Degenerate vectors (zero-norm/NaN) are dropped on both sides
    like the whole similarity family; similarities are rounded to
    ``round_digits`` (the engine-portability contract)."""
    corpus = _spread(corpus, id_col)
    a_label = (
        [F.col(label_col).alias("_albl")] if label_col is not None else []
    )
    c_label = (
        [F.col(label_col).alias("_clbl")] if label_col is not None else []
    )
    q = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col), dim).alias("qn"),
        *a_label,
    ).filter((F.col("qn") > 0) & ~F.isnan("qn"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col), dim).alias("cn"),
        *c_label,
    ).filter((F.col("cn") > 0) & ~F.isnan("cn"))
    sim = F.round(
        dot(F.col("qvec"), F.col("cvec"), dim) / (F.col("qn") * F.col("cn")),
        round_digits,
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("anchor_id")
    )
    if label_col is not None:
        # same label = positive; eqNullSafe-negation keeps NULL-labeled
        # rows (a NULL label is "unlabeled", not "same class")
        scored = scored.filter(~F.col("_clbl").eqNullSafe(F.col("_albl")))
    scored = scored.select("anchor_id", "neighbor_id", sim.alias("cosine_sim"))
    if positives is not None:
        scored = scored.join(
            F.broadcast(_pos_pairs(positives, corpus.schema[id_col].dataType)),
            ["anchor_id", "neighbor_id"],
            "left_anti",
        )
    order = [F.desc("cosine_sim"), F.asc("neighbor_id")]
    return _two_phase_topk(scored, order, k)


def sample_easy_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    m: int = 5,
    label_col: str | None = None,
    positives: DataFrame | None = None,
    salt: str = "easyneg-v1",
    id_col: str = "vec_id",
) -> DataFrame:
    """(anchor_id, neighbor_id, rank<=m): m uniform non-positive corpus
    docs per anchor, chosen by deterministic hash rank over
    md5(salt:anchor:doc) — a pure function of ids and salt, so re-runs
    and other engines reproduce the draw (same contract as
    ``sampling.stratified_sample``). Same exclusion rules as
    :func:`mine_hard_negatives`; no embeddings needed."""
    q = anchors.select(
        F.col(id_col).alias("anchor_id"),
        *( [F.col(label_col).alias("_albl")] if label_col is not None else [] ),
    )
    c = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        *( [F.col(label_col).alias("_clbl")] if label_col is not None else [] ),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("anchor_id")
    )
    if label_col is not None:
        pairs = pairs.filter(~F.col("_clbl").eqNullSafe(F.col("_albl")))
    pairs = pairs.select("anchor_id", "neighbor_id")
    if positives is not None:
        pairs = pairs.join(
            F.broadcast(_pos_pairs(positives, corpus.schema[id_col].dataType)),
            ["anchor_id", "neighbor_id"],
            "left_anti",
        )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(salt),
                    F.col("anchor_id").cast("string"),
                    F.col("neighbor_id").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    pairs = pairs.withColumn("_u", u)
    order = [F.asc("_u"), F.asc("neighbor_id")]
    return _two_phase_topk(pairs, order, m).drop("_u")


def contrastive_pairs(
    corpus: DataFrame,
    anchors: DataFrame,
    k_hard: int = 5,
    m_easy: int = 5,
    label_col: str | None = None,
    positives: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The assembled training-pair table: (anchor_id, neighbor_id, kind,
    rank, cosine_sim) with kind in ('hard', 'easy'); easy rows carry
    NULL cosine_sim (they were drawn by hash, not scored — scoring them
    would cost a second full similarity pass for a value the loss never
    uses). A doc drawn both ways keeps both rows: the kinds are distinct
    sampling distributions and dedup policy belongs to the trainer."""
    hard = mine_hard_negatives(
        corpus, anchors, k_hard, label_col, positives, vec_col, id_col
    ).select(
        "anchor_id",
        "neighbor_id",
        F.lit("hard").alias("kind"),
        "rank",
        "cosine_sim",
    )
    easy = sample_easy_negatives(
        corpus, anchors, m_easy, label_col, positives, id_col=id_col
    ).select(
        "anchor_id",
        "neighbor_id",
        F.lit("easy").alias("kind"),
        "rank",
        F.lit(None).cast("double").alias("cosine_sim"),
    )
    return hard.unionByName(easy)

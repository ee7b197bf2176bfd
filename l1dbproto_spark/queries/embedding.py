"""Model-free text ANN: feature-hashing document embeddings composed with
exact top-k cosine search — the end-to-end "find my document's nearest
neighbors with no external encoder" query (operators/embed.py +
operators/similarity.py; the embedding-side generalization of the
reference's cone cross-match, DIA.py:72-77 / SURVEY.md J1, reached from
raw TEXT instead of a pre-supplied vector column)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.embed import (
    hashed_doc_embeddings,
    hashed_doc_embeddings_oracle_sql,
)
from ..operators.similarity import brute_force_topk
from ..sources.catalog import load_table
from . import query

_DIM = 64
_QMAX = 10

_EMB_SQL = hashed_doc_embeddings_oracle_sql(dim=_DIM, l2_normalize=True)

_COS = """round(
      list_dot_product(qv, cv)
      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 9)"""


@query(
    "doc_embed_ann",
    oracle=f"""
    WITH emb AS ({_EMB_SQL}),
    q AS (SELECT doc_id AS query_id, embedding AS qv FROM emb
          WHERE doc_id < {_QMAX}),
    c AS (SELECT doc_id AS neighbor_id, embedding AS cv FROM emb),
    scored AS (
      SELECT query_id, neighbor_id, {_COS} AS cosine_sim
      FROM c, q WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 3
    """,
    survey="ext:embed (feature-hashing doc embeddings -> exact ANN, model-free); J1 from raw text",
)
def doc_embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nearest documents (cosine over signed-feature-hash vectors)
    for query docs doc_id < 10 — the whole chain is deterministic column
    algebra (exact integer coordinate sums, ordered-fold norms and dots),
    so DuckDB reproduces embeddings, similarities, and ranks bit-for-bit.
    The query-side embed subtree collapses to the 10 query docs (the
    doc_id predicate pushes below the coordinate aggregation's grouping
    key); the corpus side embeds once."""
    docs = load_table(spark, sf_dir, "documents")
    emb = hashed_doc_embeddings(docs, dim=_DIM, id_col="doc_id")
    queries = emb.filter(F.col("doc_id") < _QMAX)
    return brute_force_topk(emb, queries, k=3, id_col="doc_id")


# ---------------------------------------------------------------------------
# contrastive_pairs (driver round 12): the training-pair construction step
# (operators/negatives.py) under the hard oracle signal. Anchors vec_id<12
# over the embeddings corpus labeled label = vec_id % 4 ("same class =
# positive"), plus an EXPLICIT positive-pair table (a, a+100)/(a, a+101)
# derived in both engines by the same arithmetic. Hard rows: exact top-3
# non-positive cosine neighbors (exclusion BEFORE ranking — an anchor whose
# near neighborhood is dense with positives still fills k). Easy rows: 3
# deterministic md5-hash-rank draws over the SAME eligible set ('easyneg-v1'
# salt), NULL cosine by contract. DuckDB re-derives both leg-for-leg.
_CP_K = 3
_CP_EASY_U = (
    "CAST(concat('0x', substr(md5(concat_ws(':', 'easyneg-v1', "
    "CAST(anchor_id AS VARCHAR), CAST(neighbor_id AS VARCHAR))), 1, 12)) "
    "AS BIGINT)"
)


@query(
    "contrastive_pairs",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             CAST(vec_id % 4 AS VARCHAR) AS label
      FROM embeddings
    ),
    q AS (SELECT vec_id AS anchor_id, v AS qv, label AS albl
          FROM e WHERE vec_id < 12),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, label AS clbl FROM e),
    pos AS (
      SELECT a.vec_id AS anchor_id, a.vec_id + off AS neighbor_id
      FROM e a, (VALUES (100), (101)) t(off) WHERE a.vec_id < 12
    ),
    eligible AS (
      SELECT anchor_id, neighbor_id, qv, cv
      FROM c, q
      WHERE neighbor_id <> anchor_id AND clbl <> albl
        AND NOT EXISTS (SELECT 1 FROM pos p
                        WHERE p.anchor_id = q.anchor_id
                          AND p.neighbor_id = c.neighbor_id)
    ),
    hard AS (
      SELECT anchor_id, neighbor_id, 'hard' AS kind, rank, cosine_sim
      FROM (
        SELECT anchor_id, neighbor_id, {_COS} AS cosine_sim,
               ROW_NUMBER() OVER (
                 PARTITION BY anchor_id
                 ORDER BY {_COS} DESC, neighbor_id
               ) AS rank
        FROM eligible
      ) WHERE rank <= {_CP_K}
    ),
    easy AS (
      SELECT anchor_id, neighbor_id, 'easy' AS kind, rank,
             CAST(NULL AS DOUBLE) AS cosine_sim
      FROM (
        SELECT anchor_id, neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY anchor_id
                 ORDER BY {_CP_EASY_U}, neighbor_id
               ) AS rank
        FROM eligible
      ) WHERE rank <= {_CP_K}
    )
    SELECT * FROM hard UNION ALL SELECT * FROM easy
    """,
    survey=(
        "ext:negatives (contrastive training pairs: exact hard-negative "
        "top-k with exclusion-before-ranking + deterministic hash-rank "
        "easy draws; operators/negatives.py contrastive_pairs)"
    ),
)
def contrastive_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor_id, neighbor_id, kind, rank, cosine_sim) — 3 hard + 3
    easy negatives per anchor with label + explicit-pair exclusion.

    Scale shape: anchors broadcast (bounded query frame) against the
    corpus scan; positives broadcast-anti; per-anchor top-k is the
    two-phase exact window (partition-local cut, then final rank); the
    easy draw is a pure hash function of ids — no second scoring pass."""
    from ..operators.negatives import contrastive_pairs

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "label", (F.col("vec_id") % 4).cast("string")
    )
    anchors = emb.filter(F.col("vec_id") < 12)
    positives = anchors.select(
        F.col("vec_id").alias("anchor_id"),
        F.explode(
            F.array(F.col("vec_id") + 100, F.col("vec_id") + 101)
        ).alias("neighbor_id"),
    )
    return contrastive_pairs(
        emb,
        anchors,
        k_hard=_CP_K,
        m_easy=_CP_K,
        label_col="label",
        positives=positives,
    )

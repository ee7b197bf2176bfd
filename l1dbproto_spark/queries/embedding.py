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

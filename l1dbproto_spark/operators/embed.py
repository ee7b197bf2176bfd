"""Feature-hashing document embeddings — the model-free bridge from the
text tables to the embedding-side operators (SemDeDup, ANN, PQ indexing,
embedding near-dup) when no external encoder's vectors are available.

Classic signed feature hashing / random projection [Weinberger et al.,
ICML 2009 "Feature Hashing for Large Scale Multitask Learning";
Achlioptas 2003 sparse random projections]: each token of the
normalized text hashes to a coordinate ``idx = h(tok) mod dim`` and a
sign ``s(tok) in {-1,+1}``; the document vector is the signed count sum
per coordinate, optionally L2-normalized. Inner products of these
vectors approximate token-multiset overlap, so exact clones map to
IDENTICAL vectors (cosine 1.0 — SemDeDup drops them) and near-copies to
nearby ones. The projection is data-independent and deterministic
(portable md5-derived hashes), so embeddings are reproducible across
engines — the DuckDB oracle rebuilds them bit-for-bit — and across
snapshots at 100 TB (no fitted state to version).

Plan: token explode -> one uniform-key (doc, idx) aggregation (signed
counts collapse map-side) -> one per-doc aggregation assembling the
dense array. Two exchanges, no joins, nothing data-dependent broadcast;
the output is |docs| x dim doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from .dedup import normalize_text
from .similarity import dot_fold

#: Hash salts — part of the embedding's identity: vectors hashed under
#: different salts live in different random bases and must never be
#: compared (same contract as the bloom filter's format salt).
IDX_SALT = "embed-idx-v1"
SIGN_SALT = "embed-sign-v1"


def hashed_doc_embeddings(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    l2_normalize: bool = True,
) -> DataFrame:
    """(id_col, embedding array<double>) via signed feature hashing.

    Determinism contract: coordinate sums are exact integer sums (order
    free); the dense array is assembled in coordinate order, so the L2
    norm is an ordered fold both engines evaluate identically, and the
    normalized components are bit-reproducible in DuckDB
    (:func:`hashed_doc_embeddings_oracle_sql`). Empty/whitespace-only or
    NULL text yields the zero vector (unnormalized — cosine operators
    exclude it at their norm guards, the engine-wide degenerate-vector
    contract)."""
    tok = F.explode(
        F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " ")
    ).alias("tok")
    toks = docs.select(F.col(id_col), tok).filter(F.col("tok") != "")
    comp = (
        toks.select(
            id_col,
            F.pmod(portable_hash64(F.col("tok"), IDX_SALT), F.lit(dim)).alias(
                "idx"
            ),
            (
                F.pmod(portable_hash64(F.col("tok"), SIGN_SALT), F.lit(2)) * 2
                - 1
            ).alias("sign"),
        )
        .groupBy(id_col, "idx")
        .agg(F.sum("sign").cast("double").alias("val"))
    )
    dense = (
        comp.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("idx").cast("int"), "val"))
            ).alias("_m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.try_element_at("_m", i), F.lit(0.0)),
            ).alias("embedding"),
        )
    )
    # docs whose every token vanished (empty/NULL text) still get a row —
    # the zero vector — so the embedder is total over the corpus. The
    # token-free set is computed directly from the text (normalized text
    # empty <=> zero token rows) rather than anti-joining against `dense`,
    # which would embed the whole aggregation subtree a second time.
    empty = (
        docs.filter(
            normalize_text(F.coalesce(F.col(text_col), F.lit(""))) == ""
        )
        .select(
            id_col,
            F.array_repeat(F.lit(0.0), dim).alias("embedding"),
        )
    )
    out = dense.unionByName(empty)
    if l2_normalize:
        norm = F.sqrt(dot_fold(F.col("embedding"), F.col("embedding")))
        out = out.select(
            id_col,
            F.when(
                norm > 0,
                F.transform(F.col("embedding"), lambda x: x / norm),
            )
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    return out


def hashed_doc_embeddings_oracle_sql(
    dim: int = 64,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    l2_normalize: bool = True,
) -> str:
    """DuckDB SQL reproducing :func:`hashed_doc_embeddings` bit-for-bit
    (shared md5 hash rendering; grid left-join replaces the map
    assembly; list built in coordinate order so the norm fold matches)."""
    h_idx = portable_hash64_sql("tok", IDX_SALT)
    h_sign = portable_hash64_sql("tok", SIGN_SALT)
    emb = "list(v ORDER BY i)"
    if l2_normalize:
        emb = (
            "CASE WHEN sqrt(list_dot_product(list(v ORDER BY i), "
            "list(v ORDER BY i))) > 0 THEN "
            "list_transform(list(v ORDER BY i), x -> x / "
            "sqrt(list_dot_product(list(v ORDER BY i), list(v ORDER BY i))))"
            " ELSE list(v ORDER BY i) END"
        )
    return f"""
    WITH toks0 AS (
      SELECT {id_col} AS doc_id,
             unnest(string_split(
               lower(trim(regexp_replace(coalesce({text_col}, ''),
                                         '\\s+', ' ', 'g'))), ' ')) AS tok
      FROM {table}
    ),
    toks AS (SELECT doc_id, tok FROM toks0 WHERE tok <> ''),
    comp AS (
      SELECT doc_id, {h_idx} % {dim} AS idx,
             SUM(({h_sign} % 2) * 2 - 1)::DOUBLE AS val
      FROM toks GROUP BY doc_id, idx
    ),
    grid AS (
      SELECT d.{id_col} AS doc_id, r.i, COALESCE(SUM(c.val), 0.0)::DOUBLE AS v
      FROM (SELECT DISTINCT {id_col} FROM {table}) d
      CROSS JOIN range(0, {dim}) r(i)
      LEFT JOIN comp c ON c.doc_id = d.{id_col} AND c.idx = r.i
      GROUP BY 1, 2
    )
    SELECT doc_id AS {id_col}, {emb} AS embedding
    FROM grid GROUP BY doc_id
    """

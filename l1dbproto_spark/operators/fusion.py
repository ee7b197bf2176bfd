"""Hybrid-retrieval rank fusion: Reciprocal Rank Fusion (RRF).

The retrieval surface has two independent families — lexical BM25
(`operators/bm25.py`) and embedding ANN (`operators/similarity.py`,
`operators/embed.py`). Production retrieval fuses both: RRF (Cormack,
Clarke & Buettcher 2009, "Reciprocal Rank Fusion outperforms Condorcet and
individual Rank Learning Methods") is the standard score-free fusion —
immune to incomparable score scales because it uses only ranks:

    rrf(q, d) = sum over sources s of 1 / (k + rank_s(q, d))

Scale shape: each source ranking is already top-k-per-query (bounded rows
per query), so the fusion union + groupBy shuffles only ``n_queries * k *
n_sources`` rows — negligible next to the retrieval itself. Determinism:
contributions are folded in source order (array_sort over collected
(source, contribution) structs), the fused score is rounded to 9 decimals,
and the output rank ties break on doc_id.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_RRF_K = 60


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = DEFAULT_RRF_K,
    topk: Optional[int] = None,
) -> DataFrame:
    """Fuse per-query rankings — each input has (query_id, doc_id, rank) —
    into (query_id, doc_id, rrf_score, rank). A document absent from a
    source simply contributes nothing for it (the standard convention).
    ``topk`` truncates the fused ranking per query."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    tagged = [
        df.select(
            "query_id", "doc_id", F.lit(i).alias("source"), F.col("rank").alias("src_rank")
        )
        for i, df in enumerate(rankings)
    ]
    allr = tagged[0]
    for t in tagged[1:]:
        allr = allr.unionByName(t)
    contrib = F.lit(1.0) / (F.lit(float(k)) + F.col("src_rank").cast("double"))
    fused = (
        allr.select("query_id", "doc_id", "source", contrib.alias("contrib"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("source", "contrib"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ),
                9,
            ).alias("rrf_score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    out = fused.withColumn("rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("rank") <= topk)
    return out

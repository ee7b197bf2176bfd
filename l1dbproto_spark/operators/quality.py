"""Document quality scoring — the filter stage of corpus preparation.

The unigram log-probability score is the classic cheap LM-quality signal:
score each document by the mean log-probability of its tokens under the
corpus's OWN smoothed unigram distribution. Garbled/rare-token documents
score far below fluent text, with no model to train or ship. Used
standalone (queries/text.py) and as clean_corpus's optional quality gate
(operators/corpus.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(col: Column) -> Column:
    return F.split(F.trim(col), " +")


def unigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram log-probability:
    ``score(d) = mean over tokens t of ln((count(t) + s) / (N + s*V))``
    with add-s smoothing over the corpus vocabulary (V types, N tokens).
    Output: (``id_col``, mean_logprob, n_tokens).

    Plan shape at 100 TB: one corpus token aggregation (uniform keys) for
    the distribution, one tf aggregation per doc, one join threading the
    token log-probs back through the per-doc tf rows (AQE decides
    broadcast vs shuffle — a web-scale vocabulary is not bounded). The
    (N, V) totals are a 1-row aggregate joined back by broadcast, so the
    whole plan is lazy and cluster-side — no driver collect. ln() inputs
    are integer-derived doubles in identical operand order and the mean is
    one division, so a DuckDB oracle matches after a 9-decimal round."""
    words = docs.select(
        F.col(id_col), F.explode(_words(F.lower(F.col(text_col)))).alias("term")
    )
    vocab = words.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").cast("double").alias("_n_tok"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    logp = F.log(
        (F.col("cnt") + F.lit(smoothing))
        / (F.col("_n_tok") + F.lit(smoothing) * F.col("_v"))
    )
    lp = vocab.crossJoin(F.broadcast(totals)).select("term", logp.alias("lp"))
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.join(lp, "term")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("tf") * F.col("lp")) / F.sum("tf"), 9
            ).alias("mean_logprob"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
    )

"""Deterministic sampling queries over the documents table — the
training-mix construction layer (operators/sampling.py), registered under
the driver oracle to pin the 48-bit-hash determinism contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query

# DuckDB rendering of operators.sampling._unit_hash (same md5/substr/conv)
_U = (
    "CAST(concat('0x', substr(md5(concat('mix-v1', CAST(doc_id AS VARCHAR))), 1, 12))"
    " AS BIGINT) / CAST(281474976710656 AS DOUBLE)"
)


# Rotated out of the driver registry in round 14 (slot to one of the r13
# training-data components; the sampling family keeps weighted_topk_sample
# + pack_sequences driver-checked). SAME oracle, driver-grade compare in
# tests/test_unregistered_batteries.py.
SAMPLE_MIXTURE_ORACLE = f"""
    SELECT doc_id, lang FROM documents
    WHERE {_U} < CASE lang WHEN 'en' THEN 0.8 WHEN 'es' THEN 0.25
                 ELSE 0.05 END
    """


def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-mixture subsample of the documents corpus (en 0.8 / es 0.25
    / default 0.05): one per-row 48-bit-hash threshold comparison — zero
    shuffles, append-stable, bit-reproducible in DuckDB via the shared
    md5/substr/conv formula (operators/sampling.py). The plan is a pure
    scan+filter; at 100 TB the scan IS the cost."""
    from ..operators.sampling import sample_mixture as _mix

    docs = load_table(spark, sf_dir, "documents")
    return _mix(
        docs, {"en": 0.8, "es": 0.25}, source_col="lang", default_rate=0.05
    ).select("doc_id", "lang")


# DuckDB rendering of the E-S race key: same md5 unit hash (wtopk-v1 salt),
# same 2^-48 clamp (u=0 would make -ln(u) infinite for the BEST draw), same
# -ln(u)/w formula. ln and division are single IEEE-754 ops on identical
# operands; ids+ranks are compared, the float key never leaves the ranking.
_WTOPK_U = (
    "CAST(concat('0x', substr(md5(concat('wtopk-v1', CAST(doc_id AS VARCHAR))), 1, 12))"
    " AS BIGINT) / 281474976710656.0"
)


@query(
    "weighted_topk_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             -ln(GREATEST({_WTOPK_U}, 3.552713678800501e-15))
               / CAST(length(text) AS DOUBLE) AS sample_key
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, lang, sample_rank FROM (
      SELECT doc_id, lang, ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY sample_key, doc_id
      ) AS sample_rank FROM keyed
    ) t WHERE sample_rank <= 5
    """,
    survey="ext:sampling (Efraimidis-Spirakis exact-k weighted draw without replacement; operators/sampling.py weighted_topk_sample)",
)
def weighted_topk_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SIZE weighted sample — 5 documents per language drawn with
    probability proportional to text length (the "pick exactly k training
    docs per source, quality-proportional" selection a mixture builder
    runs against hard shard quotas): each row gets the exponential race
    key -ln(u)/w on its deterministic 48-bit unit hash, and the k
    smallest keys per group are exactly an Efraimidis-Spirakis draw
    without replacement (operators/sampling.py weighted_topk_sample).

    Scale shape: zero-shuffle key computation on the scan, then ONE
    row_number window partitioned by the group — the same shuffle any
    per-group selection pays; a global draw is a TakeOrdered. The float
    key stays inside the ranking; the driver hash compares ids + ranks."""
    from ..operators.sampling import weighted_topk_sample as _wtopk

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").cast("double").alias("w")
    )
    out = _wtopk(docs, k=5, weight_col="w", group_col="lang")
    return out.select("doc_id", "lang", "sample_rank")


# DSIR oracle: the full hashed-feature weight computation in one CTE chain.
# Rounded to 4 decimals on BOTH sides — the per-doc weight is a float sum
# whose accumulation order differs between engines; terms are O(1)-O(10)
# magnitude so cross-engine drift is ~1e-11, nine orders below the rounding
# quantum (the tolerance-safe-decimals pattern from queries/__init__.py).
_DSIR_B = 512
_DSIR_FEATS = """
      SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('dsir-v1', g)), 1, 15))
                  AS BIGINT) % {b} AS bucket,
             COUNT(*) AS cnt
      FROM (
        SELECT doc_id, unnest(t) AS g FROM {toks}
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i + 1])) AS g
        FROM {toks}
      )
      GROUP BY 1, 2
"""
_DSIR_PROBS = """
      SELECT b.bucket,
             (COALESCE(c._c, 0) + 1.0)
               / ((SELECT SUM(cnt) FROM {feats}) + 1.0 * {b}) AS prob
      FROM buckets b
      LEFT JOIN (SELECT bucket, SUM(cnt) AS _c FROM {feats}
                 GROUP BY bucket) c USING (bucket)
"""


@query(
    "dsir_log_weights",
    oracle=f"""
    WITH raw_toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    tgt_toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents WHERE lang = 'es' AND doc_id % 5 = 0
    ),
    raw_feats AS ({_DSIR_FEATS.format(b=_DSIR_B, toks="raw_toks")}),
    tgt_feats AS ({_DSIR_FEATS.format(b=_DSIR_B, toks="tgt_toks")}),
    buckets AS (
      SELECT unnest(generate_series(0, {_DSIR_B} - 1)) AS bucket
    ),
    p_raw AS ({_DSIR_PROBS.format(b=_DSIR_B, feats="raw_feats")}),
    p_tgt AS ({_DSIR_PROBS.format(b=_DSIR_B, feats="tgt_feats")}),
    w AS (
      SELECT f.doc_id,
             SUM(f.cnt * (ln(t.prob) - ln(r.prob))) AS lw
      FROM raw_feats f
      JOIN p_tgt t USING (bucket)
      JOIN p_raw r USING (bucket)
      GROUP BY 1
    )
    SELECT d.doc_id, ROUND(COALESCE(w.lw, 0.0), 4) AS log_weight
    FROM documents d LEFT JOIN w USING (doc_id)
    """,
    survey="ext:sampling (DSIR importance weights — Xie et al. 2023; operators/dsir.py)",
)
def dsir_log_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights of every document against the corpus's
    own 'es' slice standing in as the target domain: hashed unigram+bigram
    bag features, dense Laplace-smoothed 512-bucket models, one
    broadcast-ratio join + per-doc aggregation (operators/dsir.py). The
    weight pass is a single corpus scan; the bucket models are bounded at
    512 rows by construction."""
    from ..operators.dsir import importance_log_weights

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(
        (F.col("lang") == "es") & (F.col("doc_id") % 5 == 0)
    )
    w = importance_log_weights(docs, target, num_buckets=_DSIR_B)
    return w.select("doc_id", F.round("log_weight", 4).alias("log_weight"))

"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): select raw-corpus documents that look like a small target
set (the "high-quality" domain) by importance weighting in a hashed
n-gram feature space.

The published recipe:

1. featurize every document as a bag of HASHED unigram+bigram counts
   (a fixed number of buckets — the paper uses 10k — so the feature
   space is bounded regardless of vocabulary);
2. fit two bag-of-buckets unigram models: ``p_target`` on the target
   set, ``p_raw`` on the raw corpus (Laplace-smoothed);
3. per-document importance weight
   ``log w(x) = sum_b count_b(x) * (log p_target[b] - log p_raw[b])``;
4. sample without replacement via Gumbel top-k on ``log w + g_i``
   (Gumbel noise makes the draw a proper importance resample instead of
   a hard argmax).

Spark shape — all column algebra, no UDFs:

- featurization is one map-side projection (split -> n-gram arrays ->
  explode) followed by ONE uniform-key aggregation on (doc, bucket);
- each bucket model is a ``num_buckets``-row table BY CONSTRUCTION —
  bounded, so broadcasting the log-ratio table is safe at any corpus
  size (unlike data-dependent drop sets, which this engine deliberately
  leaves to AQE — see operators/semdedup.py);
- the weight pass is featurize -> broadcast-join ratio -> one per-doc
  aggregation: a single corpus scan;
- fitting ``p_raw`` is its own corpus scan; at 100 TB precompute it once
  (``bucket_distribution``) and pass it in — the models are tiny
  artifacts, the natural thing to checkpoint next to the corpus.
- Gumbel top-k is ``TakeOrdered`` (per-partition top-k, merge k rows on
  the driver) — never a global sort.

Determinism: bucket hashing uses the engine's portable md5 hash and the
Gumbel draw derives from the standard 48-bit unit hash, so every step is
bit-reproducible in DuckDB (tests/test_dsir.py) and append-stable across
runs. Tokenization is lowercase whitespace splitting (the paper uses
wordpunct; the feature space is hashed either way, and whitespace keeps
the oracle engine-portable).

No reference analog — the reference engine (lsst-dm/l1dbproto) has no
corpus-selection layer; this extends the training-data family alongside
operators/sampling.py's ``weighted_sample`` (which consumes these
weights when a Bernoulli acceptance draw is wanted instead of top-k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..checkpoint import pin

from ..functions.hashing import portable_hash64


def _tokens(text: Column) -> Column:
    """Lowercase whitespace tokens with empties removed."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda t: t != F.lit("")
    )


def hashed_ngram_features(
    docs: DataFrame,
    num_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
    include_bigrams: bool = True,
) -> DataFrame:
    """Hashed bag-of-n-grams counts: (id, bucket, cnt) with every unigram
    (and bigram) OCCURRENCE counted — DSIR weights are count-weighted, not
    set-semantics like the dedup shingles (operators/dedup.py).

    One projection builds the gram array per document (tokens ++ adjacent
    pairs via ``zip_with`` on shifted slices — no shuffle), one explode,
    one uniform-key (id, bucket) aggregation. Output rows per doc are
    bounded by min(doc tokens, num_buckets). The token array is bound as
    a real column first so the five references below (size, two slices,
    concat) parse the text once per row, not five times."""
    toks = F.col("_toks")
    grams = toks
    if include_bigrams:
        n = F.size(toks)
        bigrams = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        grams = F.concat(toks, bigrams)
    return (
        docs.select(
            F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
        )
        .select(F.col(id_col), F.explode(grams).alias("_gram"))
        .select(
            id_col,
            (portable_hash64(F.col("_gram"), salt) % num_buckets).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_distribution(
    features: DataFrame,
    num_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """Laplace-smoothed bucket model fit on a feature frame: DENSE
    (bucket, prob) over all ``num_buckets`` buckets,
    ``p[b] = (cnt[b] + s) / (total + s * B)`` — dense so the downstream
    ratio join never drops a bucket that one side has and the other
    lacks. ``num_buckets`` rows by construction: bounded, broadcastable,
    and the natural artifact to persist once per corpus at scale.

    The per-bucket counts are locally checkpointed: the smoothing
    denominator AND the dense join both consume them, and without the
    checkpoint each branch re-runs the corpus-scale featurize+aggregate
    subtree behind it (the temperature_rates lesson — differing
    projections defeat exchange reuse). Bounded at ``num_buckets`` rows,
    so the materialization is bytes."""
    counts = (
        features.groupBy("bucket")
        .agg(F.sum("cnt").alias("_c"))
        .transform(pin, eager=False)
    )
    dense = features.sparkSession.range(num_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    tot = counts.agg(F.sum("_c").alias("_tot"))
    return (
        dense.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                (F.coalesce(F.col("_c"), F.lit(0)) + F.lit(float(smoothing)))
                / (F.col("_tot") + F.lit(float(smoothing * num_buckets)))
            ).alias("prob"),
        )
    )


def log_ratio_table(
    target_probs: DataFrame, raw_probs: DataFrame
) -> DataFrame:
    """(bucket, log_ratio = ln p_target - ln p_raw). Both inputs are
    dense ``num_buckets``-row models, so the join is tiny and the result
    is safely broadcast into the corpus-scale weight pass."""
    t = target_probs.select("bucket", F.col("prob").alias("_pt"))
    r = raw_probs.select("bucket", F.col("prob").alias("_pr"))
    return t.join(r, "bucket").select(
        "bucket", (F.log("_pt") - F.log("_pr")).alias("log_ratio")
    )


def importance_log_weights(
    docs: DataFrame,
    target: DataFrame,
    num_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
    smoothing: float = 1.0,
    include_bigrams: bool = True,
    raw_probs: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weight: (id, log_weight) with
    ``log_weight = sum_b cnt_b * log_ratio[b]`` (0.0 for documents with
    no tokens — weight 1, the neutral element).

    Two corpus scans when ``raw_probs`` is None (one to fit the raw
    model, one for the weights); pass a precomputed
    :func:`bucket_distribution` to make it one. The target set is small
    by construction (it is the curated domain sample), so its scan is
    noise."""
    feats = hashed_ngram_features(
        docs, num_buckets, text_col, id_col, salt, include_bigrams
    )
    if raw_probs is None:
        raw_probs = bucket_distribution(feats, num_buckets, smoothing)
    tgt_feats = hashed_ngram_features(
        target, num_buckets, text_col, id_col, salt, include_bigrams
    )
    tgt_probs = bucket_distribution(tgt_feats, num_buckets, smoothing)
    ratio = log_ratio_table(tgt_probs, raw_probs)
    weights = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("log_ratio")).alias("log_weight"))
    )
    return (
        docs.select(id_col)
        .join(weights, id_col, "left")
        .select(
            id_col,
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def _gumbel(id_col: Column, salt: str) -> Column:
    """Deterministic standard-Gumbel draw per id: g = -ln(-ln(u)) with
    u = (h48 + 0.5) / 2^48 strictly inside (0, 1) — same md5 formula as
    sampling._unit_hash, offset so neither log can hit 0 or -inf."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 12
        ),
        16,
        10,
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 48))
    return -F.log(-F.log(u))


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    num_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
    smoothing: float = 1.0,
    include_bigrams: bool = True,
    raw_probs: DataFrame | None = None,
    gumbel: bool = True,
) -> DataFrame:
    """The full DSIR selection: top-k documents by ``log_weight + g_i``
    (Gumbel top-k == importance sampling WITHOUT replacement under the
    softmax of the weights — the paper's sampler; ``gumbel=False`` gives
    the deterministic hard top-k variant). Returns the selected documents
    with ``log_weight`` and the ``sel_key`` they ranked by.

    Plan: weight pass (see :func:`importance_log_weights`) -> join back
    onto the docs on id -> ``orderBy desc limit k``, which Spark executes
    as TakeOrdered (per-partition top-k, k-row merge) — no global sort,
    no driver materialization beyond k rows."""
    w = importance_log_weights(
        docs,
        target,
        num_buckets,
        text_col,
        id_col,
        salt,
        smoothing,
        include_bigrams,
        raw_probs,
    )
    key = F.col("log_weight")
    if gumbel:
        key = key + _gumbel(F.col(id_col), salt + "-gumbel")
    return (
        docs.join(w, id_col)
        .withColumn("sel_key", key)
        .orderBy(F.desc("sel_key"), F.asc(id_col))
        .limit(k)
    )


def normalized_weights(
    weights: DataFrame,
    weight_col: str = "log_weight",
    out_col: str = "weight",
    temperature: float = 1.0,
) -> DataFrame:
    """Bridge to acceptance sampling: convert log weights to
    max-normalized linear weights ``exp((lw - max(lw)) / T)`` in (0, 1]
    — numerically stable (raw ``exp(log_weight)`` overflows for large
    corpora/targets), ready for ``sampling.weighted_sample``'s
    score-proportional draw. ``temperature`` flattens (T > 1) or
    sharpens (T < 1) the distribution, the paper's knob between hard
    top-k and uniform. One tiny global max (partial-aggregated)
    crossJoin-broadcast onto the weight table."""
    mx = weights.agg(F.max(weight_col).alias("_mx"))
    return (
        weights.crossJoin(F.broadcast(mx))
        .withColumn(
            out_col,
            F.exp((F.col(weight_col) - F.col("_mx")) / F.lit(float(temperature))),
        )
        .drop("_mx")
    )

"""Character-n-gram language identification — multinomial Naive Bayes
over hashed char 3..5-grams, the langid.py recipe (Lui & Baldwin 2012,
"langid.py: An Off-the-shelf Language Identification Tool"; fastText's
lid.176 uses the same character-n-gram feature space under a linear
model). The standard corpus-pipeline stage CCNet/RefinedWeb-style
mixture building needs before any per-language dedup or sampling.

Why Naive Bayes and not the MLlib logistic path
(operators/classifier.py): NB training is CLOSED FORM — one grouped
count per (lang, bucket) plus Laplace smoothing — so fitting is a pure
DataFrame aggregation with no iterative driver loop, deterministic to
the bit, and the whole train+score pipeline re-derives in ANSI SQL
(the DuckDB oracle in queries/langid_q.py replays it end to end).

Scale decomposition:

* FEATURES: one projection builds the 3..5-gram array per document with
  column algebra (``sequence`` positions + ``substr`` — no UDF, no
  shuffle), one explode, one uniform-key (id, bucket) count. Rows per
  doc are bounded by min(3·len, num_buckets).
* TRAINING runs over a BOUNDED labeled sample (curated per-language
  seed docs — small by construction, as in classifier.py). The fitted
  model is a sparse (lang, bucket, weight) table capped at
  n_langs × num_buckets rows plus one n_langs-row stats table — both
  broadcastable at any corpus size.
* SCORING never shuffles the corpus by anything but doc id: featurize
  -> broadcast join the model -> one (id, lang) aggregation -> argmax.
  Unseen buckets are handled WITHOUT densifying: NB gives
  score(d, l) = n_grams(d)·log_default(l) + Σ_b cnt_b·Δ(l, b) + prior
  where Δ = log_cond − log_default is nonzero only on the sparse
  table, so the missing-bucket mass folds into one per-doc scalar.

No reference analog (the reference engine has no text layer); sibling
of operators/classifier.py on the generative side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from .dedup import normalize_text

#: Feature-space identity — models fitted under a different salt or
#: bucket count must never score against each other.
LANGID_SALT = "langid-v1"


def char_ngram_features(
    docs: DataFrame,
    num_buckets: int = 4096,
    n_min: int = 3,
    n_max: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = LANGID_SALT,
    portable: bool = True,
) -> DataFrame:
    """Hashed char-n-gram counts: (id, bucket, cnt) over every n-gram
    occurrence of the NORMALIZED text (lowercase, collapsed whitespace —
    the engine-wide canonical form), n in [n_min, n_max]. Documents
    shorter than n_min characters contribute no rows. Pure column
    algebra; the per-n position sequence is guarded so a short text
    yields an empty array rather than Spark's descending sequence(1, 0).
    """
    # Codegen-friendly construction (the shingle_rows lesson, measured
    # again by tools/scale_probe.py: the earlier
    # ``transform(sequence, i -> substr)`` form ran every gram through
    # the interpreted higher-order-function path at ~3 ms/doc): ONE
    # exploded position Generate over the n_min windows, then each
    # order's gram as a plain guarded ``substr`` — NULL where the window
    # would overrun (a truncated window must NOT be emitted: its bytes
    # equal a shorter-order gram at the same position and would double
    # count) — and a second Generate over the per-position gram array.
    # Zero lambdas anywhere in the hot path.
    t = F.col("_t")
    pos = F.col("_pos")
    positions = F.when(
        F.length(t) >= n_min,
        F.sequence(F.lit(1), F.length(t) - (n_min - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram_arms = [
        F.when(pos <= F.length(t) - (n - 1), t.substr(pos, F.lit(n)))
        for n in range(n_min, n_max + 1)
    ]
    return (
        docs.select(
            F.col(id_col),
            normalize_text(F.coalesce(F.col(text_col), F.lit(""))).alias(
                "_t"
            ),
        )
        .select(F.col(id_col), "_t", F.explode(positions).alias("_pos"))
        .select(F.col(id_col), F.explode(F.array(*gram_arms)).alias("_gram"))
        .filter(F.col("_gram").isNotNull())
        .select(
            id_col,
            F.pmod(
                # portable=True: md5-derived, bit-identical in DuckDB —
                # the oracle-able default. portable=False: JVM-native
                # xxhash64 — measured ~1.7x faster end-to-end
                # featurization (tools/scale_probe.py: the md5 leg alone
                # cost as much again as xxhash at 16x corpus); the
                # production path when no cross-engine re-derivation is
                # needed. The two spaces are incompatible — train and
                # score under ONE flag.
                portable_hash64(F.col("_gram"), salt)
                if portable
                else F.xxhash64(F.lit(salt), F.col("_gram")),
                F.lit(num_buckets),
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_langid(
    labeled: DataFrame,
    num_buckets: int = 4096,
    n_min: int = 3,
    n_max: int = 5,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    salt: str = LANGID_SALT,
    portable: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Fit the NB model on a labeled sample. Returns:

    * ``cond`` — sparse (lang, bucket, delta) where
      ``delta = ln((count + s) / (total_l + s·B)) − log_default_l`` (the
      scoring adjustment for buckets SEEN in language l's training text);
    * ``lang_stats`` — (lang, log_prior, log_default) with
      ``log_prior = ln(docs_l / docs)`` and
      ``log_default = ln(s / (total_l + s·B))`` (the smoothed mass of an
      unseen bucket).

    Closed form: two grouped aggregations over the sample's features —
    no iterations, no MLlib, nothing driver-side. Both outputs are
    bounded by construction (≤ n_langs × num_buckets / n_langs rows).
    """
    feats = char_ngram_features(
        labeled, num_buckets, n_min, n_max, text_col, id_col, salt, portable
    )
    lf = feats.join(
        labeled.select(F.col(id_col), F.col(label_col).alias("lang")),
        id_col,
    )
    counts = lf.groupBy("lang", "bucket").agg(F.sum("cnt").alias("c"))
    totals = counts.groupBy("lang").agg(F.sum("c").alias("tc"))
    n_docs = labeled.count()
    priors = (
        labeled.groupBy(F.col(label_col).alias("lang"))
        .agg(F.count(F.lit(1)).alias("nd"))
        .select(
            "lang",
            F.log(F.col("nd") / F.lit(float(n_docs))).alias("log_prior"),
        )
    )
    s, b = float(smoothing), float(num_buckets)
    lang_stats = totals.join(priors, "lang").select(
        "lang",
        "log_prior",
        F.log(F.lit(s) / (F.col("tc") + F.lit(s * b))).alias("log_default"),
    )
    # ln((c+s)/(tc+sB)) − ln(s/(tc+sB)) telescopes to ln((c+s)/s): the
    # per-language denominator cancels, so delta is independent of tc
    # and the oracle's algebra is one term shorter.
    cond = counts.select(
        "lang",
        "bucket",
        F.log((F.col("c") + F.lit(s)) / F.lit(s)).alias("delta"),
    )
    return cond, lang_stats


def langid_scores(
    docs: DataFrame,
    cond: DataFrame,
    lang_stats: DataFrame,
    num_buckets: int = 4096,
    n_min: int = 3,
    n_max: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = LANGID_SALT,
    portable: bool = True,
) -> DataFrame:
    """Corpus-scale prediction: (id, lang_pred, n_grams). One corpus
    featurization, one BROADCAST join against the sparse model, one
    (id, lang) aggregation, one argmax — the per-language score is

        n_grams·log_default_l + Σ_seen cnt_b·delta(l, b) + log_prior_l

    evaluated without ever densifying the bucket space. Documents with
    no n-grams (shorter than n_min) score on priors alone. Ties break
    toward the lexicographically LARGER language code (struct-max);
    callers needing a different rule should widen the margin, not the
    tie-break. The float sum's partition order is nondeterministic at
    the ulp level — argmax is stable whenever the decision margin
    exceeds ~1e-9 nats, which any non-degenerate model clears."""
    feats = char_ngram_features(
        docs, num_buckets, n_min, n_max, text_col, id_col, salt, portable
    )
    adj = (
        feats.join(F.broadcast(cond), "bucket")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.col("cnt") * F.col("delta")).alias("adj"))
    )
    totals = feats.groupBy(id_col).agg(F.sum("cnt").alias("n_grams"))
    base = docs.select(id_col).join(totals, id_col, "left").select(
        id_col, F.coalesce("n_grams", F.lit(0)).alias("n_grams")
    )
    scored = (
        base.crossJoin(F.broadcast(lang_stats))
        .join(adj, [id_col, "lang"], "left")
        .select(
            id_col,
            "n_grams",
            "lang",
            (
                F.col("n_grams") * F.col("log_default")
                + F.coalesce("adj", F.lit(0.0))
                + F.col("log_prior")
            ).alias("score"),
        )
    )
    return (
        scored.groupBy(id_col, "n_grams")  # n_grams is functionally dependent on id
        .agg(F.max(F.struct("score", "lang")).alias("_best"))
        .select(
            id_col,
            F.col("_best.lang").alias("lang_pred"),
            "n_grams",
        )
    )

"""Learned quality classification — the GPT-3 / LLaMA-style corpus
filter: train a linear classifier to distinguish a curated "positive"
set from random crawl text, then score every corpus document and keep
the high scorers (Brown et al. 2020 §A; Touvron et al. 2023 train a
fastText-like classifier for the same job).

This completes the engine's quality triad: rule batteries
(gopher_quality_signals / c4), no-model LM scores (unigram / bigram
log-prob), and now a LEARNED filter. The feature space is the same
hashed unigram+bigram bag the DSIR family uses
(operators/dsir.hashed_ngram_features — portable md5 hashing, bounded
``num_buckets``), so a pipeline can share one featurization pass
between importance weighting and classification.

Scale decomposition (the part that matters at 100 TB):

* TRAINING is MLlib logistic regression over a BOUNDED labeled sample
  (curated positives are small by construction; negatives are a
  same-sized random draw) — the only place ML vectors exist. The dense
  per-doc feature array is built with column algebra
  (map_from_entries + a sequence transform), no UDFs.
* INFERENCE never touches MLlib: the fitted model is a
  ``num_buckets``-row (bucket, coef) table — bounded BY CONSTRUCTION,
  so broadcasting it is safe at any corpus size — and scoring is
  featurize -> broadcast join -> one per-doc aggregation -> sigmoid.
  Single corpus scan, fully codegen'd, zero Python in the hot path.

No reference analog (the reference engine has no text layer); the
sibling of operators/dsir.py on the discriminative side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import hashed_ngram_features


def _dense_features(
    feats: DataFrame, num_buckets: int, id_col: str
) -> DataFrame:
    """(id, features array<double>) — dense bucket-count vectors built
    with column algebra: per-doc (bucket, cnt) entries become a map, and
    one ``sequence`` transform reads it positionally. Only used on the
    bounded training sample; corpus-scale scoring stays sparse."""
    # aggregate the map FIRST, then densify in a second projection — an
    # aggregate expression referenced inside a transform() lambda would
    # re-evaluate per element (num_buckets map builds per doc); a bound
    # column is read once per row
    maps = feats.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.col("bucket"), F.col("cnt").cast("double"))
            )
        ).alias("_m")
    )
    return maps.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(num_buckets - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("long")), F.lit(0.0)
            ),
        ).alias("features"),
    )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    num_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> tuple[DataFrame, float]:
    """Fit the filter on labeled samples: returns ((bucket, coef) table,
    intercept). Both inputs are BOUNDED by construction — the curated
    positive set is small and the negative side should be a same-order
    random draw (``operators/sampling.sample_mixture`` on the crawl).
    The fitted coefficient vector is ``num_buckets`` floats; it crosses
    the driver once, exactly like the KMeans centroid tables
    (operators/semdedup.py)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    spark = positive.sparkSession
    labeled = positive.select(
        F.col(id_col), F.col(text_col), F.lit(1.0).alias("label")
    ).unionByName(
        negative.select(
            F.col(id_col), F.col(text_col), F.lit(0.0).alias("label")
        )
    )
    # deterministic re-key: the two sides may share raw ids, and the key
    # must evaluate identically in every plan branch that references it
    labeled = labeled.withColumn(
        "_tid",
        F.concat(
            F.col("label").cast("int").cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        ),
    )
    feats = hashed_ngram_features(
        labeled, num_buckets, text_col, "_tid", salt
    )
    dense = _dense_features(feats, num_buckets, "_tid")
    train = labeled.select("_tid", "label").join(dense, "_tid", "left")
    train = train.withColumn(
        "features",
        F.coalesce(
            "features",
            F.array_repeat(F.lit(0.0), num_buckets),
        ),
    ).select(array_to_vector("features").alias("features"), "label")
    model = LogisticRegression(
        regParam=reg_param, maxIter=max_iter
    ).fit(train)
    coefs = model.coefficients.toArray()
    coef_table = spark.createDataFrame(
        [(int(b), float(c)) for b, c in enumerate(coefs) if c != 0.0],
        "bucket long, coef double",
    )
    return coef_table, float(model.intercept)


def quality_classifier_scores(
    docs: DataFrame,
    coef_table: DataFrame,
    intercept: float,
    num_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
) -> DataFrame:
    """Corpus-scale scoring: (id, logit, score) with
    ``score = sigmoid(intercept + sum_b cnt_b * coef_b)``. One corpus
    featurization, one BROADCAST join against the bounded coefficient
    table, one per-doc aggregation — the classifier's hot path is pure
    column algebra. Documents with no features score
    ``sigmoid(intercept)``."""
    feats = hashed_ngram_features(
        docs, num_buckets, text_col, id_col, salt
    )
    logits = (
        feats.join(F.broadcast(coef_table), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("coef")).alias("_dot"))
    )
    logit = F.lit(float(intercept)) + F.coalesce("_dot", F.lit(0.0))
    return (
        docs.select(id_col)
        .join(logits, id_col, "left")
        .select(
            id_col,
            logit.alias("logit"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("score"),
        )
    )


def quality_filter(
    docs: DataFrame,
    coef_table: DataFrame,
    intercept: float,
    threshold: float = 0.5,
    num_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
    pareto_alpha: float | None = None,
    pareto_salt: str = "qf-v1",
) -> DataFrame:
    """Keep documents the classifier likes. Two published policies:

    * hard threshold (``pareto_alpha=None``): keep ``score >= threshold``;
    * GPT-3's stochastic rule (Brown et al. 2020 §A): the paper keeps a
      document when ``np.random.pareto(alpha) > 1 - score``. Here the
      Pareto draw derives deterministically from the engine's standard
      per-id unit hash via the inverse CDF
      ``pareto = (1 - u)^(-1/alpha) - 1`` — same marginal keep
      probability (rising with score, so borderline documents survive
      stochastically), but reproducible across runs and engines.

    Zero extra shuffles beyond the scoring pass."""
    scored = quality_classifier_scores(
        docs, coef_table, intercept, num_buckets, text_col, id_col, salt
    ).select(id_col, "score")
    out = docs.join(scored, id_col)
    if pareto_alpha is None:
        return out.filter(F.col("score") >= threshold).drop("score")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(pareto_salt), F.col(id_col).cast("string"))
            ),
            1,
            12,
        ),
        16,
        10,
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 48))
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / pareto_alpha)) - F.lit(1.0)
    return out.filter(pareto > (F.lit(1.0) - F.col("score"))).drop("score")


def save_classifier(
    coef_table: DataFrame, intercept: float, path: str
) -> None:
    """Persist the fitted filter: the bounded coefficient table plus a
    one-row meta table — the build-once/score-many artifact, same
    pattern as the persistent PQ index and the bigram LM."""
    spark = coef_table.sparkSession
    coef_table.write.mode("overwrite").parquet(path.rstrip("/") + "/coef")
    spark.createDataFrame(
        [(float(intercept),)], "intercept double"
    ).write.mode("overwrite").parquet(path.rstrip("/") + "/meta")


def load_classifier(spark, path: str) -> tuple[DataFrame, float]:
    meta = spark.read.parquet(path.rstrip("/") + "/meta").first()
    return (
        spark.read.parquet(path.rstrip("/") + "/coef"),
        float(meta["intercept"]),
    )

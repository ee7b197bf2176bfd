"""Deterministic corpus sampling — the training-mix construction layer.

A pretraining run consumes a WEIGHTED MIXTURE of sources (upsample the
high-quality slice, downsample the crawl), and evaluation sets are built by
STRATIFIED sampling (k per language/domain/bucket). Both are implemented
here as hash-deterministic column algebra, for the same reasons
``split_corpus`` is (operators/corpus.py): stable across runs and engines,
no shuffle for the Bernoulli form, membership decidable per document
without seeing the corpus, and bit-for-bit reproducible by a DuckDB oracle
(tests/test_sampling.py).

Scale shape: ``sample_mixture`` is a pure per-row filter (zero shuffles,
fully codegen'd — the 100 TB scan is the cost floor); ``stratified_sample``
is one hash-partitioned window per stratum (skew-free when strata are
bounded; a mega-stratum only sorts ITS OWN rows, and only by the 48-bit
hash key). ``with_repeats`` turns >1.0 mixture rates into integer epoch
repeats + a fractional tail draw, the standard upsampling form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..checkpoint import pin


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Deterministic u in [0, 1): 48-bit md5 prefix of salt+id (exact in a
    double; identical in DuckDB via the same md5/substr/conv formula)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 12),
        16,
        10,
    )
    return h.cast("double") / F.lit(float(1 << 48))


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "lang",
    salt: str = "mix-v1",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Weighted-mixture subsample: keep each document of source s with
    probability ``rates[s]`` (deterministic per id). Sources absent from
    ``rates`` keep ``default_rate``. Rates are clamped to [0, 1] — use
    :func:`with_repeats` for upsampling above 1.0.

    One per-row comparison against the per-source threshold: no shuffle, no
    state, and re-running on a grown corpus keeps every previously-sampled
    document (the hash is per-id, so the sample is append-stable — the
    property that lets a mixture be rebuilt incrementally at 100 TB)."""
    u = _unit_hash(F.col(id_col), salt)
    clamp = lambda r: min(max(float(r), 0.0), 1.0)  # noqa: E731
    thresh = None
    for name, rate in rates.items():
        branch = (F.col(source_col) == name, F.lit(clamp(rate)))
        thresh = (
            F.when(*branch) if thresh is None else thresh.when(*branch)
        )
    default = F.lit(clamp(default_rate))
    thresh = thresh.otherwise(default) if thresh is not None else default
    return docs.filter(u < thresh)


def with_repeats(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "lang",
    salt: str = "mix-v1",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Mixture sampling with upsampling: a rate of 2.3 emits every document
    of that source twice (``repeat`` 0 and 1) plus a 0.3-probability third
    copy. Adds a ``repeat`` index column (the loader's dedup/epoch key).
    Sources absent from ``rates`` get ``default_rate`` (0.0 — dropped —
    unless overridden), mirroring :func:`sample_mixture`; rates are clamped
    below at 0 but NOT above (values > 1 are the point here).
    Implemented as floor(rate) full repeats via a ``sequence`` explode plus
    one fractional-tail hash draw — deterministic like everything else
    here."""
    clamp = lambda r: max(float(r), 0.0)  # noqa: E731
    rate_expr = None
    for name, rate in rates.items():
        branch = (F.col(source_col) == name, F.lit(clamp(rate)))
        rate_expr = (
            F.when(*branch) if rate_expr is None else rate_expr.when(*branch)
        )
    default = F.lit(clamp(default_rate))
    rate_expr = (
        rate_expr.otherwise(default) if rate_expr is not None else default
    )
    u = _unit_hash(F.col(id_col), salt)
    full = F.floor(rate_expr).cast("int")
    frac = rate_expr - full
    n_copies = (full + F.when(u < frac, F.lit(1)).otherwise(F.lit(0))).alias(
        "_n_copies"
    )
    return (
        docs.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            "repeat", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )


def stratified_sample(
    docs: DataFrame,
    k: int,
    strata_cols: list[str] | str = "lang",
    salt: str = "strat-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """k documents per stratum, chosen by hash order (the deterministic
    analogue of a uniform draw): rank documents within each stratum by the
    48-bit id hash (tie-break on id) and keep rank <= k. Adds the rank as
    ``sample_rank``.

    This is a deterministic hash-rank sample — the same marginal coverage a
    reservoir sample gives, with the stronger property that the chosen set
    is a pure function of (ids, salt): stable across runs, engines, and row
    order, and engine-reproducible (ROW_NUMBER over the same hash in
    DuckDB). Like ``weighted_topk_sample``, the per-stratum rank is an
    exact TWO-PHASE top-k: a partition-local cut keyed on
    (strata, spark_partition_id()) bounds every window frame by one scan
    partition's rows, then the final rank runs over <= partitions x k
    survivors — a stratum holding most of the corpus never sorts in a
    single task (a uniform SORT KEY does not make the one-task-per-
    stratum FRAME small; same fix class as the r10 coreness finding)."""
    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    u = _unit_hash(F.col(id_col), salt)
    order = [F.asc("_u"), F.asc(id_col)]
    wloc = Window.partitionBy(*strata_cols, "_pid").orderBy(*order)
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        docs.withColumn("_u", u)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(wloc))
        .filter(F.col("_lr") <= k)
        .drop("_pid", "_lr")
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
        .drop("_u")
    )


def temperature_rates(
    docs: DataFrame,
    alpha: float = 0.3,
    target_frac: float | None = None,
    source_col: str = "lang",
) -> DataFrame:
    """Temperature-scaled mixture rates (the standard multilingual /
    multi-source rebalancing rule, e.g. mBERT / XLM-R exponential
    smoothing): with q_s = n_s / N the corpus share of source s, the
    TARGET share is p_s = q_s^alpha / sum(q^alpha) — alpha=1 keeps natural
    proportions, alpha->0 approaches uniform, lifting small sources.

    Returns one row per source: (source, n_docs, natural_share,
    target_share, rate) where ``rate`` is the per-document keep/repeat
    probability ``sample_mixture`` / ``with_repeats`` consumes:
    ``rate_s = T * p_s / n_s`` with T the target corpus size
    (``target_frac * N``; default scales so the largest rate is exactly
    1.0 — pure downsampling, no repeats).

    One count aggregation (uniform keys) + arithmetic on the one-row
    totals — the rate table is small by construction (one row per
    source). The per-source counts are locally checkpointed: every
    downstream branch (totals, shares, the wmax scaling) references the
    SAME materialized O(sources)-row table instead of re-running the
    corpus aggregation per branch — without it the composed sample paid
    4 full corpus scans for the rate table alone (r4 fix; the branches'
    differing projections defeat exchange reuse). Deterministic given the
    corpus, so the composed sample stays engine-reproducible (DuckDB
    oracle in tests/test_sampling.py)."""
    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    ).transform(pin, eager=False)
    tot = counts.agg(
        F.sum("n_docs").alias("_n"),
        F.sum(F.pow(F.col("n_docs"), F.lit(0.0) + alpha)).alias("_za"),
    )
    shares = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("n_docs") / F.col("_n")).alias("natural_share"),
        (F.pow(F.col("n_docs"), F.lit(0.0) + alpha) / F.col("_za")).alias(
            "target_share"
        ),
        F.col("_n").alias("_n"),
    )
    # unscaled per-doc weight; T is chosen so rates are <= 1 by default
    w = F.col("target_share") * F.col("_n") / F.col("n_docs")
    if target_frac is None:
        wmax = shares.agg(
            F.max(F.col("target_share") * F.col("_n") / F.col("n_docs")).alias(
                "_wmax"
            )
        )
        return shares.crossJoin(F.broadcast(wmax)).select(
            "source",
            "n_docs",
            "natural_share",
            "target_share",
            (w / F.col("_wmax")).alias("rate"),
        )
    return shares.select(
        "source",
        "n_docs",
        "natural_share",
        "target_share",
        (F.lit(target_frac) * w).alias("rate"),
    )


def sample_with_temperature(
    docs: DataFrame,
    alpha: float = 0.3,
    target_frac: float | None = None,
    source_col: str = "lang",
    salt: str = "mix-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Compose :func:`temperature_rates` with the per-row hash filter: keep
    each document with its source's temperature rate. The rate table is
    broadcast-joined (one row per source), so this stays a single corpus
    scan with zero wide shuffles; rates computed with ``target_frac`` may
    exceed 1.0 and are clamped (use :func:`with_repeats` with collected
    rates for true upsampling).

    NULL sources are a first-class group: temperature_rates' groupBy
    already counts them and emits their rate row, and the join is
    NULL-SAFE so those docs are sampled at that rate — a plain equi-join
    silently dropped them even at alpha=1 (review find; the same
    null-key class as the asof_join fix)."""
    rates = temperature_rates(docs, alpha, target_frac, source_col)
    u = _unit_hash(F.col(id_col), salt)
    rate_tbl = F.broadcast(
        rates.select(F.col("source").alias("_rate_src"), F.col("rate"))
    )
    return (
        docs.join(
            rate_tbl, F.col(source_col).eqNullSafe(F.col("_rate_src")), "inner"
        )
        .filter(u < F.least(F.col("rate"), F.lit(1.0)))
        .drop("rate", "_rate_src")
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    target_fraction: float | None = None,
    salt: str = "wsample-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score-proportional acceptance sampling — the importance-resampling
    selection step quality-aware pipelines run (keep documents with
    probability proportional to a per-document score: a quality model's
    output, a DSIR-style importance weight, a dedup-cluster size
    correction).

    Each row is kept iff ``u < p_i`` where ``u`` is the engine's standard
    deterministic per-id unit hash and

        p_i = clamp(w_i * scale, 0, 1)
        scale = target_fraction * N / sum(w)   (or 1/max(w) when no target)

    With ``target_fraction`` the EXPECTED kept fraction is the target
    (exact when no p_i clamps); without it, acceptance is w_i / max(w) —
    the classic rejection form that always keeps the best row(s) with
    probability 1. Negative weights are treated as 0 (never kept).

    Scale shape: one tiny global aggregate (sum/count or max — partial-
    aggregated, bytes to the driver's broadcast) crossJoin-broadcast onto
    the scan, then the same zero-shuffle per-row filter as
    ``sample_mixture``; append-stability holds per (id, salt) as long as
    the scale factor is frozen — re-running on a GROWN corpus recomputes
    the scalar, so freeze it (pass the same corpus) or accept a rescaled
    draw, exactly the trade documented for temperature_rates."""
    w = F.col(weight_col).cast("double")
    wpos = F.greatest(w, F.lit(0.0))
    if target_fraction is not None:
        stats = docs.select(
            F.sum(wpos).alias("_wsum"), F.count(F.lit(1)).alias("_n")
        )
        scale = F.lit(float(target_fraction)) * F.col("_n") / F.col("_wsum")
    else:
        stats = docs.select(F.max(wpos).alias("_wmax"))
        scale = F.lit(1.0) / F.col("_wmax")
    u = _unit_hash(F.col(id_col), salt)
    p = F.least(wpos * scale, F.lit(1.0))
    return (
        docs.crossJoin(F.broadcast(stats))
        .filter(u < p)
        .drop(*stats.columns)
    )


def es_race_key(
    weight_col: str, salt: str = "wtopk-v1", id_col: str = "doc_id"
) -> Column:
    """The Efraimidis-Spirakis exponential race key ``-ln(u)/w`` on the
    engine's deterministic per-(salt, id) unit hash — the k SMALLEST keys
    are exactly a weighted draw of size k without replacement. Factored
    out so the batch operator and the streaming sample gate share one
    formula (and one DuckDB rendering). NULL/non-positive weights yield
    NULL (callers filter w > 0 first — probability-0 rows never race)."""
    w = F.col(weight_col).cast("double")
    u = F.greatest(
        _unit_hash(F.col(id_col), salt), F.lit(2.0**-48)
    )  # u=0 would make -ln(u) inf for the BEST draw; clamp to the grid step
    return F.when(w > 0, -F.log(u) / w)


def weighted_topk_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    group_col: str | None = None,
    salt: str = "wtopk-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT-SIZE weighted sampling without replacement (Efraimidis &
    Spirakis 2006): draw exactly ``k`` rows (per ``group_col`` if given)
    with inclusion probability proportional to ``weight_col`` — the
    fixed-budget companion to :func:`weighted_sample`'s Bernoulli form,
    whose output SIZE is random. This is the "pick exactly k training
    docs per source, quality-proportional" selection a mixture builder
    runs against hard shard quotas.

    Method: each row gets the exponential race key ``e_i = -ln(u_i) /
    w_i`` (``u_i`` the engine's deterministic per-(salt, id) unit hash);
    the k SMALLEST keys are exactly an E-S weighted draw without
    replacement. Non-positive / NULL weights are EXCLUDED (inclusion
    probability 0 — they never pad the result either); groups with
    fewer than k eligible rows return all of them. Deterministic per
    (salt, id) —
    re-runs reproduce the same sample, and varying the salt gives
    independent draws (the statistical test exercises exactly that).

    Scale shape: zero-shuffle key computation on the scan, then an exact
    TWO-PHASE top-k: global k is a TakeOrdered (no sort); per-group k
    first takes each SCAN PARTITION's local top-k per group (a window
    keyed on (group, spark_partition_id()) — every frame is bounded by
    one partition's rows, so a group holding half the corpus never sorts
    in one task, the skew class the coreness h-index round was flagged
    for in r10), then ranks the surviving <= partitions x k rows per
    group. Top-k is associative, so the two-phase result is IDENTICAL
    to the direct window — pinned by test. Adds ``sample_key`` (the race
    key) and ``sample_rank`` (1..k in key order)."""
    if k < 1:
        raise ValueError("weighted_topk_sample: k must be >= 1")
    keyed = docs.filter(F.col(weight_col).cast("double") > 0).withColumn(
        "sample_key", es_race_key(weight_col, salt, id_col)
    )
    order = [F.asc("sample_key"), F.asc(id_col)]  # id tiebreak: total order
    if group_col is None:
        return (
            keyed.orderBy(*order)
            .limit(k)  # TakeOrdered: no global sort
            .withColumn(
                "sample_rank",
                F.row_number().over(Window.orderBy(*order)).cast("long"),
            )
        )
    # phase 1: per-(group, scan partition) top-k — candidate cut whose
    # window frames are bounded by partition size, never group size
    wloc = Window.partitionBy(group_col, "_pid").orderBy(*order)
    local = (
        keyed.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(wloc))
        .filter(F.col("_lr") <= k)
        .drop("_pid", "_lr")
    )
    # phase 2: exact rank over <= partitions x k survivors per group
    wnd = Window.partitionBy(group_col).orderBy(*order)
    return (
        local.withColumn("sample_rank", F.row_number().over(wnd).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def token_budget_rates(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "lang",
    count_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-source sampling rates that hit a TOKEN budget at a target
    mixture — the form a pretraining run actually specifies ("500B
    tokens at 60/30/10 web/code/books"), where temperature_rates speaks
    in documents.

    For source s with corpus token mass T_s and normalized target share
    w_s, the sampled expectation is ``rate_s * T_s = w_s * budget``, so
    ``rate_s = w_s * budget / T_s``. Rates above 1.0 are returned as-is
    with ``needs_repeats = true`` — feed them to :func:`with_repeats`
    (epoch upsampling); rates for sources absent from ``weights`` are 0.

    Token counting is pluggable like everywhere else in the engine:
    ``count_col`` names a precomputed per-document count (e.g. BPE
    counts from operators/bpe.py); the default is the whitespace rule.
    One uniform-key aggregation over the corpus; the rate table is
    sources-sized."""
    n_tok = (
        F.col(count_col)
        if count_col is not None
        else F.size(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
            )
        )
    )
    tot = sum(weights.values())
    shares = {s: w / tot for s, w in weights.items()}
    masses = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(n_tok).cast("double").alias("corpus_tokens")
    )
    share_expr = None
    for s, w in shares.items():
        branch = (F.col("source") == s, F.lit(w))
        share_expr = (
            F.when(*branch) if share_expr is None else share_expr.when(*branch)
        )
    share_expr = (
        share_expr.otherwise(F.lit(0.0)) if share_expr is not None else F.lit(0.0)
    )
    rate = (
        F.lit(float(budget_tokens)) * share_expr / F.col("corpus_tokens")
    )
    return masses.select(
        "source",
        F.col("corpus_tokens").cast("long").alias("corpus_tokens"),
        share_expr.alias("target_share"),
        rate.alias("rate"),
        (rate > 1.0).alias("needs_repeats"),
    )


def training_order(
    df: DataFrame,
    seed: str = "shuffle-v1",
    n_shards: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle — the FINAL pipeline stage before a
    training run reads the corpus. Gradient quality depends on i.i.d.
    batch order, but the corpus arrives grouped by source/crawl/time;
    this assigns every row a reproducible pseudo-random position.

    Adds ``shuffle_key`` (the engine's 48-bit md5 unit hash of seed+id —
    the same formula as every sampling draw, so a DuckDB oracle
    reproduces it bit-for-bit) and, when ``n_shards`` is given,
    ``shard`` (hash-uniform in [0, n_shards), so shards are balanced in
    expectation and any shard-subset is itself an unbiased sample).
    Reading in ``ORDER BY shuffle_key, <id>`` (or per-shard
    ``ORDER BY shard, shuffle_key, <id>``) IS the shuffled epoch; the id
    tie-break keeps the order total when two rows collide in the 48-bit
    key space (birthday-expected beyond ~2^24 rows). A different
    ``seed`` is a fresh permutation.

    Scale shape: pure per-row projection — zero exchanges here. The sort
    belongs to the WRITER (``df.repartitionByRange(n, "shuffle_key")
    .sortWithinPartitions("shuffle_key")`` = one range exchange, Spark's
    scalable total order) or to the loader (each worker sorts its own
    hash-pruned shard). Composes with :func:`bin_pack_documents` /
    ``pack_sequences`` by packing on ``dense_rank`` over shuffle_key, or
    simply by sharding on the same hash.

    Null ids (data errors) propagate NULL shuffle_key/shard rather than
    silently joining some shard — the same visibility rule as the rest of
    the sampling family's null handling; a partitioned write sends them
    to the hive default partition where an audit can count them (pinned
    in test_binpack)."""
    key = _unit_hash(F.col(id_col), seed)
    out = df.withColumn("shuffle_key", key)
    if n_shards is not None:
        out = out.withColumn(
            "shard",
            F.floor(F.col("shuffle_key") * F.lit(float(n_shards))).cast("int"),
        )
    return out

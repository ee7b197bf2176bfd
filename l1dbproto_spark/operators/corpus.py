"""End-to-end corpus preparation: the composition layer that turns the
dedup / packing operator families into the training-data flow a pipeline
actually runs — filter, exact-dedup, near-dedup, pack.

Each stage is one of the engine's first-class operators; this module only
wires them and keeps an auditable drop log (every removed document with the
reason and its surviving canonical), because at corpus scale "what did the
cleaner delete and why" is an operational requirement, not a nicety.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import pin

from .dedup import (
    doc_shingle_sets,
    jaccard_pairs_from_sets,
    normalize_text,
)
from .graph import connected_components
from .packing import pack_sequences, whitespace_token_count


@dataclass
class CorpusCleanResult:
    cleaned: DataFrame  # surviving documents (original columns)
    dropped: DataFrame  # (doc_id, reason, canonical_id)


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = 3,
    min_jaccard: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int | None = 1000,
    min_logprob: float | None = None,
    repetition_gate: bool = False,
    max_pii: int | None = None,
    embeddings: DataFrame | None = None,
    centroids: DataFrame | None = None,
    sem_eps: float = 0.05,
    count_col: str | None = None,
    classifier_model: tuple[DataFrame, float] | None = None,
    min_classifier_score: float = 0.5,
    classifier_buckets: int = 4096,
    keep_best_col: str | None = None,
) -> CorpusCleanResult:
    """Staged cleaning, canonical = min doc id at every dedup stage
    (or the highest-scoring member when ``keep_best_col`` is set):

    1. length gate: fewer than ``min_tokens`` tokens → dropped
       (``reason='too_short'``, no canonical). Token counting is
       pluggable: ``count_col`` names a pre-computed per-document count
       column (e.g. BPE counts from an upstream tokenizer) — default is
       the whitespace rule shared with pack_sequences/queries/text.py;
    2. optional quality gate (``min_logprob`` set): mean unigram
       log-probability under the surviving corpus's own distribution below
       the threshold → dropped (``reason='low_quality'``, no canonical —
       operators/quality.py);
    2b. optional repetition gate (``repetition_gate=True``): documents
       failing the full Gopher repetition battery (duplicate line AND
       paragraph fractions, top 2/3/4-gram character shares, duplicate
       5..10-gram character coverage — Rae et al. A1.1 at the published
       Table A1 thresholds; operators/quality.repetition_signals) →
       dropped (``reason='repetitive'``, no canonical);
    2c. optional PII gate (``max_pii`` set): documents with more than
       ``max_pii`` detected PII hits (operators/pii.py defaults:
       email/phone/IPv4/SSN) → dropped (``reason='pii'``, no canonical —
       the redact-in-place alternative is ``redact_pii``, which keeps the
       document);
    2d. optional learned-classifier gate (``classifier_model`` set to a
       fitted ((bucket, coef) table, intercept) pair from
       operators/classifier.train_quality_classifier): documents scoring
       below ``min_classifier_score`` → dropped
       (``reason='classifier'``, no canonical). Scoring is one broadcast
       join against the bounded coefficient table — the GPT-3/LLaMA
       quality-filter stage;
    3. exact dedup: same normalized text → only the min id survives
       (``reason='exact_dup'``);
    4. near dedup: Jaccard ≥ ``min_jaccard`` pair graph → connected
       components → only each component's min id survives
       (``reason='near_dup'``);

    ``keep_best_col`` (optional) names a score column on ``docs``
    (length, classifier score, crawl freshness): stages 3 and 4 then
    keep each duplicate group's HIGHEST-scoring member instead of the
    smallest id (NULL-safe rule of graph.resolve_canonicals — scored
    beats unscored, score ties to min id; a constant score reproduces
    the default). The semantic stage keeps its own canonical rule (the
    most-similar smaller-id NEIGHBOR — which may itself be dropped when
    eps-chains overlap; see semantic_dedup's docstring).
    5. optional semantic dedup (``embeddings`` set — rows keyed by
       ``id_col`` with an ``embedding`` column; ``centroids`` a
       (cluster, centroid) table, or None to train KMeans on the
       survivors' embeddings): SemDeDup over the survivors
       (operators/semdedup.py) → dropped (``reason='semantic_dup'``,
       canonical = the most-similar smaller-id NEIGHBOR; unlike the
       exact/near stages that neighbor may itself be dropped when
       eps-chains overlap — resolve through graph.resolve_canonicals
       when an audit needs a surviving canonical) — the published
       filter → exact → fuzzy → semantic pipeline order.

    Scale shape: stage 3 is one uniform-key shuffle; stage 4 is the
    3-exchange inverted-index Jaccard plus O(diameter) label-propagation
    rounds — nothing quadratic anywhere. The optional quality gate adds two
    token aggregations (distribution + per-doc score) over stage-1
    survivors; the repetition gate one (doc, gram) aggregation + per-doc
    join. The stages short-circuit: later stages only scan survivors.

    Each gate's failing-id set (and the near/semantic drop logs) is
    locally checkpointed: every stage's signal computation EMBEDS the
    surviving-corpus subtree, so without the lineage cut each additional
    gate doubled the static plan (measured: 48-72 corpus-scan references
    with all gates on) and recomputed earlier gates per branch. The
    checkpointed frames are id-sized, the survivor chain stays a linear
    sequence of anti-joins, and each gate's work runs exactly once across
    BOTH returned frames.

    Fault-tolerance trade-off (switchable): in the default
    ``checkpoint_mode("local")`` the pinned blocks live on executors,
    not reliable storage — lose an executor (or let dynamic allocation
    decommission one) and the job FAILS instead of recomputing lineage.
    That is the right default for this operator family: the pinned
    frames are id-sized and cheap to rebuild by re-running, while a
    reliable ``checkpoint()`` writes every gate's id-set through the
    cluster filesystem on every run. For long-running production jobs on
    preemptible hardware, ``set_checkpoint_mode("reliable", spark,
    checkpoint_dir=...)`` (l1dbproto_spark/checkpoint.py) swaps EVERY
    lineage cut in the engine to filesystem-backed ``checkpoint()`` —
    the plan shape is identical; only the storage of the cut changes
    (pinned in tests/test_checkpoint_mode.py)."""
    n_tok = (
        F.col(count_col)
        if count_col is not None
        else whitespace_token_count(F.col(text_col))
    )
    # null text (or a null count column) makes n_tok NULL, which fails
    # BOTH a >= filter and its < complement — without the isNull branch
    # such documents silently vanished from keep AND drop log, violating
    # the partition contract (found by the garbage-resilience sweep)
    long_enough = docs.filter(n_tok >= min_tokens)
    too_short = docs.filter(
        (n_tok < min_tokens) | n_tok.isNull()
    ).select(
        F.col(id_col).alias("doc_id"),
        F.lit("too_short").alias("reason"),
        F.lit(None).cast("long").alias("canonical_id"),
    )

    low_quality = None
    if min_logprob is not None:
        from .quality import unigram_logprob_scores

        scores = unigram_logprob_scores(
            long_enough, text_col=text_col, id_col=id_col
        )
        failing = (
            scores.filter(F.col("mean_logprob") < min_logprob)
            .select(id_col)
            .transform(pin, eager=False)
        )
        low_quality = failing.select(
            F.col(id_col).alias("doc_id"),
            F.lit("low_quality").alias("reason"),
            F.lit(None).cast("long").alias("canonical_id"),
        )
        long_enough = long_enough.join(failing, id_col, "left_anti")

    repetitive = None
    if repetition_gate:
        from .quality import repetition_signals

        rep = repetition_signals(long_enough, text_col=text_col, id_col=id_col)
        failing_rep = (
            rep.filter(~F.col("passes_repetition"))
            .select(id_col)
            .transform(pin, eager=False)
        )
        repetitive = failing_rep.select(
            F.col(id_col).alias("doc_id"),
            F.lit("repetitive").alias("reason"),
            F.lit(None).cast("long").alias("canonical_id"),
        )
        long_enough = long_enough.join(failing_rep, id_col, "left_anti")

    pii_heavy = None
    if max_pii is not None:
        from .pii import pii_signals

        sig = pii_signals(long_enough, text_col=text_col)
        failing_pii = (
            sig.filter(F.col("n_pii") > max_pii)
            .select(id_col)
            .transform(pin, eager=False)
        )
        pii_heavy = failing_pii.select(
            F.col(id_col).alias("doc_id"),
            F.lit("pii").alias("reason"),
            F.lit(None).cast("long").alias("canonical_id"),
        )
        long_enough = long_enough.join(failing_pii, id_col, "left_anti")

    low_score = None
    if classifier_model is not None:
        from .classifier import quality_classifier_scores

        coef_table, intercept = classifier_model
        cls = quality_classifier_scores(
            long_enough,
            coef_table,
            intercept,
            num_buckets=classifier_buckets,
            text_col=text_col,
            id_col=id_col,
        )
        failing_cls = (
            cls.filter(F.col("score") < min_classifier_score)
            .select(id_col)
            .transform(pin, eager=False)
        )
        low_score = failing_cls.select(
            F.col(id_col).alias("doc_id"),
            F.lit("classifier").alias("reason"),
            F.lit(None).cast("long").alias("canonical_id"),
        )
        long_enough = long_enough.join(failing_cls, id_col, "left_anti")

    fp = F.md5(normalize_text(F.col(text_col)))
    if keep_best_col is None:
        keeper = F.min(id_col).alias("canonical_id")
        grouped = long_enough.select(F.col(id_col), fp.alias("_fp"))
    else:
        from .graph import canonical_rank

        keeper = F.max_by(
            F.col(id_col), canonical_rank(keep_best_col, id_col)
        ).alias("canonical_id")
        grouped = long_enough.select(
            F.col(id_col), F.col(keep_best_col), fp.alias("_fp")
        )
    exact_groups = grouped.groupBy("_fp").agg(keeper)
    # equi-join on the uniform fingerprint key; one row per distinct text on
    # the right, so AQE picks broadcast vs shuffle by actual size
    with_canon = long_enough.withColumn("_fp", fp).join(exact_groups, "_fp")
    exact_dups = with_canon.filter(F.col(id_col) != F.col("canonical_id")).select(
        F.col(id_col).alias("doc_id"),
        F.lit("exact_dup").alias("reason"),
        "canonical_id",
    ).transform(pin, eager=False)
    exact_survivors = with_canon.filter(F.col(id_col) == F.col("canonical_id")).drop(
        "_fp", "canonical_id"
    )

    # the production composition keeps the document-frequency guard ON by
    # default (restricted-vocabulary Jaccard, recall-lossy for pairs whose
    # every shared shingle is high-df — see shingle_jaccard_pairs); pass
    # df_cap=None for the exact oracle-matched form on bounded corpora
    pairs = jaccard_pairs_from_sets(
        doc_shingle_sets(exact_survivors, text_col=text_col, id_col=id_col),
        min_jaccard=min_jaccard,
        df_cap=df_cap,
    )
    comps = connected_components(pairs)  # (node, component=min reachable id)
    if keep_best_col is None:
        near_dups = comps.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id"),
            F.lit("near_dup").alias("reason"),
            F.col("component").alias("canonical_id"),
        ).transform(pin, eager=False)
    else:
        from .graph import resolve_canonicals

        resolved = resolve_canonicals(
            comps,
            docs.select(F.col(id_col), F.col(keep_best_col)),
            id_col=id_col,
            score_col=keep_best_col,
        )
        near_dups = resolved.filter(~F.col("is_canonical")).select(
            F.col(id_col).alias("doc_id"),
            F.lit("near_dup").alias("reason"),
            F.col("canonical_id"),
        ).transform(pin, eager=False)
    cleaned = exact_survivors.join(
        near_dups.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )

    semantic_dups = None
    if embeddings is not None:
        from .semdedup import semantic_dedup, semantic_dedup_trained

        # embeddings must carry the corpus id under ``id_col``; restrict
        # to survivors so the semantic stage only scans what is left
        vecs = embeddings.join(cleaned.select(id_col), id_col, "left_semi")
        if centroids is None:
            _, sem_dropped = semantic_dedup_trained(
                vecs, eps=sem_eps, id_col=id_col
            )
        else:
            _, sem_dropped = semantic_dedup(
                vecs, centroids, eps=sem_eps, id_col=id_col
            )
        semantic_dups = sem_dropped.select(
            F.col(id_col).alias("doc_id"),
            F.lit("semantic_dup").alias("reason"),
            F.col("canonical_id"),
        ).transform(pin, eager=False)
        cleaned = cleaned.join(
            semantic_dups.select(F.col("doc_id").alias(id_col)),
            id_col,
            "left_anti",
        )

    dropped = too_short
    if low_quality is not None:
        dropped = dropped.unionByName(low_quality)
    if repetitive is not None:
        dropped = dropped.unionByName(repetitive)
    if pii_heavy is not None:
        dropped = dropped.unionByName(pii_heavy)
    if low_score is not None:
        dropped = dropped.unionByName(low_score)
    dropped = dropped.unionByName(exact_dups).unionByName(near_dups)
    if semantic_dups is not None:
        dropped = dropped.unionByName(semantic_dups)
    return CorpusCleanResult(cleaned=cleaned, dropped=dropped)


def split_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    salt: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed id: the md5 of
    ``salt + doc_id`` maps each document to [0, 1), and cumulative weight
    intervals pick the split. Properties a training pipeline needs and a
    random() split lacks: stable across runs/engines (the salt versions the
    split), no shuffle (a per-row expression), and membership is decidable
    for a single document without seeing the corpus. Adds a ``split``
    column."""
    total = sum(weights.values())
    # 12 hex chars = 48 bits, exact in a double; u in [0, 1)
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 12),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 48))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < acc, F.lit(name))
        expr = branch if expr is None else expr.when(u < acc, F.lit(name))
    expr = (
        expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    )
    return docs.withColumn("split", expr)


def leakage_safe_split(
    docs: DataFrame,
    weights: dict[str, float],
    min_jaccard: float = 0.8,
    salt: str = "split-v1",
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int | None = 1000,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Train/val/test assignment that near-duplicates CANNOT straddle —
    the split-leakage guard. A plain per-document hash split
    (:func:`split_corpus`) puts ~w_train*w_val of every near-dup pair
    across the train/val boundary, silently leaking evaluation content
    into training; this variant splits by DUPLICATE GROUP instead: build
    the Jaccard near-dup pair graph (or accept a precomputed ``pairs``
    frame — doc_a/doc_b — from MinHash, SimHash, or SemDeDup), take
    connected components, and hash the component's canonical id through
    the same salted md5 interval rule, so every member of a duplicate
    group lands in the SAME split. Singletons hash their own id —
    identical to split_corpus, so the assignment only differs where
    leakage was possible.

    Adds ``split`` (and ``split_group``, the canonical id that was
    hashed — audit column). Same determinism properties as split_corpus;
    the extra cost over it is the pair graph + O(diameter) component
    rounds, both already bounded (inverted-index Jaccard, label
    propagation) — nothing quadratic."""
    from .graph import connected_components

    if pairs is None:
        pairs = jaccard_pairs_from_sets(
            doc_shingle_sets(docs, text_col=text_col, id_col=id_col),
            min_jaccard=min_jaccard,
            df_cap=df_cap,
        )
    comps = connected_components(pairs).transform(pin, eager=False)
    grouped = docs.join(
        comps.select(F.col("node").alias(id_col), "component"),
        id_col,
        "left",
    ).withColumn("split_group", F.coalesce(F.col("component"), F.col(id_col)))
    assigned = split_corpus(
        grouped, weights, salt=salt, id_col="split_group"
    )
    return assigned.select(*docs.columns, "split_group", "split")


def prepare_training_corpus(
    docs: DataFrame,
    ctx_len: int = 512,
    n_shards: int = 8,
    min_tokens: int = 3,
    min_jaccard: float = 0.8,
    min_logprob: float | None = None,
) -> tuple[CorpusCleanResult, DataFrame]:
    """clean → pack. Returns (clean result, packing map) — the two outputs a
    training run consumes (which documents, and where each lands in the
    fixed-length chunk stream)."""
    result = clean_corpus(
        docs,
        min_tokens=min_tokens,
        min_jaccard=min_jaccard,
        min_logprob=min_logprob,
    )
    packed = pack_sequences(result.cleaned, ctx_len=ctx_len, n_shards=n_shards)
    return result, packed

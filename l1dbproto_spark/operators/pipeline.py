"""Config-driven corpus pipeline — stages as data.

`tools/corpus_pipeline_demo.py` hardcodes the published corpus-prep
flow; production pipelines declare it, version it, and A/B it. This
module runs a pipeline from a stage LIST, each entry naming a
registered stage plus its parameters, and returns the surviving corpus
with a per-stage audit:

    docs, audit = run_pipeline(docs, [
        {"stage": "strip_html"},
        {"stage": "c4_clean", "min_sentences": 3},
        {"stage": "dedup_corpus_lines", "min_docs": 2},
        {"stage": "exact_substring_dedup", "window": 50},
        {"stage": "decontaminate", "eval_set": ev, "n": 8},
        {"stage": "clean_corpus", "min_tokens": 5, "repetition_gate": True},
        {"stage": "classifier_filter", "model": (coef, b0), "threshold": 0.5},
        {"stage": "sample_mixture", "rates": {"en": 0.8}, "default_rate": 0.1},
        {"stage": "split_corpus", "weights": {"train": .9, "val": .1}},
    ])

Stage semantics are EXACTLY the wrapped operators' — this module adds
no behavior of its own (pinned by the equivalence test). DataFrame
parameters (eval sets, fitted models) ride in the config dict like any
other value. Stages that rewrite text or drop rows chain the surviving
frame; tuple-returning stages contribute their drop counts to the
audit. Each stage boundary is optionally pinned with ``localCheckpoint``
(``checkpoint_stages=True``, the demo's measured linearization — see
clean_corpus's docstring for the executor-residency trade-off); audit
counts cost one count() per stage and can be disabled for production
(``audit=False``).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

from ..checkpoint import pin


def _stage_strip_html(docs: DataFrame, **p) -> DataFrame:
    from .html import strip_html

    return strip_html(docs, **p)


def _stage_c4_clean(docs: DataFrame, **p) -> DataFrame:
    from .c4 import c4_clean

    cleaned, _log = c4_clean(docs, **p)
    return cleaned


def _stage_c4_span_dedup(docs: DataFrame, **p) -> DataFrame:
    from .c4 import c4_span_dedup

    return c4_span_dedup(docs, **p)


def _stage_dedup_corpus_lines(docs: DataFrame, **p) -> DataFrame:
    from .c4 import dedup_corpus_lines

    return dedup_corpus_lines(docs, **p)


def _stage_exact_substring_dedup(docs: DataFrame, **p) -> DataFrame:
    from .exact_substr import exact_substring_dedup

    return exact_substring_dedup(docs, **p)


def _stage_decontaminate(docs: DataFrame, **p) -> DataFrame:
    from .contamination import decontaminate

    clean, _log = decontaminate(docs, **p)
    return clean


def _stage_decontaminate_semantic(docs: DataFrame, **p) -> DataFrame:
    from .contamination import decontaminate_semantic

    vecs = p.pop("corpus_vecs")
    ev = p.pop("eval_vecs")
    clean, _log = decontaminate_semantic(docs, vecs, ev, **p)
    return clean


def _stage_clean_corpus(docs: DataFrame, **p) -> DataFrame:
    from .corpus import clean_corpus

    return clean_corpus(docs, **p).cleaned


def _stage_classifier_filter(docs: DataFrame, **p) -> DataFrame:
    from .classifier import quality_filter

    coef, b0 = p.pop("model")
    return quality_filter(docs, coef, b0, **p)


def _stage_quality_gate(docs: DataFrame, **p) -> DataFrame:
    """Keep docs passing the Gopher rule battery."""
    from pyspark.sql import functions as F

    from .quality import gopher_quality_signals

    id_col = p.pop("id_col", "doc_id")
    passing = (
        gopher_quality_signals(docs, **p)
        .filter(F.col("passes_gopher"))
        .select(id_col)
    )
    return docs.join(passing, id_col, "left_semi")


def _stage_sample_mixture(docs: DataFrame, **p) -> DataFrame:
    from .sampling import sample_mixture

    return sample_mixture(docs, **p)


def _stage_sample_with_temperature(docs: DataFrame, **p) -> DataFrame:
    from .sampling import sample_with_temperature

    return sample_with_temperature(docs, **p)


def _stage_leakage_safe_split(docs: DataFrame, **p) -> DataFrame:
    from .corpus import leakage_safe_split

    return leakage_safe_split(docs, **p)


def _stage_split_corpus(docs: DataFrame, **p) -> DataFrame:
    from .corpus import split_corpus

    return split_corpus(docs, **p)


def _stage_validate(docs: DataFrame, suite=None, **p) -> DataFrame:
    """Data-quality gate (operators/checks.py): run the ``suite`` and
    raise — naming every failed constraint and its metric — instead of
    letting a bad drop flow into the expensive stages downstream. Passes
    the corpus through unchanged on success."""
    from .checks import failures

    if suite is None:
        raise ValueError("validate stage needs suite=CheckSuite(...)")
    fails = [
        (r.check, r.metric) for r in failures(suite.run(docs)).collect()
    ]
    if fails:
        raise ValueError(f"data-quality gate failed: {fails}")
    return docs


def _stage_normalize_unicode(docs: DataFrame, **p) -> DataFrame:
    from .textnorm import normalize_unicode

    return normalize_unicode(docs, **p)


def _stage_evolve_schema(docs: DataFrame, **p) -> DataFrame:
    from .evolve import evolve_schema

    conformed, _plan = evolve_schema(docs, **p)
    return conformed


def _stage_url_dedup(docs: DataFrame, **p) -> DataFrame:
    """Canonical-URL exact dedup: keep each group's min-id doc. Documents
    whose URL does not parse have no canonical key and are KEPT —
    quarantine/count them upstream (weburl module contract).

    ONE pass over the input (r11 review find: the first cut evaluated
    the frame — and every upstream stage — three times via an
    aggregation + semi-join + unparsed re-scan): a min-id window over
    the canonical URL, with each unparseable doc given its own synthetic
    key so it survives AND never piles into one giant NULL window
    partition (the engine's skew rule)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .weburl import normalize_url

    url_col = p.pop("url_col", "url")
    id_col = p.pop("id_col", "doc_id")
    key = F.coalesce(
        normalize_url(F.col(url_col)),
        F.concat(F.lit("_unparsed_:"), F.col(id_col).cast("string")),
    )
    w = Window.partitionBy("_url_norm")
    return (
        docs.withColumn("_url_norm", key)
        .withColumn("_keep", F.min(id_col).over(w))
        # NULL ids cannot participate in a min-id contract: keep them
        # visible (the sampling family's null-visibility rule) rather
        # than letting a NULL comparison silently drop them
        .filter((F.col(id_col) == F.col("_keep")) | F.col(id_col).isNull())
        .drop("_url_norm", "_keep")
    )


def _stage_filter_blocked_domains(docs: DataFrame, **p) -> DataFrame:
    from .weburl import filter_blocked_domains

    return filter_blocked_domains(docs, **p)


def _stage_chunk_fixed_tokens(docs: DataFrame, **p) -> DataFrame:
    """Document -> passage fan-out (the RAG indexing step). NOTE: changes
    the unit of work — downstream stages see passages keyed by
    (doc_id, chunk_idx), not documents."""
    from .chunking import chunk_fixed_tokens

    return chunk_fixed_tokens(docs, **p)


def _stage_chunk_by_sentences(docs: DataFrame, **p) -> DataFrame:
    """Sentence-boundary passage fan-out; same unit-of-work note as
    chunk_fixed_tokens."""
    from .chunking import chunk_by_sentences

    return chunk_by_sentences(docs, **p)


STAGES: dict[str, Callable[..., DataFrame]] = {
    "validate": _stage_validate,
    "evolve_schema": _stage_evolve_schema,
    "normalize_unicode": _stage_normalize_unicode,
    "url_dedup": _stage_url_dedup,
    "filter_blocked_domains": _stage_filter_blocked_domains,
    "strip_html": _stage_strip_html,
    "c4_clean": _stage_c4_clean,
    "c4_span_dedup": _stage_c4_span_dedup,
    "dedup_corpus_lines": _stage_dedup_corpus_lines,
    "exact_substring_dedup": _stage_exact_substring_dedup,
    "decontaminate": _stage_decontaminate,
    "decontaminate_semantic": _stage_decontaminate_semantic,
    "clean_corpus": _stage_clean_corpus,
    "classifier_filter": _stage_classifier_filter,
    "quality_gate": _stage_quality_gate,
    "sample_mixture": _stage_sample_mixture,
    "sample_with_temperature": _stage_sample_with_temperature,
    "split_corpus": _stage_split_corpus,
    "leakage_safe_split": _stage_leakage_safe_split,
    "chunk_fixed_tokens": _stage_chunk_fixed_tokens,
    "chunk_by_sentences": _stage_chunk_by_sentences,
}


def run_pipeline(
    docs: DataFrame,
    stages: list[dict[str, Any]],
    audit: bool = True,
    checkpoint_stages: bool = False,
) -> tuple[DataFrame, list[dict[str, Any]]]:
    """Run declared stages in order. Returns (surviving corpus, audit) —
    audit entries are ``{"stage": name, "rows": count-after}`` (empty
    list when ``audit=False``). Unknown stage names raise immediately
    with the registry's options, BEFORE any Spark work."""
    for spec in stages:
        if spec.get("stage") not in STAGES:
            raise ValueError(
                f"unknown stage {spec.get('stage')!r}; "
                f"registered: {sorted(STAGES)}"
            )
    log: list[dict[str, Any]] = []
    if audit:
        log.append({"stage": "input", "rows": docs.count()})
    for spec in stages:
        params = {k: v for k, v in spec.items() if k != "stage"}
        docs = STAGES[spec["stage"]](docs, **params)
        if checkpoint_stages:
            docs = docs.transform(pin)
        if audit:
            log.append({"stage": spec["stage"], "rows": docs.count()})
    return docs, log

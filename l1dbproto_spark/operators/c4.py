"""C4-style corpus cleaning (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning...", §2.2) — the published heuristic battery that produced
the C4 dataset, complementing the Gopher rules (operators/quality.py):
C4 FILTERS LINES and REMOVES DUPLICATED SPANS in place, where Gopher only
scores documents.

Pinned conventions (the paper gives prose, not code; every rule below is
made explicit and pinned by an independent Python reference in
tests/test_c4.py):

* lines = text split on ``\\n``, trimmed;
* a line is KEPT iff it ends in terminal punctuation (``.``, ``!``, ``?``,
  ``"``), has at least ``line_min_words`` whitespace words (paper: 5), and
  contains none of the ``drop_line_phrases`` (case-insensitive substring;
  default: ``javascript`` and the paper's cookie/policy boilerplate list);
* a document is DROPPED iff its kept text has fewer than ``min_sentences``
  sentences (counted as terminal-punctuation runs, paper: 3), or contains
  ``lorem ipsum`` (case-insensitive), or contains a curly brace ``{``
  (code marker). The paper's bad-words list is a pluggable
  ``drop_doc_phrases`` parameter — no list ships here;
* three-sentence-span dedup removes ALL BUT THE FIRST occurrence
  (corpus-wide order: smallest (doc_id, span start)) of every duplicated
  three-sentence span; the removed unit is the span's three sentences.

Everything is column algebra over one text scan: line filtering is per-row
array algebra; span dedup is one sentence explode + per-doc lead() window +
one uniform hash groupBy + a per-doc semi-join back — no UDFs, nothing
quadratic, shuffle keys uniform (span hashes / doc ids) at any corpus size.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..checkpoint import pin

# the paper's line-level boilerplate phrases + "javascript"
DEFAULT_DROP_LINE_PHRASES = [
    "javascript",
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
]

_TERMINAL = ('.', '!', '?', '"')


def _line_kept(line: Column, line_min_words: int, phrases: list[str]) -> Column:
    trimmed = F.trim(line)
    ends_ok = F.lit(False)
    for t in _TERMINAL:
        ends_ok = ends_ok | trimmed.endswith(t)
    # engine-wide whitespace rule: the explicit class, identical in Java
    # regex and RE2/DuckDB (\s includes \x0b in one and not the other —
    # queries/text.py:27 pins the rationale); a vertical-tab-separated
    # line must count the same here as in every other token counter
    enough_words = F.size(F.split(trimmed, r"[ \t\r\n\f]+")) >= line_min_words
    lower = F.lower(trimmed)
    no_phrase = F.lit(True)
    for p in phrases:
        no_phrase = no_phrase & ~lower.contains(p)
    return ends_ok & enough_words & no_phrase


def c4_quality_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_min_words: int = 5,
    min_sentences: int = 3,
    drop_line_phrases: list[str] | None = None,
    drop_doc_phrases: list[str] | None = None,
) -> DataFrame:
    """Per-document C4 battery: original columns plus

    ``c4_text`` (the line-filtered text, kept lines re-joined with \\n),
    ``n_lines`` / ``n_lines_kept``, ``n_sentences`` (terminal-punctuation
    runs in the kept text), ``has_lorem_ipsum``, ``has_brace``, and
    ``passes_c4`` (the document-level keep decision over the KEPT text).

    One per-row projection — no shuffle, no join; the line filter is an
    array ``filter`` over the split lines."""
    phrases = (
        DEFAULT_DROP_LINE_PHRASES if drop_line_phrases is None else drop_line_phrases
    )
    doc_phrases = ["lorem ipsum"] + [
        p.lower() for p in (drop_doc_phrases or [])
    ]
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: _line_kept(l, line_min_words, phrases))
    kept_text = F.array_join(F.transform(kept, lambda l: F.trim(l)), "\n")
    # sentences = runs of terminal punctuation in the kept text (e.g. "..."
    # counts once) — the pinned counting convention
    n_sentences = F.size(
        F.filter(
            F.split(kept_text, r'[.!?"]+'),
            lambda s: F.length(F.trim(s)) > 0,
        )
    )
    # a kept text ENDING in terminal punct splits into n_sentences pieces;
    # the split above drops the trailing empty piece via the length filter,
    # so the count equals the number of punctuation-terminated runs
    lower_kept = F.lower(kept_text)
    has_phrase = F.lit(False)
    for p in doc_phrases:
        has_phrase = has_phrase | lower_kept.contains(p)
    has_lorem = lower_kept.contains("lorem ipsum")
    has_brace = kept_text.contains("{")
    passes = (
        (n_sentences >= min_sentences) & ~has_phrase & ~has_brace
    )
    return docs.select(
        "*",
        kept_text.alias("c4_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        passes.alias("passes_c4"),
    )


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_min_words: int = 5,
    min_sentences: int = 3,
    drop_line_phrases: list[str] | None = None,
    drop_doc_phrases: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Apply the battery: returns (cleaned docs — original columns with
    ``text_col`` REPLACED by the line-filtered text, failing docs dropped;
    drop log (doc_id, reason) with reason one of ``too_few_sentences`` /
    ``doc_phrase`` / ``brace``). Composes upstream of clean_corpus (which
    gates and dedups but never rewrites text)."""
    sig = c4_quality_signals(
        docs, text_col, id_col, line_min_words, min_sentences,
        drop_line_phrases, drop_doc_phrases,
    )
    reason = (
        F.when(F.col("n_sentences") < min_sentences, F.lit("too_few_sentences"))
        .when(F.col("has_brace"), F.lit("brace"))
        .otherwise(F.lit("doc_phrase"))
    )
    dropped = sig.filter(~F.col("passes_c4")).select(
        F.col(id_col).alias("doc_id"), reason.alias("reason")
    )
    extra = [c for c in docs.columns if c != text_col]
    cleaned = sig.filter(F.col("passes_c4")).select(
        *extra, F.col("c4_text").alias(text_col)
    ).select(docs.columns)
    return cleaned, dropped


def c4_span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_sentences: int = 3,
) -> DataFrame:
    """C4's corpus-level dedup: remove all but the FIRST occurrence of any
    ``span_sentences``-sentence span occurring more than once anywhere in
    the corpus. First = smallest (doc_id, span start index); the removed
    unit is the span's sentences, and documents are reconstructed from
    their surviving sentences (empty documents survive as empty text —
    compose with :func:`c4_clean` or a length gate to drop them).

    Plan: one sentence explode (per-doc ``posexplode``), spans via
    ``lead()`` over the per-doc sentence window (uniform doc keys), one
    groupBy on the span hash (uniform — md5), winners by ``min(struct)``,
    then the non-winning occurrences expand to their covered sentence
    indices and anti-join the sentence table per (doc, index). Nothing in
    the plan scales with anything but the sentence count."""
    # sentence split keeps the terminator attached: insert a sentinel
    # after every terminal-punctuation run, split on the sentinel, trim —
    # a lookbehind-free construction (regex lookbehind support differs
    # across engines; this one is portable and the reference test mirrors
    # it verbatim)
    # null-id docs are EXEMPT from the corpus-wide rewrite (passed through
    # untouched): the reassembly is keyed on the id, so a null id cannot be
    # re-joined (SQL equality) and several null-id docs would collide into
    # one group — the null-visibility rule, pinned in test_robustness
    all_docs = docs
    docs = docs.filter(F.col(id_col).isNotNull())
    null_id_docs = all_docs.filter(F.col(id_col).isNull())
    sentinel = "\x1f"
    marked = F.regexp_replace(F.col(text_col), r'([.!?"]+)', "$1" + sentinel)
    # explicit unary lambda: F.trim has an optional second parameter, so
    # passing it bare would make transform supply the element INDEX as the
    # trim string (the same binary-callable trap as quality.py's _tag)
    sentences = F.filter(
        F.transform(F.split(marked, sentinel), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    sent = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(sentences).alias("sidx", "sentence"),
    )
    w = Window.partitionBy("doc_id").orderBy("sidx")
    span_parts = [F.col("sentence")] + [
        F.lead("sentence", i).over(w) for i in range(1, span_sentences)
    ]
    spans = sent.select(
        "doc_id",
        "sidx",
        F.when(
            F.lead("sentence", span_sentences - 1).over(w).isNotNull(),
            F.md5(F.concat_ws("", *span_parts)),
        ).alias("span_hash"),
    ).filter(F.col("span_hash").isNotNull())
    winners = spans.groupBy("span_hash").agg(
        F.min(F.struct("doc_id", "sidx")).alias("w"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    losers = (
        spans.join(winners, "span_hash")
        .filter(
            (F.col("n_occ") > 1)
            & (
                (F.col("doc_id") != F.col("w.doc_id"))
                | (F.col("sidx") != F.col("w.sidx"))
            )
        )
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("sidx"), F.col("sidx") + F.lit(span_sentences - 1)
                )
            ).alias("sidx"),
        )
        .distinct()
    )
    # rebuild ONLY documents that actually lost a span: untouched docs
    # keep their original text VERBATIM (newlines and all — the previous
    # unconditional rebuild rejoined every doc's sentences with spaces,
    # gutting line structure for the no-dup majority, and shuffled the
    # whole corpus through collect_list for nothing; review find)
    touched = losers.select("doc_id").distinct().transform(pin, eager=False)
    survivors = (
        sent.join(touched, "doc_id", "left_semi")
        .join(losers, ["doc_id", "sidx"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sidx", "sentence"))),
                    lambda s: s["sentence"],
                ),
                " ",
            ).alias("_new_text")
        )
    )
    extra = [c for c in docs.columns if c != text_col]
    touched_ids = touched.withColumnRenamed("doc_id", id_col)
    rewritten = (
        docs.join(touched_ids, id_col, "left_semi")
        .join(survivors.withColumnRenamed("doc_id", id_col), id_col, "left")
        .select(
            *extra,
            F.trim(F.coalesce(F.col("_new_text"), F.lit(""))).alias(text_col),
        )
        .select(docs.columns)
    )
    untouched = docs.join(touched_ids, id_col, "left_anti")
    return rewritten.unionByName(untouched.select(docs.columns)).unionByName(
        null_id_docs.select(docs.columns)
    )


def dedup_corpus_lines(
    docs: DataFrame,
    min_docs: int = 2,
    mode: str = "keep_first",
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level LINE dedup — the CCNet/RefinedWeb boilerplate remover
    (Wenzek et al. 2020 dedup paragraphs keeping one copy; Penedo et al.
    2023 strip repeated crawl furniture): navigation menus, cookie
    banners, and share buttons recur verbatim across pages, and neither
    the document-level dedup family (operators/dedup.py) nor the
    three-sentence span rule (:func:`c4_span_dedup`) targets single
    recurring lines.

    A line (``\\n``-split, compared by trimmed text) is DUPLICATED when it
    appears in at least ``min_docs`` DISTINCT documents (within-document
    repetition is the repetition battery's job, operators/quality.py).
    ``mode="keep_first"`` keeps the corpus-first occurrence (smallest
    (doc_id, line index) — CCNet's one-copy rule); ``mode="remove_all"``
    strips every occurrence (boilerplate is noise everywhere). Lines that
    trim to empty are exempt — they are structure, not content, and every
    blank line in the corpus would otherwise collide into one hash key.
    Documents that lost a line are reconstructed from surviving lines in
    order (a document reduced to nothing survives as empty text — compose
    with a length gate, like :func:`c4_span_dedup`); untouched documents
    — including NULL-text docs — pass through VERBATIM, NULL staying
    NULL, matching :func:`c4_span_dedup` so ``corpus_diff`` never reports
    a no-op as a modification.

    Plan, same family as the span dedup: one line posexplode (per-doc),
    one groupBy on the md5 line hash (uniform keys — the blank-line
    exemption removes the one degenerate hot key), the per-(doc, index)
    removal anti-join, and the per-doc reassembly agg. Three uniform-key
    exchanges; nothing scales with anything but the corpus line count."""
    if mode not in ("keep_first", "remove_all"):
        raise ValueError("mode must be 'keep_first' or 'remove_all'")
    # null-id docs pass through untouched — same exemption and reason as
    # c4_span_dedup (id-keyed reassembly; pinned in test_robustness)
    all_docs = docs
    docs = docs.filter(F.col(id_col).isNotNull())
    null_id_docs = all_docs.filter(F.col(id_col).isNull())
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.col(text_col), re.escape(sep))
        ).alias("lidx", "line"),
    ).withColumn(
        "line_hash",
        F.when(
            F.length(F.trim(F.col("line"))) > 0,
            F.md5(F.trim(F.col("line"))),
        ),
    )
    content = lines.filter(F.col("line_hash").isNotNull())
    stats = content.groupBy("line_hash").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.min(F.struct("doc_id", "lidx")).alias("w"),
    )
    dup = stats.filter(F.col("n_docs") >= min_docs)
    doomed = content.join(dup, "line_hash")
    if mode == "keep_first":
        doomed = doomed.filter(
            (F.col("doc_id") != F.col("w.doc_id"))
            | (F.col("lidx") != F.col("w.lidx"))
        )
    # doomed is (doc_id, lidx) — bounded by the duplicated-line count, far
    # smaller than the corpus — and feeds THREE consumers (the survivor
    # anti-join, touched, and through it both rewrite branches); pinning it
    # keeps the line-explode/stats subtree out of every downstream branch
    doomed = doomed.select("doc_id", "lidx").transform(pin, eager=False)
    # rebuild ONLY documents that actually lost a line — same pattern (and
    # same reasons) as c4_span_dedup's touched-only rewrite. The binding
    # rationale is CORRECTNESS: the no-dup majority keeps its text VERBATIM
    # (NULL text stays NULL — a coalesce-to-'' here made corpus_diff report
    # untouched NULL-text docs as 'modified'; advice find). On local-scale
    # wall-clock the two extra joins are a measured flat ~0.3-0.5 s
    # overhead vs a rebuild-everything variant at every shape tried
    # (PERFORMANCE.md 'dedup_corpus_lines crossover study'), so no local
    # speed win is claimed; the reassembly shuffle being bounded by the
    # touched minority (not the corpus) matters only where that shuffle's
    # BYTES dominate — full-text rows at 100 TB — alongside the verbatim
    # guarantee that no byte of an untouched document is ever re-encoded.
    touched = doomed.select("doc_id").distinct().transform(pin, eager=False)
    survivors = (
        lines.join(touched, "doc_id", "left_semi")
        .join(doomed, ["doc_id", "lidx"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("lidx", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("_new_text")
        )
    )
    extra = [c for c in docs.columns if c != text_col]
    touched_ids = touched.withColumnRenamed("doc_id", id_col)
    rewritten = (
        docs.join(touched_ids, id_col, "left_semi")
        .join(survivors.withColumnRenamed("doc_id", id_col), id_col, "left")
        .select(
            *extra,
            # a touched doc that lost EVERY line has no survivor row ->
            # empty text (the documented reduced-to-nothing contract)
            F.coalesce(F.col("_new_text"), F.lit("")).alias(text_col),
        )
        .select(docs.columns)
    )
    untouched = docs.join(touched_ids, id_col, "left_anti")
    return rewritten.unionByName(untouched.select(docs.columns)).unionByName(
        null_id_docs.select(docs.columns)
    )

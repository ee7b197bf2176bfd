"""Corpus health report — the one-pass summary an operator runs before
and after every pipeline stage ("what did this gate do to my corpus?"):
volume, token-length distribution, duplication estimate, emptiness, per
source and overall.

One aggregation pass: a single projection computes the per-document
signals (token count, char count, exact-dup fingerprint), then ONE
``rollup`` aggregation produces the per-source rows plus the grand
total (null source = overall, standard ROLLUP semantics). Nothing else
touches the corpus.

Duplication: ``approx=True`` (default, the 100 TB path) estimates
distinct fingerprints with HLL (``approx_count_distinct``, fixed-size
partial-aggregatable state); ``approx=False`` computes exact
``count(distinct)`` — one extra shuffle, engine-reproducible, what the
DuckDB oracle checks. ``dup_rate = 1 - distinct/n`` is the fraction of
documents that are byte-duplicates (after the engine's standard text
normalization) of an earlier one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str | None = None,
    approx: bool = True,
) -> DataFrame:
    """(source?, n_docs, n_tokens, n_chars, tok_p50, tok_p90, tok_p99,
    n_distinct, dup_rate, empty_frac) — one row per source plus the
    rollup total (source null). Without ``source_col``, a single overall
    row."""
    n_tok = F.size(
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
        )
    )
    base = docs.select(
        *( [F.col(source_col).alias("source")] if source_col else [] ),
        n_tok.alias("_nt"),
        F.length(text_col).alias("_nc"),
        F.md5(normalize_text(F.col(text_col))).alias("_fp"),
    )
    distinct = (
        F.approx_count_distinct("_fp")
        if approx
        else F.count_distinct("_fp")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.sum("_nc").alias("n_chars"),
        F.percentile_approx("_nt", 0.5).alias("tok_p50"),
        F.percentile_approx("_nt", 0.9).alias("tok_p90"),
        F.percentile_approx("_nt", 0.99).alias("tok_p99"),
        distinct.alias("n_distinct"),
        # guard the n_docs=0 group (an empty corpus after aggressive
        # filtering is legitimate; ANSI would error the 0/0)
        F.when(
            F.count(F.lit(1)) > 0,
            F.lit(1.0) - distinct / F.count(F.lit(1)),
        ).alias("dup_rate"),
        F.avg((F.col("_nt") == 0).cast("double")).alias("empty_frac"),
    ]
    if source_col is None:
        return base.agg(*aggs)
    return base.rollup("source").agg(*aggs)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_unchanged: bool = False,
) -> DataFrame:
    """Snapshot-to-snapshot change set — the audit an incremental corpus
    rebuild starts from: (id, change) with ``change`` in ``added``
    (id only in new), ``removed`` (id only in old), ``modified`` (same id,
    different normalized text), and optionally ``unchanged``.

    Texts compare by the engine's canonical normalized fingerprint
    (operators/dedup.normalize_text + md5), so whitespace/case churn does
    not count as modification — the same equivalence exact dedup uses.

    One full outer join on the id (uniform key); each side is scanned
    once and only (id, fingerprint) shuffles, never text."""
    # presence is tracked by an explicit marker, NOT fingerprint
    # nullness: a row present with NULL text has a NULL fingerprint and
    # would otherwise misreport as added/removed (review find); NULL-text
    # fingerprints compare via null-safe equality, so NULL -> NULL is
    # "unchanged" and NULL -> text is "modified"
    o = old.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("_ofp"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("_nfp"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, id_col, "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("_ofp").eqNullSafe(F.col("_nfp")), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col(id_col), change.alias("change"))
    if include_unchanged:
        return out
    return out.filter(F.col("change") != "unchanged")

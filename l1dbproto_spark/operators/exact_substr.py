"""Exact-substring deduplication (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better", §ExactSubstr): when two
places in the corpus share a token run of at least ``window`` tokens,
remove the duplicated run from all but the first occurrence.

The paper builds a corpus-wide suffix array; that is a sequential
construction that does not distribute. The equivalent corpus-scale
Spark shape: every length-``window`` token window is hashed, windows
whose hash occurs more than once are duplicate SEEDS, and a seed marks
its ``window`` covered token positions for removal (keep-first: the
corpus-wide smallest (doc_id, window start) survives). Any shared run
of length L >= window is covered by L - window + 1 overlapping seeds,
so the whole run is removed in the losers — exactly the suffix-array
outcome for runs at or above the threshold, without the sequential
build. (Runs shorter than ``window`` are by definition below the
dedup threshold on both constructions.)

Plan (mirrors c4.c4_span_dedup's sentence form, one granularity down):

1. per-document token array + window hashes built MAP-SIDE with array
   algebra — ``transform`` over a ``sequence`` of start indices slicing
   the token array; no ``lead()`` chain (a 50-token window would need
   50 stacked window functions), no shuffle;
2. one posexplode to (doc, start, hash) — the same row volume as any
   shingle explode (~1 row per token);
3. one uniform-key groupBy on the md5 window hash: winner =
   min(struct(doc_id, start)), occurrence count;
4. losing occurrences expand to their covered token indices
   (``sequence`` explode, distinct), anti-join the token table, and
   documents are rebuilt from surviving tokens in order.

Output text is whitespace-normalized (tokens rejoined with single
spaces) — the paper operates on the token stream, and byte-exact
reconstruction would require carrying the original inter-token bytes.

Scale: nothing quadratic anywhere — row counts are linear in token
count, shuffle keys are uniform hashes / doc ids, and the only
expansion is the per-seed ``window``-row sequence explode, bounded by
(duplicated seeds x window). No reference analog (the reference engine
has no text layer); complements c4_span_dedup (sentence spans) and the
shingle families in operators/dedup.py (whole-document near-dup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import pin


def duplicate_window_seeds(
    docs: DataFrame,
    window: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All token-window duplicate seeds: (doc_id, start, window_hash,
    n_occ, is_winner) for every window whose hash occurs >1 time
    corpus-wide. ``start`` is the 0-based token index; the winner is the
    smallest (doc_id, start). Diagnostic/report companion to
    :func:`exact_substring_dedup` — same plan prefix.

    The token array is materialized as a bound column before the window
    transform slices it: an expression referenced inside a transform()
    lambda re-evaluates per element (every window hash would re-split
    the text), while a column reference is read once per row."""
    toks = F.col("_toks")
    n = F.size(toks)
    hashes = F.transform(
        F.sequence(F.lit(0), n - F.lit(window)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    wins = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
        ).alias("_toks"),
    ).select(
        "doc_id",
        F.posexplode(F.when(n >= window, hashes)).alias(
            "start", "window_hash"
        ),
    )
    counts = wins.groupBy("window_hash").agg(
        F.min(F.struct("doc_id", "start")).alias("_w"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    return (
        wins.join(counts, "window_hash")
        .filter(F.col("n_occ") > 1)
        .select(
            "doc_id",
            "start",
            "window_hash",
            "n_occ",
            (
                (F.col("doc_id") == F.col("_w.doc_id"))
                & (F.col("start") == F.col("_w.start"))
            ).alias("is_winner"),
        )
    )


def exact_substring_dedup(
    docs: DataFrame,
    window: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every duplicated >=``window``-token run, keeping the
    corpus-wide first occurrence (smallest (doc_id, start)). Returns the
    input frame with ``text_col`` rewritten to the surviving tokens
    (whitespace-normalized; documents can come back empty — compose with
    a length gate). Documents shorter than ``window`` tokens pass
    through verbatim (modulo whitespace normalization of touched docs
    only — untouched docs keep their original text byte-exact)."""
    seeds = duplicate_window_seeds(docs, window, text_col, id_col)
    # (doc, token-index) removal set: data-dependent size (a template-heavy
    # corpus can lose a large fraction of its tokens), so NO broadcast hint
    # anywhere below — AQE sizes the joins. It feeds three consumers
    # (semi-join, anti-join, touched set), so checkpoint it to keep the
    # window-hash aggregation behind it single-run; localCheckpoint blocks
    # are executor-resident (job fails rather than recomputes on executor
    # loss) — see clean_corpus's docstring for the trade-off
    removed = (
        seeds.filter(~F.col("is_winner"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("start"), F.col("start") + F.lit(window - 1)
                )
            ).alias("tidx"),
        )
        .distinct()
        .transform(pin, eager=False)
    )
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    tok_rows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("tidx", "tok"),
    )
    # only docs that actually lose tokens are rebuilt; everything else
    # keeps its original text untouched (left join below misses them)
    rebuilt = (
        tok_rows.join(removed.select("doc_id").distinct(), "doc_id", "left_semi")
        .join(removed, ["doc_id", "tidx"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tidx", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("_new_text")
        )
    )
    # docs whose every token was removed vanish from rebuilt's groupBy
    # input only if they had no surviving rows — collect_list on an empty
    # group never fires, so re-add them as empty text via the touched set
    touched = removed.select("doc_id").distinct()
    patched = touched.join(rebuilt, "doc_id", "left").select(
        "doc_id", F.coalesce("_new_text", F.lit("")).alias("_new_text")
    )
    extra = [c for c in docs.columns if c != text_col]
    return (
        docs.join(
            patched.withColumnRenamed("doc_id", id_col), id_col, "left"
        )
        .select(
            *extra,
            F.coalesce(F.col("_new_text"), F.col(text_col)).alias(text_col),
        )
        .select(docs.columns)
    )

"""Scan-count regression guard: every registered query's static plan may
reference each source table at most a known number of times. The r4 audit
found operators whose branches re-aggregated the corpus with differing
projections (defeating runtime stage reuse) and staged pipelines whose
plans doubled per stage; this pins the fixed state.

Multi-scans in the whitelist are INTRINSIC two-role scans (corpus +
queries carved from one table, two year-ranges of orders, union of
filtered branches) — the pushed-down filters make the extra scans
partial, and the shapes match what any SQL engine plans."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from l1dbproto_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"

# name -> {table: max allowed FileScan references}; default ceiling is 1
ALLOWED = {
    "source_object_match": {"orders": 2},   # match + increment roles
    "catalog_union": {"orders": 2},         # two filtered branches unioned
    "ann_topk_brute": {"embeddings": 2},    # corpus + queries roles
    # bucket scan + probe scan (candidate generation) + the two re-rank
    # vector scans — candidates are distinct (query, neighbor) pairs, so
    # each scan's role is disjoint and the probe/query scans carry
    # pushed-down vec_id filters
    "ann_topk_lsh": {"embeddings": 4},
    "ann_topk_ivf": {"embeddings": 4},      # + centroid training sample
    "embedding_near_dup_pairs": {"embeddings": 2},  # self-join sides
    "exists_anti_semi": {"customer": 2, "orders": 2},  # EXISTS + NOT EXISTS
    "above_average_customers": {"customer": 2},  # row side + average side
    "asof_last_click_before_purchase": {"events": 2},  # clicks + purchases
    # corpus scans twice by design since the stage-1 slimming (int8
    # pre-filter scan + full-precision survivor join-back — the extra
    # columnar scan buys an all-pairs shuffle that carries only ids and
    # scores); queries are checkpointed to one materialization
    "quantized_topk": {"embeddings": 3},
    "ivf_pq_topk": {"embeddings": 2},       # corpus (assign+encode) +
                                            # re-rank fetch; queries and
                                            # index artifacts checkpointed
                                            # (r15: was 5 — query batch now
                                            # pinned once)
    "contamination_report": {"documents": 3},  # corpus + filtered eval index
    "tfidf_top_terms": {"documents": 2},    # tf + df branches share ONE
                                            # identical tf subtree — the
                                            # scheduler skips the duplicate
                                            # map stage at runtime
    "semdedup_drops": {"embeddings": 6},    # union clones x pair-join sides
    "dsir_log_weights": {"documents": 2},  # id spine + featurize roles
                                            # (bucket models hide behind
                                            # their B-row checkpoints)
    "q6_forecast_revenue": {"lineitem": 2},
    "argmax_order_per_customer": {"orders": 2},
    "top_k_per_group": {"orders": 2},
    # two line-explode roles (dup stats + survivor anti-join; the doomed
    # set is pinned) + two original-text roles (touched rewrite branch +
    # untouched verbatim branch)
    "dedup_corpus_lines": {"documents": 4},
    # corpus-embed + query-embed roles (the doc_id<10 predicate pushes
    # below the coordinate aggregation, so the query-side scan is 10
    # docs), each with its zero-vector completion branch
    "doc_embed_ann": {"documents": 4},
    # corpus-stats agg + postings + the dfreq postings clone — dfreq and tf
    # share ONE identical exchange; AQE reuses it at runtime (verified:
    # post-exec plan shows ReusedExchange, same pattern as tfidf_top_terms)
    "bm25_topk": {"documents": 3},
    "fuzzy_name_match": {"part": 2},        # token-blocked self-join sides
    # observation agg + the grid side's bounds clone of the same agg
    # subtree — one shared exchange, AQE-reused at runtime
    "gap_fill_resample": {"events": 2},
    # corpus signatures (stage 1) + survivor join-back + the vec_id<20
    # query carve-out (pinned to one materialization) — same shape and
    # rationale as quantized_topk
    "hamming_topk": {"embeddings": 3},
    # (cohort, offset) activity agg + the offset-0 sizes clone of the
    # same subtree — one shared exchange, AQE-reused at runtime
    "cohort_retention": {"orders": 2},
    # dedup-groups agg + mix's per-domain agg + the mix denominators'
    # clone of the per-domain subtree (1-row broadcast; shared exchange,
    # AQE-reused at runtime like cohort_retention)
    "weburl_dedup_mix": {"documents": 3},
    # corpus scan x2 (hard scoring fold + easy hash-rank pair gen) +
    # anchors carve-out x2 + the positives table's anchors clone x2 —
    # every non-corpus role carries the pushed vec_id<12 filter (12-row
    # broadcast scans), so the corpus is read once per leg like the
    # similarity family
    "contrastive_pairs": {"embeddings": 6},
    # ONE-scan loss aggregation + the conformed-frame proof aggregate
    # (deliberately separate consumers of the same table; the loss
    # report itself is plan-pinned to one scan in test_evolve)
    "evolve_cast_loss": {"documents": 2},
    # r13 rows. conversation_audit: report + fingerprint groupBys are two
    # deliberate consumers of the turn scan (one exchange each on the
    # inherent conv_id key); preference_pairs: the best/worst rule's two
    # rank-filter branches share one ranked subtree (scheduler-dedups at
    # runtime like tfidf) + the dense rule's self-join sides — intrinsic
    # two-role scans, 2 + 2; snapshot_drift_report: each statistic's
    # (old, new) count pair is two pushed-filter scans — the pinned
    # counts frame stops any further re-reads (4 = 2 stats x 2 sides;
    # the drift suite pins the per-statistic ceiling)
    "conversation_audit": {"documents": 2},
    "preference_pairs": {"documents": 4},
    "snapshot_drift_report": {"documents": 4},
    # r14 row. corpus-bag role + the vec_id<10 query carve-out (pushed
    # filter -> 10-row broadcast scan) — the same two-role shape as the
    # rest of the similarity family
    "maxsim_token_topk": {"embeddings": 2},
}


@pytest.mark.parametrize("name", sorted(load_all()))
def test_scan_ceiling(spark, name):
    spec = load_all()[name]
    df = spec.builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = Counter(re.findall(r"testdata/sf0\.001/(\w+)\.parquet", plan))
    allowed = ALLOWED.get(name, {})
    for table, n in scans.items():
        cap = allowed.get(table, 1)
        assert n <= cap, (
            f"{name} scans {table} {n}x (cap {cap}) — a new plan branch is "
            f"re-reading the table; share the subtree or checkpoint the "
            f"small side"
        )


def _scans(df, table="documents"):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return Counter(
        re.findall(r"testdata/sf0\.001/(\w+)\.parquet", plan)
    ).get(table, 0)


def test_exact_substr_scan_ceiling(spark):
    """exact_substring_dedup: the removal set hides behind its
    checkpoint; the visible plan reads documents for the token table and
    the final rebuild join only."""
    from l1dbproto_spark.operators.exact_substr import exact_substring_dedup
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    out = exact_substring_dedup(docs, window=20)
    assert _scans(out) <= 2


def test_bpe_counts_scan_ceiling(spark):
    """bpe_token_counts: id spine + word-count scan + the vocab branch
    (which shares the word-count shuffle at runtime) — never more."""
    from l1dbproto_spark.operators.bpe import bpe_token_counts
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    out = bpe_token_counts(docs, merges=[("a", "b")])
    assert _scans(out) <= 3


def test_classifier_scoring_scan_ceiling(spark):
    """quality_classifier_scores: id spine + one featurization scan; the
    coefficient table is an in-memory bounded frame."""
    from l1dbproto_spark.operators.classifier import (
        quality_classifier_scores,
    )
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    coef = spark.createDataFrame(
        [(0, 0.5), (1, -0.5)], "bucket long, coef double"
    )
    out = quality_classifier_scores(docs, coef, 0.1, num_buckets=64)
    assert _scans(out) <= 2


def test_strip_html_single_scan(spark):
    from l1dbproto_spark.operators.html import strip_html
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    assert _scans(strip_html(docs)) == 1


def test_bigram_logprob_scan_ceiling(spark):
    """bigram_logprob_scores: one position-row scan feeds every model
    branch through the shared (id, prev, w) aggregation."""
    from l1dbproto_spark.operators.quality import bigram_logprob_scores
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    # the pair-count checkpoint hides the model branches' subtree; the
    # visible scan is the per-doc scoring join's, and materializing the
    # checkpoint adds exactly one more at runtime (two-scan shape)
    assert _scans(bigram_logprob_scores(docs)) == 1

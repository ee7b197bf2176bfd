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
    "ann_topk_lsh": {"embeddings": 2},
    "ann_topk_ivf": {"embeddings": 4},      # + centroid training sample
    "embedding_near_dup_pairs": {"embeddings": 2},  # self-join sides
    "exists_anti_semi": {"customer": 2, "orders": 2},  # EXISTS + NOT EXISTS
    "above_average_customers": {"customer": 2},  # row side + average side
    "asof_last_click_before_purchase": {"events": 2},  # clicks + purchases
    "quantized_topk": {"embeddings": 2},    # corpus + queries roles
    "ivf_pq_topk": {"embeddings": 5},       # corpus, queries, re-rank (index
                                            # artifacts checkpointed)
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
    "price_percentiles": {"part": 2},
    "argmax_order_per_customer": {"orders": 2},
    "top_k_per_group": {"orders": 2},
    "window_frames_battery": {"orders": 2},
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

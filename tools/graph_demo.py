#!/usr/bin/env python
"""End-to-end corpus-graph demo — the round-10 graph-mining family composed
over the documents table's near-dup pair graph, gated by the data-quality
check suite:

  1. ingest gate: declarative check suite            (operators/checks.py)
  2. near-dup candidate pairs (MinHash-LSH)          (operators/dedup.py)
  3. dedup clusters (connected components)           (operators/graph.py)
  4. cluster cohesion: triangles + clustering coeff  (operators/graph.py)
  5. coreness of the pair graph                      (operators/graph.py)
  6. communities (label propagation) vs components   (operators/graph.py)
  7. quality-aware canonical selection               (operators/graph.py)

Usage: python tools/graph_demo.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from l1dbproto_spark.operators.checks import CheckSuite, failures
from l1dbproto_spark.operators.dedup import (
    minhash_band_buckets,
    minhash_candidate_pairs,
    minhash_signatures,
    shingle_rows,
)
from l1dbproto_spark.operators.graph import (
    clustering_coefficient,
    connected_components,
    core_numbers,
    label_propagation,
    resolve_canonicals,
)
from l1dbproto_spark.session import get_spark
from l1dbproto_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("graph-demo")
    docs = load_table(spark, sf_dir, "documents")

    print("== 1. ingest gate: data-quality check suite ==")
    report = (
        CheckSuite()
        .completeness("text", min_ratio=0.5)
        .uniqueness("doc_id")
        .row_count(min_rows=1)
        .satisfies("text_nonempty", F.length("text") > 0, min_ratio=0.5)
        .run(docs)
    )
    report.show(truncate=False)
    n_fail = failures(report).count()
    print(f"failed checks: {n_fail}")
    if n_fail:
        raise SystemExit("ingest gate failed — not proceeding to dedup")

    print("== 2. near-dup candidate pairs (MinHash-LSH) ==")
    sig = minhash_signatures(shingle_rows(docs, n=3), k=8)
    pairs = (
        minhash_candidate_pairs(minhash_band_buckets(sig, bands=4, rows_per_band=2))
        .select("doc_a", "doc_b")
        .cache()
    )
    print(f"candidate pairs: {pairs.count()}")

    print("== 3. dedup clusters (connected components) ==")
    comps = connected_components(pairs).cache()
    comps.groupBy("component").count().orderBy(F.desc("count")).show(5)

    print("== 4. cluster cohesion: clustering coefficient ==")
    cc = clustering_coefficient(pairs, "doc_a", "doc_b")
    cc.orderBy(F.desc("degree")).show(5)
    cc.agg(
        F.avg("coefficient").alias("mean_coeff"),
        F.sum("triangles").alias("tri_corners"),
    ).show()

    print("== 5. coreness of the pair graph ==")
    cores = core_numbers(pairs, "doc_a", "doc_b")
    cores.groupBy("core").count().orderBy("core").show()

    print("== 6. communities (LPA) vs components ==")
    lpa = label_propagation(pairs, "doc_a", "doc_b")
    n_comp = comps.select("component").distinct().count()
    n_comm = lpa.select("label").distinct().count()
    print(f"components: {n_comp}  LPA communities: {n_comm} "
          "(LPA >= components: propagation can split weakly-joined blobs, "
          "never merge disconnected ones)")
    assert n_comm >= n_comp

    print("== 7. quality-aware canonical selection (longest text wins) ==")
    scores = docs.select("doc_id", F.length("text").alias("score"))
    canon = resolve_canonicals(comps, scores, id_col="doc_id", score_col="score")
    canon.filter(F.col("is_canonical")).orderBy("component").show(5)
    kept = canon.filter(F.col("is_canonical")).count()
    clustered = canon.count()
    print(f"clustered docs: {clustered}  canonicals kept: {kept}  "
          f"dropped as duplicates: {clustered - kept}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Corpus scale-probe: run the core pipeline operators over 1x / 4x /
16x blowups of the documents table (5k -> 80k docs at sf0.1) and report
wall time + the fitted scaling exponent log(t_16/t_1)/log(16) — the
direct local evidence for the 100-TB question "is this operator's cost
linear in the corpus?" (exponent ~1.0 = linear scan/agg shapes; the
near-dup candidate stage is allowed >1 only insofar as its OUTPUT pair
count grows).

The blowup preserves structure deliberately: copy r of a document keeps
the text with a one-token suffix ' vr', so exact-dup families do not
collapse, shingle profiles stay near-identical (near-dup candidate
pressure scales with the corpus), and ids remain distinct
(doc_id * k + r). Perturbation and ids are deterministic.

Usage: python tools/scale_probe.py [k ...]  (default 1 4 16)
Prints one JSON line; the measured table lives in PERFORMANCE.md."""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from l1dbproto_spark.session import get_spark
from l1dbproto_spark.sources.catalog import load_table


def scaled_docs(spark, sf_dir: str, k: int):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if k == 1:
        return docs
    reps = spark.range(k).select(F.col("id").alias("_r"))
    return docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * k + F.col("_r")).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" v"), F.col("_r").cast("string")
        ).alias("text"),
    )


def probes(spark, docs):
    from l1dbproto_spark.operators.dedup import (
        exact_dedup_groups,
        minhash_band_buckets,
        minhash_candidate_pairs,
        minhash_signatures,
        shingle_rows,
    )
    from l1dbproto_spark.operators.embed import hashed_doc_embeddings
    from l1dbproto_spark.operators.langid import langid_scores, train_langid

    labeled = docs.filter(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("lang"),
    )
    cond, stats = train_langid(labeled, num_buckets=1024)
    cond_fast, stats_fast = train_langid(
        labeled, num_buckets=1024, portable=False
    )

    def minhash_pairs():
        sigs = minhash_signatures(shingle_rows(docs))
        return minhash_candidate_pairs(minhash_band_buckets(sigs)).count()

    return {
        "exact_dedup": lambda: exact_dedup_groups(docs).count(),
        "minhash_candidates": minhash_pairs,
        "langid_score": lambda: langid_scores(
            docs, cond, stats, num_buckets=1024
        ).count(),
        "langid_score_fast": lambda: langid_scores(
            docs, cond_fast, stats_fast, num_buckets=1024, portable=False
        ).count(),
        "hashed_embeddings": lambda: hashed_doc_embeddings(
            docs, dim=32
        ).count(),
    }


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale_probe")
    out: dict[str, dict[str, float]] = {}
    rows: dict[int, int] = {}
    for k in ks:
        docs = scaled_docs(spark, sf_dir, k).localCheckpoint()
        rows[k] = docs.count()
        for name, thunk in probes(spark, docs).items():
            thunk()  # untimed warm rep (codegen/page cache)
            t0 = time.time()
            n = thunk()
            dt = round(time.time() - t0, 3)
            out.setdefault(name, {})[str(k)] = dt
            out[name][f"n_{k}"] = n
    exps = {}
    k_lo, k_hi = str(min(ks)), str(max(ks))
    for name, d in out.items():
        if d[k_lo] > 0:
            exps[name] = round(
                math.log(d[k_hi] / d[k_lo]) / math.log(max(ks) / min(ks)), 3
            )
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "rows": rows,
                "times": out,
                "exponent": exps,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()

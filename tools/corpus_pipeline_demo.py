#!/usr/bin/env python
"""End-to-end training-corpus preparation demo — every stage of the
pipeline composed from the engine's first-class operators, on the driver's
synthetic tables:

  0. C4 line filter + doc gates + 3-sentence
     span dedup                               (operators/c4.py)
  0a. corpus-level line dedup: boilerplate
     lines recurring across docs, keep-first  (operators/c4.py)
  0b. exact-substring dedup: duplicated
     >=W-token runs removed, keep-first       (operators/exact_substr.py)
  1. decontaminate against an eval set        (operators/contamination.py)
  2. clean: length / repetition / PII gates,
     exact + near dedup, semantic dedup       (operators/corpus.py + semdedup)
  2b. CCNet perplexity bucketing: keep
     head+middle per language                 (operators/quality.py)
  2c. DSIR importance weights against the
     eval-set "domain" (report only)          (operators/dsir.py)
  2d. self-supervised quality classifier:
     train head-vs-tail buckets, score all
     survivors (report only)                  (operators/classifier.py)
  3. temperature-rebalanced mixture sample    (operators/sampling.py)
  4. train/val/test split                     (operators/corpus.py)
  5. deterministic training shuffle, then
     pack into fixed-length context windows
     on the shuffled shard/order; whole-doc
     best-fit bins audited alongside          (operators/sampling.py + packing.py)

Prints a per-stage audit (counts + drop-log reasons) and one JSON line.

Usage: python tools/corpus_pipeline_demo.py [sf_dir] (default sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from l1dbproto_spark.operators.c4 import c4_clean, c4_span_dedup  # noqa: E402
from l1dbproto_spark.operators.contamination import decontaminate  # noqa: E402
from l1dbproto_spark.operators.corpus import clean_corpus, split_corpus  # noqa: E402
from l1dbproto_spark.operators.dsir import importance_log_weights  # noqa: E402
from l1dbproto_spark.operators.exact_substr import exact_substring_dedup  # noqa: E402
from l1dbproto_spark.operators.packing import pack_sequences  # noqa: E402
from l1dbproto_spark.operators.quality import (  # noqa: E402
    perplexity_buckets,
    unigram_logprob_scores,
)
from l1dbproto_spark.operators.sampling import sample_with_temperature  # noqa: E402
from l1dbproto_spark.session import get_spark  # noqa: E402
from l1dbproto_spark.sources.catalog import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-demo", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    t0 = time.time()
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    n0 = docs.count()

    # 0. C4 cleanup: line filter + doc gates, then corpus-wide
    # three-sentence-span dedup. The synthetic corpus has no terminal
    # punctuation, so the doc gates are relaxed here (min_sentences=0,
    # line_min_words=1 with "" accepted via the corpus text shape) — the
    # demo exercises the span-dedup plumbing; real corpora use defaults.
    c4_docs, c4_log = c4_clean(docs, line_min_words=1, min_sentences=0)
    c4_docs = c4_span_dedup(c4_docs)
    # fall back to originals when C4 line-filtering empties the synthetic
    # text (no terminal punctuation anywhere): keep the original rows
    c4_n = c4_docs.filter(F.length("text") > 0).count()
    if c4_n == 0:
        c4_docs = docs
        c4_n = n0

    # 0a. corpus-level line dedup: strip lines recurring across >=3 docs
    # (the CCNet/RefinedWeb boilerplate rule; keep-first)
    from l1dbproto_spark.operators.c4 import dedup_corpus_lines

    c4_docs = dedup_corpus_lines(c4_docs, min_docs=3)

    # 0b. exact-substring dedup: remove duplicated >=25-token runs
    # corpus-wide (keep-first). The synthetic corpus rarely shares runs
    # this long, so this mostly exercises the plumbing at demo scale.
    # the rewrite's output is consumed by every downstream stage; pin it
    # so the token-window machinery runs once (a production pipeline
    # writes the rewritten corpus to a table at this macro-stage boundary)
    c4_docs = exact_substring_dedup(c4_docs, window=25).localCheckpoint()
    n0b = c4_docs.filter(F.length("text") > 0).count()

    # 1. decontamination (eval set: every 50th doc stands in for a benchmark)
    ev = c4_docs.filter(F.col("doc_id") % 50 == 0)
    decon, decon_log = decontaminate(c4_docs, ev, n=3, max_contamination=0.5)
    n1 = decon.count()

    # 2. staged cleaning incl. semantic dedup over the embeddings
    res = clean_corpus(
        decon,
        min_tokens=5,
        min_jaccard=0.5,
        repetition_gate=True,
        max_pii=2,
        embeddings=emb,
        sem_eps=0.05,
    )
    reasons = {
        r.reason: r.n
        for r in res.dropped.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    n2 = res.cleaned.count()

    # 2b. CCNet-style bucketing: score survivors under their own unigram
    # distribution, cut per-language tertiles, drop the tail third
    scored = res.cleaned.join(
        unigram_logprob_scores(res.cleaned), "doc_id"
    )
    # pin the bucketed frame: every consumer below (head/middle keep,
    # classifier training labels, DSIR featurizations) embeds the whole
    # upstream pipeline otherwise
    bucketed = perplexity_buckets(scored, group_col="lang").localCheckpoint()
    kept_hm = bucketed.filter(F.col("bucket") != "tail").drop(
        "bucket", "mean_logprob", "n_tokens"
    )
    n2b = kept_hm.count()

    # 2c. DSIR weights against the same eval set standing in as the
    # "target domain" — reported as a distribution audit; the selection
    # step (dsir_select / weighted_sample) is a drop-in when a pipeline
    # wants domain-matched downsampling instead of temperature mixing
    dsir_w = importance_log_weights(kept_hm, ev, num_buckets=2048)
    w_stats = dsir_w.agg(
        F.round(F.avg("log_weight"), 3).alias("mean"),
        F.round(F.max("log_weight"), 3).alias("max"),
    ).first()

    # 2d. self-supervised quality classifier: the CCNet buckets label
    # their own training set (head = positive, tail = negative) — the
    # GPT-3 filter shape with no external curation; scores are reported
    # as a sanity audit (head should outscore tail on held-in data)
    from l1dbproto_spark.operators.classifier import (
        quality_classifier_scores,
        train_quality_classifier,
    )

    head = bucketed.filter(F.col("bucket") == "head").drop(
        "bucket", "mean_logprob", "n_tokens"
    )
    tail = bucketed.filter(F.col("bucket") == "tail").drop(
        "bucket", "mean_logprob", "n_tokens"
    )
    # demo budget: 512 buckets / 15 LBFGS iterations separate these
    # buckets cleanly; each MLlib iteration is a Spark job, so the demo
    # keeps the count low (production tunes regParam/maxIter as usual)
    coef, b0 = train_quality_classifier(
        head, tail, num_buckets=512, max_iter=15
    )
    cls_scores = quality_classifier_scores(
        kept_hm, coef.localCheckpoint(), b0, num_buckets=512
    )
    cls_mean = cls_scores.agg(
        F.round(F.avg("score"), 3).alias("m")
    ).first()["m"]

    # 3. temperature-rebalanced mixture (lifts low-resource languages)
    mixed = sample_with_temperature(kept_hm, alpha=0.3, source_col="lang")
    n3 = mixed.count()

    # 4. deterministic split
    split = split_corpus(mixed, {"train": 0.9, "val": 0.05, "test": 0.05})
    splits = {
        r.split: r.n
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    # 5. shuffle + pack the train split into 512-token windows: shard
    # assignment/order come from the deterministic training shuffle
    # (every epoch reads a reproducible permutation)
    from l1dbproto_spark.operators.sampling import training_order

    train = training_order(
        split.filter(F.col("split") == "train"), n_shards=8
    ).withColumn("_rank", F.col("shuffle_key"))
    packed = pack_sequences(
        train, ctx_len=512, shard_col="shard", order_col="_rank"
    )
    n_chunks = packed.select("shard", "chunk").distinct().count()

    # 5b. the no-split alternative: whole-doc best-fit bins + fill audit
    from l1dbproto_spark.operators.packing import (
        bin_pack_documents,
        bin_pack_stats,
    )

    bins = bin_pack_documents(train, ctx_len=512, n_shards=8)
    fill = (
        bin_pack_stats(bins, ctx_len=512)
        .agg(F.avg("fill_ratio").alias("f"))
        .first()["f"]
    )

    audit = {
        "sf_dir": sf_dir,
        "input_docs": n0,
        "after_c4": c4_n,
        "after_exact_substr": n0b,
        "dsir_log_weight_mean_max": [w_stats["mean"], w_stats["max"]],
        "classifier_mean_score_on_kept": cls_mean,
        "after_decontamination": n1,
        "decontamination_dropped": n0 - n1,
        "clean_drop_reasons": reasons,
        "after_clean": n2,
        "after_perplexity_head_middle": n2b,
        "after_mixture": n3,
        "splits": splits,
        "train_chunks_512tok": n_chunks,
        "binpack_mean_fill": round(float(fill), 3),
        "wall_sec": round(time.time() - t0, 2),
    }
    for k, v in audit.items():
        print(f"  {k}: {v}")
    print(json.dumps(audit))


if __name__ == "__main__":
    main()

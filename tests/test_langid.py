"""operators/langid.py — char-n-gram NB language ID: featurization
window arithmetic, closed-form fit algebra, prior-only degenerate path,
and end-to-end accuracy on the planted two-lexicon corpus (the
driver-grade oracle compare lives in tests/test_unregistered_batteries).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from l1dbproto_spark.operators.langid import (
    char_ngram_features,
    langid_scores,
    train_langid,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_ngram_window_arithmetic(spark):
    # "abcd" -> 3-grams abc,bcd; 4-gram abcd; no 5-gram = 3 occurrences.
    # "ab" is below n_min -> zero rows. NULL text -> zero rows.
    # "  AbC  " normalizes to "abc" -> exactly one gram.
    docs = _docs(spark, [(1, "abcd"), (2, "ab"), (3, None), (4, "  AbC  ")])
    feats = char_ngram_features(docs, num_buckets=64)
    got = {
        r.doc_id: r.n
        for r in feats.groupBy("doc_id")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    }
    assert got == {1: 3, 4: 1}


def test_char_ngram_bucket_content(spark):
    """CONTENT check, not just counts: the buckets of 'abcd' must be the
    portable-md5 buckets of exactly {'abc', 'bcd', 'abcd'} — this is the
    assertion that catches a wrong gram window (e.g. the PySpark HOF
    arity trap where a default-arg lambda silently receives the element
    INDEX as the gram length)."""
    import hashlib

    from l1dbproto_spark.operators.langid import LANGID_SALT

    def bucket(gram: str, b: int = 64) -> int:
        h = hashlib.md5((LANGID_SALT + gram).encode()).hexdigest()[:15]
        return int(h, 16) % b

    feats = char_ngram_features(
        _docs(spark, [(1, "abcd")]), num_buckets=64
    ).collect()
    got = {(r.bucket, r.cnt) for r in feats}
    from collections import Counter

    want_counter = Counter(bucket(g) for g in ("abc", "bcd", "abcd"))
    assert got == {(b, c) for b, c in want_counter.items()}


def test_char_ngram_counts_occurrences_not_types(spark):
    # "aaaa" -> 3-grams aaa,aaa (2 occurrences of ONE type) + 4-gram
    # aaaa -> one bucket row per type, counts preserved.
    feats = char_ngram_features(
        _docs(spark, [(1, "aaaa")]), num_buckets=64
    ).collect()
    assert sum(r.cnt for r in feats) == 3
    assert {r.cnt for r in feats} == {2, 1}


def test_train_langid_closed_form_algebra(spark):
    # One doc per language with disjoint text; verify delta/log_default/
    # log_prior against the hand formula (s=1).
    labeled = spark.createDataFrame(
        [(0, "aaaa", "x"), (1, "zzzz", "y"), (2, "zzzz", "y")],
        "doc_id long, text string, lang string",
    )
    cond, stats = train_langid(labeled, num_buckets=32)
    st = {r.lang: r for r in stats.collect()}
    # lang x: grams aaa(2) aaaa(1) -> tc=3; lang y: zzz(4) zzzz(2) -> tc=6
    assert math.isclose(st["x"].log_default, math.log(1.0 / (3 + 32)))
    assert math.isclose(st["y"].log_default, math.log(1.0 / (6 + 32)))
    assert math.isclose(st["x"].log_prior, math.log(1.0 / 3.0))
    assert math.isclose(st["y"].log_prior, math.log(2.0 / 3.0))
    deltas = {(r.lang, r.bucket): r.delta for r in cond.collect()}
    # every delta is ln(c+1) with c in {1, 2, 4} here (no collisions
    # needed for the assertion: the multiset of deltas is fixed)
    assert sorted(round(d, 9) for d in deltas.values()) == sorted(
        round(math.log(c + 1.0), 9) for c in (2, 1, 4, 2)
    )


def test_scores_prior_only_for_short_text(spark):
    # a doc below n_min has zero grams: score = log_prior alone, so the
    # majority-prior language wins and n_grams = 0.
    labeled = spark.createDataFrame(
        [(0, "aaaa", "x"), (1, "zzzz", "y"), (2, "zzzz", "y")],
        "doc_id long, text string, lang string",
    )
    cond, stats = train_langid(labeled, num_buckets=32)
    preds = langid_scores(
        _docs(spark, [(10, "ab")]), cond, stats, num_buckets=32
    ).collect()
    assert len(preds) == 1
    assert preds[0].lang_pred == "y" and preds[0].n_grams == 0


def test_planted_two_lexicon_corpus_fully_separates(spark):
    from l1dbproto_spark.queries.text import charngram_langid

    out = charngram_langid(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500
    assert all(r.correct for r in out)
    # held-out docs (not in the doc_id%3==0 training third) also correct
    held = [r for r in out if r.doc_id % 3 != 0]
    assert held and all(r.lang_pred == r.lang_true for r in held)


def test_fast_hash_path_same_predictions(spark):
    """portable=False (JVM xxhash64 buckets — the production path) must
    classify the planted corpus identically; the plan must carry
    xxhash64 and no md5 in the featurization."""
    from l1dbproto_spark.queries.text import (
        _LANGID_BUCKETS,
        _LANGID_LEX0,
        _LANGID_LEX1,
    )

    lex0 = F.array(*[F.lit(w) for w in _LANGID_LEX0])
    lex1 = F.array(*[F.lit(w) for w in _LANGID_LEX1])
    is_l0 = F.col("doc_id") % 2 == 0
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda j: F.element_at(
                    F.when(is_l0, lex0).otherwise(lex1),
                    (F.pmod(F.col("id") * 7 + j, F.lit(5)) + 1).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    labeled = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "lang", F.when(is_l0, F.lit("l0")).otherwise(F.lit("l1"))
    )
    cond, stats = train_langid(
        labeled, num_buckets=_LANGID_BUCKETS, portable=False
    )
    preds = langid_scores(
        docs, cond, stats, num_buckets=_LANGID_BUCKETS, portable=False
    )
    plan = preds._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and "md5" not in plan, plan
    out = preds.collect()
    assert len(out) == 300
    truth = {r.doc_id: ("l0" if r.doc_id % 2 == 0 else "l1") for r in out}
    assert all(r.lang_pred == truth[r.doc_id] for r in out)

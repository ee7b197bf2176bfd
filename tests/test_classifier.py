"""Learned quality classifier (operators/classifier.py): separability on
synthetic labeled data, bit-level Python-reference scoring parity
(independent md5 featurization), deterministic Pareto filtering, and
plan guards on the corpus-scale scoring path."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from l1dbproto_spark.operators.classifier import (
    quality_classifier_scores,
    quality_filter,
    train_quality_classifier,
)

B = 256
GOOD = ["insight", "theorem", "careful", "study", "evidence", "method"]
BAD = ["click", "winner", "free", "deal", "buy", "now"]
NEUTRAL = ["the", "a", "of", "and", "with", "for"]


def _doc(rng: random.Random, vocab: list[str], n: int = 20) -> str:
    return " ".join(
        rng.choice(vocab if rng.random() < 0.7 else NEUTRAL)
        for _ in range(n)
    )


def _data(spark):
    rng = random.Random(7)
    pos = [(i, _doc(rng, GOOD)) for i in range(60)]
    neg = [(i, _doc(rng, BAD)) for i in range(60)]  # ids overlap: re-key test
    held = [(200 + i, _doc(rng, GOOD)) for i in range(20)] + [
        (300 + i, _doc(rng, BAD)) for i in range(20)
    ]
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(pos, schema),
        spark.createDataFrame(neg, schema),
        spark.createDataFrame(held, schema),
    )


@pytest.fixture(scope="module")
def fitted(spark):
    pos, neg, held = _data(spark)
    coef, b0 = train_quality_classifier(pos, neg, num_buckets=B)
    return coef.cache(), b0, held


def test_separates_held_out(spark, fitted):
    coef, b0, held = fitted
    scores = {
        r.doc_id: r.score
        for r in quality_classifier_scores(
            held, coef, b0, num_buckets=B
        ).collect()
    }
    good = [scores[d] for d in scores if d < 300]
    bad = [scores[d] for d in scores if d >= 300]
    assert sum(s > 0.5 for s in good) >= 19  # >=95% accuracy each side
    assert sum(s < 0.5 for s in bad) >= 19
    assert min(good) > max(bad) - 0.2  # wide margin overall


def _ref_score(text: str, coefs: dict[int, float], b0: float) -> float:
    toks = [t for t in text.lower().split() if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    logit = b0
    for g in grams:
        h = int(hashlib.md5(("dsir-v1" + g).encode()).hexdigest()[:15], 16)
        logit += coefs.get(h % B, 0.0)
    return 1.0 / (1.0 + math.exp(-logit))


def test_scores_match_python_reference(spark, fitted):
    coef, b0, held = fitted
    coefs = {r.bucket: r.coef for r in coef.collect()}
    got = {
        r.doc_id: r.score
        for r in quality_classifier_scores(
            held, coef, b0, num_buckets=B
        ).collect()
    }
    for row in held.collect():
        assert got[row.doc_id] == pytest.approx(
            _ref_score(row.text, coefs, b0), abs=1e-9
        ), row.doc_id


def test_featureless_doc_scores_intercept(spark, fitted):
    coef, b0, _ = fitted
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    [r] = quality_classifier_scores(df, coef, b0, num_buckets=B).collect()
    assert r.score == pytest.approx(1.0 / (1.0 + math.exp(-b0)), abs=1e-12)


def test_threshold_and_pareto_filters(spark, fitted):
    coef, b0, held = fitted
    scores = {
        r.doc_id: r.score
        for r in quality_classifier_scores(
            held, coef, b0, num_buckets=B
        ).collect()
    }
    kept = {
        r.doc_id
        for r in quality_filter(
            held, coef, b0, threshold=0.5, num_buckets=B
        ).collect()
    }
    assert kept == {d for d, s in scores.items() if s >= 0.5}
    # Pareto form: reproduce the deterministic draw in Python
    alpha = 9.0
    kept_p = {
        r.doc_id
        for r in quality_filter(
            held, coef, b0, num_buckets=B, pareto_alpha=alpha
        ).collect()
    }
    want_p = set()
    for d, s in scores.items():
        h = int(
            hashlib.md5(("qf-v1" + str(d)).encode()).hexdigest()[:12], 16
        )
        u = (h + 0.5) / float(1 << 48)
        if (1.0 - u) ** (-1.0 / alpha) - 1.0 > 1.0 - s:
            want_p.add(d)
    assert kept_p == want_p
    # the stochastic rule keeps at least the hard-threshold high scorers'
    # order: every kept doc under threshold-0.9 filtering is high-score
    assert want_p  # draw actually keeps something at alpha=9


def test_scoring_plan_broadcasts_bounded_coefs(spark, fitted):
    coef, b0, held = fitted
    out = quality_classifier_scores(held, coef, b0, num_buckets=B)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_clean_corpus_classifier_gate(spark, fitted):
    """The classifier gate drops low scorers with reason='classifier' and
    composes with the existing gates (drop log partitions the corpus)."""
    from l1dbproto_spark.operators.corpus import clean_corpus

    coef, b0, held = fitted
    res = clean_corpus(
        held,
        min_tokens=1,
        classifier_model=(coef, b0),
        min_classifier_score=0.5,
        classifier_buckets=B,
    )
    dropped = {
        r.doc_id: r.reason for r in res.dropped.collect()
    }
    kept = {r.doc_id for r in res.cleaned.collect()}
    scores = {
        r.doc_id: r.score
        for r in quality_classifier_scores(
            held, coef, b0, num_buckets=B
        ).collect()
    }
    for d, s in scores.items():
        if s < 0.5:
            assert dropped.get(d) == "classifier", d
    assert kept.isdisjoint(dropped)
    assert kept | set(dropped) == set(scores)


def test_save_load_roundtrip(spark, fitted, tmp_path):
    from l1dbproto_spark.operators.classifier import (
        load_classifier,
        save_classifier,
    )

    coef, b0, held = fitted
    save_classifier(coef, b0, str(tmp_path / "model"))
    coef2, b02 = load_classifier(spark, str(tmp_path / "model"))
    a = {
        r.doc_id: r.score
        for r in quality_classifier_scores(
            held, coef, b0, num_buckets=B
        ).collect()
    }
    b = {
        r.doc_id: r.score
        for r in quality_classifier_scores(
            held, coef2, b02, num_buckets=B
        ).collect()
    }
    assert a == b and b02 == b0

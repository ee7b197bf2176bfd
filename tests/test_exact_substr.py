"""Exact-substring dedup (operators/exact_substr.py): independent Python
reference parity on a planted-duplicate corpus, boundary cases at the
window threshold, and plan guards."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from l1dbproto_spark.operators.exact_substr import (
    duplicate_window_seeds,
    exact_substring_dedup,
)

W = 20


def _ref(texts: dict[int, str], window: int) -> dict[int, str]:
    """Direct Python transcription of the documented spec: global window
    occurrence lists, keep-first winners, covered-index removal,
    untouched docs byte-exact."""
    toks = {d: [t for t in s.split() if t] for d, s in texts.items()}
    occ: dict[tuple, list] = defaultdict(list)
    for d in sorted(toks):
        ts = toks[d]
        for s in range(len(ts) - window + 1):
            occ[tuple(ts[s : s + window])].append((d, s))
    removed: dict[int, set] = defaultdict(set)
    for places in occ.values():
        if len(places) > 1:
            winner = min(places)
            for d, s in places:
                if (d, s) != winner:
                    removed[d].update(range(s, s + window))
    return {
        d: (
            " ".join(t for i, t in enumerate(ts) if i not in removed[d])
            if d in removed
            else texts[d]
        )
        for d, ts in toks.items()
        for ts in [toks[d]]
    }


def _corpus() -> dict[int, str]:
    """8 docs of per-doc-unique filler with planted shared runs:
    - RUN_A (W + 10 tokens) in docs 1, 4, 6 at different offsets;
    - RUN_B (exactly W tokens) in docs 2 and 7;
    - RUN_C (W - 1 tokens, BELOW threshold) in docs 3 and 5;
    - doc 8 is shorter than W tokens."""
    run_a = [f"A{i}" for i in range(W + 10)]
    run_b = [f"B{i}" for i in range(W)]
    run_c = [f"C{i}" for i in range(W - 1)]

    def filler(d: int, k: int, n: int) -> list[str]:
        return [f"w{d}x{k}x{i}" for i in range(n)]

    docs = {
        1: filler(1, 0, 7) + run_a + filler(1, 1, 31),
        2: filler(2, 0, 40) + run_b + filler(2, 1, 3),
        3: filler(3, 0, 11) + run_c + filler(3, 1, 25),
        4: run_a + filler(4, 0, 50),
        5: filler(5, 0, 33) + run_c,
        6: filler(6, 0, 26) + run_a + filler(6, 1, 2) + run_a,
        7: run_b + filler(7, 0, 60),
        8: filler(8, 0, W - 3),
    }
    return {d: " ".join(ts) for d, ts in docs.items()}


def _run(spark, texts: dict[int, str]):
    df = spark.createDataFrame(
        [(d, t, f"s{d % 2}") for d, t in texts.items()],
        "doc_id long, text string, source string",
    )
    out = exact_substring_dedup(df, window=W)
    return {r.doc_id: (r.text, r.source) for r in out.collect()}


def test_matches_python_reference(spark):
    texts = _corpus()
    got = _run(spark, texts)
    want = _ref(texts, W)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d], d


def test_threshold_and_passthrough_semantics(spark):
    texts = _corpus()
    got = _run(spark, texts)
    # below-threshold shared run (W-1 tokens) survives everywhere
    assert "C0" in got[3][0] and "C0" in got[5][0]
    # untouched docs keep their text byte-exact, extra columns intact
    assert got[3][0] == texts[3] and got[8][0] == texts[8]
    assert got[8][1] == "s0"
    # the first occurrence (doc 1 by (doc_id, start)) keeps RUN_A;
    # later occurrences lose every token of it — including BOTH copies
    # inside doc 6
    assert "A0" in got[1][0]
    assert "A0" not in got[4][0] and "A0" not in got[6][0]
    # exactly-W run: doc 2 < doc 7 by doc id, doc 2 keeps it
    assert "B0" in got[2][0] and "B0" not in got[7][0]


def test_full_document_clone_empties_the_copy(spark):
    base = " ".join(f"t{i}" for i in range(3 * W))
    df = spark.createDataFrame(
        [(10, base), (20, base)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.text
        for r in exact_substring_dedup(df, window=W).collect()
    }
    assert out[10] == base
    assert out[20] == ""


def test_seed_report_shape(spark):
    texts = _corpus()
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    seeds = duplicate_window_seeds(df, window=W)
    rows = seeds.collect()
    assert all(r.n_occ > 1 for r in rows)
    # exactly one winner per duplicated hash, and it is the global min
    by_hash = defaultdict(list)
    for r in rows:
        by_hash[r.window_hash].append(r)
    for rs in by_hash.values():
        winners = [r for r in rs if r.is_winner]
        assert len(winners) == 1
        assert (winners[0].doc_id, winners[0].start) == min(
            (r.doc_id, r.start) for r in rs
        )


def test_plan_no_cartesian_no_forced_broadcast(spark):
    df = spark.createDataFrame(
        list(_corpus().items()), "doc_id long, text string"
    )
    out = exact_substring_dedup(df, window=W)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the removal set carries no mandatory broadcast: the logical plan
    # has no ResolvedHint rows (AQE decides at runtime)
    logical = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical

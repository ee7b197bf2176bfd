"""operators/evals.py BLEU + ROUGE-N: hand cases for the clipping /
brevity / multi-reference rules and an independent-Python-reference pin
for corpus BLEU (the driver-grade oracle compare of the planted query
lives in tests/test_unregistered_batteries.py)."""

from __future__ import annotations

import math
from collections import Counter

from l1dbproto_spark.operators.evals import (
    bleu_ngram_stats,
    bleu_report,
    rouge_n_scores,
)


def _preds(spark, rows):
    return spark.createDataFrame(
        rows, "example_id long, prediction string, references array<string>"
    )


def _py_bleu(examples, n_max=4):
    """Independent corpus BLEU (Papineni 2002), plain Python."""
    m = [0] * n_max
    t = [0] * n_max
    c = r = 0

    def grams(toks, n):
        return Counter(
            tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    for pred, refs in examples:
        pt = pred.split()
        rts = [x.split() for x in refs]
        c += len(pt)
        r += min((abs(len(rt) - len(pt)), len(rt)) for rt in rts)[1]
        for n in range(1, n_max + 1):
            pg = grams(pt, n)
            t[n - 1] += max(len(pt) - n + 1, 0)
            for g, cnt in pg.items():
                m[n - 1] += min(cnt, max(grams(rt, n)[g] for rt in rts))
    if any(x == 0 for x in m) or any(x == 0 for x in t):
        return 0.0
    bp = 1.0 if c >= r else math.exp(1.0 - r / c)
    return bp * math.exp(
        sum(math.log(m[i] / t[i]) for i in range(n_max)) / n_max
    )


def test_clipping_rule(spark):
    # "the the the" vs ref "the cat": 'the' appears 3x in pred but max
    # 1x in any ref -> match_1 = 1 (clipped), total_1 = 3.
    out = bleu_ngram_stats(
        _preds(spark, [(1, "the the the", ["the cat"])])
    ).collect()[0]
    assert out.match_1 == 1 and out.total_1 == 3
    assert out.match_2 == 0 and out.total_2 == 2
    assert out.pred_len == 3 and out.ref_len == 2


def test_effective_ref_length_ties_to_shorter(spark):
    # pred len 3; refs of len 2 and 4 are equally close -> pick 2.
    out = bleu_ngram_stats(
        _preds(spark, [(1, "a b c", ["x y", "x y z w"])])
    ).collect()[0]
    assert out.ref_len == 2


def test_clip_uses_max_over_references(spark):
    # 'a a' in pred; ref1 has 'a' once, ref2 twice -> clip at 2.
    out = bleu_ngram_stats(
        _preds(spark, [(1, "a a", ["a b", "a a"])])
    ).collect()[0]
    assert out.match_1 == 2


def test_corpus_bleu_matches_python_reference(spark):
    examples = [
        ("the cat sat on the mat", ["the cat sat on a mat", "a cat on the mat"]),
        ("he ate a fish", ["he ate the fish today"]),
        ("green ideas sleep furiously", ["colorless green ideas sleep furiously"]),
    ]
    rows = [(i, p, rs) for i, (p, rs) in enumerate(examples)]
    got = bleu_report(_preds(spark, rows)).collect()[0]
    want = _py_bleu(examples)
    assert abs(got.bleu - want) < 1e-9
    assert got.n_examples == 3
    # per-n precision sanity: exact integer ratios
    assert got.p_1 == round(
        sum(
            min(
                Counter(p.split())[w],
                max(Counter(r.split())[w] for r in rs),
            )
            for p, rs in examples
            for w in set(p.split())
        )
        / sum(len(p.split()) for p, _ in examples),
        9,
    )


def test_corpus_bleu_zero_when_an_order_is_dry(spark):
    # one-word predictions: no 2-grams anywhere -> bleu 0 (no smoothing).
    got = bleu_report(_preds(spark, [(1, "cat", ["cat"])])).collect()[0]
    assert got.bleu == 0.0


def test_rouge_multi_reference_max_and_edges(spark):
    # ROUGE-1 vs two refs: second ref overlaps 2/2 of pred -> best f1.
    out = rouge_n_scores(
        _preds(spark, [(1, "a b", ["x y z", "a b"]), (2, "", [""])]),
        n=1,
    ).collect()
    by_id = {r.example_id: r for r in out}
    assert by_id[1].f1 == 1.0 and by_id[1].precision == 1.0
    assert by_id[2].f1 == 1.0  # both-empty convention
    out2 = rouge_n_scores(
        _preds(spark, [(1, "a b c", ["x y"])]), n=2
    ).collect()[0]
    assert out2.f1 == 0.0 and out2.recall == 0.0


def _py_chrf(pred, refs, n_max=6, beta=2.0):
    """Python mirror of the documented chrF rule."""
    import re

    def chars(s):
        return re.sub(r"[ \t\r\n\f]+", "", s or "")

    def grams(s, n):
        return Counter(s[i : i + n] for i in range(len(s) - n + 1))

    best = None
    p0 = chars(pred)
    for ref in refs if refs else [""]:
        r0 = chars(ref)
        ps = rs = 0.0
        k = 0
        for n in range(1, n_max + 1):
            pg, rg = grams(p0, n), grams(r0, n)
            if not pg and not rg:
                continue
            k += 1
            m = sum(min(c, rg[g]) for g, c in pg.items())
            ps += m / sum(pg.values()) if pg else 0.0
            rs += m / sum(rg.values()) if rg else 0.0
        if k == 0:
            score = 1.0
        else:
            p_mean, r_mean = ps / k, rs / k
            if p_mean == 0.0 or r_mean == 0.0:
                score = 0.0
            else:
                b2 = beta * beta
                score = round(
                    (1 + b2) * p_mean * r_mean / (b2 * p_mean + r_mean), 9
                )
        best = score if best is None else max(best, score)
    return best


def test_chrf_matches_python_mirror(spark):
    from l1dbproto_spark.operators.evals import chrf_scores

    examples = [
        (1, "the cat sat", ["the cat sat on the mat", "a cat sat"]),
        (2, "completely different", ["nothing shared here at all"]),
        (3, "abc", ["abc"]),
        (4, "", [""]),
        (5, "ab", ["xy"]),
    ]
    got = {
        r.example_id: r.chrf
        for r in chrf_scores(_preds(spark, examples)).collect()
    }
    for ex_id, pred, refs in examples:
        want = _py_chrf(pred, refs)
        assert abs(got[ex_id] - want) < 1e-9, (ex_id, got[ex_id], want)
    assert got[3] == 1.0 and got[4] == 1.0 and got[5] == 0.0


def _py_lcs(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        row = [0]
        for j, y in enumerate(b, 1):
            row.append(max(prev[j], row[j - 1], prev[j - 1] + (x == y)))
        prev = row
    return prev[-1]


def test_rouge_l_lcs_dp_and_edges(spark):
    from l1dbproto_spark.operators.evals import rouge_l_scores

    examples = [
        (1, "the cat sat on the mat", ["the cat on a mat", "a cat the mat sat"]),
        (2, "a b c d", ["d c b a"]),           # LCS 1 despite full overlap
        (3, "x y z", ["x y z"]),               # exact -> 1.0
        (4, "", [""]),                          # both empty -> 1.0
        (5, "a b", ["z"]),                      # disjoint -> 0.0
        (6, "police killed the gunman", ["the gunman police killed", "police kill the gunman"]),
    ]
    got = {r.example_id: r for r in rouge_l_scores(_preds(spark, examples)).collect()}
    for ex_id, pred, refs in examples:
        pt = pred.split()
        best = None
        for ref in refs:
            rt = ref.split()
            m = _py_lcs(pt, rt)
            if not pt and not rt:
                f = 1.0
            elif not pt or not rt or m == 0:
                f = 0.0
            else:
                f = round(2.0 * m / (len(pt) + len(rt)), 9)
            best = f if best is None else max(best, f)
        assert abs(got[ex_id].f1 - best) < 1e-9, (ex_id, got[ex_id].f1, best)
    assert got[2].lcs == 1 and got[3].f1 == 1.0 and got[4].f1 == 1.0
    assert got[5].f1 == 0.0
    # Lin 2004's own example: LCS("police killed the gunman",
    # "the gunman police killed") = 2 ("police killed"... actually
    # "the gunman" / "police killed" both length 2)
    assert got[6].lcs >= 2


def test_wer_levenshtein_dp_and_edges(spark):
    from l1dbproto_spark.operators.evals import wer_scores

    def _py_lev(a, b):
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            row = [i]
            for j, y in enumerate(b, 1):
                row.append(min(prev[j] + 1, row[j - 1] + 1, prev[j - 1] + (x != y)))
            prev = row
        return prev[-1]

    examples = [
        (1, "the cat sat", ["the cat sat"]),            # 0 edits
        (2, "the cat sat", ["the dog sat on mat"]),     # sub + 2 dels? -> DP
        (3, "a b c d", ["b c d e", "a b c d x"]),       # multi-ref min
        (4, "", [""]),                                   # both empty -> 0.0
        (5, "a b", [""]),                                # empty ref -> NULL wer
        (6, "", ["x y z"]),                              # empty pred -> 3 dels
    ]
    got = {r.example_id: r for r in wer_scores(_preds(spark, examples)).collect()}
    for ex_id, pred, refs in examples:
        pt = pred.split()
        best = None
        for ref in refs:
            rt = ref.split()
            e = _py_lev(pt, rt)
            w = (0.0 if e == 0 else None) if not rt else round(e / len(rt), 9)
            cand = (float("inf") if w is None else w, e, len(rt), w)
            best = cand if best is None or cand < best else best
        assert got[ex_id].edits == best[1], (ex_id, got[ex_id], best)
        if best[3] is None:
            assert got[ex_id].wer is None
        else:
            assert abs(got[ex_id].wer - best[3]) < 1e-9
    assert got[1].wer == 0.0 and got[4].wer == 0.0
    assert got[5].wer is None and got[5].edits == 2
    assert got[6].edits == 3 and abs(got[6].wer - 1.0) < 1e-9

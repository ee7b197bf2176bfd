"""BPE tokenization (operators/bpe.py): independent Python reference
parity for merge learning and token counting, roundtrip/boundary
properties, and integration with the packing layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.bpe import (
    apply_bpe_to_words,
    bpe_token_counts,
    bpe_tokenize,
    learn_bpe,
    word_frequencies,
)

CORPUS = {
    1: "the cat sat on the mat",
    2: "the cat ate the rat",
    3: "low lower lowest low low",
    4: "newer newest new new newer",
    5: "ababab ababab abab",
    6: "",
    7: "the the the them theme",
}


# --- independent reference (deliberately different construction) -------


def _ref_learn(texts, n_merges, min_pair_count=2):
    freqs = {}
    for t in texts.values():
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    vocab = [(list(w), f) for w, f in freqs.items()]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab:
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            break
        # max count; ties -> lexicographically smallest pair
        best_pair = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best_pair[1] < min_pair_count:
            break
        a, b = best_pair[0]
        merges.append((a, b))
        vocab = [(_ref_apply_one(s, a, b), f) for s, f in vocab]
    return merges


def _ref_apply_one(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if syms[i] == a and i + 1 < len(syms) and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_encode(word, merges):
    syms = list(word)
    for a, b in merges:
        syms = _ref_apply_one(syms, a, b)
    return syms


def _df(spark):
    return spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )


def test_learn_matches_reference(spark):
    merges = learn_bpe(word_frequencies(_df(spark)), n_merges=30)
    want = _ref_learn(CORPUS, 30)
    assert merges == want
    assert 0 < len(merges) <= 30


def test_counts_match_reference(spark):
    merges = learn_bpe(word_frequencies(_df(spark)), n_merges=20)
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(_df(spark), merges).collect()
    }
    want = {
        d: sum(len(_ref_encode(w, merges)) for w in t.split())
        for d, t in CORPUS.items()
    }
    assert got == want
    assert got[6] == 0  # empty doc


def test_tokenize_roundtrip_and_consistency(spark):
    merges = learn_bpe(word_frequencies(_df(spark)), n_merges=25)
    toks = {
        r.doc_id: list(r.tokens)
        for r in bpe_tokenize(_df(spark), merges).collect()
    }
    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(_df(spark), merges).collect()
    }
    for d, t in CORPUS.items():
        # lossless: concatenated tokens reproduce the text minus whitespace
        assert "".join(toks[d]) == "".join(t.split()), d
        assert len(toks[d]) == counts[d], d


def test_zero_merges_counts_characters(spark):
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(_df(spark), merges=[]).collect()
    }
    want = {d: sum(len(w) for w in t.split()) for d, t in CORPUS.items()}
    assert got == want


def test_no_repeated_pairs_learns_nothing(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef"), (2, "gh ij kl")], "doc_id long, text string"
    )
    # every adjacent pair occurs once -> below min_pair_count=2
    assert learn_bpe(word_frequencies(df), n_merges=10) == []


def test_precomputed_vocab_path_matches(spark):
    df = _df(spark)
    merges = learn_bpe(word_frequencies(df), n_merges=15)
    words = df.select(
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
        ).alias("word")
    )
    vocab = apply_bpe_to_words(words, merges)
    a = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(df, merges).collect()
    }
    b = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(df, merges, vocab=vocab).collect()
    }
    assert a == b
    # vocab rows carry consistent tokens/counts
    for r in vocab.collect():
        assert len(r.tokens) == r.n_tokens
        assert "".join(r.tokens) == r.word


def test_packing_consumes_bpe_counts(spark):
    from l1dbproto_spark.operators.packing import pack_sequences

    df = _df(spark)
    merges = learn_bpe(word_frequencies(df), n_merges=20)
    with_counts = df.join(bpe_token_counts(df, merges), "doc_id")
    packed = pack_sequences(
        with_counts.filter(F.col("n_bpe_tokens") > 0),
        ctx_len=16,
        n_shards=2,
        count_col="n_bpe_tokens",
    )
    rows = packed.collect()
    assert rows
    # no chunk overflows the context length
    from collections import defaultdict

    fill = defaultdict(int)
    for r in rows:
        fill[(r.shard, r.chunk)] += r.tokens_in_chunk
    assert all(v <= 16 for v in fill.values())


def test_merges_persist_roundtrip(spark, tmp_path):
    from l1dbproto_spark.operators.bpe import load_bpe, save_bpe

    merges = learn_bpe(word_frequencies(_df(spark)), n_merges=25)
    save_bpe(merges, spark, str(tmp_path / "bpe"))
    loaded = load_bpe(spark, str(tmp_path / "bpe"))
    assert loaded == merges  # rank order preserved exactly
    a = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(_df(spark), merges).collect()
    }
    b = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(_df(spark), loaded).collect()
    }
    assert a == b

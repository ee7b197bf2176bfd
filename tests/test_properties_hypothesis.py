"""Property-based tests (hypothesis) for the packing and quantization
operators — randomized inputs, algebraic invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from l1dbproto_spark.operators.packing import pack_sequences
from l1dbproto_spark.operators.quantize import quantize_embeddings

_SPARK = {}


def _get_spark():
    # reuse the session across hypothesis examples (fixture-per-example would
    # rebuild plans only, but session startup is the expensive part)
    if "s" not in _SPARK:
        from l1dbproto_spark.session import get_spark

        _SPARK["s"] = get_spark("hypothesis", cpus=8)
    return _SPARK["s"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=30),
    ctx=st.integers(min_value=2, max_value=17),
    shards=st.integers(min_value=1, max_value=4),
)
def test_packing_invariants_random(n_tokens, ctx, shards):
    spark = _get_spark()
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(n_tokens)],
        ["doc_id", "text"],
    )
    pdf = pack_sequences(docs, ctx_len=ctx, n_shards=shards).toPandas()
    # token conservation per document
    per_doc = pdf.groupby("doc_id").agg(
        assigned=("tokens_in_chunk", "sum"), n=("n_tokens", "first")
    )
    assert (per_doc.assigned == per_doc.n).all()
    assert dict(per_doc.n) == {i: n for i, n in enumerate(n_tokens)}
    # every chunk except each shard's last is exactly full; none overflows
    stats = pdf.groupby(["shard", "chunk"]).tokens_in_chunk.sum()
    for shard in {s for s, _ in stats.index}:
        chunks = stats.loc[shard].sort_index()
        assert (chunks.iloc[:-1] == ctx).all()
        assert chunks.iloc[-1] <= ctx
    # chunk membership spans are contiguous positions (no doc appears in
    # non-adjacent chunks)
    for _, g in pdf.groupby(["shard", "doc_id"]):
        cs = sorted(g.chunk)
        assert cs == list(range(cs[0], cs[0] + len(cs)))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100.0,
                max_value=100.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=1,
            max_size=16,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_quantization_error_bound_random(vecs):
    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = quantize_embeddings(df).collect()
    for r in rows:
        orig = [float(x) for x in vecs[r.vec_id]]
        if max(abs(x) for x in orig) == 0:
            assert all(q == 0 for q in r.qvec)
            continue
        # int8 range and per-element dequantization error <= scale/2
        assert all(-127 <= q <= 127 for q in r.qvec)
        for q, x in zip(r.qvec, orig):
            assert abs(q * r.qscale - x) <= r.qscale / 2 + 1e-9


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=12),
    chunk=st.integers(min_value=2, max_value=20),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunking_invariants_random(n_tokens, chunk, overlap_frac):
    from l1dbproto_spark.operators.packing import chunk_documents

    overlap = min(chunk - 1, int(chunk * overlap_frac))
    stride = chunk - overlap
    spark = _get_spark()
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(n_tokens)],
        ["doc_id", "text"],
    )
    pdf = chunk_documents(docs, chunk, overlap).toPandas()
    for i, n in enumerate(n_tokens):
        g = pdf[pdf.doc_id == i].sort_values("chunk_index")
        # dense indices, strided starts
        assert list(g.chunk_index) == list(range(len(g)))
        assert (g.start_tok == 1 + g.chunk_index * stride).all()
        # every token covered: union of [start, start+n_chunk) == [1, n]
        covered = set()
        for st_, k in zip(g.start_tok, g.n_chunk_tokens):
            covered |= set(range(st_, st_ + k))
        assert covered == set(range(1, n + 1)), (i, n, chunk, overlap)
        # all but the last window are full width
        assert (g.n_chunk_tokens.iloc[:-1] == chunk).all()
        # chunk text round-trips the token slice
        for st_, k, txt in zip(g.start_tok, g.n_chunk_tokens, g.chunk_text):
            assert txt == " ".join(f"t{j}" for j in range(st_ - 1, st_ - 1 + k))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=25),
    ctx=st.integers(min_value=2, max_value=19),
    shards=st.integers(min_value=1, max_value=3),
)
def test_packing_custom_count_col_random(counts, ctx, shards):
    """Pluggable token counts: packing over an arbitrary pre-computed
    count column obeys the same conservation/capacity/contiguity
    invariants, regardless of the text (which is deliberately a constant
    here — the counts alone drive the map)."""
    spark = _get_spark()
    docs = spark.createDataFrame(
        [(i, "irrelevant text", n) for i, n in enumerate(counts)],
        ["doc_id", "text", "bpe_tokens"],
    )
    pdf = pack_sequences(
        docs, ctx_len=ctx, n_shards=shards, count_col="bpe_tokens"
    ).toPandas()
    per_doc = pdf.groupby("doc_id").agg(
        assigned=("tokens_in_chunk", "sum"), n=("n_tokens", "first")
    )
    assert (per_doc.assigned == per_doc.n).all()
    assert dict(per_doc.n) == {i: n for i, n in enumerate(counts)}
    stats = pdf.groupby(["shard", "chunk"]).tokens_in_chunk.sum()
    for shard in {s for s, _ in stats.index}:
        chunks = stats.loc[shard].sort_index()
        assert (chunks.iloc[:-1] == ctx).all()
        assert chunks.iloc[-1] <= ctx


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=10,
    ),
    window=st.integers(min_value=2, max_value=5),
)
def test_exact_substring_dedup_matches_reference_random(docs, window):
    """Random small-alphabet corpora (duplicates guaranteed at these
    sizes) against the documented-spec Python reference from
    test_exact_substr."""
    from tests.test_exact_substr import _ref
    from l1dbproto_spark.operators.exact_substr import exact_substring_dedup

    spark = _get_spark()
    texts = {i: " ".join(ts) for i, ts in enumerate(docs)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.text
        for r in exact_substring_dedup(df, window=window).collect()
    }
    want = _ref(texts, window)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="xyz", min_size=1, max_size=6),
        min_size=1,
        max_size=30,
    ),
    n_merges=st.integers(min_value=0, max_value=12),
)
def test_bpe_random_corpus_properties(words, n_merges):
    """BPE invariants on random corpora: learned merges match the
    reference learner, token counts match reference encoding, and the
    count is bounded by [1, len(word)] per word."""
    from tests.test_bpe import _ref_encode, _ref_learn
    from l1dbproto_spark.operators.bpe import (
        bpe_token_counts,
        learn_bpe,
        word_frequencies,
    )

    spark = _get_spark()
    texts = {0: " ".join(words), 1: " ".join(words[::2])}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    merges = learn_bpe(word_frequencies(df), n_merges=n_merges)
    assert merges == _ref_learn(texts, n_merges)
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(df, merges).collect()
    }
    for d, t in texts.items():
        toks = t.split()
        want = sum(len(_ref_encode(w, merges)) for w in toks)
        assert got[d] == want
        assert len(toks) <= got[d] <= sum(len(w) for w in toks)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(
        st.one_of(
            st.integers(min_value=-5, max_value=40), st.none()
        ),
        min_size=1,
        max_size=30,
    ),
    ctx=st.integers(min_value=2, max_value=17),
    shards=st.integers(min_value=1, max_value=4),
)
def test_bin_packing_invariants_random(counts, ctx, shards):
    """BFD whole-doc packing: capacity never exceeded, every positive-count
    doc packed exactly once (null/non-positive excluded), oversize docs
    truncated to ctx, bins within the ceil lower bound and the naive
    next-fit upper bound per shard."""
    from l1dbproto_spark.operators.packing import bin_pack_documents

    spark = _get_spark()
    docs = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "doc_id long, cnt long"
    )
    pdf = bin_pack_documents(
        docs, ctx_len=ctx, n_shards=shards, count_col="cnt", text_col="?"
    ).toPandas()
    packable = {i for i, c in enumerate(counts) if c is not None and c > 0}
    assert set(pdf["doc_id"]) == packable
    assert pdf["doc_id"].is_unique
    fills = pdf.groupby(["shard", "bin"])["tokens_packed"].sum()
    assert (fills <= ctx).all()
    expect = pdf["n_tokens"].clip(upper=ctx)
    assert (pdf["tokens_packed"] == expect).all()
    for shard, grp in pdf.groupby("shard"):
        used = grp["bin"].nunique()
        total = int(grp["tokens_packed"].sum())
        assert used >= -(-total // ctx)
        rem, naive = 0, 0
        for t in grp.sort_values("doc_id")["tokens_packed"]:
            if t > rem:
                naive += 1
                rem = ctx
            rem -= int(t)
        assert used <= naive


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa bb.", "cc dd.", "ee ff.", "", "  ", "gg."]),
            min_size=0,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    ),
    min_docs=st.integers(min_value=2, max_value=3),
)
def test_line_dedup_differential_random(docs, min_docs):
    """dedup_corpus_lines (keep_first) == a pure-Python re-derivation of
    the pinned rule on random small corpora built from a shared line
    vocabulary (maximizing cross-doc collisions)."""
    from l1dbproto_spark.operators.c4 import dedup_corpus_lines

    spark = _get_spark()
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in dedup_corpus_lines(df, min_docs=min_docs).collect()}

    # reference
    from collections import defaultdict

    occ = defaultdict(list)  # trimmed line -> [(doc, idx)]
    for i, lines in rows:
        for j, ln in enumerate(lines.split("\n")):
            if ln.strip():
                occ[ln.strip()].append((i, j))
    doomed = set()
    for key, positions in occ.items():
        if len({d for d, _ in positions}) >= min_docs:
            for pos in sorted(positions)[1:]:
                doomed.add(pos)
    want = {}
    for i, lines in rows:
        kept = [
            ln
            for j, ln in enumerate(lines.split("\n"))
            if (i, j) not in doomed
        ]
        want[i] = "\n".join(kept)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=5),
        min_size=1,
        max_size=25,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_hashed_embedding_invariants_random(words, seed):
    """Feature-hashing embeddings are a function of the token MULTISET:
    (a) permuting tokens changes nothing; (b) self-concatenation scales
    the raw vector by exactly 2 (so the L2-normalized form is
    identical)."""
    import random as _random

    from l1dbproto_spark.operators.embed import hashed_doc_embeddings

    spark = _get_spark()
    text = " ".join(words)
    rng = _random.Random(seed)
    shuffled_words = list(words)
    rng.shuffle(shuffled_words)
    rows = [
        (1, text),
        (2, " ".join(shuffled_words)),
        (3, (text + " " + text)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    raw = {
        r.doc_id: list(r.embedding)
        for r in hashed_doc_embeddings(df, dim=16, l2_normalize=False).collect()
    }
    assert raw[1] == raw[2]  # permutation invariance, bit-exact
    assert raw[3] == [2.0 * x for x in raw[1]]  # exact integer doubling
    norm = {
        r.doc_id: list(r.embedding)
        for r in hashed_doc_embeddings(df, dim=16).collect()
    }
    assert norm[1] == norm[2]


# --- weburl.normalize_url: algebraic properties over generated URLs ------

_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
    min_size=1,
    max_size=8,
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_pname = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
)
_pval = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789%.~", min_size=0, max_size=8
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    labels=st.lists(_label, min_size=1, max_size=4),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.sampled_from(["", "/", "/a/b", "/a%20b/.x"]),
    params=st.lists(st.tuples(_pname, _pval), max_size=5),
    tracking=st.lists(
        st.sampled_from(["utm_source=x", "utm_c", "fbclid=1", "gclid=", "ref=nav"]),
        max_size=3,
    ),
    fragment=st.sampled_from(["", "#top", "#a/b?c=d"]),
    shuffle_seed=st.integers(min_value=0, max_value=999),
)
def test_normalize_url_fixpoint_and_insensitivity(
    scheme, labels, port, path, params, tracking, fragment, shuffle_seed
):
    """normalize_url is a FIXPOINT (its output normalizes to itself) and
    is insensitive to query-param order, tracking params, and fragments —
    the properties that make it a dedup key."""
    import random

    from l1dbproto_spark.operators.weburl import normalize_url

    spark = _get_spark()
    host = ".".join(labels)
    base_params = [f"{k}={v}" for k, v in params]
    mixed = base_params + list(tracking)
    rng = random.Random(shuffle_seed)
    shuffled = mixed[:]
    rng.shuffle(shuffled)

    def q(ps):
        return ("?" + "&".join(ps)) if ps else ""

    u1 = f"{scheme}://{host}{port}{path}{q(mixed)}{fragment}"
    u2 = f"{scheme.lower()}://{host}{port}{path}{q(shuffled)}"
    u3 = f"{scheme.upper()}://{host}{port}{path}{q(base_params)}#other"
    df = spark.createDataFrame(
        [(u1,), (u2,), (u3,)], "url string"
    ).select(normalize_url(F.col("url")).alias("n"))
    n1, n2, n3 = [r.n for r in df.collect()]
    assert n1 is not None and n1 == n2 == n3
    # fixpoint: renormalizing the canonical form changes nothing
    again = (
        spark.createDataFrame([(n1,)], "url string")
        .select(normalize_url(F.col("url")).alias("n"))
        .collect()[0]
        .n
    )
    assert again == n1

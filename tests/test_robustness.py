"""Garbage-resilience sweep: every text-facing operator must handle
null text, empty/whitespace-only docs, pathological single tokens,
non-ASCII (CJK/emoji/accents), and control characters without raising —
at 100 TB all of these exist in the corpus. Behavioral pins, not just
no-crash: row-count conventions and null handling are asserted per
family."""

from __future__ import annotations

from pyspark.sql import functions as F

ROWS = [
    (1, None),
    (2, ""),
    (3, "   \t\n  "),
    (4, "x" * 10_000),
    (5, "héllo wörld 你好 世界 🙂 emoji test"),
    (6, "a\x00b control\x01chars here ok fine"),
    (7, "normal text that is completely fine and long enough to pass"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_cleaning_family(spark):
    from l1dbproto_spark.operators.c4 import (
        c4_clean,
        c4_span_dedup,
        dedup_corpus_lines,
    )
    from l1dbproto_spark.operators.corpus import clean_corpus
    from l1dbproto_spark.operators.exact_substr import exact_substring_dedup
    from l1dbproto_spark.operators.html import strip_html

    df = _df(spark)
    res = clean_corpus(df, min_tokens=1)
    kept = {r.doc_id for r in res.cleaned.collect()}
    dropped = {r.doc_id: r.reason for r in res.dropped.collect()}
    # the partition contract: every input doc is kept OR logged — the
    # null-text doc used to vanish from both (fixed: null n_tok ->
    # too_short)
    assert kept | set(dropped) == {r[0] for r in ROWS}
    assert kept.isdisjoint(dropped)
    assert dropped.get(1) == "too_short"  # null text -> length gate
    # empty and whitespace-only normalize identically: one survives as
    # the exact-dup canonical, the other is logged
    assert dropped.get(3) == "exact_dup"
    assert 2 in kept and 4 in kept and 7 in kept
    # text rewriters preserve row count and never null out non-null text
    assert exact_substring_dedup(df, window=3).count() == 7
    assert strip_html(df).count() == 7
    assert c4_span_dedup(df).count() == 7
    assert dedup_corpus_lines(df).count() == 7
    # null-id docs pass through the corpus-wide rewriters with their TEXT
    # INTACT (eighth found-and-fixed: the id-keyed reassembly join wiped
    # them to '' and multiple null-id docs collided into one group)
    nid = spark.createDataFrame(
        [(None, "keep me\nunique content"), (None, "second null doc"),
         (7, "normal doc line.")],
        "doc_id long, text string",
    )
    for rewriter in (dedup_corpus_lines, c4_span_dedup):
        out = sorted(
            (str(r.doc_id), r.text) for r in rewriter(nid).collect()
        )
        assert ("None", "keep me\nunique content") in out
        assert ("None", "second null doc") in out
        assert len(out) == 3
    cleaned, _ = c4_clean(df)
    assert cleaned.count() == 0  # nothing here has 3 sentences


def test_scoring_family(spark):
    from l1dbproto_spark.operators.dsir import importance_log_weights
    from l1dbproto_spark.operators.quality import (
        bigram_logprob_scores,
        collocations,
        gopher_quality_signals,
        repetition_signals,
        unigram_logprob_scores,
    )

    df = _df(spark)
    # aggregation scorers: the null-text doc contributes no token rows
    # and is absent; every other doc (incl. empty-string, which
    # tokenizes to [''] under the space-run rule) is present
    for scorer in (unigram_logprob_scores, bigram_logprob_scores):
        ids = {r.doc_id for r in scorer(df).collect()}
        assert ids == {2, 3, 4, 5, 6, 7}, scorer.__name__
    # projection batteries keep every row
    assert gopher_quality_signals(df).count() == 7
    assert repetition_signals(df).count() == 7
    assert collocations(df, min_count=1).count() > 0
    # DSIR: id-spine contract — every input doc gets a weight (0 for
    # featureless), none is NaN/inf
    w = importance_log_weights(df, df.filter(F.col("doc_id") == 7))
    rows = {r.doc_id: r.log_weight for r in w.collect()}
    assert set(rows) == {r[0] for r in ROWS}
    assert rows[1] == 0.0
    assert all(x == x and abs(x) != float("inf") for x in rows.values())


def test_counting_and_report_family(spark):
    from l1dbproto_spark.operators.bpe import (
        bpe_token_counts,
        learn_bpe,
        word_frequencies,
    )
    from l1dbproto_spark.operators.dedup import (
        duplication_density,
        exact_dedup_groups,
    )
    from l1dbproto_spark.operators.pii import pii_signals
    from l1dbproto_spark.operators.report import corpus_report

    df = _df(spark)
    merges = learn_bpe(word_frequencies(df), n_merges=10)
    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(df, merges).collect()
    }
    assert set(counts) == {r[0] for r in ROWS}
    assert counts[1] == 0 and counts[2] == 0 and counts[3] == 0
    assert counts[4] >= 1  # the 10k-char token counts as >= 1 BPE token
    dd = {r.doc_id: r for r in duplication_density(df, n=2).collect()}
    assert set(dd) == {r[0] for r in ROWS}
    # degenerate docs (null/empty/whitespace) share one empty shingle
    # and flag each other as duplicates — the documented convention
    assert dd[1].n_ngrams == 1 and dd[1].dup_density == 1.0
    assert dd[7].dup_density == 0.0
    assert exact_dedup_groups(df).count() == 6  # null fp groups too
    assert pii_signals(df).count() == 7
    rep = corpus_report(df, approx=False).collect()[0]
    assert rep.n_docs == 7 and rep.empty_frac > 0


def test_embedding_family_degenerate_vectors(spark):
    """Zero-norm, NULL, NaN, and wrong-dimension vectors must not crash
    the cosine family (ANSI mode turns the zero division into a hard
    error without the norm guard) — degenerate rows are excluded, sane
    rows still rank."""
    import random

    from l1dbproto_spark.operators.quantize import quantized_topk
    from l1dbproto_spark.operators.semdedup import semantic_dedup
    from l1dbproto_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)
    ] + [
        (100, None),
        (101, [float("nan")] * 8),
        (102, [0.0] * 8),
        (103, [rng.uniform(-1, 1) for _ in range(4)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2)
    res = brute_force_topk(df, q, k=3).collect()
    assert len(res) == 6
    # degenerate ids never appear as neighbors
    assert all(r.neighbor_id not in (100, 101, 102) for r in res)
    # n_bits=2 -> 4 buckets over 20 sane vectors: co-bucket members
    # guaranteed; the NaN row must not resurface as a bucket mate
    lsh = lsh_bucketed_topk(df, q, k=3, n_bits=2).collect()
    assert len(lsh) >= 1
    assert all(r.neighbor_id not in (100, 101, 102) for r in lsh)
    # amplified multi-table form: same degenerate-vector contract — NULL /
    # NaN / zero-norm rows may enter the bucket join (their buckets are
    # well-defined integers) but the re-rank's norm guard keeps them out
    # of the output on both sides; wrong-dim row 103 (4 < n_bits positions
    # wrap) must neither crash nor rank
    from l1dbproto_spark.operators.similarity import multitable_lsh_topk

    mt = multitable_lsh_topk(
        df, q, k=3, n_bits=4, n_tables=2, multiprobe=1, dim=8
    ).collect()
    assert len(mt) >= 1
    assert all(r.neighbor_id not in (100, 101, 102) for r in mt)
    assert all(r.query_id in (0, 1) for r in mt)
    assert quantized_topk(df, q, k=3).count() == 6
    cent = spark.createDataFrame(
        [(0, [0.5] * 8), (1, [-0.5] * 8)], "cluster int, centroid array<double>"
    )
    kept, dropped = semantic_dedup(df, cent, eps=0.5)
    # the keep/drop split still covers only well-defined vectors' drops
    assert dropped.count() >= 0 and kept.count() >= 1


def test_empty_corpus_everywhere(spark):
    """A fully-filtered (empty) corpus is legitimate pipeline state —
    downstream operators must return empty/neutral results, not raise."""
    from l1dbproto_spark.operators.bpe import learn_bpe, word_frequencies
    from l1dbproto_spark.operators.corpus import clean_corpus, split_corpus
    from l1dbproto_spark.operators.exact_substr import exact_substring_dedup
    from l1dbproto_spark.operators.report import corpus_report
    from l1dbproto_spark.operators.sampling import (
        sample_mixture,
        temperature_rates,
        token_budget_rates,
    )

    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert sample_mixture(empty, {"en": 0.5}).count() == 0
    assert temperature_rates(empty).count() == 0
    assert token_budget_rates(empty, {"en": 1.0}, 100).count() == 0
    assert clean_corpus(empty).cleaned.count() == 0
    assert split_corpus(empty, {"train": 0.9, "val": 0.1}).count() == 0
    assert exact_substring_dedup(empty, window=5).count() == 0
    assert learn_bpe(word_frequencies(empty), 5) == []
    rep = corpus_report(empty, approx=False).collect()[0]
    assert rep.n_docs == 0 and rep.dup_rate is None


def test_streaming_exact_gate_null_text(spark, tmp_path):
    """Null-text docs must not bypass the exact-dedup gate: they
    fingerprint as the empty document, dedupe against it in-batch, and a
    later epoch's re-delivery is rejected like any other duplicate (a
    null md5 used to never match the store, re-admitting such docs on
    every delivery)."""
    from l1dbproto_spark.streaming.doc_dedup import StreamingDocDedup

    gate = StreamingDocDedup(spark, str(tmp_path / "store"))
    batch = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "hello world"), (4, "")],
        "doc_id long, text string",
    )
    first = sorted(r.doc_id for r in gate.admit(batch, epoch_id=0).collect())
    # null (2) and empty (4) share the empty fingerprint: min id 2 wins;
    # 1 beats its clone 3
    assert first == [1, 2]
    later = [r.doc_id for r in gate.admit(batch, epoch_id=1).collect()]
    assert later == []  # nothing re-admitted by a later epoch


def test_hll_rollup_nonnative_types(spark):
    """hll_sketch_agg accepts only int/long/string/binary natively —
    doubles (and other types) are canonicalized to strings, preserving
    the distinct count; nulls are ignored as usual."""
    from l1dbproto_spark.operators.sketches import hll_estimate, hll_rollup

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, None), (3, "b", 2.5), (4, "a", 5.0),
         (5, "a", 2.5)],
        "id long, k string, v double",
    )
    out = {r.k: r.approx_distinct for r in hll_rollup(df, "k", "v").collect()}
    assert out["a"] == 2 and out["b"] == 1
    # sketches still merge after the cast
    total = hll_estimate(hll_rollup(df, "k", "v")).collect()[0]
    assert total.approx_distinct == 2


def test_multimodal_null_payloads(spark):
    """Null payloads must not crash the Arrow byte paths — such rows are
    excluded from feature outputs (a fully-skipped batch must still
    yield a type-stable empty frame for Arrow's list columns)."""
    from l1dbproto_spark.operators.multimodal import (
        blob_metadata,
        byte_histogram_features,
        chunk_fingerprints,
        resize_media,
    )

    rows = [
        (1, bytearray(b"hello media bytes" * 10), 8, 8),
        (2, None, 4, 4),
        (3, bytearray(b""), 0, 0),
        (4, bytearray(b"x"), None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, declared_width int,"
        " declared_height int",
    )
    assert blob_metadata(df).count() == 4  # column algebra: row-preserving
    hist_ids = {r.media_id for r in byte_histogram_features(df).collect()}
    assert hist_ids == {1, 3, 4}  # null payload excluded, empty kept
    assert chunk_fingerprints(df).count() == 12  # 3 blobs x 4 chunks
    assert {r.media_id for r in resize_media(df).collect()} == {1, 3, 4}


def test_apdb_empty_visit(spark, tmp_path):
    """A visit with zero detections (clouds, shutter fault) must store
    and read back cleanly — empty appends, empty merges, empty history."""
    import datetime

    from l1dbproto_spark.apdb import ApdbSpark
    from l1dbproto_spark.plans.region import Circle
    from l1dbproto_spark.schemas import table_def

    db = ApdbSpark(spark, str(tmp_path / "apdb"))
    db.make_schema()
    t = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    empty_obj = spark.createDataFrame([], table_def("DiaObject"))
    empty_src = spark.createDataFrame([], table_def("DiaSource"))
    db.store(t, empty_obj, empty_src)
    db.store(t + datetime.timedelta(seconds=45), empty_obj, None)
    reg = Circle(10.0, -40.0, 1.0)
    assert db.get_dia_objects(reg).count() == 0
    assert db.get_dia_sources(reg, [1, 2, 3], t).count() == 0


def test_packing_null_count_excluded_without_poisoning(spark):
    """A NULL custom count excludes that doc from the packing map but
    must not perturb shard-mates: the survivors pack exactly as if the
    null doc were absent (documented convention)."""
    from l1dbproto_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, "a b c", 3), (2, "d e", None), (3, "f g h i", 4)],
        "doc_id long, text string, n long",
    )
    with_null = pack_sequences(df, ctx_len=4, n_shards=1, count_col="n")
    without = pack_sequences(
        df.filter(df.doc_id != 2), ctx_len=4, n_shards=1, count_col="n"
    )
    a = sorted(
        (r.doc_id, r.chunk, r.start_tok, r.tokens_in_chunk)
        for r in with_null.collect()
    )
    b = sorted(
        (r.doc_id, r.chunk, r.start_tok, r.tokens_in_chunk)
        for r in without.collect()
    )
    assert a == b and {x[0] for x in a} == {1, 3}


def test_streaming_near_dup_gate_null_text(spark, tmp_path):
    """The near-dup gate is null-safe by the truncated-shingle rule:
    null and empty docs share the empty shingle's minhash signature, so
    they deduplicate together (min id wins) and later epochs reject the
    re-delivery — no unbounded re-admission."""
    from l1dbproto_spark.streaming.doc_dedup import StreamingNearDupGate

    gate = StreamingNearDupGate(spark, str(tmp_path / "store"))
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, None),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    first = sorted(r.doc_id for r in gate.admit(batch, epoch_id=0).collect())
    assert first == [1, 2]
    assert gate.admit(batch, epoch_id=1).count() == 0


def test_asof_and_salted_agg_null_keys(spark):
    """As-of joins and salted aggregation must treat null keys/timestamps
    sanely: asof rows with null key or null ts simply find no match
    (payload null, rows preserved), and the salted two-phase aggregation
    keeps the null-key group with the exact same totals as a plain
    groupBy."""
    from l1dbproto_spark.operators.asof import asof_join
    from l1dbproto_spark.operators.skew import salted_agg

    left = spark.createDataFrame(
        [(1, "u1", 100, "p1"), (2, None, 200, "p2"), (3, "u1", None, "p3")],
        "event_id long, user_id string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(10, "u1", 50, 1.0), (11, None, 60, 2.0), (12, "u1", None, 3.0)],
        "rid long, user_id string, ts long, value double",
    )
    out = {r.event_id: r.asof_value for r in asof_join(
        left, right, ["user_id"], "ts", ["value"]
    ).collect()}
    assert set(out) == {1, 2, 3}      # rows preserved
    assert out[1] == 1.0              # u1@100 picks up u1@50
    assert out[2] is None and out[3] is None  # null key / null ts: no match

    skewed = spark.createDataFrame(
        [(None if i % 5 == 0 else "k", float(i)) for i in range(50)],
        "k string, v double",
    )
    got = {
        r.k: r.sum_v
        for r in salted_agg(skewed, ["k"], {"sum_v": F.sum("v")}).collect()
    }
    want = {
        r.k: r.s
        for r in skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert got == want and None in got


def test_graph_mining_family_garbage(spark):
    """NULL endpoints, self-loops, and empty graphs: canonical_edges drops
    NULL-endpoint rows (a NULL key is unjoinable, not a node) and
    self-loops; every miner returns an empty frame — not an error — on an
    empty edge set."""
    from l1dbproto_spark.operators.graph import (
        canonical_edges,
        clustering_coefficient,
        core_numbers,
        k_core,
        label_propagation,
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (None, None), (5, 5), (2, 1)],
        "src INT, dst INT",
    )
    got = {(r.u, r.v) for r in canonical_edges(edges).collect()}
    assert got == {(1, 2)}

    empty = spark.createDataFrame([], "src INT, dst INT")
    assert triangle_counts(empty).count() == 0
    assert clustering_coefficient(empty).count() == 0
    assert core_numbers(empty).count() == 0
    assert k_core(empty, 1).count() == 0
    assert label_propagation(empty).count() == 0


def test_check_suite_garbage(spark):
    """All-NULL columns: completeness 0.0 (fails), predicate rates count
    NULL predicates as unsatisfied, uniqueness of an all-NULL key is
    rows-distinct semantics (count_distinct ignores NULLs -> 0.0, fails) —
    never a NULL verdict."""
    from l1dbproto_spark.operators.checks import CheckSuite

    df = spark.createDataFrame(
        [(None, None)] * 4, "k STRING, v DOUBLE"
    )
    rows = {
        r.check: r
        for r in (
            CheckSuite()
            .completeness("k")
            .uniqueness("k")
            .satisfies("pos", F.col("v") > 0)
            .run(df)
            .collect()
        )
    }
    assert rows["completeness(k)"].metric == 0.0 and not rows["completeness(k)"].passed
    assert rows["uniqueness(k)"].metric == 0.0 and not rows["uniqueness(k)"].passed
    assert rows["satisfies(pos)"].metric == 0.0 and not rows["satisfies(pos)"].passed
    assert all(r.passed is not None for r in rows.values())

"""Attribute store (operators/attributes.py): family parity with the
underlying signal operators, policy application semantics (first
failing reason, null-rejecting), parquet-persist policy iteration, and
equivalence with composed direct filters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.attributes import apply_policy, doc_attributes
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").limit(200).cache()


@pytest.fixture(scope="module")
def attrs(spark, docs):
    return doc_attributes(docs).cache()


def test_families_match_direct_operators(spark, docs, attrs):
    from l1dbproto_spark.operators.pii import pii_signals
    from l1dbproto_spark.operators.quality import (
        gopher_quality_signals,
        unigram_logprob_scores,
    )

    rows = {r.doc_id: r for r in attrs.collect()}
    assert len(rows) == 200
    g = {r.doc_id: r for r in gopher_quality_signals(docs).collect()}
    p = {r.doc_id: r for r in pii_signals(docs).collect()}
    u = {r.doc_id: r for r in unigram_logprob_scores(docs).collect()}
    for d, r in rows.items():
        assert r.passes_gopher == g[d].passes_gopher
        assert r.n_words == g[d].n_words
        assert r.n_pii == p[d].n_pii
        if d in u:
            assert r.unigram_logprob == u[d].mean_logprob


def test_policy_semantics_first_reason_and_null_rejection(spark):
    attrs = spark.createDataFrame(
        [
            (1, True, 1, -2.0),
            (2, False, 0, -1.0),   # fails 'gopher' (first)
            (3, False, 9, -9.9),   # fails all three -> reason 'gopher'
            (4, True, 9, -1.0),    # fails 'pii' only
            (5, True, 0, None),    # null lm -> null-rejecting -> 'lm'
        ],
        "doc_id long, passes_gopher boolean, n_pii long, lp double",
    )
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 6)], "doc_id long, text string"
    )
    kept, dropped = apply_policy(
        docs,
        attrs,
        {
            "gopher": "passes_gopher",
            "pii": F.col("n_pii") <= 2,
            "lm": F.col("lp") > -5.0,
        },
    )
    assert {r.doc_id for r in kept.collect()} == {1}
    assert {r.doc_id: r.reason for r in dropped.collect()} == {
        2: "gopher",
        3: "gopher",
        4: "pii",
        5: "lm",
    }
    assert kept.columns == docs.columns


def test_policy_iteration_from_parquet_without_recompute(
    spark, docs, attrs, tmp_path
):
    """The Dolma pattern: persist attributes once, apply two different
    policies by re-reading the parquet — results must match policies
    applied to the live frame."""
    path = str(tmp_path / "attrs")
    attrs.write.parquet(path)
    stored = spark.read.parquet(path)
    for policy in [
        {"rep": "passes_repetition"},
        {"rep": "passes_repetition", "pii": "n_pii <= 1"},
    ]:
        a_kept, a_drop = apply_policy(docs, stored, policy)
        b_kept, b_drop = apply_policy(docs, attrs, policy)
        assert {r.doc_id for r in a_kept.collect()} == {
            r.doc_id for r in b_kept.collect()
        }
        assert {(r.doc_id, r.reason) for r in a_drop.collect()} == {
            (r.doc_id, r.reason) for r in b_drop.collect()
        }


def test_policy_equals_composed_direct_filters(spark, docs, attrs):
    """Keeping via the attribute policy == intersecting the operators'
    own pass sets (the policy layer adds no semantics of its own)."""
    from l1dbproto_spark.operators.pii import pii_signals
    from l1dbproto_spark.operators.quality import repetition_signals

    kept, _ = apply_policy(
        docs,
        attrs,
        {"rep": "passes_repetition", "pii": "n_pii <= 1"},
    )
    got = {r.doc_id for r in kept.collect()}
    rep_ok = {
        r.doc_id
        for r in repetition_signals(docs).collect()
        if r.passes_repetition
    }
    pii_ok = {r.doc_id for r in pii_signals(docs).collect() if r.n_pii <= 1}
    assert got == rep_ok & pii_ok


def test_dup_density_family(spark, docs):
    from l1dbproto_spark.operators.dedup import duplication_density

    attrs = doc_attributes(
        docs, gopher=False, repetition=False, pii=False, lm=None,
        dup_density=True, dup_density_n=3,
    )
    got = {r.doc_id: r.dup_density for r in attrs.collect()}
    want = {
        r.doc_id: r.dup_density
        for r in duplication_density(docs, n=3).collect()
    }
    assert got == want


def test_apply_policy_partition_contract(spark):
    """Docs missing from the attribute frame drop with 'no_attributes'
    (never vanish); an empty policy dict keeps every attributed doc."""
    from l1dbproto_spark.operators.attributes import apply_policy

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    attrs = spark.createDataFrame(
        [(1, True), (2, False)], "doc_id long, ok boolean"
    )
    kept, dropped = apply_policy(docs, attrs, {"ok": "ok"})
    k = {r.doc_id for r in kept.collect()}
    d = {r.doc_id: r.reason for r in dropped.collect()}
    assert k == {1}
    assert d == {2: "ok", 3: "no_attributes"}
    assert k | set(d) == {1, 2, 3} and k.isdisjoint(d)
    # empty policies: all attributed docs keep, unattributed still logged
    kept2, dropped2 = apply_policy(docs, attrs, {})
    assert {r.doc_id for r in kept2.collect()} == {1, 2}
    assert {r.doc_id: r.reason for r in dropped2.collect()} == {
        3: "no_attributes"
    }


def _mixed_media(spark):
    """Two images (one sharp, one blurry-flat), two WAVs (one voiced,
    one silent), one corrupt blob — the mixed store media_attributes
    serves."""
    import io
    import wave

    import numpy as np

    rng = np.random.default_rng(5)

    def ppm(rgb):
        h, w, _ = rgb.shape
        return f"P6 {w} {h} 255\n".encode() + rgb.astype(np.uint8).tobytes()

    def wav(x):
        ints = (np.clip(x, -1, 1) * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes(ints.tobytes())
        return buf.getvalue()

    import struct

    def avi(n_frames):
        def chunk(cid, body):
            return cid + struct.pack("<I", len(body)) + body + (
                b"\x00" if len(body) & 1 else b""
            )

        def lst(ltype, body):
            return chunk(b"LIST", ltype + body)

        avih = struct.pack("<10I", 40000, 0, 0, 0, n_frames, 0, 1, 0, 8, 8)
        hdrl = lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", b"vids" + b"MJPG" + b"\x00" * 48)),
        )
        movi = lst(
            b"movi", b"".join(chunk(b"00dc", b"\x01\x02") for _ in range(n_frames))
        )
        body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

    sharp = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    flat = np.full((24, 24, 3), 120, np.uint8)
    t = np.arange(4000) / 8000.0
    voiced = 0.5 * np.sin(2 * np.pi * 440 * t)
    rows = [
        (0, "image", ppm(sharp)),
        (1, "image", ppm(flat)),
        (2, "audio", wav(voiced)),
        (3, "audio", wav(np.zeros(4000))),
        (4, "image", b"corrupt-jpeg"),
        (5, "video", avi(4)),
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def test_media_attributes_wide_frame_and_policy(spark):
    from l1dbproto_spark.operators.attributes import media_attributes

    media = _mixed_media(spark)
    attrs = media_attributes(media)
    rows = {r.media_id: r for r in attrs.collect()}
    assert len(rows) == 6
    # metadata present on every row
    assert all(rows[i].n_bytes > 0 and rows[i].fingerprint for i in rows)
    # image signals on images only; audio signals null there
    assert rows[0].image_ok and rows[0].sharpness > rows[1].sharpness
    assert rows[0].ahash is not None and rows[0].audio_ok is None
    # audio signals on audio only
    assert rows[2].audio_ok and rows[2].silence_ratio < 0.1
    assert rows[3].silence_ratio == 1.0 and rows[3].brightness is None
    # corrupt image: attributed, image_ok False, null signals
    assert rows[4].image_ok is False and rows[4].sharpness is None
    # video container metadata on videos only
    assert rows[5].video_ok and rows[5].declared_frames == 4
    assert rows[5].fps == pytest.approx(25.0)
    assert rows[5].video_fourcc == "MJPG" and rows[5].image_ok is None
    assert rows[0].video_ok is None

    # kind-scoped policies through the SAME apply_policy machinery
    kept, dropped = apply_policy(
        media,
        attrs,
        {
            "decodes": "(kind != 'image') OR image_ok",
            "sharp": f"(kind != 'image') OR sharpness > {rows[1].sharpness}",
            "not_silent": "(kind != 'audio') OR silence_ratio < 0.9",
            "has_frames": "(kind != 'video') OR n_video_chunks >= 1",
        },
        id_col="media_id",
    )
    assert {r.media_id for r in kept.collect()} == {0, 2, 5}
    reasons = {r.doc_id: r.reason for r in dropped.collect()}
    assert reasons == {1: "sharp", 3: "not_silent", 4: "decodes"}


def test_media_attributes_accepts_persisted_decode(spark):
    from l1dbproto_spark.operators.attributes import media_attributes
    from l1dbproto_spark.operators.multimodal import decode_media

    media = _mixed_media(spark).filter("kind = 'image'")
    dec = decode_media(media).localCheckpoint()
    attrs = media_attributes(media, audio=False, decoded_image=dec)
    direct = media_attributes(media, audio=False)
    a = {r.media_id: r for r in attrs.collect()}
    b = {r.media_id: r for r in direct.collect()}
    assert set(a) == set(b)
    assert all(a[i].ahash == b[i].ahash for i in a)
    assert all(a[i].sharpness == b[i].sharpness for i in a)

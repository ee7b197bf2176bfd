"""Perceptual image hashing (multimodal.perceptual_hashes) + Hamming
near-dup retrieval over image hashes via the hash-agnostic SimHash block
bucketing (dedup.simhash_near_dup_pairs)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.dedup import simhash_near_dup_pairs
from l1dbproto_spark.operators.multimodal import (
    _box_resize_gray,
    _pack_bits_i64,
    decode_media,
    perceptual_hashes,
)

RNG = np.random.default_rng(11)


def ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return f"P6 {w} {h} 255\n".encode() + rgb.astype(np.uint8).tobytes()


def gradient(w: int, h: int) -> np.ndarray:
    x = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    y = np.linspace(0, 128, h, dtype=np.float64)[:, None]
    img = np.clip(x + y, 0, 255) % 256
    return np.stack([img, 255 - img, img / 2], axis=2).astype(np.uint8)


def _hashes(spark, blobs):
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "media_id long, payload binary"
    )
    return {
        r.media_id: r
        for r in perceptual_hashes(decode_media(df)).collect()
    }


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_box_resize_exact_on_block_image():
    # a 16x16 image of 8x8 constant 2x2 blocks box-resizes to the blocks
    blocks = RNG.integers(0, 256, (8, 8)).astype(np.float64)
    img = np.kron(blocks, np.ones((2, 2)))
    assert np.allclose(_box_resize_gray(img, 8, 8), blocks)
    # upscale axis: 4 rows -> 8 uses nearest, every cell defined
    out = _box_resize_gray(img[:4], 8, 8)
    assert out.shape == (8, 8) and np.isfinite(out).all()


def test_pack_bits_two_complement():
    bits = np.zeros(64, dtype=bool)
    bits[63] = True
    assert _pack_bits_i64(bits) == -(1 << 63)
    bits[0] = True
    assert _pack_bits_i64(bits) == -(1 << 63) + 1


def test_hash_matches_numpy_reference(spark):
    rgb = RNG.integers(0, 256, (24, 31, 3)).astype(np.uint8)
    row = _hashes(spark, [ppm(rgb)])[0]
    luma = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    a = _box_resize_gray(luma, 8, 8)
    assert row.ahash == _pack_bits_i64(a >= a.mean())
    d = _box_resize_gray(luma, 8, 9)
    assert row.dhash == _pack_bits_i64(d[:, :-1] > d[:, 1:])


def test_scale_invariance_and_noise_robustness(spark):
    base = gradient(64, 64)
    double = np.kron(base, np.ones((2, 2, 1))).astype(np.uint8)  # 128x128
    noisy = np.clip(
        base.astype(np.int16) + RNG.integers(-4, 5, base.shape), 0, 255
    ).astype(np.uint8)
    inverted = (255 - base).astype(np.uint8)
    hs = _hashes(spark, [ppm(base), ppm(double), ppm(noisy), ppm(inverted)])
    # exact 2x upscale: box means identical -> identical hashes
    assert hs[0].ahash == hs[1].ahash and hs[0].dhash == hs[1].dhash
    assert _hamming(hs[0].ahash, hs[2].ahash) <= 3
    assert _hamming(hs[0].dhash, hs[2].dhash) <= 3
    # inversion flips nearly every comparison
    assert _hamming(hs[0].ahash, hs[3].ahash) >= 48


def test_undecodable_passthrough(spark):
    hs = _hashes(spark, [ppm(gradient(16, 16)), b"JFIF-not-really"])
    assert hs[0].ok and hs[0].ahash is not None
    assert not hs[1].ok and hs[1].ahash is None and hs[1].dhash is None


def test_image_near_dup_pairs_via_block_bucketing(spark):
    # textured base: on a smooth gradient adjacent resampled cells are
    # near-equal and dhash comparisons flip under any noise — textured
    # content is what the difference hash is built for
    base = RNG.integers(0, 256, (48, 48, 3)).astype(np.uint8)
    near = np.clip(
        base.astype(np.int16) + RNG.integers(-3, 4, base.shape), 0, 255
    ).astype(np.uint8)
    far = RNG.integers(0, 256, (48, 48, 3)).astype(np.uint8)
    hs = perceptual_hashes(
        decode_media(
            spark.createDataFrame(
                [(0, ppm(base)), (1, ppm(near)), (2, ppm(far))],
                "media_id long, payload binary",
            )
        )
    ).select(F.col("media_id").alias("doc_id"), F.col("dhash").alias("simhash"))
    pairs = simhash_near_dup_pairs(hs, max_bits=3, bits=64).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {(0, 1)}


def test_grid_overflow_guard(spark):
    df = decode_media(
        spark.createDataFrame(
            [(0, ppm(gradient(8, 8)))], "media_id long, payload binary"
        )
    )
    with pytest.raises(ValueError, match="overflow"):
        perceptual_hashes(df, grid=9)


def box_blur(rgb: np.ndarray, k: int = 5) -> np.ndarray:
    """Independent separable box blur for the sharpness fixture."""
    out = rgb.astype(np.float64)
    for axis in (0, 1):
        acc = np.zeros_like(out)
        for d in range(-(k // 2), k // 2 + 1):
            acc += np.roll(out, d, axis=axis)
        out = acc / k
    return np.clip(out, 0, 255).astype(np.uint8)


def _signals(spark, blobs):
    from l1dbproto_spark.operators.multimodal import image_quality_signals

    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "media_id long, payload binary"
    )
    return {
        r.media_id: r for r in image_quality_signals(decode_media(df)).collect()
    }


def test_image_quality_flat_and_reference(spark):
    flat = np.full((16, 16, 3), 96, np.uint8)
    rgb = RNG.integers(0, 256, (20, 24, 3)).astype(np.uint8)
    sig = _signals(spark, [ppm(flat), ppm(rgb), b"corrupt"])
    f = sig[0]
    assert f.brightness == pytest.approx(96 / 255, abs=1e-9)
    assert f.contrast == 0.0 and f.sharpness == 0.0 and f.colorfulness == 0.0
    # independent recompute of every signal on the random image
    x = rgb.astype(np.float64)
    luma = 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]
    lap = (
        4 * luma[1:-1, 1:-1]
        - luma[:-2, 1:-1]
        - luma[2:, 1:-1]
        - luma[1:-1, :-2]
        - luma[1:-1, 2:]
    )
    rg = x[:, :, 0] - x[:, :, 1]
    yb = 0.5 * (x[:, :, 0] + x[:, :, 1]) - x[:, :, 2]
    r = sig[1]
    assert r.brightness == pytest.approx(luma.mean() / 255)
    assert r.contrast == pytest.approx(luma.std() / 255)
    assert r.sharpness == pytest.approx(lap.var())
    assert r.colorfulness == pytest.approx(
        np.sqrt(rg.std() ** 2 + yb.std() ** 2)
        + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    )
    assert not sig[2].ok and sig[2].sharpness is None


def test_image_quality_orders_blur_and_color(spark):
    sharp = RNG.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    gray3 = np.repeat(
        RNG.integers(0, 256, (32, 32, 1)), 3, axis=2
    ).astype(np.uint8)
    sig = _signals(spark, [ppm(sharp), ppm(box_blur(sharp)), ppm(gray3)])
    assert sig[0].sharpness > 10 * sig[1].sharpness  # blur kills Laplacian var
    assert sig[2].colorfulness == 0.0  # equal channels = no color
    assert sig[0].colorfulness > 20


def test_image_dedup_clusters_end_to_end(spark):
    from l1dbproto_spark.operators.multimodal import image_dedup_clusters

    base = RNG.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    near1 = np.clip(
        base.astype(np.int16) + RNG.integers(-2, 3, base.shape), 0, 255
    ).astype(np.uint8)
    near2 = np.clip(
        base.astype(np.int16) + RNG.integers(-2, 3, base.shape), 0, 255
    ).astype(np.uint8)
    unique = RNG.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    media = spark.createDataFrame(
        [
            (10, ppm(base)),
            (11, ppm(near1)),
            (12, ppm(near2)),
            (20, ppm(unique)),
            (30, b"corrupt"),
        ],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in image_dedup_clusters(media).collect()}
    # corrupt blob absent; unique image is its own singleton canonical
    assert set(out) == {10, 11, 12, 20}
    assert out[20].is_canonical and out[20].canonical_id == 20
    # the near-dup trio clusters together, min id canonical by default
    assert out[10].component == out[11].component == out[12].component
    assert all(out[i].canonical_id == 10 for i in (10, 11, 12))
    assert out[10].is_canonical and not out[11].is_canonical

    # quality-aware: score frame promotes the sharpest copy instead
    scores = spark.createDataFrame(
        [(10, 1.0), (11, 9.0), (12, 2.0), (20, 5.0)], "media_id long, score double"
    )
    best = {
        r.media_id: r
        for r in image_dedup_clusters(media, score=scores).collect()
    }
    assert all(best[i].canonical_id == 11 for i in (10, 11, 12))
    assert best[11].is_canonical and not best[10].is_canonical
    assert best[20].is_canonical  # singleton unaffected by scoring


def test_image_pair_stage_plan_has_no_cartesian(spark):
    # the Hamming pair stage must stay bucket-joined at any corpus size —
    # a CartesianProduct here is the all-pairs scale killer
    hashes = spark.createDataFrame(
        [(i, i * 7919) for i in range(100)], "doc_id long, simhash long"
    )
    pairs = simhash_near_dup_pairs(hashes, max_bits=3, bits=64)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

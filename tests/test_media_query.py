"""Pins for the image_dedup_families driver row's planted structure
(queries/multimodal.py): the oracle's family arithmetic is only valid if
(a) the 100 family codewords are far apart in Hamming space and never
share a 16-bit block (zero cross-family candidates through the
pigeonhole bucketing), and (b) every synthesized PPM's dhash — through
the REAL decode + perceptual-hash operators — equals its planted
codeword exactly. These tests pin both, so a change to the hash grid,
bit order, box resample, noise amplitude, or codeword constants fails
HERE with a named invariant instead of as an opaque driver hash
mismatch."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from l1dbproto_spark.queries.multimodal import (
    _IDF_FAMILIES,
    _IDF_MULT,
    _planted_ppm_media,
)

N_DOCS = 500  # the sf0.001/sf0.01 documents id range the row runs over


def _codeword(f: int) -> int:
    return ((f + 1) * _IDF_MULT) & (2**64 - 1)


def _planted(doc_id: int) -> int:
    code = _codeword(doc_id % _IDF_FAMILIES)
    for j in range((doc_id // _IDF_FAMILIES) % 4):
        code ^= 1 << (2 * j)
    return code


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= 1 << 63 else u


def test_codeword_separation_and_block_disjointness():
    codes = [_codeword(f) for f in range(_IDF_FAMILIES)]
    min_d = 64
    for i in range(len(codes)):
        for j in range(i + 1, len(codes)):
            x = codes[i] ^ codes[j]
            min_d = min(min_d, bin(x).count("1"))
            for b in range(4):
                assert (x >> (16 * b)) & 0xFFFF != 0, (
                    f"families {i}/{j} share 16-bit block {b} — the "
                    "pigeonhole bucketing would emit cross-family candidates"
                )
    # variant flips move each hash <=3 bits, so cross-family pairs need
    # distance > 3 + 3 + 3 to stay out of the Hamming<=3 pair stage
    assert min_d >= 10, f"min pairwise codeword distance {min_d} < 10"


def test_within_family_variants_pair_and_families_do_not():
    for f in (0, 7, 99):
        members = [_planted(f + v * _IDF_FAMILIES) for v in range(4)]
        for i in range(4):
            for j in range(i + 1, 4):
                d = bin(members[i] ^ members[j]).count("1")
                assert d <= 3, f"family {f} variants {i}/{j} at distance {d}"
    # spot-check cross-family distances after flips
    a, b = _planted(3), _planted(4 + 2 * _IDF_FAMILIES)
    assert bin(a ^ b).count("1") > 3


def test_planted_dhash_through_real_decode_and_hash(spark):
    """End to end on Spark: synthesize -> decode_media ->
    perceptual_hashes must yield EXACTLY the planted codeword for every
    doc_id in the driver range."""
    from l1dbproto_spark.operators.multimodal import (
        decode_media,
        perceptual_hashes,
    )

    docs = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    media = _planted_ppm_media(docs)
    hashes = perceptual_hashes(decode_media(media)).filter("ok")
    rows = {r.media_id: r.dhash for r in hashes.collect()}
    assert len(rows) == N_DOCS
    for doc_id in range(N_DOCS):
        assert rows[doc_id] == _signed(_planted(doc_id)), f"doc {doc_id}"


def test_noise_varies_bytes_within_family(spark):
    """The near-dups are NEAR dups: same-family members with the same
    variant index still differ at the byte level (the +/-4 noise), so
    the row exercises perceptual, not byte, identity."""
    docs = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    blobs = {
        r.media_id: bytes(r.payload)
        for r in _planted_ppm_media(docs).collect()
    }
    same_variant = [0, 4 * _IDF_FAMILIES]  # family 0, variant 0, twice
    assert blobs[same_variant[0]] != blobs[same_variant[1]]
    # and every blob is a valid bounded-range PPM
    for b in blobs.values():
        body = b.split(b"\n", 1)[1]
        px = np.frombuffer(body, np.uint8)
        assert px.size == 8 * 9 * 3 and px.max() <= 212

"""AVI container parsing (operators/video.py): hand-assembled RIFF/AVI
fixtures per the spec (the independent-construction discipline of the
WAV tests), with PPM frame payloads so the built-in image decoder can
verify frame bytes end-to-end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from l1dbproto_spark.operators.video import avi_frames, parse_avi, video_meta

RNG = np.random.default_rng(3)


def chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def lst(ltype: bytes, body: bytes) -> bytes:
    return chunk(b"LIST", ltype + body)


def make_avi(
    frames: list[bytes],
    w: int = 32,
    h: int = 24,
    us_per_frame: int = 40000,
    audio_chunks: list[bytes] = (),
) -> bytes:
    avih = struct.pack(
        "<10I",
        us_per_frame,  # dwMicroSecPerFrame
        1_000_000,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags (HASINDEX)
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        2 if audio_chunks else 1,  # dwStreams
        0,  # dwSuggestedBufferSize
        w,  # dwWidth
        h,  # dwHeight
    )
    strh_v = b"vids" + b"MJPG" + b"\x00" * 48
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh_v)),
    )
    if audio_chunks:
        hdrl = lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh_v))
            + lst(b"strl", chunk(b"strh", b"auds" + b"\x00" * 52)),
        )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi_body += b"".join(chunk(b"01wb", a) for a in audio_chunks)
    movi = lst(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return f"P6 {w} {h} 255\n".encode() + rgb.astype(np.uint8).tobytes()


FRAMES = [
    ppm(RNG.integers(0, 256, (24, 32, 3)).astype(np.uint8)) for _ in range(5)
]


def test_parse_avi_header_and_chunks():
    hdr, chunks = parse_avi(make_avi(FRAMES, audio_chunks=[b"\x01\x02"]))
    assert (hdr["width"], hdr["height"]) == (32, 24)
    assert hdr["us_per_frame"] == 40000 and hdr["total_frames"] == 5
    assert hdr["n_streams"] == 2
    assert hdr["streams"][0] == ("vids", "MJPG")
    assert hdr["streams"][1][0] == "auds"
    kinds = [(s, k) for s, k, _, _ in chunks]
    assert kinds == [(0, "dc")] * 5 + [(1, "wb")]


def test_parse_avi_rejects():
    for blob in (b"", b"RIFF\x04\x00\x00\x00WAVE", make_avi(FRAMES)[:40]):
        with pytest.raises(ValueError):
            parse_avi(blob)


def test_parse_avi_survives_pathological_list_nesting():
    """A crafted blob of minimal LIST headers nested far past Python's
    recursion limit must raise the documented ValueError (no avih), not
    RecursionError — the walk runs on an explicit stack."""
    body = b"JUNK"
    for _ in range(50_000):
        payload = b"x\x00\x00\x00" + body
        body = b"LIST" + struct.pack("<I", len(payload)) + payload
    full = b"AVI " + body
    blob = b"RIFF" + struct.pack("<I", len(full)) + full
    with pytest.raises(ValueError, match="avih"):
        parse_avi(blob)


def test_parse_avi_chunk_order_across_sibling_lists():
    """Video chunks split across two sibling movi LISTs must come back
    in container order (the stack walk is in-order, not batched)."""

    def chunk(cid, data):
        return cid + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b""
        )

    def lst(ltype, data):
        return chunk(b"LIST", ltype + data)

    avih = struct.pack("<10I", 40000, 0, 0, 0, 4, 0, 1, 0, 32, 24)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", b"vids" + b"MJPG" + b"\x00" * 48)),
    )
    movi1 = lst(b"movi", chunk(b"00dc", b"AA") + chunk(b"00dc", b"BB"))
    movi2 = lst(b"movi", chunk(b"00dc", b"CC") + chunk(b"00dc", b"DD"))
    full = b"AVI " + hdrl + movi1 + movi2
    blob = b"RIFF" + struct.pack("<I", len(full)) + full
    _, chunks = parse_avi(blob)
    payloads = [blob[s:e] for _, _, s, e in chunks]
    assert payloads == [b"AA", b"BB", b"CC", b"DD"]


def _media(spark, blobs):
    return spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "media_id long, payload binary"
    )


def test_video_meta_contract(spark):
    rows = {
        r.media_id: r
        for r in video_meta(
            _media(spark, [make_avi(FRAMES), b"not avi", None])
        ).collect()
    }
    assert set(rows) == {0, 1}  # null payload skipped
    m = rows[0]
    assert m.ok and (m.width, m.height) == (32, 24)
    assert m.fps == pytest.approx(25.0)
    assert m.declared_frames == 5 and m.video_fourcc == "MJPG"
    assert m.n_video_chunks == 5
    assert not rows[1].ok and rows[1].fps is None


def test_avi_frames_stride_cap_and_payloads(spark):
    media = _media(spark, [make_avi(FRAMES, audio_chunks=[b"\xff" * 8])])
    out = avi_frames(media).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in out] == [0, 1, 2, 3, 4]
    assert [r.t_ms for r in out] == [0.0, 40.0, 80.0, 120.0, 160.0]
    assert all(bytes(r.frame) == FRAMES[r.frame_idx] for r in out)
    strided = avi_frames(media, every_k=2).collect()
    assert sorted(r.frame_idx for r in strided) == [0, 2, 4]
    capped = avi_frames(media, max_frames=2).collect()
    assert sorted(r.frame_idx for r in capped) == [0, 1]
    # malformed container: zero rows, never a task failure
    assert avi_frames(_media(spark, [b"garbage"])).count() == 0


def test_frames_decode_end_to_end(spark):
    from l1dbproto_spark.operators.multimodal import decode_media

    from pyspark.sql import functions as F

    frames = avi_frames(_media(spark, [make_avi(FRAMES)])).select(
        F.col("frame_idx").alias("media_id"),
        F.col("frame").alias("payload"),
    )
    decoded = {r.media_id: r for r in decode_media(frames).collect()}
    assert len(decoded) == 5 and all(d.ok for d in decoded.values())
    # exact pixel bytes round-trip through container + image decoder
    rgb0 = np.frombuffer(bytes(decoded[0].pixels), np.uint8)
    want = np.frombuffer(FRAMES[0].split(b"\n", 1)[1], np.uint8)
    assert np.array_equal(rgb0, want)
    assert decoded[3].width == 32 and decoded[3].height == 24


def test_avi_video_meta_driver_grade(spark):
    """r14 promotion candidate (COVERAGE.md queue): the planted-AVI
    metadata row at full driver-grade compare — the real nested-LIST
    chunk walk against an oracle that predicts every column from doc_id
    arithmetic without parsing a byte (wav_decode_meta pattern)."""
    import duckdb

    from l1dbproto_spark.queries.multimodal import (
        AVI_VIDEO_META_ORACLE,
        avi_video_meta,
    )
    from tools.check_correctness import compare

    sf = "/root/testdata/sf0.001"
    got = avi_video_meta(spark, sf).toPandas()
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = duck.execute(AVI_VIDEO_META_ORACLE).df()
    duck.close()
    assert len(got) == 500
    assert (~got["ok"]).sum() > 0 and got["ok"].sum() > 0  # both verdicts
    issues = compare("avi_video_meta", got, want)
    assert not issues, issues

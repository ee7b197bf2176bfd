"""Built-in PNG/GIF/JPEG header parsers (operators/multimodal.py
image_header and friends): hand-assembled spec fixtures, malformation
rejections, probe_media classification of the three web formats, and the
streaming media gate admitting them — all without PIL (absent in this
container, which makes these tests exercise exactly the built-in
path)."""

from __future__ import annotations

import struct
import zlib

import pytest

from l1dbproto_spark.operators.multimodal import (
    _gif_header,
    _jpeg_header,
    _png_header,
    image_header,
    probe_media,
)


def png_bytes(w: int, h: int, depth: int = 8, color: int = 2) -> bytes:
    ihdr = struct.pack(">II5B", w, h, depth, color, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    return b"\x89PNG\r\n\x1a\n" + chunk


def gif_bytes(w: int, h: int, version: bytes = b"GIF89a") -> bytes:
    return version + struct.pack("<HH", w, h) + b"\x00" * 4


def jpeg_bytes(w: int, h: int, sof: int = 0xC0, extra_ff: bool = False) -> bytes:
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(64))
    sof_body = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    fill = b"\xff" if extra_ff else b""
    return b"\xff\xd8" + app0 + dqt + fill + seg(sof, sof_body)


def test_png_header_parses_and_rejects():
    assert _png_header(png_bytes(640, 480)) == (640, 480)
    assert image_header(png_bytes(1, 7)) == (1, 7, "png")
    for bad in (
        b"\x89PNG\r\n\x1a\n",  # truncated
        png_bytes(0, 10),  # degenerate
        png_bytes(10, 10, depth=3),  # invalid bit depth
        png_bytes(10, 10, color=5),  # invalid color type
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 4 + b"IDAT" + b"\x00" * 20,  # no IHDR
    ):
        with pytest.raises(ValueError):
            _png_header(bad)


def test_gif_header_parses_and_rejects():
    assert _gif_header(gif_bytes(320, 200)) == (320, 200)
    assert _gif_header(gif_bytes(16, 16, b"GIF87a")) == (16, 16)
    assert image_header(gif_bytes(5, 9)) == (5, 9, "gif")
    for bad in (b"GIF88a" + b"\x00" * 8, gif_bytes(0, 5), b"GIF89a\x01"):
        with pytest.raises(ValueError):
            _gif_header(bad)


def test_jpeg_header_walks_segments_to_sof():
    assert _jpeg_header(jpeg_bytes(1920, 1080)) == (1920, 1080)
    # progressive (SOF2) and fill bytes before a marker both parse
    assert _jpeg_header(jpeg_bytes(64, 48, sof=0xC2)) == (64, 48)
    assert _jpeg_header(jpeg_bytes(64, 48, extra_ff=True)) == (64, 48)
    assert image_header(jpeg_bytes(33, 44)) == (33, 44, "jpeg")


def test_jpeg_header_rejections():
    good = jpeg_bytes(64, 48)
    sos = bytes([0xFF, 0xDA]) + struct.pack(">H", 4) + b"\x00\x00"
    for bad in (
        b"\xff\xd8",  # SOI only
        good[:20],  # truncated mid-segment
        b"\xff\xd8 not actually decodable here",  # junk after SOI
        b"\xff\xd8" + sos,  # scan before any SOF
        b"\xff\xd8\xff\xd9",  # EOI before any SOF
        jpeg_bytes(0, 48),  # degenerate width
    ):
        with pytest.raises(ValueError):
            _jpeg_header(bad)


def test_probe_classifies_web_formats_without_pil(spark):
    blobs = spark.createDataFrame(
        [
            (1, png_bytes(12, 34)),
            (2, gif_bytes(56, 78)),
            (3, jpeg_bytes(90, 11)),
            (4, jpeg_bytes(8, 8)[:6]),  # truncated jpeg -> quarantine
        ],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in probe_media(blobs).collect()}
    assert got[1].ok and (got[1].kind, got[1].width, got[1].height) == ("image", 12, 34)
    assert got[2].ok and (got[2].width, got[2].height) == (56, 78)
    assert got[3].ok and (got[3].width, got[3].height) == (90, 11)
    assert not got[4].ok and got[4].kind is None


def test_media_gate_admits_web_formats(spark, tmp_path):
    from l1dbproto_spark.streaming.media_stream import (
        StreamingMediaIngest,
        media_ingest_rate,
    )

    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.png").write_bytes(png_bytes(100, 50))
    (d / "b.gif").write_bytes(gif_bytes(10, 20))
    (d / "c.jpg").write_bytes(jpeg_bytes(300, 200))
    (d / "x.jpg").write_bytes(b"\xff\xd8 junk")
    out = str(tmp_path / "media")
    gate = StreamingMediaIngest(spark)
    gate.bind_stream(str(d), out).awaitTermination(120)
    rate = media_ingest_rate(spark, out).collect()[0]
    assert (rate.n_admitted, rate.n_quarantined, rate.n_image) == (3, 1, 3)
    adm = {r.path.split("/")[-1]: r for r in spark.read.parquet(out).collect()}
    assert adm["c.jpg"].width == 300 and adm["c.jpg"].height == 200

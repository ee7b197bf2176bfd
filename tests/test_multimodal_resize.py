"""resize_media (operators/multimodal.py): deterministic fake-decode resize
— numpy-reference equivalence, schema, and identity-resize property."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.multimodal import resize_media


def _media(spark):
    rows = [
        (1, bytes(range(48)), 8, 6),          # exact-fit 6x8 image
        (2, b"\x10" * 10, 4, 4),              # short payload -> tiled
        (3, bytes(range(256)) * 2, 16, 16),   # larger than out size
        (4, b"ab", None, None),               # missing dims -> 8x8 default
    ]
    return spark.createDataFrame(
        rows, "media_id long, payload binary, declared_width int, declared_height int"
    )


def test_resize_matches_numpy_reference(spark):
    out_w, out_h = 4, 3
    got = {
        r.media_id: (bytes(r.resized), r.width, r.height)
        for r in resize_media(_media(spark), out_w, out_h).collect()
    }
    for mid, blob, w, h in [
        (1, bytes(range(48)), 8, 6),
        (2, b"\x10" * 10, 4, 4),
        (3, bytes(range(256)) * 2, 16, 16),
        (4, b"ab", 8, 8),
    ]:
        img = np.resize(np.frombuffer(blob, dtype=np.uint8), (h, w))
        rows = (np.arange(out_h) * h) // out_h
        cols = (np.arange(out_w) * w) // out_w
        want = img[np.ix_(rows, cols)].tobytes()
        assert got[mid] == (want, out_w, out_h), mid
        assert len(got[mid][0]) == out_w * out_h


def test_resize_to_same_size_is_identity(spark):
    """Resizing an exact-fit image to its own declared size reproduces the
    payload bytes (nearest-neighbor with unit scale is the identity)."""
    df = _media(spark).filter(F.col("media_id") == 1)
    (row,) = resize_media(df, out_width=8, out_height=6).collect()
    assert bytes(row.resized) == bytes(range(48))


def test_sample_frames_matches_numpy_reference(spark):
    from l1dbproto_spark.operators.multimodal import sample_frames

    # 4x2 frames of 8 bytes each: 3 exact frames + one padded tail
    rows = [
        (1, bytes(range(26)), 4, 2, 1000),   # 26 bytes -> 4 frames (tail padded)
        (2, bytes(range(8)), 4, 2, 500),     # exactly 1 frame
        (3, b"\x05" * 64, 4, 2, 800),        # 8 frames
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, declared_width int,"
        " declared_height int, declared_ms int",
    )
    got = {}
    for r in sample_frames(media, every_k=2, max_frames=3).collect():
        got.setdefault(r.media_id, []).append(
            (r.frame_idx, r.t_ms, bytes(r.frame), r.width, r.height)
        )
    for mid, frames in got.items():
        frames.sort()
    for mid, blob, w, h, ms in rows:
        fsize = w * h
        n = max(1, -(-len(blob) // fsize))
        buf = np.resize(np.frombuffer(blob, dtype=np.uint8), (n, fsize))
        picked = list(range(0, n, 2))[:3]
        want = [
            (fi, ms * fi // n, buf[fi].tobytes(), w, h) for fi in picked
        ]
        assert got[mid] == want, mid
    # frame counts: ceil(26/8)=4 -> picks 0,2; 1 frame -> picks 0; 8 -> 0,2,4
    assert len(got[1]) == 2 and len(got[2]) == 1 and len(got[3]) == 3


def _ppm(width, height, rgb: bytes) -> bytes:
    return b"P6\n# test comment\n%d %d\n255\n" % (width, height) + rgb


def _bmp24(width, height, rgb: bytes, top_down=False) -> bytes:
    """Minimal uncompressed 24-bit BI_RGB writer (4-byte-padded BGR rows,
    bottom-up unless top_down) — the independent reference encoder the
    built-in decoder is checked against."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    rows = []
    px = np.frombuffer(rgb, "u1").reshape(height, width, 3)
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        row = px[y, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    raster = b"".join(rows)
    h = height if top_down is False else -height
    info = struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 14 + 40)
    return file_hdr + info + raster


def test_decode_media_builtin_ppm_bmp_real_decode(spark):
    """The dependency-free decode path is REAL in any environment: binary
    PPM and 24-bit BMP payloads decode to exact RGB pixel buffers
    (bottom-up and top-down BMPs agree), an unknown/corrupt format emits
    ok=false instead of failing the task, and null payloads are skipped.
    (With PIL installed, PIL decodes the same formats to the same bytes —
    the contract is identical either way.)"""
    from l1dbproto_spark.operators import multimodal as mm

    rgb = bytes(range(3 * 2 * 3))  # 3x2 image, distinct byte per channel
    df = spark.createDataFrame(
        [
            (1, bytearray(_ppm(3, 2, rgb))),
            (2, bytearray(_bmp24(3, 2, rgb))),
            (3, bytearray(_bmp24(3, 2, rgb, top_down=True))),
            (4, bytearray(b"GIF89a not supported")),
            (5, None),  # null payload: skipped (nullable local schema)
        ],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in mm.decode_media(df).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for mid in (1, 2, 3):
        assert rows[mid].ok, mid
        assert (rows[mid].width, rows[mid].height) == (3, 2), mid
        assert bytes(rows[mid].pixels) == rgb, mid
    assert not rows[4].ok and rows[4].width is None


def test_builtin_decoders_reject_malformed(spark):
    """Truncated rasters / unsupported depths raise ValueError locally and
    map to ok=false through the operator."""
    from l1dbproto_spark.operators import multimodal as mm

    rgb = bytes(18)
    with pytest.raises(ValueError):
        mm._decode_ppm(_ppm(3, 2, rgb)[:-4])  # truncated raster
    with pytest.raises(ValueError):
        mm._decode_bmp(_bmp24(3, 2, rgb)[:40])  # truncated header
    with pytest.raises(ValueError):
        mm._decode_builtin(b"\x89PNG....")  # no builtin decoder
    ppm16 = _ppm(3, 2, rgb).replace(b"255", b"65535")
    with pytest.raises(ValueError):
        mm._decode_ppm(ppm16)  # 16-bit maxval unsupported


def test_decode_media_with_pil_decodes_and_flags_corrupt(spark):
    """Real-decode path (runs only where PIL is installed): a valid PNG
    decodes to its true dimensions + raw RGB bytes; a corrupt payload
    emits ok=false with null dims instead of failing the task; a null
    payload is skipped."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from l1dbproto_spark.operators import multimodal as mm

    buf = io.BytesIO()
    PIL_Image.new("RGB", (3, 2), color=(10, 20, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(png), 3, 2, None),
            (2, "image", bytearray(b"not an image"), None, None, None),
            (3, "image", None, None, None, None),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in mm.decode_media(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].ok and (rows[1].width, rows[1].height) == (3, 2)
    assert bytes(rows[1].pixels) == bytes([10, 20, 30]) * 6
    assert not rows[2].ok and rows[2].width is None

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


def test_decode_media_without_pil_raises_documented_stub(spark):
    """Sandbox path: no PIL -> the documented NotImplementedError at CALL
    time (graceful gate, not an import-time failure of the module)."""
    from l1dbproto_spark.operators import multimodal as mm

    try:
        import PIL.Image  # noqa: F401

        pytest.skip("PIL present: the real-decode test covers this env")
    except ImportError:
        pass
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG.."), 2, 2, None)], mm.MEDIA_SCHEMA
    )
    with pytest.raises(NotImplementedError, match="media decode requires"):
        mm.decode_media(df)


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

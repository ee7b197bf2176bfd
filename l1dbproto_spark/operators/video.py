"""Video container operators — the video leg of the multimodal family.

``parse_avi``/``video_meta``/``avi_frames`` is a REAL pure-Python
RIFF/AVI container parser (the same chunk-walk discipline as the WAV
decoder in operators/audio.py, plus an in-order nested-LIST walk on an
explicit stack — recursion-limit-proof against crafted deep nesting): the main
``avih`` header gives geometry/fps/declared frames, ``strh`` stream
headers give the codec fourcc, and the ``movi`` payload chunks
(``##dc``/``##db``/``##wb``) give each frame's bytes. Frame PAYLOADS
stay codec-opaque (an MJPEG frame is a JPEG blob — feed it to
``multimodal.decode_media``, which decodes it under PIL, or decodes
embedded PPM/BMP frames with the built-in decoders in any environment);
the container walk, frame indexing, timestamps, stride/cap sampling,
and Arrow fan-out are all real. One malformed container costs its own
rows only, per the family contract.

Scale: both operators ride the media scan with zero shuffle;
``avi_frames``' fan-out is bounded by ``max_frames`` (cap with logged
intent — the video analogue of posting-list caps)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _u4(buf: bytes, pos: int) -> int:
    return int(np.frombuffer(buf, "<u4", 1, pos)[0])


def _walk(buf: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_end) at one nesting level;
    chunks are word-aligned like every RIFF container."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = _u4(buf, pos + 4)
        body = pos + 8
        yield cid, body, min(body + size, end)
        pos = body + size + (size & 1)


def parse_avi(blob: bytes) -> tuple[dict, list[tuple[int, str, int, int]]]:
    """(header, chunks): header has width/height/us_per_frame/
    total_frames/n_streams plus per-stream (fcc_type, fcc_handler);
    chunks is [(stream_no, kind, start, end)] in container order with
    kind in dc (compressed video) / db (uncompressed video) / wb
    (audio). Raises ValueError on a malformed container."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    header: dict = {}
    streams: list[tuple[str, str]] = []
    chunks: list[tuple[int, str, int, int]] = []

    # explicit generator stack, not recursion: a crafted blob of minimal
    # 12-byte LIST headers nests deeper than Python's recursion limit,
    # and the contract is ValueError (one ok=false row), never
    # RecursionError escaping to direct callers. The stack keeps the
    # depth-first IN-ORDER walk, so chunk order stays container order.
    stack = [_walk(blob, 12, len(blob))]
    while stack:
        item = next(stack[-1], None)
        if item is None:
            stack.pop()
            continue
        cid, bs, be = item
        if cid == b"LIST":
            stack.append(_walk(blob, bs + 4, be))  # skip the list type
        elif cid == b"avih" and be - bs >= 40:
            header.update(
                us_per_frame=_u4(blob, bs),
                total_frames=_u4(blob, bs + 16),
                n_streams=_u4(blob, bs + 24),
                width=_u4(blob, bs + 32),
                height=_u4(blob, bs + 36),
            )
        elif cid == b"strh" and be - bs >= 8:
            streams.append(
                (
                    blob[bs : bs + 4].decode("ascii", "replace"),
                    blob[bs + 4 : bs + 8].decode("ascii", "replace").strip(),
                )
            )
        elif (
            len(cid) == 4
            and cid[:2].isdigit()
            and cid[2:] in (b"dc", b"db", b"wb")
        ):
            chunks.append((int(cid[:2]), cid[2:].decode(), bs, be))

    if not header:
        raise ValueError("missing avih header")
    header["streams"] = streams
    return header, chunks


_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps", T.DoubleType(), True),
        T.StructField("declared_frames", T.IntegerType(), True),
        T.StructField("n_streams", T.IntegerType(), True),
        T.StructField("video_fourcc", T.StringType(), True),
        T.StructField("n_video_chunks", T.IntegerType(), True),
    ]
)


def video_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Container metadata without touching frame payloads: (id, ok,
    width, height, fps, declared_frames, n_streams, video_fourcc,
    n_video_chunks). Malformed containers emit ok=false; null payloads
    skip (the decode_media contract)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                if blob is None:
                    continue
                try:
                    hdr, chunks = parse_avi(bytes(blob))
                    vid = [s for s in hdr["streams"] if s[0] == "vids"]
                    usf = hdr["us_per_frame"]
                    rows.append(
                        (
                            mid,
                            True,
                            hdr["width"],
                            hdr["height"],
                            1e6 / usf if usf else None,
                            hdr["total_frames"],
                            hdr["n_streams"],
                            vid[0][1] if vid else None,
                            sum(1 for c in chunks if c[1] in ("dc", "db")),
                        )
                    )
                except Exception:
                    rows.append(
                        (mid, False, None, None, None, None, None, None, None)
                    )
            if not rows:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "ok": pd.Series([], dtype="bool"),
                        "width": pd.Series([], dtype="Int32"),
                        "height": pd.Series([], dtype="Int32"),
                        "fps": pd.Series([], dtype="float64"),
                        "declared_frames": pd.Series([], dtype="Int32"),
                        "n_streams": pd.Series([], dtype="Int32"),
                        "video_fourcc": pd.Series([], dtype="object"),
                        "n_video_chunks": pd.Series([], dtype="Int32"),
                    }
                )
                continue
            yield pd.DataFrame(rows, columns=[f.name for f in _META_SCHEMA]).astype(
                {id_col: "int64", "ok": "bool"}
            )

    return df.select(id_col, payload_col).mapInPandas(extract, _META_SCHEMA)


def avi_frames(
    df: DataFrame,
    stream: int = 0,
    every_k: int = 1,
    max_frames: int | None = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Extract video frame payloads from stream ``stream``: one row per
    kept frame — (id, frame_idx, t_ms, frame) — striding ``every_k`` and
    capped at ``max_frames`` (the sample_frames policy, now over a real
    container). ``frame_idx`` counts the stream's video chunks in
    container order; ``t_ms`` = idx * frame period from ``avih``.
    Malformed containers emit zero rows (count them via
    :func:`video_meta`); audio chunks are never materialized."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("t_ms", T.DoubleType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                if blob is None:
                    continue
                try:
                    b = bytes(blob)
                    hdr, chunks = parse_avi(b)
                except Exception:
                    continue
                period_ms = hdr["us_per_frame"] / 1000.0
                kept = 0
                idx = 0
                for sno, kind, bs, be in chunks:
                    if sno != stream or kind not in ("dc", "db"):
                        continue
                    if idx % every_k == 0 and (
                        max_frames is None or kept < max_frames
                    ):
                        rows.append((mid, idx, idx * period_ms, b[bs:be]))
                        kept += 1
                    idx += 1
            if not rows:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "frame_idx": pd.Series([], dtype="Int32"),
                        "t_ms": pd.Series([], dtype="float64"),
                        "frame": pd.Series([], dtype="object"),
                    }
                )
                continue
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "t_ms", "frame"]
            ).astype({id_col: "int64"})

    return df.select(id_col, payload_col).mapInPandas(extract, out_schema)

"""Fuzz the pure-Python media header parsers (image_header and its five
format parsers, wav_meta, flac_meta, parse_avi): the probe contract is
that a malformed blob costs ONE ``ok=false`` row — which holds only if
every parser's failure mode is ValueError (the exception the probe maps)
and never IndexError / struct.error / OverflowError escaping from an
unchecked offset. Three attack surfaces per parser: pure random bytes,
random bytes behind a VALID magic (the adversarial case — the dispatch
commits to the parser before the body is sane), and random
truncations/mutations of a valid fixture."""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from l1dbproto_spark.operators.audio import flac_meta, wav_meta
from l1dbproto_spark.operators.multimodal import image_header
from l1dbproto_spark.operators.video import parse_avi

_MAGICS = [
    b"P6",
    b"BM",
    b"\x89PNG\r\n\x1a\n",
    b"GIF89a",
    b"GIF87a",
    b"\xff\xd8",
    b"RIFF",
    b"fLaC",
]


def _valid_fixtures() -> list[bytes]:
    ihdr = struct.pack(">II5B", 4, 3, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    gif = b"GIF89a" + struct.pack("<HH", 4, 3) + b"\x00" * 4
    sof = struct.pack(">BHHB", 8, 3, 4, 1) + b"\x01\x11\x00"
    jpeg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 6) + b"JF\x00\x00"
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    )
    ppm = b"P6 4 3 255\n" + bytes(36)
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | 8000
    flac = (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
        + struct.pack(">HH", 16, 16) + b"\x00" * 6
        + packed.to_bytes(8, "big") + b"\x00" * 16
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 8) + bytes(8)
    )
    return [png, gif, jpeg, ppm, flac, wav]


def _probe_all(blob: bytes) -> None:
    """Every parser either returns or raises ValueError — nothing else.
    (parse_avi may also legitimately return for non-AVI RIFFs only if
    the magic matches, which random bytes essentially never do.)"""
    for fn in (image_header, wav_meta, flac_meta, parse_avi):
        try:
            fn(blob)
        except ValueError:
            pass


@settings(max_examples=300, deadline=None)
@given(blob=st.binary(max_size=300))
def test_random_bytes_raise_valueerror_only(blob):
    _probe_all(blob)


@settings(max_examples=300, deadline=None)
@given(
    magic=st.sampled_from(_MAGICS),
    body=st.binary(max_size=200),
)
def test_valid_magic_random_body(magic, body):
    _probe_all(magic + body)


@settings(max_examples=300, deadline=None)
@given(
    fixture=st.sampled_from(_valid_fixtures()),
    cut=st.integers(min_value=0, max_value=80),
    flip_at=st.integers(min_value=0, max_value=79),
    flip_to=st.integers(min_value=0, max_value=255),
)
def test_truncated_and_mutated_fixtures(fixture, cut, flip_at, flip_to):
    _probe_all(fixture[: max(len(fixture) - cut, 0)])
    if flip_at < len(fixture):
        mutated = bytearray(fixture)
        mutated[flip_at] = flip_to
        _probe_all(bytes(mutated))


def test_fixtures_actually_parse():
    """The fuzz corpus is built from blobs the parsers ACCEPT — otherwise
    the mutation test would be fuzzing dead inputs."""
    png, gif, jpeg, ppm, flac, wav = _valid_fixtures()
    assert image_header(png) == (4, 3, "png")
    assert image_header(gif) == (4, 3, "gif")
    assert image_header(jpeg) == (4, 3, "jpeg")
    assert image_header(ppm) == (4, 3, "ppm")
    assert flac_meta(flac) == (8000, 1, 16, 8000)
    assert wav_meta(wav) == (8000, 1, 16, 4)

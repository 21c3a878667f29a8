"""Deterministic synthetic "image" codec for CI and golden fixtures.

The container has no cv2/PIL and no GPU, so tests cannot decode real images.
Instead media bytes use a tiny self-describing binary format that embeds the
ground-truth text lines (position + contrast), letting the stub engine
"detect" and "recognize" them deterministically while exercising every branch
of the adaptive pipeline (tiling, overlap duplicates, low-contrast lines that
only the CLAHE pass recovers, corrupt blobs for the dead-letter path).

Layout (little-endian):
    magic   8s   b"FAKEIMG1"
    width   u32
    height  u32
    nlines  u32
    per line:
        x u32, y u32, w u32, h u32, contrast u8, tlen u16, text tlen bytes utf-8

A real deployment swaps this module for cv2.imdecode inside the same engine
interface (see engine/paddle.py) — the Spark-side plumbing is identical.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

MAGIC = b"FAKEIMG1"
_HDR = struct.Struct("<III")
_LINE_FIXED = struct.Struct("<IIIIBH")


@dataclass(frozen=True)
class FakeLine:
    x: int
    y: int
    w: int
    h: int
    contrast: int  # 0-255; low-contrast lines need the CLAHE pass to be read
    text: str


@dataclass(frozen=True)
class FakeImage:
    width: int
    height: int
    lines: tuple[FakeLine, ...]


def encode(width: int, height: int, lines: list[FakeLine]) -> bytes:
    out = [MAGIC, _HDR.pack(width, height, len(lines))]
    for ln in lines:
        t = ln.text.encode("utf-8")
        out.append(_LINE_FIXED.pack(ln.x, ln.y, ln.w, ln.h, ln.contrast, len(t)))
        out.append(t)
    return b"".join(out)


def decode(data: bytes) -> FakeImage:
    """Parse fake-image bytes; raises ValueError on corrupt input.

    The raise is the analogue of a failed cv2.imdecode — callers route it to
    the dead-letter table (semantics of reference workers/ocr/main.py:239-242:
    any per-job exception marks the job failed, the daemon survives).
    """
    if len(data) < len(MAGIC) + _HDR.size or data[: len(MAGIC)] != MAGIC:
        raise ValueError("not a FAKEIMG1 blob (corrupt or unsupported image)")
    w, h, n = _HDR.unpack_from(data, len(MAGIC))
    pos = len(MAGIC) + _HDR.size
    lines = []
    for _ in range(n):
        if pos + _LINE_FIXED.size > len(data):
            raise ValueError("truncated FAKEIMG1 blob")
        x, y, lw, lh, contrast, tlen = _LINE_FIXED.unpack_from(data, pos)
        pos += _LINE_FIXED.size
        if pos + tlen > len(data):
            raise ValueError("truncated FAKEIMG1 text")
        text = data[pos : pos + tlen].decode("utf-8")
        pos += tlen
        lines.append(FakeLine(x, y, lw, lh, contrast, text))
    return FakeImage(w, h, tuple(lines))

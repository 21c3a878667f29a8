"""Deterministic synthetic "PDF" codec — the layout-parse analogue of
fakeimg.py. No PDF library exists in this container, so tests use a tiny
self-describing binary that embeds the ground-truth layout blocks; a real
deployment swaps the decode for pypdf/pdfminer behind the same interface
(see operators/layout.py).

Layout (little-endian):
    magic   8s  b"FAKEPDF1"
    npages  u16
    per page:
        nblocks u16
        per block:
            kind u8 (0=heading 1=paragraph 2=table 3=caption)
            x u16, y u16, w u16, h u16
            tlen u16, text tlen bytes utf-8
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

MAGIC = b"FAKEPDF1"
_U16 = struct.Struct("<H")
_BLOCK = struct.Struct("<BHHHHH")

KINDS = ("heading", "paragraph", "table", "caption")


@dataclass(frozen=True)
class PdfBlock:
    kind: str
    x: int
    y: int
    w: int
    h: int
    text: str


def encode(pages: list[list[PdfBlock]]) -> bytes:
    out = [MAGIC, _U16.pack(len(pages))]
    for blocks in pages:
        out.append(_U16.pack(len(blocks)))
        for b in blocks:
            t = b.text.encode("utf-8")
            out.append(_BLOCK.pack(KINDS.index(b.kind), b.x, b.y, b.w, b.h, len(t)))
            out.append(t)
    return b"".join(out)


def decode(data: bytes) -> list[list[PdfBlock]]:
    if len(data) < len(MAGIC) + 2 or data[: len(MAGIC)] != MAGIC:
        raise ValueError("not a FAKEPDF1 blob (corrupt or unsupported pdf)")
    pos = len(MAGIC)
    (npages,) = _U16.unpack_from(data, pos)
    pos += 2
    pages = []
    for _ in range(npages):
        if pos + 2 > len(data):
            raise ValueError("truncated FAKEPDF1")
        (nblocks,) = _U16.unpack_from(data, pos)
        pos += 2
        blocks = []
        for _ in range(nblocks):
            if pos + _BLOCK.size > len(data):
                raise ValueError("truncated FAKEPDF1 block")
            kind_i, x, y, w, h, tlen = _BLOCK.unpack_from(data, pos)
            pos += _BLOCK.size
            if kind_i >= len(KINDS) or pos + tlen > len(data):
                raise ValueError("bad FAKEPDF1 block")
            text = data[pos : pos + tlen].decode("utf-8")
            pos += tlen
            blocks.append(PdfBlock(KINDS[kind_i], x, y, w, h, text))
        pages.append(blocks)
    return pages

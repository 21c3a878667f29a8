"""Deterministic synthetic corpus generator (interleaved text+media docs).

The driver's /root/testdata tables are flat TPC-H-ish tables; the graft's
authoritative input shape (BASELINE.json input_hint) is the interleaved
documents table + a media side-table. This module synthesizes both,
seeded and pure, at any scale — used by tests (tiny), golden fixtures, and
bench.py (sf-scaled). Knobs follow FIXTURES.md: spans/doc 1-40, media
fraction ~0.3, ~5% invalid media keys, a long tail of media-heavy docs for
skew, image heights covering NO_TILE / TILE_MED / TILE_LONG, a few corrupt
blobs for the dead-letter path.
"""

from __future__ import annotations

import hashlib
import random

from .engine.fakeimg import FakeLine, encode

WORDS = (
    "the quick brown fox jumps over lazy dog panel speech bubble hero villain "
    "chapter scene night city rooftop shadow blade whisper thunder echo dream "
    "gate stone river flame glass mirror crown oath storm ember dawn dusk"
).split()


def _text(rng: random.Random, lo: int = 3, hi: int = 10) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))


def make_media_bytes(rng: random.Random, height_class: str) -> bytes:
    """One synthetic page image. height_class ∈ {short, med, long} maps to the
    reference planner's bands (<=3500 / <=12000 / >12000,
    ocr_engine.py:479-505)."""
    if height_class == "short":
        height = rng.randint(800, 3400)
    elif height_class == "med":
        height = rng.randint(3600, 11800)
    else:
        height = rng.randint(12500, 30000)
    width = rng.randint(600, 1100)
    n_lines = max(1, height // rng.randint(250, 600))
    lines = []
    y = rng.randint(10, 120)
    for _ in range(n_lines):
        if y + 60 >= height:
            break
        # ~15% low-contrast lines: invisible to pass A (conf < 0.3 floor),
        # recovered by the enhance pass — keeps pass-B/fallback paths hot.
        contrast = rng.randint(10, 60) if rng.random() < 0.15 else rng.randint(90, 250)
        lines.append(
            FakeLine(
                x=rng.randint(0, width // 2),
                y=y,
                w=rng.randint(80, width // 2),
                h=rng.randint(18, 48),
                contrast=contrast,
                text=_text(rng),
            )
        )
        y += rng.randint(60, 420)
    return encode(width, height, lines)


def generate_corpus(
    n_docs: int,
    seed: int = 42,
    media_fraction: float = 0.3,
    corrupt_fraction: float = 0.01,
    skew_heavy_fraction: float = 0.02,
) -> tuple[list[dict], list[dict]]:
    """Returns (documents_rows, media_rows) as plain dicts ready for
    spark.createDataFrame against schemas.DOCUMENTS / schemas.MEDIA."""
    rng = random.Random(seed)
    docs: list[dict] = []
    media: list[dict] = []
    for d in range(n_docs):
        doc_id = f"work{d % 97:04d}-ed{d % 7:02d}-doc{d:06d}"
        heavy = rng.random() < skew_heavy_fraction
        n_spans = rng.randint(25, 40) if heavy else rng.randint(1, 12)
        spans = []
        for off in range(n_spans):
            is_media = rng.random() < (0.8 if heavy else media_fraction)
            if is_media:
                if rng.random() < 0.05:
                    # invalid key grammar — exercises the fallback output-key
                    # path (reference key_parser.py:53-60)
                    ref = f"blob/opaque/{doc_id}/{off}.bin"
                else:
                    # page number encodes (doc, offset) so media_ref is unique
                    ref = (
                        f"raw/manhwa/work{d % 97:04d}/ed{d % 7:02d}/"
                        f"chapter-{d % 500:04d}/page-{d * 100 + off}.jpg"
                    )
                hclass = rng.choices(
                    ["short", "med", "long"], weights=[0.75, 0.2, 0.05]
                )[0]
                if rng.random() < corrupt_fraction:
                    content = b"\x89PNG corrupt" + bytes(rng.getrandbits(8) for _ in range(32))
                else:
                    content = make_media_bytes(rng, hclass)
                media.append(
                    {
                        "media_ref": ref,
                        "content": content,
                        "byte_size": len(content),
                        "sha256": hashlib.sha256(content).hexdigest(),
                    }
                )
                spans.append(
                    {"kind": "media", "text": None, "media_ref": ref, "offset": off}
                )
            else:
                spans.append(
                    {
                        "kind": "text",
                        "text": _text(rng, 5, 30),
                        "media_ref": None,
                        "offset": off,
                    }
                )
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs, media

"""Deterministic stub OCR backend over the FAKEIMG1 codec.

Pure function of the input bytes — no ML deps, identical output on every run
and every worker, which is what golden-fixture span-sequence equality needs.
Behavior is shaped so every branch of the adaptive pipeline gets real work:

- lines in tile-overlap regions are detected by both tiles (NMS dedup work);
- low-contrast lines fall under the drop-score floor in pass A and are only
  recovered after ``enhance`` (the CLAHE pass-B path, reference
  workers/ocr/ocr_engine.py:611-635);
- confidence is a pure function of effective contrast, rounded to 4 decimals
  exactly like the reference (ocr_engine.py:347).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from .base import LineDict
from .fakeimg import FakeImage, decode as fake_decode

DROP_SCORE = 0.3        # reference ocr_engine.py:50 (PaddleOCR drop_score)
ENHANCE_BOOST = 96      # contrast points added by the stub "CLAHE"
MIN_VISIBLE_FRAC = 0.5  # a line is detected iff ≥50% of its height is in-tile

# Calibrated compute emulation: a real recognizer costs time proportional to
# pixels (reference: 1-3s short / 8-20s long images on an A5000,
# DEPLOY_RUNPOD.md:165-168). OCR_STUB_COST=k burns ~k sha256 rounds per
# 100k pixels per recognize() call, so throughput benchmarks exercise the
# compute-bound profile a real engine has. 0 (default) = off for fast CI.
try:
    _COST = int(os.environ.get("OCR_STUB_COST", "0"))
except ValueError:  # bad env must not kill every executor worker at import
    _COST = 0
_BURN_BUF = b"\x5a" * 262144


def _burn(pixels: int) -> None:
    if _COST <= 0:
        return
    h = hashlib.sha256()
    for _ in range(max(1, pixels * _COST // 100_000)):
        h.update(_BURN_BUF)


@dataclass(frozen=True)
class StubTile:
    image: FakeImage
    y_start: int
    y_end: int
    enhanced: bool = False


def _confidence(contrast: int, enhanced: bool) -> float:
    eff = min(255, contrast + ENHANCE_BOOST) if enhanced else contrast
    return round(0.05 + 0.90 * eff / 255.0, 4)


class StubEngine:
    """Engine implementation for CI / goldens (see engine/base.Engine)."""

    def decode(self, data: bytes) -> FakeImage:
        return fake_decode(data)

    def dimensions(self, image: FakeImage) -> tuple[int, int]:
        return image.width, image.height

    def crop(self, image: FakeImage, y_start: int, y_end: int) -> StubTile:
        return StubTile(image, y_start, y_end, enhanced=False)

    def enhance(self, tile: StubTile) -> StubTile:
        return StubTile(tile.image, tile.y_start, tile.y_end, enhanced=True)

    def recognize(self, tile: StubTile) -> list[LineDict]:
        _burn(tile.image.width * (tile.y_end - tile.y_start))
        out: list[LineDict] = []
        for ln in tile.image.lines:
            top, bot = ln.y, ln.y + ln.h
            visible = min(bot, tile.y_end) - max(top, tile.y_start)
            if ln.h <= 0 or visible / ln.h < MIN_VISIBLE_FRAC:
                continue
            conf = _confidence(ln.contrast, tile.enhanced)
            if conf < DROP_SCORE:
                continue
            # tile-local coords; 4-point box like the reference's
            # normalized output (ocr_engine.py:337-349)
            x0, y0 = float(ln.x), float(ln.y - tile.y_start)
            x1, y1 = float(ln.x + ln.w), float(ln.y - tile.y_start + ln.h)
            out.append(
                {
                    "text": ln.text,
                    "confidence": conf,
                    "bbox": [[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                }
            )
        return out

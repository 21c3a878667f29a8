"""Real-image OCR backend (PaddleOCR/cv2) — env-gated, not available in CI.

Mirrors the reference's engine configuration (workers/ocr/ocr_engine.py:22-69:
PP-OCRv4, lang=en, use_angle_cls=False, det_limit_side_len=4096,
det_db_thresh=0.15, det_db_box_thresh=0.35, det_db_unclip_ratio=2.5,
rec_batch_num=6, drop_score=0.3) and its CLAHE parameters
(ocr_engine.py:356-377: clipLimit=2.0, tileGridSize=(8,8)).

The container for this build has neither cv2 nor paddleocr, so construction
raises unless the deps are importable; the Spark plumbing (schemas, Arrow
batching, tiling, dedup) is identical to the stub path and fully tested there.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from .base import LineDict

try:  # pragma: no cover - not installed in CI
    import cv2
    import numpy as np

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False

try:  # pragma: no cover
    from paddleocr import PaddleOCR

    _HAVE_PADDLE = True
except Exception:  # pragma: no cover
    _HAVE_PADDLE = False


@dataclass
class NdTile:
    pixels: Any  # np.ndarray view
    y_start: int
    y_end: int
    enhanced: bool = False


class PaddleEngine:  # pragma: no cover - requires GPU deps
    def __init__(self) -> None:
        if not (_HAVE_CV2 and _HAVE_PADDLE):
            raise NotImplementedError(
                "PaddleEngine needs cv2 + paddleocr (not in this container); "
                "set OCR_ENGINE=stub for the deterministic backend"
            )
        self._ocr = PaddleOCR(
            use_angle_cls=False,
            lang="en",
            det_limit_side_len=4096,
            det_db_thresh=0.15,
            det_db_box_thresh=0.35,
            det_db_unclip_ratio=2.5,
            rec_batch_num=6,
            drop_score=0.3,
            show_log=False,
        )

    def decode(self, data: bytes) -> Any:
        arr = np.frombuffer(data, dtype=np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("cv2.imdecode failed (corrupt or unsupported image)")
        return img

    def dimensions(self, image: Any) -> tuple[int, int]:
        h, w = image.shape[:2]
        return w, h

    def crop(self, image: Any, y_start: int, y_end: int) -> NdTile:
        return NdTile(image[y_start:y_end], y_start, y_end)

    def enhance(self, tile: NdTile) -> NdTile:
        gray = cv2.cvtColor(tile.pixels, cv2.COLOR_BGR2GRAY)
        clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
        eq = clahe.apply(gray)
        return NdTile(
            cv2.cvtColor(eq, cv2.COLOR_GRAY2BGR), tile.y_start, tile.y_end, True
        )

    def recognize(self, tile: NdTile) -> list[LineDict]:
        raw = self._ocr.ocr(tile.pixels, cls=False)
        out: list[LineDict] = []
        for page in raw or []:
            for det in page or []:
                bbox, (text, conf) = det
                out.append(
                    {
                        "text": str(text),
                        "confidence": round(float(conf), 4),
                        "bbox": [[float(p[0]), float(p[1])] for p in bbox],
                    }
                )
        return out

"""Legacy pipeline + mode dispatch parity (reference main.py:129-166,
ocr_engine.py:196-244 dedup v1, :758-869 fixed-tile path)."""

import pytest

from chapterbridge_ocr_worker_spark.engine.fakeimg import FakeLine, encode
from chapterbridge_ocr_worker_spark.engine.inner import (
    deduplicate_boxes,
    deduplicate_lines,
    dispatch,
    run_plain,
    run_with_tiling,
)
from chapterbridge_ocr_worker_spark.engine.stub import StubEngine


def box(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]


def test_dedup_v1_conf_desc_no_retro_evict():
    low = {"text": "same words", "confidence": 0.5, "bbox": box(0, 0, 100, 20)}
    high = {"text": "same words", "confidence": 0.9, "bbox": box(2, 1, 101, 21)}
    # v1 sorts conf-desc first, so input order never matters
    assert deduplicate_boxes([low, high]) == [high]
    assert deduplicate_boxes([high, low]) == [high]


def test_dedup_v1_vs_v2_threshold_difference():
    # IoU between these two boxes is ~0.55: a dup for v1 (thr 0.5 on the
    # legacy path) but NOT for v2 (thr 0.6 on the adaptive path)
    a = {"text": "hello there", "confidence": 0.9, "bbox": box(0, 0, 100, 20)}
    b = {"text": "hello there", "confidence": 0.8, "bbox": box(0, 6, 100, 26)}
    from chapterbridge_ocr_worker_spark.engine.inner import bbox_iou

    iou = bbox_iou(a["bbox"], b["bbox"])
    assert 0.5 < iou < 0.6
    assert len(deduplicate_boxes([a, b], iou_threshold=0.5)) == 1
    assert len(deduplicate_lines([a, b], iou_threshold=0.6)) == 2


def test_legacy_tiling_dedups_overlap_and_sorts():
    eng = StubEngine()
    lines = [
        FakeLine(10, 100, 200, 30, 200, "top"),
        FakeLine(10, 1850, 200, 30, 200, "in overlap"),  # tile 2000/200 overlap
        FakeLine(10, 3500, 200, 30, 200, "bottom"),
    ]
    res = run_with_tiling(encode(800, 4000, lines), eng)
    assert res["strategy"] == "TILING_LEGACY"
    assert [l["text"] for l in res["lines"]] == ["top", "in overlap", "bottom"]


def test_legacy_fatal_falls_back_then_propagates():
    eng = StubEngine()
    # corrupt bytes: tiling's catch-all falls back to run_plain (reference
    # ocr_engine.py:864-869), which also can't decode -> the error surfaces
    # to the caller, where the UDF dead-letters it
    with pytest.raises(ValueError):
        run_with_tiling(b"corrupt bytes", eng)
    with pytest.raises(ValueError):
        run_plain(b"corrupt", eng)


def test_legacy_tiling_skips_failed_tile_only():
    # per-tile try/except (reference ocr_engine.py:817-836): one bad tile is
    # skipped, detections from the other tiles survive
    class FlakyEngine(StubEngine):
        def recognize(self, tile):
            if tile.y_start == 1800:  # second tile of 800x4000 @ 2000/200
                raise RuntimeError("simulated tile failure")
            return super().recognize(tile)

    lines = [
        FakeLine(10, 100, 200, 30, 200, "top"),       # tile 0 only
        FakeLine(10, 2500, 200, 30, 200, "middle"),   # failing tile only
        FakeLine(10, 3700, 200, 30, 200, "bottom"),   # tile 2 only
    ]
    res = run_with_tiling(encode(800, 4000, lines), FlakyEngine())
    assert res["strategy"] == "TILING_LEGACY"
    assert [l["text"] for l in res["lines"]] == ["top", "bottom"]


def test_dispatch_default_is_reference_legacy(monkeypatch):
    # reference main.py:132 defaults OCR_ADAPTIVE=false -> legacy auto mode
    monkeypatch.delenv("OCR_ADAPTIVE", raising=False)
    monkeypatch.delenv("OCR_USE_TILING", raising=False)
    eng = StubEngine()
    tall = encode(800, 2500, [FakeLine(10, 100, 200, 30, 200, "x")])
    short = encode(800, 900, [FakeLine(10, 100, 200, 30, 200, "x")])
    assert dispatch(tall, eng)["strategy"] == "TILING_LEGACY"
    assert dispatch(short, eng)["strategy"] == "PLAIN"


def test_dispatch_modes(monkeypatch):
    eng = StubEngine()
    tall = encode(800, 2500, [FakeLine(10, 100, 200, 30, 200, "x")])
    short = encode(800, 900, [FakeLine(10, 100, 200, 30, 200, "x")])

    monkeypatch.setenv("OCR_ADAPTIVE", "true")
    assert dispatch(short, eng)["strategy"] == "NO_TILE"

    monkeypatch.setenv("OCR_ADAPTIVE", "false")
    monkeypatch.setenv("OCR_USE_TILING", "never")
    assert dispatch(tall, eng)["strategy"] == "PLAIN"

    monkeypatch.setenv("OCR_USE_TILING", "always")
    assert dispatch(short, eng)["strategy"] == "TILING_LEGACY"

    monkeypatch.setenv("OCR_USE_TILING", "auto")
    assert dispatch(tall, eng)["strategy"] == "TILING_LEGACY"  # h>2000
    assert dispatch(short, eng)["strategy"] == "PLAIN"

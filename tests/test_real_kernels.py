"""Both sides of the import gates for the real (non-FAKEIMG) kernels.

This container has no cv2/PIL/pypdf, so here the *absent* side runs: a real
jpeg/png/pdf blob must dead-letter with NotImplementedError — never kill the
task — and the gated function itself must raise cleanly. Where the libraries
exist, the skipif-inverted tests exercise the real decode/draw/parse bodies.
Pure kernel-level tests (the batch iterators take pandas directly): no
SparkSession needed.
"""

from __future__ import annotations

import pandas as pd
import pytest

from chapterbridge_ocr_worker_spark.operators import debug_overlay, layout, multimodal

PNG_MAGIC = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
JPEG_MAGIC = b"\xff\xd8\xff\xe0" + b"\x00" * 64
PDF_MAGIC = b"%PDF-1.7\n" + b"\x00" * 64

HAVE_CV2 = multimodal._HAVE_CV2
HAVE_PYPDF = layout._HAVE_PYPDF
try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# --- absent side: clean NotImplementedError, per-row dead-letter ----------


@pytest.mark.skipif(HAVE_CV2, reason="covers the cv2-ABSENT gate")
def test_decode_real_raises_cleanly_without_cv2():
    with pytest.raises(NotImplementedError, match="cv2"):
        multimodal._decode_real(PNG_MAGIC)


@pytest.mark.skipif(HAVE_CV2, reason="covers the cv2-ABSENT gate")
def test_real_raster_rows_dead_letter_not_crash():
    batch = pd.DataFrame(
        {"media_ref": ["a.png", "b.jpg"], "content": [PNG_MAGIC, JPEG_MAGIC]}
    )
    out = pd.concat(list(multimodal._meta_batches(iter([batch]))))
    assert list(out["format"]) == ["png", "jpeg"]
    assert out["error"].str.contains("cv2").all()
    assert out["width"].isna().all()


@pytest.mark.skipif(HAVE_PIL, reason="covers the PIL-ABSENT gate")
def test_overlay_real_raises_cleanly_without_pil():
    with pytest.raises(NotImplementedError, match="PIL"):
        debug_overlay._overlay_real(PNG_MAGIC, [])


@pytest.mark.skipif(HAVE_PYPDF, reason="covers the pypdf-ABSENT gate")
def test_pdf_rows_dead_letter_not_crash():
    batch = pd.DataFrame({"doc_id": ["d1"], "content": [PDF_MAGIC]})
    out = pd.concat(list(layout._layout_batches(iter([batch]))))
    assert len(out) == 1
    assert "pypdf" in out["error"].iloc[0]


# --- present side: the real kernel bodies (skipped in this container) -----


@pytest.mark.skipif(not HAVE_CV2, reason="cv2 not in this container")
def test_decode_and_quartet_real_png():  # pragma: no cover - needs cv2
    import cv2
    import numpy as np

    img = np.zeros((120, 80, 3), dtype=np.uint8)
    img[10:40, 5:60] = 200
    ok, buf = cv2.imencode(".png", img)
    assert ok
    data = buf.tobytes()

    decoded, w, h, ch = multimodal._decode_real(data)
    assert (w, h, ch) == (80, 120, 3)

    batch = pd.DataFrame({"media_ref": ["x.png"], "content": [data]})
    meta = pd.concat(list(multimodal._meta_batches(iter([batch]))))
    assert meta["error"].isna().all()
    assert int(meta["width"].iloc[0]) == 80
    assert int(meta["height"].iloc[0]) == 120

    with pytest.raises(ValueError, match="imdecode"):
        multimodal._decode_real(PNG_MAGIC)  # magic only, corrupt body


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not in this container")
def test_overlay_real_draws():  # pragma: no cover - needs PIL
    import io

    from PIL import Image

    src = Image.new("RGB", (100, 60), (255, 255, 255))
    buf = io.BytesIO()
    src.save(buf, format="PNG")
    lines = [
        {
            "text": "hello",
            "confidence": 0.91,
            "bbox": [[5.0, 30.0], [60.0, 30.0], [60.0, 45.0], [5.0, 45.0]],
        }
    ]
    out = debug_overlay._overlay_real(buf.getvalue(), lines)
    annotated = Image.open(io.BytesIO(out))
    assert annotated.size == (100, 60)
    assert out != buf.getvalue()  # something was drawn


@pytest.mark.skipif(not HAVE_PYPDF, reason="pypdf not in this container")
def test_pdf_real_parse():  # pragma: no cover - needs pypdf
    import io

    from pypdf import PdfWriter

    w = PdfWriter()
    w.add_blank_page(width=200, height=200)
    buf = io.BytesIO()
    w.write(buf)
    pages = layout._decode_real_pdf(buf.getvalue())
    assert len(pages) == 1  # blank page -> zero blocks, but parsed
    assert pages[0] == []

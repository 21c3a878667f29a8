"""F12: debug overlay — bbox polygons + labels rendered onto the page image.

Clean-room graft of the reference's ``draw_debug_boxes``
(workers/ocr/ocr_engine.py:247-293): for every detected line, draw its box
and a ``"{text[:20]}... ({conf:.2f})"`` label at (x0, y0-25); the reference
saves the annotated image to OCR_DEBUG_DIR per job. In Spark the analogue
is a DEBUG-ARTIFACT TABLE: one annotated image blob per OCR'd media span,
written like any other sink (a cluster has no shared local debug dir).

Rendering backends follow the engine pattern: over the FAKEIMG codec the
"drawing" appends annotation lines (label text at the label position,
contrast 255) to the decoded image and re-encodes — deterministic and
assertable; the real-image path (PIL ImageDraw, exactly the reference's
kernel) is import-gated the same way engine/paddle.py gates PaddleOCR.

Scale shape: Arrow-batched mapInPandas over (media bytes x lines), same
unit of work as the OCR UDF; errors dead-letter per row, never the task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..engine import fakeimg

DEBUG_OVERLAY = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("debug_ref", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("byte_size", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def _label(text: str, conf: float) -> str:
    # reference ocr_engine.py:282-283 verbatim label format
    return f"{text[:20]}... ({conf:.2f})" if len(text) > 20 else f"{text} ({conf:.2f})"


def _overlay_fake(content: bytes, lines: list) -> bytes:
    """Annotate a FAKEIMG blob: original lines + one label line per
    detection at (x0, y0-25), the reference's label anchor."""
    img = fakeimg.decode(bytes(content))
    annotations = []
    for ln in lines:
        bbox = ln["bbox"]
        x0, y0 = int(bbox[0][0]), int(bbox[0][1])
        annotations.append(
            fakeimg.FakeLine(
                x=x0,
                y=max(0, y0 - 25),
                w=20,
                h=20,
                contrast=255,
                text=_label(ln["text"], float(ln["confidence"])),
            )
        )
    return fakeimg.encode(img.width, img.height, list(img.lines) + annotations)


def _overlay_real(content: bytes, lines: list) -> bytes:
    """Real-image path: PIL ImageDraw, the same polygon+label shape as the
    reference's kernel (ocr_engine.py:247-293) — a polygon per detection
    bbox plus the label at (x0, y0-25). Deliberate divergences from the
    reference: red width-1 outline and red label (reference: width=2 outline
    with a blue truetype label + optional title banner), and y0-25 clamped
    at 0 so labels for top-edge detections stay inside the canvas.
    Import-gated: PIL is absent in this container, where a
    non-FAKEIMG blob dead-letters with this NotImplementedError instead of
    killing the task (tests/test_real_kernels.py covers both gate sides)."""
    try:
        from PIL import Image, ImageDraw
    except ImportError as exc:
        raise NotImplementedError("PIL not available for real-image overlays") from exc
    import io  # pragma: no cover - below runs only where PIL exists

    img = Image.open(io.BytesIO(bytes(content))).convert("RGB")
    draw = ImageDraw.Draw(img)
    for ln in lines:
        pts = [(float(p[0]), float(p[1])) for p in ln["bbox"]]
        draw.polygon(pts, outline=(255, 0, 0))
        x0, y0 = pts[0]
        draw.text(
            (x0, max(0.0, y0 - 25)),
            _label(ln["text"], float(ln["confidence"])),
            fill=(255, 0, 0),
        )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _overlay_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in DEBUG_OVERLAY.fields}
        for doc_id, offset, media_ref, content, lines in zip(
            pdf["doc_id"], pdf["offset"], pdf["media_ref"], pdf["content"], pdf["lines"]
        ):
            row: dict = {
                "doc_id": doc_id,
                "offset": int(offset),
                "media_ref": media_ref,
                "debug_ref": f"debug/{media_ref}#%d.overlay" % int(offset),
                "content": None,
                "byte_size": None,
                "error": None,
            }
            try:
                if content is None:
                    raise ValueError("media_ref has no content (missing blob)")
                line_dicts = [
                    {"text": l["text"], "confidence": l["confidence"], "bbox": l["bbox"]}
                    for l in (lines if lines is not None else [])
                ]
                blob = (
                    _overlay_fake(bytes(content), line_dicts)
                    if bytes(content)[:8] == fakeimg.MAGIC
                    else _overlay_real(bytes(content), line_dicts)
                )
                row["content"] = blob
                row["byte_size"] = len(blob)
            except Exception as exc:  # dead-letter, never crash the task
                row["error"] = str(exc)[:1000]
            for k, v in row.items():
                out[k].append(v)
        yield pd.DataFrame(out)


def render_debug_overlays(ocr_results: DataFrame, media: DataFrame) -> DataFrame:
    """Successful OCR rows + media blobs -> annotated debug images.

    The join re-attaches the image bytes (the OCR stage dropped them);
    media is the big side, same equi-join shape as the pipeline's blob
    join — bucket both by media_ref at scale to make it shuffle-free.
    """
    ok = ocr_results.filter(F.col("error").isNull()).select(
        "doc_id", "offset", "media_ref", "lines"
    )
    return ok.join(media.select("media_ref", "content"), "media_ref", "left").mapInPandas(
        _overlay_batches, schema=DEBUG_OVERLAY
    )

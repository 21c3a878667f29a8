"""PDF / layout parsing: binary docs -> typed, reading-ordered blocks.

Third member of the north-rule extraction family (HTML boilerplate strip,
OCR, PDF/layout parse). Same Spark shape as the OCR stage: opaque binary
column in, Arrow-batched ``mapInPandas``, typed rows out, errors
dead-lettered per row. Blocks come back in reading order (page, then
(y, x) within page — the same ordering invariant as OCR lines,
reference ocr_engine.py:684) and boilerplate-ish blocks can be filtered
relationally afterwards (headings/captions carry their kind).

The real decode kernel (pypdf/pdfminer) is not in this container; it is
gated behind an import-try exactly like cv2 in engine/paddle.py. The
FAKEPDF1 codec carries ground truth for CI.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..engine import fakepdf

try:  # pragma: no cover - real kernel, not in this container
    import pypdf  # noqa: F401

    _HAVE_PYPDF = True
except Exception:
    _HAVE_PYPDF = False

LAYOUT_BLOCK = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("block_idx", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("bbox", T.ArrayType(T.IntegerType())),  # x,y,w,h
        T.StructField("error", T.StringType()),
    ]
)


def _decode_real_pdf(data: bytes) -> list[list[fakepdf.PdfBlock]]:
    """pypdf extraction kernel behind the import gate (pypdf is absent in
    this container; tests/test_real_kernels.py covers both gate sides).

    pypdf exposes page text but no glyph geometry, so blocks are emitted in
    extraction order with synthetic reading-order bboxes (x=0, y=line
    index) and kind='paragraph' — already enough for main_text_from_blocks.
    Swap in pdfminer's LTPage boxes for true layout; the FAKEPDF1 codec
    (the CI path) carries real geometry."""
    if not _HAVE_PYPDF:
        raise NotImplementedError(
            "real PDF parse needs pypdf/pdfminer (not in this container)"
        )
    import io  # pragma: no cover - below runs only where pypdf exists

    from pypdf import PdfReader

    reader = PdfReader(io.BytesIO(data))
    pages = []
    for page in reader.pages:
        text = page.extract_text() or ""
        lines = [ln for ln in text.splitlines() if ln.strip()]
        pages.append(
            [
                fakepdf.PdfBlock("paragraph", 0, i, max(len(ln), 1), 1, ln)
                for i, ln in enumerate(lines)
            ]
        )
    return pages


def _decode(data: bytes):
    if data[:8] == fakepdf.MAGIC:
        return fakepdf.decode(data)
    if data[:5] == b"%PDF-":
        return _decode_real_pdf(data)
    raise ValueError("unsupported document format (not FAKEPDF1/%PDF)")


def _layout_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf_batch in batches:
        out: dict[str, list] = {f.name: [] for f in LAYOUT_BLOCK.fields}

        def emit(doc_id, page, idx, kind, text, bbox, error):
            out["doc_id"].append(doc_id)
            out["page"].append(page)
            out["block_idx"].append(idx)
            out["kind"].append(kind)
            out["text"].append(text)
            out["bbox"].append(bbox)
            out["error"].append(error)

        for doc_id, content in zip(pdf_batch["doc_id"], pdf_batch["content"]):
            did = str(doc_id)
            try:
                pages = _decode(bytes(content))
            except Exception as exc:  # dead-letter row, job lives
                emit(did, None, None, None, None, None, str(exc)[:1000])
                continue
            for pno, blocks in enumerate(pages):
                ordered = sorted(blocks, key=lambda b: (b.y, b.x))
                for idx, b in enumerate(ordered):
                    emit(did, pno, idx, b.kind, b.text, [b.x, b.y, b.w, b.h], None)
        yield pd.DataFrame(out)


def parse_layout(docs: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, content:binary) -> LAYOUT_BLOCK rows in reading order."""
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(content_col).alias("content"),
    ).mapInPandas(_layout_batches, schema=LAYOUT_BLOCK)


def main_text_from_blocks(blocks: DataFrame) -> DataFrame:
    """Relational main-content step over parsed blocks: drop captions and
    table cells, keep headings+paragraphs, reassemble per doc in reading
    order — the PDF twin of the HTML link-density filter."""
    keep = blocks.filter(
        F.col("error").isNull() & F.col("kind").isin("heading", "paragraph")
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("page", "block_idx", "text"))
    )
    return (
        keep.groupBy("doc_id")
        .agg(ordered.alias("blocks"))
        .select(
            "doc_id",
            F.concat_ws("\n", F.transform("blocks", lambda b: b["text"])).alias(
                "main_text"
            ),
            F.size("blocks").alias("n_blocks"),
        )
    )

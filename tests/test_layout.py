"""PDF/layout parse: codec roundtrip, reading order, main-text assembly,
dead-letter on corrupt bytes."""

import pytest

from chapterbridge_ocr_worker_spark.engine.fakepdf import PdfBlock, decode, encode
from chapterbridge_ocr_worker_spark.operators.layout import (
    main_text_from_blocks,
    parse_layout,
)


def sample_pdf():
    return encode(
        [
            [
                PdfBlock("paragraph", 10, 200, 400, 60, "first para"),
                PdfBlock("heading", 10, 50, 400, 30, "The Title"),
                PdfBlock("caption", 10, 400, 200, 20, "fig 1: noise"),
            ],
            [
                PdfBlock("table", 10, 100, 400, 100, "a|b|c"),
                PdfBlock("paragraph", 10, 300, 400, 60, "second page para"),
            ],
        ]
    )


def test_codec_roundtrip_and_corrupt():
    pages = decode(sample_pdf())
    assert len(pages) == 2 and pages[0][1].text == "The Title"
    with pytest.raises(ValueError):
        decode(b"%PDF-1.7 not really")  # real pdf -> NotImplemented path is
        # exercised below via spark; raw decode of garbage raises
    with pytest.raises(ValueError):
        decode(b"garbage")


def test_parse_layout_reading_order_and_main_text(spark):
    docs = spark.createDataFrame(
        [("d1", bytearray(sample_pdf())), ("d2", bytearray(b"garbage"))],
        ["doc_id", "content"],
    )
    blocks = parse_layout(docs)
    rows = blocks.filter("doc_id = 'd1'").orderBy("page", "block_idx").collect()
    # reading order within page: heading (y=50) before paragraph (y=200)
    assert [(r["page"], r["kind"]) for r in rows] == [
        (0, "heading"),
        (0, "paragraph"),
        (0, "caption"),
        (1, "table"),
        (1, "paragraph"),
    ]
    # corrupt doc dead-letters, doesn't crash
    bad = blocks.filter("doc_id = 'd2'").collect()
    assert len(bad) == 1 and "unsupported" in bad[0]["error"]

    main = {r["doc_id"]: r for r in main_text_from_blocks(blocks).collect()}
    assert main["d1"]["main_text"] == "The Title\nfirst para\nsecond page para"
    assert main["d1"]["n_blocks"] == 3
    assert "d2" not in main

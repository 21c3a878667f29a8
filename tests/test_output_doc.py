"""F13 golden parity: the nested output document must match a single-process
twin of the reference's build_ocr_output (ocr_engine.py:872-926) per media
span, typed field-for-field."""

import hashlib
import re

from chapterbridge_ocr_worker_spark import datagen, schemas
from chapterbridge_ocr_worker_spark.engine.inner import run_adaptive
from chapterbridge_ocr_worker_spark.engine.stub import StubEngine
from chapterbridge_ocr_worker_spark.operators.output_doc import (
    build_output_documents,
    serialize_output_documents,
)
from chapterbridge_ocr_worker_spark.operators.resume import split_failures
from chapterbridge_ocr_worker_spark.pipeline import run_extraction

KEY_RE = re.compile(
    r"^raw/manhwa/([^/]+)/([^/]+)/(chapter-\d+)/(page-\d+)\.\w+$"
)


def golden_doc(media_ref, doc_id, lines):
    """Pure-python twin of reference build_ocr_output + the graft's
    documented identifier mapping (output_doc.py module docstring)."""
    m = KEY_RE.match(media_ref)
    asset_id = hashlib.sha256(media_ref.encode()).hexdigest()
    if m:
        work, ed, chap, page = m.groups()
        out_key = f"derived/manhwa/{work}/{ed}/{chap}/ocr/{page}.json"
        chapter = int(chap.split("-")[1])
        pageno = int(page.split("-")[1])
    else:
        work = ed = chapter = pageno = None
        out_key = f"derived/manhwa/unknown/unknown/ocr/{asset_id}.json"
    return out_key, {
        "version": "ocr_v1",
        "engine": "stub",
        "source": {"raw_asset_id": asset_id, "raw_r2_key": media_ref},
        "metadata": {
            "work_id": work,
            "edition_id": ed,
            "segment_id": doc_id,
            "chapter": chapter,
            "page": pageno,
            "source_key": media_ref,
        },
        "stats": {"line_count": len(lines)},
        "lines": [(l["text"], l["confidence"], l["bbox"]) for l in lines],
    }


def test_output_docs_match_reference_shape(spark):
    docs, media = datagen.generate_corpus(n_docs=25, seed=11, corrupt_fraction=0.05)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    media_df = spark.createDataFrame(media, schema=schemas.MEDIA)
    res = run_extraction(spark, docs_df, media_df)
    ok, _ = split_failures(res.ocr_all)
    out = build_output_documents(ok).collect()
    assert out

    blob = {m["media_ref"]: m["content"] for m in media}
    eng = StubEngine()
    checked_invalid = False
    for r in out:
        lines = run_adaptive(blob[r["media_ref"]], eng)["lines"]
        exp_key, exp = golden_doc(r["media_ref"], r["doc_id"], lines)
        d = r["doc"]
        assert r["output_ref"] == exp_key
        assert d["version"] == exp["version"]
        assert d["engine"] == exp["engine"]
        assert d["source"].asDict() == exp["source"]
        assert d["metadata"].asDict() == exp["metadata"]
        assert d["stats"]["line_count"] == exp["stats"]["line_count"]
        got_lines = [(l["text"], l["confidence"], l["bbox"]) for l in d["lines"]]
        assert got_lines == exp["lines"]
        if not KEY_RE.match(r["media_ref"]):
            checked_invalid = True
    assert checked_invalid  # the unknown/unknown fallback path was exercised


def test_serialized_payload_asset_record(spark):
    docs, media = datagen.generate_corpus(n_docs=8, seed=3, corrupt_fraction=0.0)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    media_df = spark.createDataFrame(media, schema=schemas.MEDIA)
    res = run_extraction(spark, docs_df, media_df)
    ok, _ = split_failures(res.ocr_all)
    rows = serialize_output_documents(build_output_documents(ok)).collect()
    assert rows
    for r in rows:
        assert r["byte_size"] == len(r["json"])
        assert r["sha256"] == hashlib.sha256(r["json"].encode()).hexdigest()
        assert '"version":"ocr_v1"' in r["json"]


def test_debug_overlay_annotations(spark):
    from chapterbridge_ocr_worker_spark.engine import fakeimg
    from chapterbridge_ocr_worker_spark.operators.debug_overlay import (
        render_debug_overlays,
    )

    docs, media = datagen.generate_corpus(n_docs=10, seed=5, corrupt_fraction=0.1)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    media_df = spark.createDataFrame(media, schema=schemas.MEDIA)
    res = run_extraction(spark, docs_df, media_df)
    rows = render_debug_overlays(res.ocr_all, media_df).collect()
    assert rows
    ok = [r for r in rows if r["error"] is None]
    assert ok
    eng = StubEngine()
    blob = {m["media_ref"]: m["content"] for m in media}
    checked = 0
    for r in ok[:10]:
        lines = run_adaptive(blob[r["media_ref"]], eng)["lines"]
        img = fakeimg.decode(bytes(r["content"]))
        orig = fakeimg.decode(blob[r["media_ref"]])
        assert r["byte_size"] == len(bytes(r["content"]))
        # annotated = original lines + one label per detection at (x0, y0-25)
        assert len(img.lines) == len(orig.lines) + len(lines)
        labels = list(img.lines)[len(orig.lines):]
        for lab, det in zip(labels, lines):
            x0, y0 = det["bbox"][0]
            assert (lab.x, lab.y) == (int(x0), max(0, int(y0) - 25))
            txt, conf = det["text"], det["confidence"]
            exp = (f"{txt[:20]}... ({conf:.2f})" if len(txt) > 20
                   else f"{txt} ({conf:.2f})")
            assert lab.text == exp
            checked += 1
    assert checked > 0

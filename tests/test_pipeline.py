"""End-to-end Spark pipeline tests: span-sequence equality against the
single-process golden, dead-letter routing, resume anti-join, lineage."""

import pytest
from pyspark.sql import functions as F

from chapterbridge_ocr_worker_spark import datagen, golden, schemas
from chapterbridge_ocr_worker_spark.engine.stub import StubEngine
from chapterbridge_ocr_worker_spark.pipeline import run_extraction, write_run
from chapterbridge_ocr_worker_spark.sources import tables


@pytest.fixture(scope="module")
def corpus():
    return datagen.generate_corpus(n_docs=40, seed=7, corrupt_fraction=0.05)


@pytest.fixture(scope="module")
def dfs(spark, corpus):
    docs, media = corpus
    return (
        spark.createDataFrame(docs, schema=schemas.DOCUMENTS),
        spark.createDataFrame(media, schema=schemas.MEDIA),
    )


def collect_spans(df):
    rows = df.collect()
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in rows
    }


def test_span_sequence_equality(spark, corpus, dfs):
    docs, media = corpus
    docs_df, media_df = dfs
    res = run_extraction(spark, docs_df, media_df)
    actual = collect_spans(res.output)
    expected, errors = golden.golden_output(docs, media, StubEngine())
    assert set(actual) == set(expected)
    for doc_id in expected:
        assert actual[doc_id] == expected[doc_id], f"span mismatch in {doc_id}"
    # sanity: corpus actually exercised OCR + dead-letter paths
    n_media_texts = sum(
        1 for spans in actual.values() for s in spans if s[0] == "media" and s[1]
    )
    assert n_media_texts > 0
    assert len(errors) > 0  # corrupt blobs existed


def test_dead_letter_rows(spark, corpus, dfs):
    docs, media = corpus
    docs_df, media_df = dfs
    res = run_extraction(spark, docs_df, media_df)
    fails = res.failures.collect()
    _, errors = golden.golden_output(docs, media, StubEngine())
    # media_refs may appear in several docs; compare the set of failing refs
    assert {f["media_ref"] for f in fails} == set(errors)
    for f in fails:
        assert "FAKEIMG" in f["error"] or "corrupt" in f["error"]
        assert len(f["error"]) <= schemas.ERROR_TRUNCATE


def test_resume_skips_done_docs(spark, dfs, tmp_path):
    docs_df, media_df = dfs
    wh = str(tmp_path / "warehouse")
    first_half = docs_df.limit(20)
    s1 = write_run(spark, first_half, media_df, wh)
    assert s1["docs"] == 20
    # second run over the FULL set resumes: only the remaining docs process
    s2 = write_run(spark, docs_df, media_df, wh)
    assert s2["docs"] == docs_df.count() - 20
    out = tables.read_table(spark, wh, "ocr_output")
    assert out.count() == docs_df.count()
    assert out.select("doc_id").distinct().count() == docs_df.count()
    lineage = tables.read_table(spark, wh, "lineage")
    assert lineage.count() == docs_df.count()  # exactly-once lineage rows
    ckpt = tables.read_table(spark, wh, "checkpoint")
    assert ckpt.filter(F.col("status") == "success").count() > 0


def test_lineage_schema_and_output_keys(spark, dfs):
    docs_df, media_df = dfs
    res = run_extraction(spark, docs_df, media_df)
    rows = res.lineage.limit(50).collect()
    assert rows
    for r in rows:
        assert r["output_ref"].startswith("derived/manhwa/")
        assert len(r["sha256"]) == 64
        assert r["byte_size"] > 0

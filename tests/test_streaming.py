"""Streaming (availableNow) incremental extraction: new files picked up per
trigger, previously-seen files skipped via the streaming checkpoint."""

from pyspark.sql import functions as F

from chapterbridge_ocr_worker_spark import datagen, schemas
from chapterbridge_ocr_worker_spark.sources import tables
from chapterbridge_ocr_worker_spark.streaming.incremental import run_incremental


def test_incremental_two_triggers(spark, tmp_path):
    docs, media = datagen.generate_corpus(n_docs=20, seed=99, corrupt_fraction=0.0)
    media_df = spark.createDataFrame(media, schema=schemas.MEDIA)
    docs_dir = str(tmp_path / "docs_in")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    first = spark.createDataFrame(docs[:12], schema=schemas.DOCUMENTS)
    first.coalesce(1).write.mode("append").parquet(docs_dir)
    run_incremental(spark, docs_dir, media_df, wh, ckpt)
    out1 = tables.read_table(spark, wh, "ocr_output")
    assert out1.count() == 12

    # new arrivals only
    second = spark.createDataFrame(docs[12:], schema=schemas.DOCUMENTS)
    second.coalesce(1).write.mode("append").parquet(docs_dir)
    run_incremental(spark, docs_dir, media_df, wh, ckpt)
    out2 = tables.read_table(spark, wh, "ocr_output")
    assert out2.count() == 20
    assert out2.select("doc_id").distinct().count() == 20

    # third trigger with nothing new: no duplicates
    run_incremental(spark, docs_dir, media_df, wh, ckpt)
    out3 = tables.read_table(spark, wh, "ocr_output")
    assert out3.count() == 20
    # lineage exactly-once
    lin = tables.read_table(spark, wh, "lineage")
    assert lin.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0

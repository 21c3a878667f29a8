"""merge_upsert (MERGE INTO stand-in) and the stateful streaming operator."""

from pyspark.sql import functions as F

from chapterbridge_ocr_worker_spark.sources import tables
from chapterbridge_ocr_worker_spark.streaming.stateful import running_totals_per_type


def test_merge_upsert(spark, tmp_path):
    root = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "k", "v"]
    )
    tables.write_table(base, root, "links")
    updates = spark.createDataFrame(
        [(2, "b", 99), (4, "d", 40)], ["id", "k", "v"]
    )
    tables.merge_upsert(spark, root, "links", updates, keys=["id"])
    rows = {
        r["id"]: r["v"] for r in tables.read_table(spark, root, "links").collect()
    }
    assert rows == {1: 10, 2: 99, 3: 30, 4: 40}  # matched updated, new inserted

    # idempotent re-apply
    tables.merge_upsert(spark, root, "links", updates, keys=["id"])
    assert tables.read_table(spark, root, "links").count() == 4


def test_merge_upsert_creates_missing_table(spark, tmp_path):
    root = str(tmp_path)
    updates = spark.createDataFrame([(1, 5)], ["id", "v"])
    tables.merge_upsert(spark, root, "fresh", updates, keys=["id"])
    assert tables.read_table(spark, root, "fresh").count() == 1


def test_stateful_running_totals(spark, tmp_path):
    src = str(tmp_path / "events_in")
    ev1 = spark.createDataFrame(
        [("click", 1.0), ("click", 2.0), ("view", 5.0)], ["event_type", "value"]
    )
    ev1.coalesce(1).write.mode("append").parquet(src)
    schema = ev1.schema
    ckpt = str(tmp_path / "ckpt")

    def run_once(qname):
        # memory sink can't recover from a checkpoint; foreachBatch can
        collected = {}

        def sink(batch_df, epoch_id):
            for r in batch_df.collect():
                collected[r["event_type"]] = (r["total_events"], r["total_value"])

        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_totals_per_type(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return collected

    out1 = run_once("stateful_out1")
    assert out1["click"] == (2, 3.0)
    assert out1["view"] == (1, 5.0)

    # second batch: state carries over across triggers via checkpoint
    ev2 = spark.createDataFrame([("click", 10.0)], ["event_type", "value"])
    ev2.coalesce(1).write.mode("append").parquet(src)
    out2 = run_once("stateful_out2")
    assert out2["click"] == (3, 13.0)  # running total, not per-batch


def test_compact_table_preserves_rows(spark, tmp_path):
    from chapterbridge_ocr_worker_spark import datagen, schemas
    from chapterbridge_ocr_worker_spark.pipeline import write_run

    docs, media = datagen.generate_corpus(n_docs=12, seed=41, corrupt_fraction=0.0)
    mdf = spark.createDataFrame(media, schema=schemas.MEDIA)
    wh = str(tmp_path / "wh_compact")
    # two runs -> two snapshot dirs per table, many small files
    write_run(spark, spark.createDataFrame(docs[:6], schema=schemas.DOCUMENTS), mdf, wh)
    write_run(spark, spark.createDataFrame(docs, schema=schemas.DOCUMENTS), mdf, wh)
    before = tables.read_table(spark, wh, "ocr_output")
    rows_before = {r["doc_id"] for r in before.select("doc_id").collect()}

    stats = tables.compact_table(spark, wh, "ocr_output", target_files=2)
    assert stats["snapshots_before"] == 2
    assert stats["files_after"] <= 2 < stats["files_before"]

    after = tables.read_table(spark, wh, "ocr_output")
    assert {r["doc_id"] for r in after.select("doc_id").collect()} == rows_before
    assert after.count() == 12
    # resume still works against the compacted lineage
    tables.compact_table(spark, wh, "lineage", target_files=1)
    s = write_run(spark, spark.createDataFrame(docs, schema=schemas.DOCUMENTS), mdf, wh)
    assert s["docs"] == 0

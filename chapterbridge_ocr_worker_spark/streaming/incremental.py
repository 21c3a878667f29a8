"""Incremental (streaming) variant of the extraction pipeline.

The reference is a micro-poll daemon (sleep POLL_SECONDS, claim one job,
process — workers/ocr/main.py:232-255). SURVEY.md §2.9 maps that to two
Spark modes:

1. batch-with-resume (pipeline.py — the default): the pending set is an
   anti-join; rerun to resume.
2. this module: Structured Streaming over the documents table with
   ``trigger(availableNow=True)`` — Spark's own checkpointing tracks which
   files/snapshots were processed, giving the daemon's incremental
   semantics (new docs picked up per trigger) without a queue. Each
   micro-batch runs the SAME batch DAG via foreachBatch, so correctness
   and code are shared with the batch path.

At production scale the source would be an Iceberg table stream
(spark.readStream.format("iceberg")); here it is the parquet directory
source, same mechanics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import run_extraction
from ..schemas import DOCUMENTS
from ..sources import tables


def run_incremental(
    spark: SparkSession,
    docs_dir: str,
    media: DataFrame,
    warehouse: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
) -> None:
    """Process any not-yet-seen document files, then stop (availableNow).

    Re-invoking later picks up only new files — Spark's streaming
    checkpoint replaces the reference's job-queue claim protocol. The
    per-doc lineage anti-join inside run_extraction additionally guards
    against replays of a partially committed micro-batch (idempotent sink,
    at-least-once -> effectively-once).
    """
    stream = spark.readStream.schema(DOCUMENTS).parquet(docs_dir)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        prior = tables.read_table(spark, warehouse, "lineage")
        res = run_extraction(
            spark, batch_df, media, lineage=prior, num_partitions=num_partitions
        )
        # same commit rule as write_run: output-exists <=> lineage-row, so
        # docs with a dead-lettered span are not committed (a rerun of the
        # doc — e.g. its file rewritten with a fixed blob — retries them)
        completed = res.output.join(
            res.failures.select("doc_id").distinct(), "doc_id", "left_anti"
        )
        tables.append_snapshot(completed, warehouse, "ocr_output")
        tables.append_snapshot(res.lineage, warehouse, "lineage")
        tables.append_snapshot(res.failures, warehouse, "failures")

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

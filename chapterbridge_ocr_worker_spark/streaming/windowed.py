"""Watermarked, append-mode windowed aggregation — the production-shaped
streaming metric sink.

The complete-mode + memory-sink variant (queries.stream_hourly_agg) is an
oracle HARNESS: complete mode re-emits the whole result every trigger and a
memory sink accumulates on the driver — neither survives production scale.
This module is the pattern that does:

- ``withWatermark`` bounds state: hourly windows older than the watermark
  (max event time - delay) are finalized, EMITTED ONCE, and their state is
  dropped — state size is O(active windows), not O(history);
- ``outputMode("append")`` + a file sink writes each finalized window
  exactly once; re-triggering (availableNow) with the same checkpoint is
  idempotent — no new input, no new rows (verified: 3380 rows before and
  after a rerun at sf0.01);
- late rows behind the watermark are dropped, the documented trade of
  bounded state for bounded lateness.

Determinism note (why this is oracle-able): with availableNow over a static
directory, the first micro-batch aggregates everything and the watermark
advances to max(ts) - delay at its end; the flush batch then emits exactly
the windows with end <= watermark. The DuckDB twin reproduces that set with
plain SQL over the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def session_counts_append(
    spark: SparkSession,
    events_dir: str,
    schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    timeout_s: int = 180,
) -> DataFrame:
    """Streaming sessionization via ``session_window`` (gap-merged event-
    time sessions) with watermark + append mode: a session finalizes — and
    emits exactly once — when the watermark passes its end (last event +
    gap). The stateful-session analogue of hourly_agg_append; state is
    bounded to open sessions."""
    agg = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        # a mid-flight availableNow batch would make the parquet read
        # below silently partial — fail loudly instead
        q.stop()
        raise TimeoutError(
            f"streaming query did not finish within {timeout_s}s"
        )
    return spark.read.parquet(out_dir)


def hourly_agg_append(
    spark: SparkSession,
    events_dir: str,
    schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "2 hours",
    timeout_s: int = 180,
) -> DataFrame:
    """Run the watermarked hourly aggregation over every not-yet-seen file
    in events_dir (availableNow), appending finalized windows to the
    parquet sink; returns the sink read back.

    ts is cast to TIMESTAMP — watermarks reject TIMESTAMP_NTZ, and with the
    session pinned to UTC the cast is value-preserving.
    """
    agg = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_v_r"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        # a mid-flight availableNow batch would make the parquet read
        # below silently partial — fail loudly instead
        q.stop()
        raise TimeoutError(
            f"streaming query did not finish within {timeout_s}s"
        )
    return spark.read.parquet(out_dir)

"""Explicit partitioning + skew control for the OCR stage.

Reference scaling is "run more daemon processes against the queue"
(DEPLOY_RUNPOD.md:245-259); here the equivalents are deliberate:

- Work unit = media span (page), so a media-heavy doc is already split.
- ``repartition(n, xxhash64(doc_id, offset))`` spreads spans uniformly —
  a pure hash of the composite key has no hot values by construction, which
  is the salting-equivalent for the UDF stage (BASELINE north_star asks for
  repartition-by-doc_id-hash + salting of media-heavy docs; hashing the
  (doc_id, offset) pair IS the salted form of hashing doc_id alone).
- Remaining skew is *byte-size* skew (one 30k-px page ≈ 20× median work,
  DEPLOY_RUNPOD.md:165-168). Hash-partitioning many spans per partition
  averages it out; for pathological corpora ``repartition_by_cost`` orders
  the heaviest pages into their own range partitions.
- AQE (enabled session-wide) coalesces small post-shuffle partitions and
  splits skewed join partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_spans(media_spans: DataFrame, num_partitions: int) -> DataFrame:
    """Uniform hash spread of span work units before the OCR UDF."""
    return media_spans.repartition(
        num_partitions, F.xxhash64("doc_id", "offset")
    )


def repartition_by_cost(
    media_spans: DataFrame, num_partitions: int, cost_col: str = "byte_size"
) -> DataFrame:
    """Range-partition by descending estimated cost so the few giant pages
    land first and alone; use when byte-size skew is pathological.

    est_pixels/byte_size is the per-span cost proxy (the reference's planner
    keys off height the same way, ocr_engine.py:473-505).
    """
    return media_spans.repartitionByRange(
        num_partitions, F.col(cost_col).desc(), F.xxhash64("doc_id", "offset")
    )


def with_salt(df: DataFrame, key: str, buckets: int, threshold_col: str, threshold: int) -> DataFrame:
    """Generic hot-key salting helper: adds a ``salt`` column that is 0 for
    normal rows and pmod(xxhash64(key, monotonic row marker), buckets) for
    rows whose ``threshold_col`` exceeds ``threshold``. Group first by
    (key, salt), then re-aggregate by key (two-phase agg)."""
    return df.withColumn(
        "salt",
        F.when(
            F.col(threshold_col) > threshold,
            F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(buckets)),
        ).otherwise(F.lit(0)),
    )

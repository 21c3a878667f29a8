"""SparkSession construction with scale-aware defaults.

The knobs mirror what the reference tunes by hand (reference:
workers/ocr/ocr_engine.py:44-50 rec_batch_num/det_limit_side_len;
DEPLOY_RUNPOD.md:195-209 batch-size-vs-VRAM): here they become Arrow batch
sizing and shuffle-partition counts so each executor's Python worker gets
full batches without blowing memory on image bytes.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Arrow batches carry raw media bytes into the OCR UDF. A webtoon page can
# be multi-MB, so batches must stay memory-bounded — but bounding by ROW
# COUNT alone (64 rows, the r1-r5 setting) fragmented every text-side
# mapInPandas/mapInArrow stage into tiny batches. r6: bound by BYTES
# (maxBytesPerBatch, the direct knob for the media-size hazard — 32 MB ≈
# 16 worst-case pages per batch) and let narrow numeric/text rows batch up
# to a proper vectorization width.
DEFAULT_ARROW_BATCH = 2048
DEFAULT_ARROW_BYTES = str(32 * 1024 * 1024)


def get_spark(
    app_name: str = "chapterbridge-ocr-worker-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local SparkSession tuned for this pipeline.

    On a real cluster the same confs apply; only ``master`` changes
    (spark-submit supplies it). AQE is on so post-shuffle partitions
    coalesce and skewed joins split at runtime.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_ARROW_BATCH),
        )
        .config("spark.sql.execution.arrow.maxBytesPerBatch", DEFAULT_ARROW_BYTES)
        # Python workers are reused so the OCR engine singleton amortizes
        # across batches (reference warms the model once at daemon start,
        # workers/ocr/main.py:227-230).
        .config("spark.python.worker.reuse", "true")
        # Input split size is a SCALE knob (guide §6): the default here
        # suits the repo's local fixtures (tables of 1-150 MB, where
        # 128 MB splits leave a fact-table scan on 1-2 cores); a
        # production deployment on real multi-GB inputs sets
        # SPARK_GRAFT_MAX_PARTITION_BYTES=512m-1g so sequential scans
        # aren't task-overhead-bound. Parquet row-group granularity still
        # bounds split parallelism per file.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # long many-query sessions (the bench sweep runs 60 queries x 2-5
        # runs in one driver): (a) shuffle files / broadcast blocks are
        # only reclaimed when a driver GC runs the ContextCleaner's weak
        # refs — force that periodically instead of letting state pile up
        # for 30 min (the default); (b) every distinct plan compiles fresh
        # codegen classes, and an exhausted JIT code cache silently drops
        # the whole JVM to interpreter speed late in the session — give it
        # headroom
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        .config("spark.ui.enabled", "false")
        # saveAsTable targets (bucketed tables) land in tmp, never the repo
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "spark-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ship_package(spark)
    return spark


_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (programmatic ``--py-files``).

    Python workers unpickle mapInPandas/applyInPandasWithState closures by
    MODULE NAME — a session whose environment lacks this repo on PYTHONPATH
    dies inside executors with ModuleNotFoundError. get_spark() calls this
    automatically; callers with their own SparkSession call it once. Same
    mechanics as `spark-submit --py-files pkg.zip` on a real cluster.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_root)
    zpath = os.path.join(
        tempfile.gettempdir(), "chapterbridge_ocr_worker_spark_pyfiles.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_root):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(dirpath, fname)
                    z.write(full, os.path.relpath(full, parent))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)

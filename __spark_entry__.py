"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship extraction over an interleave-ified slice of the
                 sf0.001 documents table.
queries()     -> one DataFrame builder per implemented operator family
                 (SURVEY.md §2 + training-data ops), keyed by name.
oracle_sql()  -> DuckDB SQL twins for every SQL-expressible query.

The registry itself lives in chapterbridge_ocr_worker_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

from chapterbridge_ocr_worker_spark.queries import QUERIES  # noqa: E402

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to executors (programmatic --py-files).

    The driver process imports this file by path, but Spark's Python
    workers unpickle mapInPandas closures by module name — without this,
    any session lacking PYTHONPATH=/root/repo fails with
    ModuleNotFoundError inside executors. addPyFile works identically on
    a real multi-executor cluster.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg = os.path.join(_ROOT, "chapterbridge_ocr_worker_spark")
    zpath = os.path.join(
        tempfile.gettempdir(), "chapterbridge_ocr_worker_spark_pyfiles.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(dirpath, fname)
                    z.write(full, os.path.relpath(full, _ROOT))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    return QUERIES["extract_e2e"].fn(spark, "/root/testdata/sf0.001")


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(qd.fn) for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in QUERIES.items() if qd.sql is not None}

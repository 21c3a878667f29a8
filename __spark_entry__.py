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
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

from chapterbridge_ocr_worker_spark.conf import ship_package as _ensure_shipped  # noqa: E402
from chapterbridge_ocr_worker_spark.queries import QUERIES  # noqa: E402


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

"""Physical-plan inspection helpers — scale hygiene made assertable.

The reference has no planner (SURVEY.md §4): every optimization there is
hand-coded. Here Catalyst does the work, and these helpers let tests PIN
the physical properties that matter at 100 TB:

- column pruning reached the parquet scan (ReadSchema);
- filters were pushed down (PushedFilters);
- small dimensions broadcast instead of shuffling;
- the number of exchanges (shuffles) in a DAG stays what we designed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the physical plan (excludes broadcast)."""
    return len(re.findall(r"\(\d+\) Exchange", formatted(df)))


def count_broadcast_joins(df: DataFrame) -> int:
    return formatted(df).count("BroadcastHashJoin")


def scan_read_schema(df: DataFrame, table_substr: str) -> str:
    """ReadSchema of the scan whose location contains table_substr."""
    plan = formatted(df)
    for block in plan.split("\n\n"):
        if "Scan parquet" in block or "Location" in block:
            if table_substr in block:
                m = re.search(r"ReadSchema: (.+)", block)
                if m:
                    return m.group(1)
    return ""


def pushed_filters(df: DataFrame, table_substr: str) -> str:
    plan = formatted(df)
    for block in plan.split("\n\n"):
        if table_substr in block:
            m = re.search(r"PushedFilters: (.+)", block)
            if m:
                return m.group(1)
    return ""

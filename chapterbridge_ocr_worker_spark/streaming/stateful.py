"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful stream processing (its 'streaming' is a poll
loop), but a complete engine needs the primitive: here, a running per-key
document counter + char accumulator with arbitrary user state, emitted per
micro-batch. The same pattern hosts dedup-within-stream, rate limits, or
session state at scale (state is sharded by the groupBy key across
executors; Spark checkpoints it per trigger).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"event_type": [key[0]], "total_events": [n], "total_value": [v]}
    )


def running_totals_per_type(event_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame (with event_type, value) -> running totals with
    user-managed state; output mode 'update'."""
    return event_stream.groupBy("event_type").applyInPandasWithState(
        _update, OUTPUT, STATE, "update", GroupStateTimeout.NoTimeout
    )

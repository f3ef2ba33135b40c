"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState`` (SURVEY.md §2.10 harness rows).

This is the escape hatch for stream semantics the built-in windowed
aggregations can't express — arbitrary per-key state evolved across
micro-batches. The engine's example keeps a running (event count, value sum)
per user and emits the updated totals every batch.

Scale posture: state lives in the per-partition state store (RocksDB/HDFS
backed on a cluster), keyed by user — the stream shuffles once on the key
and each task owns its key range's state; nothing accumulates on the
driver. Data crosses to Python as Arrow batches (the §3.4 boundary), the
one place Python is allowed in the streaming path.

Determinism: under an ``availableNow`` replay of a static file the operator
processes every row exactly once, so the final emitted totals equal the
batch ``GROUP BY`` — which is how q_stream_stateful is oracle-checked
(exact, not rows-only). Multi-batch state carry-over is pinned separately
by tests/test_streaming.py with a controlled two-file replay.

Spark 4's successor API ``transformWithStateInPandas`` was probed in this
environment and crashes at Python-worker init (`ImportError: cannot import
name 'descriptor' from 'google.protobuf'` — its runner needs the protobuf
package, absent in this container and not installable here). Re-probed
round 5 (2026-08-14): ``import google.protobuf`` still raises
ModuleNotFoundError, so the blocker stands unchanged. The implementation
below sticks to ``applyInPandasWithState``, which shares the same
state-store execution path; swapping to the new API is a mechanical port
once protobuf is available — re-run this probe at every Spark/container
upgrade.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_counters(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def user_running_counters(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) over an events stream; emits the updated
    totals for every user seen in each micro-batch."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_counters,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

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
rounds 5, 7, 8, 9, 10, 11, 13, and 14 (latest 2026-08-16): ``import
google.protobuf`` still raises ModuleNotFoundError, so the blocker stands
unchanged. The implementation
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
        StructField("total_value_e2", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total_e2", LongType())]
)


def _update_counters(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # State holds a floor-e2 integer total (per-row IEEE multiply + floor,
    # exact integer accumulation): bit-identical to the batch/DuckDB
    # floor-e2 sum regardless of the order micro-batches deliver rows —
    # a float running total would be summation-order-dependent.
    import numpy as np

    n, total_e2 = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total_e2 += int(
            np.floor(pdf["value"].to_numpy() * 100).astype("int64").sum()
        )
    state.update((n, total_e2))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value_e2": [total_e2]}
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


EMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ema_e2", LongType()),
    ]
)

EMA_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("ema", LongType())]
)


def _update_ema(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # Order-SENSITIVE state fold: the recurrence must see this batch's rows
    # in event-time order, so the Arrow chunks are concatenated and sorted
    # before folding (within a micro-batch the file source hands chunks in
    # partition order, which is not time order). Across batches, state
    # carries (n, ema); the availableNow single-file replay is one batch,
    # and multi-file replays feed files in time order by construction
    # (tests/test_streaming.py's controlled two-file pattern).
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    n, ema = state.get if state.exists else (0, 0)
    for v in pdf["v_e2"].astype("int64"):
        # Truncating div-2 (Spark DIV / DuckDB // semantics); Python //
        # floors, which diverges on odd negative intermediates.
        if n == 0:
            ema = int(v)
        else:
            s = int(v) + ema
            ema = -((-s) // 2) if s < 0 else s // 2
        n += 1
    state.update((n, ema))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ema_e2": [ema]})


def user_running_ema(stream: DataFrame) -> DataFrame:
    """Per-user integer EMA (alpha=1/2 over floor-e2 values) with the
    running state in the state store — q_ts_ema's recurrence on the
    streaming execution path."""
    import pyspark.sql.functions as F

    return (
        stream.select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("v_e2"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ema,
            outputStructType=EMA_OUTPUT_SCHEMA,
            stateStructType=EMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

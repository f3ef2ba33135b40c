"""Batch sessionization: gap-based session assignment per key.

The classic lag → new-session flag → running-sum idiom (the batch
counterpart of Structured Streaming's session windows, used by
queries/timeseries.py::q_ts_sessionize whose DuckDB oracle runs the same
windows in SQL).

Scale shape: both window passes and any downstream per-session aggregate
partition on the key column, so the whole operator costs ONE shuffle. Gap
arithmetic stays in integer microseconds — no interval-dialect drift — and
the (ts, tiebreak) ordering makes session boundaries deterministic under
same-timestamp ties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """All input columns plus a per-key `session_id` (1-based, ordered by
    first activity). A new session starts when the gap to the previous row
    exceeds ``gap_us`` microseconds."""
    w = Window.partitionBy(key).orderBy(
        F.col(ts).asc_nulls_last(), F.col(tiebreak).asc_nulls_last()
    )
    prev = F.lag(ts).over(w)
    new_sess = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts)) - F.unix_micros(prev) > gap_us), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )

"""Per-key ordered recurrences (sequential state folds) for batch frames.

A recurrence's output depends on the previous OUTPUT — no window frame
expresses it. The distributed shape is: one shuffle on the key, then an
Arrow-batched applyInPandas fold per key, sequential only within the key
(inherent to the semantics), embarrassingly parallel across keys. The
streaming twin lives in streaming/stateful.py (user_running_ema) and holds
the same fold's (n, ema) state in the state store.

Determinism contract: callers supply INTEGER value columns (the e2/e4
fixed-point discipline); the folds below use exact integer arithmetic
only, so results are independent of partitioning and engine.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def ema_halving(df: DataFrame, key: str, order: Sequence[str],
                value: str) -> DataFrame:
    """Final alpha=1/2 EMA per key over integer ``value``: first = v_0,
    then ema = (v + ema_prev) // 2. Returns (key, n_events, ema) with the
    input's key/value column names preserved."""
    import pandas as pd

    out_schema = f"{key} long, n_events long, {value} long"
    order_cols = list(order)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        ema = 0
        for i, v in enumerate(pdf[value].astype("int64")):
            ema = int(v) if i == 0 else (int(v) + ema) // 2
        return pd.DataFrame(
            {key: [int(pdf[key].iloc[0])], "n_events": [len(pdf)], value: [ema]}
        )

    cols = [key, *order_cols, value]
    return df.select(*cols).groupBy(key).applyInPandas(fold, out_schema)


def cusum_fold(df: DataFrame, keys: Sequence[str], order: Sequence[str],
               value: str, ref: str) -> DataFrame:
    """One-sided CUSUM per key over integer ``value`` against integer
    reference ``ref``: s_0 = 0; s_t = max(0, s_{t-1} + v_t - ref_t).
    Returns (keys..., n_events, max_cusum, final_cusum) — the classic
    change-point statistic (a sustained upward shift accumulates; noise
    resets through the max(0, ·) floor)."""
    import pandas as pd

    key_cols = list(keys)
    order_cols = list(order)
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (
        ", ".join(f"{k} {types[k]}" for k in key_cols)
        + ", n_events long, max_cusum long, final_cusum long"
    )

    def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        s = 0
        peak = 0
        vs = pdf[value].astype("int64").to_numpy()
        rs = pdf[ref].astype("int64").to_numpy()
        for v, r in zip(vs, rs):
            s = max(0, s + int(v) - int(r))
            peak = max(peak, s)
        row = {k: [key[i]] for i, k in enumerate(key_cols)}
        row.update(
            {"n_events": [len(pdf)], "max_cusum": [peak], "final_cusum": [s]}
        )
        return pd.DataFrame(row)

    cols = [*key_cols, *order_cols, value, ref]
    return df.select(*cols).groupBy(*key_cols).applyInPandas(fold, out_schema)

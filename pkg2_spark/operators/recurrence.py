"""Per-key ordered recurrences (sequential state folds) for batch frames.

A recurrence's output depends on the previous OUTPUT — no window frame
expresses it. The distributed shape is: ONE hash shuffle on the key,
`sortWithinPartitions(key, order...)` so every key's rows are contiguous
and ordered, then `mapInPandas` folding whole Arrow batches with a
cross-batch carry for the key that straddles a batch boundary. Sequential
only within a key (inherent to the semantics), embarrassingly parallel
across keys — and, unlike a per-group `applyInPandas`, the Python/Arrow
round-trip cost is paid per ~10k-row BATCH, not per key. With millions of
small keys (per-user state at corpus scale) per-group dispatch is the
bottleneck; the partition fold is flat in the key count.

The streaming twin lives in streaming/stateful.py (user_running_ema) and
holds the same fold's (n, ema) state in the state store.

Determinism contract: callers supply INTEGER value columns (the e2/e4
fixed-point discipline); the folds below use exact integer arithmetic
only, so results are independent of partitioning and engine.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def partition_ordered_fold(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    fold: Callable,
    emit: Callable,
    out_schema: str,
) -> DataFrame:
    """Run a sequential per-key fold over ``df`` with the partition-fold
    dataflow described in the module docstring.

    ``fold(state_or_None, group_pdf) -> state`` consumes one CONTIGUOUS,
    ORDERED slice of a key's rows (a key split across Arrow batches sees
    multiple calls, threading the state). ``emit(key_tuple, state) ->
    dict`` produces the key's single output row once the key closes.
    """
    import pandas as pd

    key_cols = list(keys)
    order_cols = list(order)

    def run(batches):
        cur_key = None
        state = None
        rows: list[dict] = []

        def close():
            if cur_key is not None:
                rows.append(emit(cur_key, state))

        for pdf in batches:
            if pdf.empty:
                continue
            # sort=False keeps first-appearance order; rows are already
            # (key, order...)-sorted within the partition, so each group
            # slice is the key's next contiguous ordered run.
            for kv, grp in pdf.groupby(key_cols, sort=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                if kv != cur_key:
                    close()
                    cur_key, state = kv, None
                state = fold(state, grp)
        close()
        if rows:
            yield pd.DataFrame(rows)

    shuffled = df.repartition(*key_cols).sortWithinPartitions(
        *key_cols, *order_cols
    )
    return shuffled.mapInPandas(run, out_schema)


def ema_halving(df: DataFrame, key: str, order: Sequence[str],
                value: str) -> DataFrame:
    """Final alpha=1/2 EMA per key over integer ``value``: first = v_0,
    then ema = (v + ema_prev) div 2 with TRUNCATING division — Spark DIV
    and DuckDB // both truncate toward zero on negatives, while Python's
    // floors, so the fold emulates truncation (same contract as
    holt_fold) to stay engine-exact on odd negative intermediates."""

    def fold(state, grp):
        n, ema = state if state is not None else (0, 0)
        for v in grp[value].astype("int64"):
            if n == 0:
                ema = int(v)
            else:
                s = int(v) + ema
                ema = -((-s) // 2) if s < 0 else s // 2
            n += 1
        return (n, ema)

    def emit(kv, state):
        return {key: int(kv[0]), "n_events": state[0], value: state[1]}

    return partition_ordered_fold(
        df.select(key, *order, value), [key], order, fold, emit,
        f"{key} long, n_events long, {value} long",
    )


def holt_fold(df: DataFrame, key: str, order: Sequence[str],
              value: str) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) per key
    over integer ``value``, both smoothings at alpha = beta = 1/2:
    l_1 = v_1, b_1 = 0; then l_t = (v_t + l_{t-1} + b_{t-1}) div 2 and
    b_t = (b_{t-1} + l_t - l_{t-1}) div 2. Returns (key, n_events,
    level_e2, trend_e2). The trend can be negative, so the spec fixes
    TRUNCATING division (what Spark's DIV and DuckDB's // both do on
    negatives) and the Python fold emulates it explicitly — Python's //
    floors, which would diverge on odd negative intermediates."""

    def tdiv2(a: int) -> int:
        return -((-a) // 2) if a < 0 else a // 2

    def fold(state, grp):
        n, lv, b = state if state is not None else (0, 0, 0)
        for v in grp[value].astype("int64"):
            v = int(v)
            if n == 0:
                lv, b = v, 0
            else:
                nxt = tdiv2(v + lv + b)
                b = tdiv2(b + nxt - lv)
                lv = nxt
            n += 1
        return (n, lv, b)

    def emit(kv, state):
        return {
            key: int(kv[0]),
            "n_events": state[0],
            "level_e2": state[1],
            "trend_e2": state[2],
        }

    return partition_ordered_fold(
        df.select(key, *order, value), [key], order, fold, emit,
        f"{key} long, n_events long, level_e2 long, trend_e2 long",
    )


def cusum_fold(df: DataFrame, keys: Sequence[str], order: Sequence[str],
               value: str, ref: str) -> DataFrame:
    """One-sided CUSUM per key over integer ``value`` against integer
    reference ``ref``: s_0 = 0; s_t = max(0, s_{t-1} + v_t - ref_t).
    Returns (keys..., n_events, max_cusum, final_cusum) — the classic
    change-point statistic (a sustained upward shift accumulates; noise
    resets through the max(0, ·) floor).

    Unlike the EMA's floor-per-step halving, this recurrence has a closed
    form — the Lindley/reflected-walk identity: with entry state s0 and
    C = cumsum(v - ref), s_t = max(s0 + C_t, C_t - min_{j<=t} C_j). That
    makes the whole batch computable with SEGMENTED vector ops (numpy
    cumsum + Cython groupby cummin/max over key-change segments), no
    per-key Python iteration at all — the fold is flat in the key count,
    which is what survives a millions-of-series corpus."""
    key_cols = list(keys)
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (
        ", ".join(f"{k} {types[k]}" for k in key_cols)
        + ", n_events long, max_cusum long, final_cusum long"
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        out_keys, out_n, out_peak, out_s = [], [], [], []
        carry_key = None
        carry = (0, 0, 0)  # (n, final_s, peak)
        last_key_slice = None

        for pdf in batches:
            if len(pdf) == 0:
                continue
            kdf = pdf[key_cols].reset_index(drop=True)
            neq = (kdf != kdf.shift()).any(axis=1).to_numpy()
            neq[0] = True
            seg = np.cumsum(neq) - 1
            nseg = int(seg[-1]) + 1
            starts = np.flatnonzero(neq)
            d = (pdf[value].to_numpy(np.int64)
                 - pdf[ref].to_numpy(np.int64))
            cg = np.cumsum(d)
            base = np.zeros(nseg, np.int64)
            base[1:] = cg[starts[1:] - 1]
            c = cg - base[seg]  # per-segment cumsum
            cmin = pd.Series(c).groupby(seg).cummin().to_numpy()
            s0 = np.zeros(nseg, np.int64)
            cont = (carry_key is not None
                    and tuple(kdf.iloc[0]) == carry_key)
            if carry_key is not None and not cont:
                # The carried key ended exactly at the previous batch
                # boundary — flush it before folding this batch.
                out_keys.append(last_key_slice)
                out_n.append(np.array([carry[0]], np.int64))
                out_s.append(np.array([carry[1]], np.int64))
                out_peak.append(np.array([carry[2]], np.int64))
            if cont:
                s0[0] = carry[1]
            s_vec = np.maximum(s0[seg] + c, c - cmin)
            np.maximum(s_vec, 0, out=s_vec)
            bounds = np.append(starts, len(pdf))
            ns = np.diff(bounds).astype(np.int64)
            finals = s_vec[bounds[1:] - 1]
            peaks = pd.Series(s_vec).groupby(seg).max().to_numpy(np.int64)
            if cont:
                ns[0] += carry[0]
                peaks[0] = max(peaks[0], carry[2])
            if nseg > 1:  # every segment but the last is closed
                out_keys.append(kdf.iloc[starts[:-1]])
                out_n.append(ns[:-1])
                out_s.append(finals[:-1])
                out_peak.append(peaks[:-1])
            carry_key = tuple(kdf.iloc[-1])
            carry = (int(ns[-1]), int(finals[-1]), int(peaks[-1]))
            last_key_slice = kdf.iloc[starts[-1:]]
        if carry_key is not None:
            out_keys.append(last_key_slice)
            out_n.append(np.array([carry[0]], np.int64))
            out_s.append(np.array([carry[1]], np.int64))
            out_peak.append(np.array([carry[2]], np.int64))
        if out_keys:
            kout = pd.concat(out_keys, ignore_index=True)
            kout["n_events"] = np.concatenate(out_n)
            kout["max_cusum"] = np.concatenate(out_peak)
            kout["final_cusum"] = np.concatenate(out_s)
            yield kout

    cols = [*key_cols, *order, value, ref]
    shuffled = df.select(*cols).repartition(*key_cols).sortWithinPartitions(
        *key_cols, *order
    )
    return shuffled.mapInPandas(run, out_schema)

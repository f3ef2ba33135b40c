"""Cross-batch carry correctness for the partition-level recurrence folds.

operators/recurrence.py folds whole Arrow batches and threads per-key
state across batch boundaries. At the test/driver scales every partition
fits one default-size (10k-row) batch, so the carry path would otherwise
never execute — this suite forces tiny Arrow batches so keys straddle
batch boundaries many times, and asserts the results are IDENTICAL to the
single-batch run (the fold's output must be invariant to how Arrow slices
the partition).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pkg2_spark.catalog import load_tables
from pkg2_spark.operators.recurrence import cusum_fold, ema_halving, holt_fold

_BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"].select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_e2"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def tiny_batches(spark):
    old = spark.conf.get(_BATCH_CONF, "10000")
    yield lambda n: spark.conf.set(_BATCH_CONF, str(n))
    spark.conf.set(_BATCH_CONF, old)


def test_ema_invariant_to_arrow_slicing(spark, sf_dir, tiny_batches):
    e = _events(spark, sf_dir)
    fold = lambda: _rows(  # noqa: E731
        ema_halving(e, "user_id", ["ts", "event_id"], "v_e2")
    )
    base = fold()
    assert base, "fixture must be non-empty for the carry test to mean anything"
    tiny_batches(7)  # ~10 slices per 66-row user series at sf0.001
    assert fold() == base


def test_cusum_invariant_to_arrow_slicing(spark, sf_dir, tiny_batches):
    e = _events(spark, sf_dir)
    k = e.groupBy("event_type").agg(
        F.expr("CAST(sum(v_e2) DIV count(*) AS BIGINT)").alias("ref_e2")
    )
    j = e.join(F.broadcast(k), "event_type")
    fold = lambda: _rows(  # noqa: E731
        cusum_fold(j, ["user_id", "event_type"], ["ts", "event_id"], "v_e2", "ref_e2")
    )
    base = fold()
    assert base
    tiny_batches(5)
    assert fold() == base


def test_holt_invariant_to_arrow_slicing(spark, sf_dir, tiny_batches):
    e = _events(spark, sf_dir)
    fold = lambda: _rows(  # noqa: E731
        holt_fold(e, "user_id", ["ts", "event_id"], "v_e2")
    )
    base = fold()
    assert base
    tiny_batches(3)
    assert fold() == base


def test_holt_truncating_division_on_negative_trend(spark):
    # A falling series drives the trend negative with odd intermediates:
    # the fold must TRUNCATE (SQL DIV) rather than floor (Python //).
    import pandas as pd

    pdf = pd.DataFrame(
        {"k": [1] * 4, "o": [1, 2, 3, 4], "v": [100, 0, 0, 0]}
    )
    df = spark.createDataFrame(pdf)
    out = holt_fold(df, "k", ["o"], "v").collect()[0]
    # Hand-rolled: l=100,b=0 -> l=50,b=-25 -> l=12,b=-31 -> l=-9,b=-26
    # (trunc) vs l=-10,b=-26 (floor) at the last step.
    assert (out["level_e2"], out["trend_e2"]) == (-9, -26)


def test_ema_truncating_division_on_negative_values(spark):
    # Same truncation contract for the EMA recurrence: with negative
    # inputs the (v + ema) intermediate goes odd-negative, where Python
    # floor (//) and SQL DIV diverge. ema([-5, -2]) = trunc(-7/2) = -3
    # under DIV; floor would give -4.
    import pandas as pd

    pdf = pd.DataFrame({"k": [1, 1], "o": [1, 2], "v": [-5, -2]})
    df = spark.createDataFrame(pdf)
    out = ema_halving(df, "k", ["o"], "v").collect()[0]
    assert out["v"] == -3

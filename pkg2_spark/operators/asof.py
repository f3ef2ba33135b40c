"""As-of join — the operator Spark lacks natively (SURVEY.md §2.3, §4.3).

Semantics: for each left row, attach the latest right row whose timestamp is
<= the left row's timestamp, per key (DuckDB: ``ASOF LEFT JOIN``). Spark has
no native operator, and the correlated-scalar-subquery formulation is rejected
by the analyzer (UNSUPPORTED_CORRELATED_SCALAR_SUBQUERY, SURVEY.md §2.3 [V]).

Implementation (validated cross-engine by the survey session): UNION both
sides with a side tag, then ``last_value(ignoreNulls) OVER (PARTITION BY key
ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)`` carries the most recent right
payload forward onto each left row; filter back to left rows.

Scale posture: one shuffle on the key (the window partition), no join
explosion, no per-key state beyond the sort — the same cost shape as a
sort-merge join. Right-side ties on (key, ts): the later row in (ts, tag,
right_order) order wins deterministically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    right_order: list[str] | None = None,
) -> DataFrame:
    """LEFT as-of join: latest right row with right_ts <= left_ts, per `on` key.

    payload maps right-column -> output-column for the carried values.
    right_order: extra right-side columns ordering same-timestamp right rows
    (the max wins), making tie-break deterministic.
    """
    lcols = left.columns
    tag_sorted_payload = list(payload.items())
    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),  # left sorts after right at equal ts
        *[F.col(c) for c in lcols if c != on],
        *[F.lit(None).cast(right.schema[src].dataType).alias(f"__p_{dst}") for src, dst in tag_sorted_payload],
    )
    order_cols = right_order or []
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        *[F.col(src).alias(f"__p_{dst}") for src, dst in tag_sorted_payload],
    )
    # Right rows at the same (key, ts) are ordered by right_order so the last
    # (max) one is what left rows observe — deterministic tie-break.
    unioned = lhs.unionByName(
        rhs.withColumn(
            "__rord", F.struct(*[F.col(f"__p_{dst}") for dst in [d for _, d in tag_sorted_payload]])
        ),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__rord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct of all payload columns (__rord is exactly that struct,
    # and is NULL on left rows via allowMissingColumns) so every carried value
    # comes from the SAME matched right row — per-column carries would fill a
    # NULL payload field from a different (earlier) right row.
    carried = unioned.select(
        "*", F.last("__rord", ignorenulls=True).over(w).alias("__carry")
    )
    out = carried.filter(F.col("__tag") == 1).select(
        F.col("__k").alias(on),
        F.col("__ts").alias(left_ts),
        *[c for c in lcols if c not in (on, left_ts)],
        *[
            F.col("__carry").getField(f"__p_{dst}").alias(dst)
            for _, dst in tag_sorted_payload
        ],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tolerance: str | None = None,
) -> DataFrame:
    """LEFT as-of join looking FORWARD: earliest right row with
    right_ts >= left_ts (and right_ts <= left_ts + tolerance, when given),
    per `on` key — pandas merge_asof(direction='forward') semantics.

    Mirror of asof_join: the union carries the NEXT right payload backward
    via first_value(ignoreNulls) over (current row .. unbounded following).
    At equal timestamps the right row is visible to the left row (>= is
    inclusive): left sorts before right via the tag. Tolerance is applied
    after the carry by nulling payloads whose matched timestamp is out of
    range — same single-shuffle cost shape as the backward form.
    """
    lcols = left.columns
    items = list(payload.items())
    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__tag"),  # left sorts before right at equal ts
        *[F.col(c) for c in lcols if c != on],
        *[
            F.lit(None).cast(right.schema[src].dataType).alias(f"__p_{dst}")
            for src, dst in items
        ],
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        *[F.col(src).alias(f"__p_{dst}") for src, dst in items],
    )
    unioned = lhs.unionByName(
        rhs.withColumn(
            "__rord", F.struct(*[F.col(f"__p_{dst}") for _, dst in items])
        ),
        allowMissingColumns=True,
    )
    # First right row at-or-after each left row; equal-(ts) right rows are
    # ordered by __rord so the MIN payload struct wins deterministically.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__rord").asc_nulls_last())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # As in asof_join: carry ONE payload struct (__rord; NULL on left rows)
    # with a single first(ignorenulls), so __match_ts and every payload field
    # come from the SAME nearest-forward right row — per-column carries would
    # fill a NULL payload field from a LATER right row than the match.
    carried = unioned.select(
        "*",
        F.first(F.when(F.col("__tag") == 1, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__match_ts"),
        F.first("__rord", ignorenulls=True).over(w).alias("__carry"),
    )
    in_tol = F.lit(True)
    if tolerance is not None:
        in_tol = F.col("__match_ts") <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
    return carried.filter(F.col("__tag") == 0).select(
        F.col("__k").alias(on),
        F.col("__ts").alias(left_ts),
        *[c for c in lcols if c not in (on, left_ts)],
        *[
            F.when(in_tol, F.col("__carry").getField(f"__p_{dst}")).alias(dst)
            for _, dst in items
        ],
    )

"""SURVEY.md §2.5 — window functions.

pkg2 analog [Tier C]: latest-version-per-package under a version ordering =
top-1 per group (q_win_topk_group).

Scale notes: every window here partitions by a real key (customer, user,
priority) — one shuffle on the partition key, state bounded by partition
size. The only global (un-partitioned) window in the engine is the total-order
check in sorts_sets.q_sort_multi, flagged there as a correctness-only shape.
Determinism: every ORDER BY carries a unique tie-break column (§2.13.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from pkg2_spark.catalog import load_tables
from pkg2_spark.registry import query


@query(
    "q_win_rank",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM orders
WHERE o_orderkey < 3000
WINDOW w AS (
  PARTITION BY o_orderpriority
  ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
)
""",
)
def q_win_rank(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    return o.filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q_win_topk_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
         ) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def q_win_topk_group(spark, sf_dir):
    # Top-k per group — rank-filter pattern. Physical plan: one shuffle on
    # the group key; AQE-coalesced. (The latest-version-per-package analog.)
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_total_e2,
       count(*) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS n_so_far
FROM orders
""",
)
def q_win_running(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Floor-e2 BIGINT prefix sums: windowed float sums are frame-evaluation-
    # order-dependent (DuckDB's segment-tree window aggregation sums in tree
    # order, Spark accumulates linearly) — integer prefix sums are exact in
    # both.
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .over(w)
        .alias("running_total_e2"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@query(
    "q_win_sliding",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(avg(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ), 4) AS moving_avg3
FROM orders
""",
)
def q_win_sliding(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc_nulls_last())
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg3"),
    )


@query(
    "q_win_range_frame",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       count(*) OVER (
         PARTITION BY o_orderpriority
         ORDER BY o_totalprice ASC NULLS LAST
         RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
       ) AS n_within_10k
FROM orders
WHERE o_orderkey < 3000
""",
)
def q_win_range_frame(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").asc_nulls_last())
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey",
        "o_orderpriority",
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
    )


@query(
    "q_win_leadlag",
    oracle="""
SELECT user_id, event_id,
       round(lag(value, 1, -1.0) OVER w, 4) AS prev_value,
       round(lead(value, 1, -1.0) OVER w, 4) AS next_value,
       coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER w), -1) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST)
""",
)
def q_win_leadlag(spark, sf_dir):
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.lag("value", 1, -1.0).over(w), 4).alias("prev_value"),
        F.round(F.lead("value", 1, -1.0).over(w), 4).alias("next_value"),
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)), F.lit(-1)
        ).alias("gap_us"),
    )


@query(
    "q_win_firstlast",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       round(last_value(o_totalprice) OVER w, 2) AS last_price,
       round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price,
       round(last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS) OVER w, 2) AS last_finished_price
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
""",
)
def q_win_firstlast(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    finished = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
        F.round(F.last(finished, ignorenulls=True).over(w), 2).alias("last_finished_price"),
    )


@query(
    "q_win_dist",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cume
FROM orders
WHERE o_orderkey < 3000
WINDOW w AS (
  PARTITION BY o_orderpriority
  ORDER BY o_totalprice ASC NULLS LAST, o_orderkey ASC NULLS LAST
)
""",
)
def q_win_dist(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    return o.filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )

"""SURVEY.md §2.3 — joins.

pkg2 analogs [Tier C]: "which package provides X" = equi join through the
provides relation; dependency-closure = iterated self-join (queries/graph.py);
latest-version pick = window top-1 (queries/windows.py).

Scale notes per operator:
- Dimension joins (region/nation/supplier/part) are broadcast — no shuffle of
  the fact side. Verified in plans: region/nation auto-BHJ under AQE.
- Fact-fact joins shuffle on the join key; AQE handles skew splitting.
- The theta join is a BroadcastNestedLoopJoin — declared only on bounded
  inputs (supplier), never on facts; at 100 TB a theta join over facts is a
  design error, not a tuning problem.
- The as-of join is one window shuffle, not a join explosion
  (operators/asof.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pkg2_spark.catalog import load_tables
from pkg2_spark.operators.asof import asof_join
from pkg2_spark.registry import query


@query(
    "q_join_inner",
    oracle="""
SELECT p_brand, count(*) AS n, CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size < 10
GROUP BY p_brand
""",
)
def q_join_inner(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"), "inner")
        .filter(F.col("p_size") < 10)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_e2"),
        )
    )


@query(
    "q_join_broadcast",
    oracle="""
SELECT n_name, count(*) AS n_cust, CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_e2
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q_join_broadcast(spark, sf_dir):
    # Explicit broadcast of the 25-row dim: the fact side never shuffles for
    # the join (it still shuffles once for the final groupBy).
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.floor(F.col("c_acctbal") * 100).cast("long")).alias("sum_bal_e2"),
        )
    )


@query(
    "q_join_smj",
    oracle="""
SELECT s_suppkey, count(*) AS n_same_nation_cust
FROM supplier JOIN customer ON s_nationkey = c_nationkey
GROUP BY s_suppkey
""",
)
def q_join_smj(spark, sf_dir):
    # Forced sort-merge join via MERGE hint — the shuffle-and-sort strategy
    # that spills gracefully when neither side fits in memory.
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .hint("merge")
        .join(t["customer"], F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_same_nation_cust"))
    )


@query(
    "q_join_left",
    oracle="""
SELECT c_custkey,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(o.total_e2, 0) AS total_spent_e2
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_e2
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o.o_custkey
""",
)
def q_join_left(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("total_e2"))
    )
    return (
        t["customer"]
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_e2"), F.lit(0)).alias("total_spent_e2"),
        )
    )


@query(
    "q_join_right",
    oracle="""
SELECT c_custkey, c_mktsegment, coalesce(o.n_orders, 0) AS n_orders
FROM (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
) o RIGHT JOIN customer ON o.o_custkey = c_custkey
""",
)
def q_join_right(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    per_cust = t["orders"].groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        per_cust.join(t["customer"], F.col("o_custkey") == F.col("c_custkey"), "right")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )


@query(
    "q_join_full",
    oracle="""
WITH hot_clicks AS (
  SELECT user_id, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' AND value > 0.9
  GROUP BY user_id
), big_buys AS (
  SELECT user_id, count(*) AS n_buys
  FROM events WHERE event_type = 'purchase' AND value > 0.95
  GROUP BY user_id
)
SELECT coalesce(h.user_id, b.user_id) AS user_id,
       coalesce(h.n_clicks, 0) AS n_clicks,
       coalesce(b.n_buys, 0) AS n_buys
FROM hot_clicks h FULL JOIN big_buys b ON h.user_id = b.user_id
""",
)
def q_join_full(spark, sf_dir):
    e = load_tables(spark, sf_dir)["events"]
    hot = (
        e.filter((F.col("event_type") == "click") & (F.col("value") > 0.9))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    buys = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 0.95))
        .groupBy(F.col("user_id").alias("b_user"))
        .agg(F.count(F.lit(1)).alias("n_buys"))
    )
    return (
        hot.join(buys, F.col("user_id") == F.col("b_user"), "full")
        .select(
            F.coalesce(F.col("user_id"), F.col("b_user")).alias("user_id"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("n_buys"), F.lit(0)).alias("n_buys"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
""",
)
def q_join_semi(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q_join_anti(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "q_join_cross",
    oracle="""
SELECT r1.r_name AS from_region, r2.r_name AS to_region
FROM region r1 CROSS JOIN region r2
WHERE r1.r_regionkey <> r2.r_regionkey
""",
)
def q_join_cross(spark, sf_dir):
    r = load_tables(spark, sf_dir)["region"]
    r1 = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region"))
    r2 = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region"))
    return (
        r1.crossJoin(r2)
        .filter(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
    )


@query(
    "q_join_theta",
    oracle="""
SELECT a.s_suppkey AS richer, b.s_suppkey AS poorer,
       round(a.s_acctbal - b.s_acctbal, 2) AS bal_gap
FROM supplier a JOIN supplier b
  ON a.s_acctbal > b.s_acctbal + 9000
""",
)
def q_join_theta(spark, sf_dir):
    # Pure non-equi condition → BroadcastNestedLoopJoin. Bounded input only
    # (supplier is dim-sized at every sf).
    s = load_tables(spark, sf_dir)["supplier"]
    a = s.select(F.col("s_suppkey").alias("richer"), F.col("s_acctbal").alias("bal_a"))
    b = s.select(F.col("s_suppkey").alias("poorer"), F.col("s_acctbal").alias("bal_b"))
    return (
        a.join(b, F.col("bal_a") > F.col("bal_b") + 9000)
        .select("richer", "poorer", F.round(F.col("bal_a") - F.col("bal_b"), 2).alias("bal_gap"))
    )


@query(
    "q_join_range",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 10 MINUTE
 AND c.ts <= p.ts
""",
)
def q_join_range(spark, sf_dir):
    # Band join: equi prefix (user_id) keeps it a hash/SMJ join; the range
    # condition is a post-join filter. Never a pure cross product.
    e = load_tables(spark, sf_dir)["events"]
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            "purchase_id",
            "click_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       c.event_id AS last_click_id, epoch_us(c.ts) AS click_ts_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_join_asof(spark, sf_dir):
    # Latest click at-or-before each purchase, per user — the validated
    # union+last_value(ignoreNulls) pattern (operators/asof.py).
    e = load_tables(spark, sf_dir)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"), F.col("user_id").alias("user_id"), F.col("ts").alias("c_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="c_ts",
        payload={"c_event_id": "last_click_id", "c_ts": "last_click_ts"},
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "last_click_id",
        F.unix_micros("last_click_ts").alias("click_ts_us"),
    )


@query(
    "q_join_multiway",
    oracle="""
SELECT n_name,
       count(*) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_mktsegment = 'BUILDING' AND r_name = 'ASIA'
GROUP BY n_name
""",
)
def q_join_multiway(spark, sf_dir):
    # Q3-shape star join: facts shuffle on their keys once; nation/region are
    # broadcast; Catalyst pushes both filters below the joins.
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
                .cast("long")
            ).alias("revenue_e4"),
        )
    )


@query(
    "q_join_salted",
    oracle="""
SELECT o_orderpriority, count(*) AS n, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_e2
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
""",
)
def q_join_salted(spark, sf_dir):
    # Explicit salted join (operators/skew.py): the orders side is sprayed
    # over 8 sub-keys, the customer side replicated 8x — a hot customer's
    # orders land on 8 reducers instead of one. Result is identical to the
    # plain join (each order meets its customer exactly once, under one
    # salt), so it hash-matches the unsalted oracle.
    from pkg2_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir)
    o = t["orders"].withColumnRenamed("o_custkey", "custkey")
    c = (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .withColumnRenamed("c_custkey", "custkey")
    )
    joined = salted_join(o, c, on="custkey", salt_from=["o_orderkey"], salt_mod=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("sum_price_e2"),
    )


@query(
    "q_join_asof_fwd",
    oracle="""
SELECT cl.event_id, cl.user_id, epoch_us(cl.ts) AS ts_us,
       m.event_id AS next_purchase_id, epoch_us(m.ts) AS purchase_ts_us
FROM (SELECT * FROM events WHERE event_type = 'click') cl
LEFT JOIN LATERAL (
  SELECT p.event_id, p.ts
  FROM events p
  WHERE p.event_type = 'purchase' AND p.user_id = cl.user_id
    AND p.ts >= cl.ts AND p.ts <= cl.ts + INTERVAL 30 MINUTE
  ORDER BY p.ts ASC, p.event_id ASC LIMIT 1
) m ON true
""",
)
def q_join_asof_fwd(spark, sf_dir):
    # FORWARD as-of with tolerance: the next purchase at most 30 minutes
    # after each click, per user (pandas merge_asof direction='forward') —
    # operators/asof.py::asof_join_forward, the mirror of the backward
    # union+first_value pattern: one shuffle on the key, no join explosion,
    # tolerance applied after the carry. The oracle spells the semantics as
    # a LATERAL top-1 subquery (DuckDB ASOF JOIN is backward-only).
    from pkg2_spark.operators.asof import asof_join_forward

    e = load_tables(spark, sf_dir)["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
    )
    # payload ordered (ts, id): the equal-timestamp tie-break struct must
    # compare ts first, matching the oracle's ORDER BY p.ts, p.event_id
    joined = asof_join_forward(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        payload={"p_ts": "next_purchase_ts", "p_event_id": "next_purchase_id"},
        tolerance="30 MINUTES",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "next_purchase_id",
        F.unix_micros("next_purchase_ts").alias("purchase_ts_us"),
    )

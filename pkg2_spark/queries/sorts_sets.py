"""SURVEY.md §2.6 sorts/limits/top-k + §2.7 set operations.

Determinism: the driver's value-hash is order-insensitive, so a sort is only
observable through (a) LIMIT/OFFSET row selection and (b) an explicit rank
column encoding the order into values. Both appear below; every ordering
spells NULLS placement (Spark ASC default = NULLS FIRST, DuckDB = NULLS LAST
— SURVEY.md §2.6 [V]) and carries a unique tie-break key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from pkg2_spark.catalog import load_tables
from pkg2_spark.registry import query


@query(
    "q_sort_multi",
    oracle="""
SELECT row_number() OVER (
         ORDER BY nullif(c_mktsegment, 'BUILDING') ASC NULLS FIRST,
                  c_acctbal DESC NULLS LAST,
                  c_custkey ASC NULLS LAST
       ) AS rn,
       c_custkey,
       nullif(c_mktsegment, 'BUILDING') AS seg
FROM customer
WHERE c_custkey <= 1000
""",
)
def q_sort_multi(spark, sf_dir):
    # The rank column encodes the total order into values so the
    # order-insensitive hash still verifies the sort. Un-partitioned window =
    # single-partition shuffle: correctness-check shape only — at scale a
    # total order is produced by range-partitioned sort (df.orderBy), not a
    # global window.
    c = load_tables(spark, sf_dir)["customer"].filter(F.col("c_custkey") <= 1000)
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    w = Window.orderBy(
        seg.asc_nulls_first(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey").asc_nulls_last(),
    )
    return c.select(
        F.row_number().over(w).alias("rn"),
        "c_custkey",
        seg.alias("seg"),
    )


@query(
    "q_limit_topk",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
LIMIT 100
""",
)
def q_limit_topk(spark, sf_dir):
    # ORDER BY + LIMIT → TakeOrderedAndProject: per-partition top-k then a
    # k-sized merge on the driver — no global sort, scales to any input size.
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last())
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .limit(100)
    )


@query(
    "q_offset",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
LIMIT 25 OFFSET 50
""",
)
def q_offset(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last())
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .offset(50)
        .limit(25)
    )


@query(
    "q_set_union_all",
    oracle="""
SELECT o_custkey AS custkey, 'urgent_order' AS src
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT c_custkey AS custkey, 'building_cust' AS src
FROM customer WHERE c_mktsegment = 'BUILDING'
""",
)
def q_set_union_all(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    a = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"), F.lit("urgent_order").alias("src"))
    )
    b = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"), F.lit("building_cust").alias("src"))
    )
    return a.unionAll(b)


@query(
    "q_set_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_set_union(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.union(b).distinct()


@query(
    "q_set_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_set_intersect(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "q_set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_set_except(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.subtract(b)


@query(
    "q_set_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def q_set_except_all(spark, sf_dir):
    # Bag semantics: multiplicities subtract (exceptAll), unlike q_set_except.
    o = load_tables(spark, sf_dir)["orders"]
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)

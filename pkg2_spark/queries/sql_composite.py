"""Composite SQL-entry-point queries (TPC-H-shaped; SURVEY.md §3.1).

Every other query in the registry is built through the DataFrame API
(§3.2); these two run the SAME engine through its SQL surface —
``spark.sql`` over the registered views — including the analyzer features
a SQL workload leans on (correlated EXISTS subqueries, CASE aggregation
over a multi-join). Spark SQL and DuckDB SQL agree on this dialect subset
verbatim, so the oracle is the identical string.

Scale posture: Q4's EXISTS decorrelates to a left-semi hash join (no
per-row subquery execution); Q7 is a star join over broadcast dims with
one fact-fact shuffle — both all-Catalyst, nothing engine-specific.
"""

from __future__ import annotations

from pkg2_spark.catalog import load_tables
from pkg2_spark.registry import query

# TPC-H Q4 shape: order-priority checking — correlated EXISTS against the
# fact table. lineitem has no commitdate/receiptdate in this schema; the
# lateness predicate is shipdate-after-orderdate + discount bound instead.
_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      AND l_discount > 0.02
  )
GROUP BY o_orderpriority
"""

# TPC-H Q7-ish: bilateral shipping volume between a nation pair (synthetic
# names NATION_3/NATION_7) by year. Volume follows the Q10 floor-scaled-e4
# discipline (see _Q6 note) — the last composites on round(sum(double))
# were converted in round 6 to retire the summation-order flake class.
_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume_e4) AS BIGINT) AS revenue_e4
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
           AS volume_e4
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# TPC-H Q5: local supplier volume — the 6-table star+snowflake join with the
# customer-and-supplier-in-the-same-nation condition that forces a join-order
# decision (c_nationkey = s_nationkey ties two dimension branches together).
# Revenue follows the Q10 floor-scaled-e4 discipline (see _Q6 note).
_Q5 = """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS revenue_e4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@query("q_sql_tpch_q5", oracle=_Q5)
def q_sql_tpch_q5(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q5)


@query("q_sql_tpch_q4", oracle=_Q4)
def q_sql_tpch_q4(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q4)


@query("q_sql_tpch_q7", oracle=_Q7)
def q_sql_tpch_q7(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q7)


# TPC-H Q1: pricing summary report — the canonical wide-aggregate scan.
# All sums follow the Q10 floor-scaled discipline (per-row IEEE product,
# floor to BIGINT, exact integer sum — see _Q6 note); the averages divide
# those bit-identical BIGINTs by count(*), so both engines round the SAME
# double (the Q14 ratio pattern) instead of order-sensitive float sums.
_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty_e2,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_price_e2,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS sum_disc_price_e4,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000)
                     AS BIGINT)) AS BIGINT) AS sum_charge_e4,
       round(CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)), 4) AS avg_qty,
       round(CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)), 4) AS avg_price,
       round(CAST(sum(CAST(floor(l_discount * 10000) AS BIGINT)) AS DOUBLE)
             / (10000.0 * count(*)), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1996-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q_sql_tpch_q1", oracle=_Q1)
def q_sql_tpch_q1(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q1)


# TPC-H Q3 shape: unshipped-orders revenue top-10. This schema has no
# o_shippriority; o_orderpriority stands in. The order date is emitted as
# an integer yyyymmdd key (identical expression in both dialects — no
# timestamp output column, §2.13.2). l_orderkey tiebreak makes the LIMIT
# deterministic under revenue ties. Revenue follows the Q10
# floor-scaled-e4 discipline (see _Q6 note), which also makes the
# ORDER BY key exact.
_Q3 = """
SELECT l_orderkey,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS revenue_e4,
       CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
            + day(o_orderdate) AS INTEGER) AS o_date_key,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-30 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, l_orderkey ASC
LIMIT 10
"""


@query("q_sql_tpch_q3", oracle=_Q3)
def q_sql_tpch_q3(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q3)


# TPC-H Q6: forecasting revenue change — the canonical pushdown-everything
# filter + single aggregate. All three predicates reach the parquet scan.
# Revenue follows the Q10 floor-scaled-e4 discipline (per-row IEEE product,
# then floor to BIGINT, then exact integer sum): a round(sum(double), 2)
# landing on a cent boundary can flip with summation order between engine
# partitionings — the r3 q_kmeans_step flake class.
_Q6 = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000) AS BIGINT))
            AS BIGINT) AS revenue_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


@query("q_sql_tpch_q6", oracle=_Q6)
def q_sql_tpch_q6(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q6)


# TPC-H Q9 shape: product-type profit by nation and year. This schema has no
# partsupp, so profit is revenue (extendedprice net of discount) rather than
# revenue minus supplycost; the join tree (part ⋈ lineitem ⋈ supplier ⋈
# orders ⋈ nation with a LIKE part filter) is Q9's.
# Profit follows the Q10 floor-scaled-e4 discipline (see _Q6 note).
_Q9 = """
SELECT nation, o_year,
       CAST(sum(CAST(floor(amount * 10000) AS BIGINT)) AS BIGINT) AS sum_profit_e4
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@query("q_sql_tpch_q9", oracle=_Q9)
def q_sql_tpch_q9(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q9)


# TPC-H Q10: returned-item reporting — top-20 customers by lost revenue in a
# quarter. c_custkey tiebreak makes the LIMIT deterministic under ties.
# Revenue is summed as floor-scaled e4 integers (per-row IEEE product then
# floor — bit-identical cross-engine) because a float sum rounded to 2dp
# landed exactly on a cent boundary at sf0.01 and flipped with summation
# order (same discipline as q_llm_colloc).
_Q10 = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS revenue_e4,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_e4 DESC, c_custkey ASC
LIMIT 20
"""


@query("q_sql_tpch_q10", oracle=_Q10)
def q_sql_tpch_q10(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q10)


# TPC-H Q14: promotion effect — conditional aggregation ratio over a
# part ⋈ lineitem month slice (p_type here is the bare class, not a prefix).
# Both ratio legs are floor-scaled-e4 integer sums (see _Q6 note): the two
# BIGINTs are bit-identical across engines, so the one double division and
# its 2dp round see the same operands everywhere.
_Q14 = """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                               THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                               ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
             / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE), 2)
       AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@query("q_sql_tpch_q14", oracle=_Q14)
def q_sql_tpch_q14(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q14)


# TPC-H Q19: discounted revenue — the OR-of-ANDs multi-attribute predicate
# that exercises CNF/DNF predicate handling across a join. Revenue follows
# the Q10 floor-scaled-e4 discipline (see _Q6 note).
_Q19 = """
SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS revenue_e4
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@query("q_sql_tpch_q19", oracle=_Q19)
def q_sql_tpch_q19(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q19)


# TPC-H Q13 shape: customer order-count distribution — the LEFT OUTER join
# + double aggregation (per-customer count, then count-of-counts) that
# exercises outer-join null handling through aggregation. This schema has
# no o_comment; the "excluded orders" filter is an o_orderpriority class.
_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
"""


@query("q_sql_tpch_q13", oracle=_Q13)
def q_sql_tpch_q13(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q13)


# TPC-H Q18 shape: large-volume customers — the grouped-HAVING IN-subquery
# (decorrelated by Spark into a semi-join on the aggregated key set).
# Quantity totals are exact doubles summed per key; the emitted total
# follows the floor-e2 integer discipline.
_Q18 = """
SELECT c.c_name, o.o_orderkey,
       CAST(floor(sum(l.l_quantity) * 100) AS BIGINT) AS total_qty_e2
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
GROUP BY c.c_name, o.o_orderkey
"""


@query("q_sql_tpch_q18", oracle=_Q18)
def q_sql_tpch_q18(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q18)


# TPC-H Q22 shape: global sales opportunity — above-average-balance
# customers with NO urgent orders: one scalar subquery (broadcast 1-row
# aggregate) + one anti-join (decorrelated NOT EXISTS). This schema has no
# phone column; the country grouping is the customer's nation key bucket,
# and the anti-join is restricted to '1-URGENT' orders so the result is
# non-trivial on this corpus (every customer has SOME order).
_Q22 = """
SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntry_bucket,
       count(*) AS numcust,
       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_e2
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY CAST(c_nationkey % 5 AS INTEGER)
"""


@query("q_sql_tpch_q22", oracle=_Q22)
def q_sql_tpch_q22(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q22)


# TPC-H Q2 shape: minimum-cost supplier. This schema has no partsupp table,
# so the supply relation is the DISTINCT (l_partkey, l_suppkey) pairs
# observed in lineitem, and the "supply cost" stand-in is s_acctbal. The
# structural load is Q2's: a correlated scalar-min subquery over the same
# 4-table snowflake as the outer query, which Catalyst decorrelates into an
# aggregate + join (no per-row re-execution). Balances are emitted as
# floor-e2 integers; p_partkey/s_name tiebreaks pin the LIMIT.
_Q2 = """
WITH supply AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem
)
SELECT CAST(floor(s_acctbal * 100) AS BIGINT) AS acctbal_e2,
       s_name, n_name, p_partkey, p_name
FROM part
JOIN supply   ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'PROMO' AND r_name = 'ASIA'
  AND s_acctbal = (
    SELECT min(s2.s_acctbal)
    FROM supply ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA'
  )
ORDER BY acctbal_e2 ASC, p_partkey ASC, s_name ASC
LIMIT 100
"""


@query("q_sql_tpch_q2", oracle=_Q2)
def q_sql_tpch_q2(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q2)


# TPC-H Q8: national market share — the CASE-sum ratio over the 8-table
# join (two nation roles: customer's region restricts the market, the
# supplier's nation is the share numerator). Both ratio legs are
# floor-scaled-e4 integer sums (see _Q6 note), so the single double
# division sees bit-identical operands in both engines.
_Q8 = """
SELECT o_year,
       round(CAST(share_num_e4 AS DOUBLE) / CAST(share_den_e4 AS DOUBLE), 4)
       AS mkt_share
FROM (
  SELECT o_year,
         CAST(sum(CASE WHEN nation = 'NATION_3' THEN vol_e4
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS share_num_e4,
         CAST(sum(vol_e4) AS BIGINT) AS share_den_e4
  FROM (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS vol_e4,
           n2.n_name AS nation
    FROM part
    JOIN lineitem  ON p_partkey = l_partkey
    JOIN supplier  ON s_suppkey = l_suppkey
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  ) all_nations
  GROUP BY o_year
) shares
"""


@query("q_sql_tpch_q8", oracle=_Q8)
def q_sql_tpch_q8(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q8)


# TPC-H Q11 shape: important stock identification — per-key value with a
# HAVING-over-scalar-subquery threshold. No partsupp: value is the
# nation's lineitem revenue per part. Q11's literal "fraction of the
# global total" threshold is scale-DEPENDENT (TPC-H divides it by SF;
# a fixed 0.001 empties the result at sf0.1), so the threshold here is
# scale-free: parts worth more than 2x the mean part value. Per-part
# values are exact e4 integer sums; avg() divides that exact integer sum
# by an exact count, so both engines compare against the same double.
_Q11 = """
WITH partval AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
              AS BIGINT) AS value_e4
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, value_e4
FROM partval
WHERE CAST(value_e4 AS DOUBLE) > (SELECT 2.0 * avg(CAST(value_e4 AS DOUBLE))
                                  FROM partval)
ORDER BY value_e4 DESC, l_partkey ASC
"""


@query("q_sql_tpch_q11", oracle=_Q11)
def q_sql_tpch_q11(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q11)


# TPC-H Q12 shape: shipping modes vs order priority. No l_shipmode /
# l_commitdate / l_receiptdate in this schema: the grouped dimension is
# l_linestatus and "late" is shipped >45 days after the order date
# (interval arithmetic both dialects share). count(CASE WHEN..) keeps both
# legs BIGINT in both engines without a sum-cast dance.
_Q12 = """
SELECT l_linestatus,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


@query("q_sql_tpch_q12", oracle=_Q12)
def q_sql_tpch_q12(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q12)


# TPC-H Q15: top supplier — the revenue-view + scalar-max pattern. The CTE
# is evaluated for both the join input and the max; revenue is an exact e4
# integer per supplier, so the max comparison is integer equality (none of
# Q15's classic double-equality fragility).
_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
              AS BIGINT) AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_e4
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM revenue)
ORDER BY s_suppkey ASC
"""


@query("q_sql_tpch_q15", oracle=_Q15)
def q_sql_tpch_q15(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q15)


# TPC-H Q16 shape: parts/supplier relationship — count(DISTINCT) per
# attribute triple with a NOT IN supplier-exclusion subquery (the
# "complaints" class here is negative account balance; 6 of 100 suppliers
# at sf0.01, so the anti-join is non-trivial). supply = observed
# (part, supp) pairs, as in _Q2.
_Q16 = """
WITH supply AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM supply
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


@query("q_sql_tpch_q16", oracle=_Q16)
def q_sql_tpch_q16(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q16)


# TPC-H Q17: small-quantity-order revenue — correlated scalar-avg subquery
# against the same fact table (decorrelated to a per-part aggregate +
# join). l_quantity is integral (verified: zero fractional values at
# sf0.01), so avg() is an exact small-integer-sum / count in both engines
# and the 0.5 * avg threshold comparison cannot drift. The revenue total is
# emitted as a floor-e2 integer instead of Q17's "/ 7.0" double.
_Q17 = """
SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
       AS total_rev_e2
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@query("q_sql_tpch_q17", oracle=_Q17)
def q_sql_tpch_q17(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q17)


# TPC-H Q20 shape: potential part promotion — nested IN subqueries
# (supplier IN (grouped-HAVING over a part-filtered year of lineitem)).
# No partsupp/availqty: the HAVING threshold is absolute shipped quantity.
# Both engines decorrelate the IN to a semi-join over the aggregate.
_Q20 = """
SELECT s_name, s_suppkey
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 100
  )
ORDER BY s_suppkey ASC
"""


@query("q_sql_tpch_q20", oracle=_Q20)
def q_sql_tpch_q20(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q20)


# TPC-H Q21 shape: suppliers who kept orders waiting — the EXISTS +
# NOT EXISTS pair over the same derived relation ("some other supplier in
# the order; no other supplier was ALSO late"). Lateness (shipped >60 days
# after order date on a finished order) is materialized once in the CTE so
# each correlated subquery references a single outer row — the form both
# engines decorrelate to semi/anti joins. numwait DESC + s_name tiebreak
# pins the LIMIT.
_Q21 = """
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN l l1   ON s_suppkey = l1.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3' AND l1.late = 1
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late = 1)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


@query("q_sql_tpch_q21", oracle=_Q21)
def q_sql_tpch_q21(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_Q21)


@query(
    "q_sql_ctas",
    oracle="""
WITH mart AS (
  SELECT o_orderstatus, o_orderpriority,
         count(*) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_e2
  FROM orders
  GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_priorities,
       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       CAST(sum(sum_price_e2) AS BIGINT) AS sum_price_e2
FROM mart GROUP BY o_orderstatus
""",
)
def q_sql_ctas(spark, sf_dir):
    """SQL DDL entry point — CREATE TABLE AS SELECT: a summary mart is
    materialized through the pure-SQL path (``spark.sql`` CTAS over the
    registered views, external parquet LOCATION under tmp_io), then the
    catalog table is re-read BY NAME through SQL and rolled up one level
    further. This is the warehouse ELT loop (stage a mart, query the
    mart), run end-to-end through the catalog — q_sink_parquet covers
    the DataFrame writer; this covers the DDL surface.

    Scale: the CTAS is one hash-agg + one parquet write sized by AQE;
    the re-read aggregates the |status × priority| mart, not the fact
    table. Fixture-cached per scale; the catalog entry is re-registered
    idempotently (CREATE OR REPLACE semantics via DROP IF EXISTS —
    the table is external, so re-registration never rewrites data)."""
    import os

    from pkg2_spark.queries.relational import fixture_path, fixture_ready

    load_tables(spark, sf_dir)
    path = fixture_path("sql_ctas_mart", sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    name = f"orders_mart_{tag}"
    if not fixture_ready(path, sf_dir):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(
            f"""
            CREATE TABLE {name}
            USING PARQUET LOCATION '{path}'
            AS SELECT o_orderstatus, o_orderpriority,
                      count(*) AS n_orders,
                      CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS sum_price_e2
               FROM orders
               GROUP BY o_orderstatus, o_orderpriority
            """
        )
    elif not spark.catalog.tableExists(name):
        spark.sql(
            f"CREATE TABLE {name} USING PARQUET LOCATION '{path}'"
        )
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_priorities,
               CAST(sum(n_orders) AS BIGINT) AS n_orders,
               CAST(sum(sum_price_e2) AS BIGINT) AS sum_price_e2
        FROM {name} GROUP BY o_orderstatus
        """
    )


@query(
    "q_sql_variables",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_e2
FROM lineitem
WHERE l_quantity < 25 AND l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag
""",
)
def q_sql_variables(spark, sf_dir):
    """Spark 4 SQL-surface trio in one pinned query: SESSION VARIABLES
    (DECLARE/SET VAR — the quantity cap enters the WHERE as a variable,
    set AFTER declaration so the SET path is exercised), a SQL-macro
    FUNCTION (CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN expr —
    the discounted-revenue e2 arithmetic), and a PARAMETERIZED query
    (named marker :cut bound to a Python date via spark.sql(args=...)).
    All three are resolution-time features: the physical plan shows the
    macro INLINED into whole-stage codegen (a plain FLOOR expression —
    no Python/UDF node) and both predicates PUSHED to the parquet scan
    (PushedFilters: LessThan(l_quantity, 25), LessThanOrEqual
    (l_shipdate, ...)), so the SQL conveniences cost nothing at 100 TB.
    The oracle replays the same constants literally."""
    import datetime

    load_tables(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE qty_cap INT DEFAULT 24")
    spark.sql("SET VAR qty_cap = 25")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_e2(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(p * (1 - d) * 100) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(disc_e2(l_extendedprice, l_discount)) AS BIGINT)
                 AS revenue_e2
        FROM lineitem
        WHERE l_quantity < qty_cap AND l_shipdate <= :cut
        GROUP BY l_returnflag
        """,
        args={"cut": datetime.date(1998, 9, 2)},
    )

"""SURVEY.md §2.4 — aggregations.

pkg2 analog [Tier C]: group-by statistics per repo/arch over package records.
Scale notes: every groupBy here is a hash aggregate with automatic
partial/final split (map-side combine), so the shuffle carries one row per
(partition, group), not per input row. Low-cardinality group keys (returnflag
× linestatus = 6 groups) make the final stage trivially small at any SF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from pkg2_spark.catalog import load_tables
from pkg2_spark.operators.skew import salted_agg
from pkg2_spark.registry import query

# Flagship: TPC-H Q1 shape — hash aggregate, 8 measures, 6 groups.
# Validated cross-engine at sf0.1 by the survey session (SURVEY.md §2.4 ✅).
# Sums follow the floor-scaled-integer discipline (per-row IEEE multiply +
# floor to BIGINT, exact integer sum — the q_sql_tpch_q1 pattern): a
# round(sum(double)) last digit is summation-order-dependent across engine
# partitionings. Averages divide the bit-identical BIGINTs by count(*), so
# both engines round the SAME double.
_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2,
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
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _floor_long(col: F.Column, scale: int) -> F.Column:
    """Per-row floor-scaled BIGINT — one IEEE multiply (bit-identical on
    both engines), then floor; sums over these are exact integers."""
    return F.floor(col * scale).cast("long")


@query("q_agg_group", oracle=_Q1_ORACLE)
def q_agg_group(spark, sf_dir):
    l = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    qty_e2 = F.sum(_floor_long(F.col("l_quantity"), 100))
    price_e2 = F.sum(_floor_long(F.col("l_extendedprice"), 100))
    disc_e4 = F.sum(_floor_long(F.col("l_discount"), 10000))
    cnt = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qty_e2.alias("sum_qty_e2"),
            price_e2.alias("sum_base_price_e2"),
            F.sum(_floor_long(disc_price, 10000)).alias("sum_disc_price_e4"),
            F.sum(_floor_long(disc_price * (1 + F.col("l_tax")), 10000)).alias(
                "sum_charge_e4"
            ),
            F.round(qty_e2.cast("double") / (100.0 * cnt), 4).alias("avg_qty"),
            F.round(price_e2.cast("double") / (100.0 * cnt), 4).alias("avg_price"),
            F.round(disc_e4.cast("double") / (10000.0 * cnt), 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "q_agg_global",
    oracle="""
SELECT
  count(*) AS n_rows,
  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_e2,
  round(CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        / (100.0 * count(*)), 4) AS avg_price,
  round(min(o_totalprice), 2) AS min_price,
  round(max(o_totalprice), 2) AS max_price
FROM orders
""",
)
def q_agg_global(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    price_e2 = F.sum(_floor_long(F.col("o_totalprice"), 100))
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        price_e2.alias("sum_price_e2"),
        F.round(price_e2.cast("double") / (100.0 * F.count(F.lit(1))), 4).alias(
            "avg_price"
        ),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "q_agg_having",
    oracle="""
SELECT c_mktsegment, count(*) AS n,
       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_bal_e2
FROM customer
GROUP BY c_mktsegment
HAVING count(*) > 10 AND sum(CAST(floor(c_acctbal * 100) AS BIGINT)) > 0
""",
)
def q_agg_having(spark, sf_dir):
    # The HAVING threshold compares the exact integer sum too: a float sum
    # hovering at zero could flip the group in/out between partitionings.
    c = load_tables(spark, sf_dir)["customer"]
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_floor_long(F.col("c_acctbal"), 100)).alias("total_bal_e2"),
        )
        .filter((F.col("n") > 10) & (F.col("total_bal_e2") > 0))
    )


@query(
    "q_agg_distinct",
    oracle="""
SELECT
  o_orderstatus,
  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
  count(*) AS n
FROM orders
GROUP BY o_orderstatus
""",
)
def q_agg_distinct(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_filtered",
    oracle="""
SELECT
  l_returnflag,
  count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
  count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
           FILTER (WHERE l_tax > 0.04) AS BIGINT) AS taxed_price_e2,
  count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_filtered(spark, sf_dir):
    l = load_tables(spark, sf_dir)["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_disc"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        F.sum(
            F.when(F.col("l_tax") > 0.04, _floor_long(F.col("l_extendedprice"), 100))
        ).alias("taxed_price_e2"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_stats",
    oracle="""
SELECT
  l_returnflag,
  round(stddev_samp(l_quantity), 4) AS sd_qty,
  round(var_samp(l_extendedprice), 2) AS var_price,
  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
  round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc,
  count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_stats(spark, sf_dir):
    l = load_tables(spark, sf_dir)["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("cov_qty_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_percentile",
    oracle="""
SELECT
  o_orderpriority,
  round(median(o_totalprice), 4) AS med_price,
  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
  round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
  count(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
)
def q_agg_percentile(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 4).alias("med_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_rollup",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
  CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2,
  count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_agg_rollup(spark, sf_dir):
    l = load_tables(spark, sf_dir)["lineitem"]
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.sum(_floor_long(F.col("l_quantity"), 100)).alias("sum_qty_e2"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_cube",
    oracle="""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
  CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_e2,
  count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_agg_cube(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.sum(_floor_long(F.col("o_totalprice"), 100)).alias("sum_price_e2"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_gsets",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
  CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_e2
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def q_agg_gsets(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(grouping(l_returnflag) AS INT) AS g_flag,
          CAST(grouping(l_linestatus) AS INT) AS g_status,
          CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            AS sum_price_e2
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_agg_collect",
    oracle="""
SELECT n_regionkey, to_json(list_sort(list(n_name))) AS nations
FROM nation
GROUP BY n_regionkey
""",
)
def q_agg_collect(spark, sf_dir):
    n = load_tables(spark, sf_dir)["nation"]
    # Bare collect_list is shuffle-order nondeterministic (SURVEY.md §2.13.5);
    # always canonicalize with array_sort. The array is serialized to JSON at
    # the output boundary: the driver's pandas canonicalizer cannot hash bare
    # list cells (round-1 FAIL), and Spark/DuckDB to_json agree byte-for-byte
    # on string arrays (no-space separators, same escaping).
    return n.groupBy("n_regionkey").agg(
        F.to_json(F.array_sort(F.collect_list("n_name"))).alias("nations")
    )


@query(
    "q_agg_mode",
    oracle="""
WITH counted AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS cnt
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
), ranked AS (
  SELECT c_nationkey, c_mktsegment, cnt,
         row_number() OVER (
           PARTITION BY c_nationkey
           ORDER BY cnt DESC, c_mktsegment ASC NULLS LAST
         ) AS rn
  FROM counted
)
SELECT c_nationkey, c_mktsegment AS mode_segment, cnt
FROM ranked WHERE rn = 1
""",
)
def q_agg_mode(spark, sf_dir):
    c = load_tables(spark, sf_dir)["customer"]
    counted = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("cnt").desc(), F.col("c_mktsegment").asc_nulls_last()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_mktsegment").alias("mode_segment"), "cnt")
    )


@query("q_agg_approx_cd")  # rows-only: HLL sketches can't hash-match across engines
def q_agg_approx_cd(spark, sf_dir):
    e = load_tables(spark, sf_dir)["events"]
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


@query("q_agg_approx_pct")  # rows-only: approximate sketch, engine-specific
def q_agg_approx_pct(spark, sf_dir):
    e = load_tables(spark, sf_dir)["events"]
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("approx_median"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_salted",
    oracle="""
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
       min(CAST(floor(l_extendedprice) AS BIGINT)) AS min_price_floor,
       max(CAST(floor(l_extendedprice) AS BIGINT)) AS max_price_floor
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_salted(spark, sf_dir):
    # Skew-proof two-stage aggregate (operators/skew.py): 3 hot keys over
    # the fact table is exactly the shape where a direct groupBy makes one
    # reducer the straggler at 100 TB. Salting by hash(l_orderkey) spreads
    # each key over 16 sub-groups; counts and integer sums recombine
    # bit-exactly, so the result hash-matches the plain GROUP BY oracle.
    li = load_tables(spark, sf_dir)["lineitem"]
    pre = li.select(
        "l_returnflag",
        "l_orderkey",
        F.floor("l_quantity").alias("qty_i"),
        F.floor("l_extendedprice").alias("price_i"),
    )
    return salted_agg(
        pre,
        keys=["l_returnflag"],
        aggs={
            "n": ("count", "qty_i"),
            "total_qty": ("sum", "qty_i"),
            "min_price_floor": ("min", "price_i"),
            "max_price_floor": ("max", "price_i"),
        },
        salt_from=["l_orderkey"],
    )


@query(
    "q_agg_approx_cd_check",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_5pct
FROM events
GROUP BY event_type
""",
)
def q_agg_approx_cd_check(spark, sf_dir):
    # Error-bound CONTRACT for the HLL sketch (q_agg_approx_cd is rows-only
    # because sketch values are engine-specific): the approx estimate must
    # land within 5% of the exact distinct count per group — well beyond
    # the default rsd (2.3%) yet tight enough to catch a broken sketch. The
    # sketch value itself never crosses the output boundary; the BOOLEAN
    # does, so the weak rows-only query gains a hash-checkable guarantee.
    e = load_tables(spark, sf_dir)["events"]
    # rsd=0.01 → the 5% contract sits ~5 sigma out (the DEFAULT rsd of 0.05
    # actually violated 5% at sf0.1's 1500-distinct groups — measured)
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rel_err = F.abs(F.col("approx") - F.col("exact_users")) / F.col("exact_users")
    return agg.select(
        "event_type",
        "exact_users",
        (rel_err <= 0.05).alias("within_5pct"),
    )


@query(
    "q_agg_approx_pct_check",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 2) AS exact_median_2dp,
       TRUE AS within_1pct
FROM events
GROUP BY event_type
""",
)
def q_agg_approx_pct_check(spark, sf_dir):
    # Same contract for the percentile sketch: percentile_approx at 10k
    # accuracy must land within 1% relative error of the EXACT interpolated
    # median (computed engine-side with F.percentile, which the oracle
    # mirrors with quantile_cont — both interpolate identically).
    e = load_tables(spark, sf_dir)["events"]
    agg = e.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("approx"),
        F.percentile("value", F.lit(0.5)).alias("exact"),
    )
    rel_err = F.abs(F.col("approx") - F.col("exact")) / F.abs(F.col("exact"))
    return agg.select(
        "event_type",
        F.round("exact", 2).alias("exact_median_2dp"),
        (rel_err <= 0.01).alias("within_1pct"),
    )


@query(
    "q_ml_linreg",
    oracle="""
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
       round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty,
       round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_ml_linreg(spark, sf_dir):
    """Per-group OLS regression via the SQL-standard REGR_* aggregate
    family (price ~ quantity per return flag) — the distributed
    closed-form fit: every regr_* aggregate is a one-pass map-combinable
    moment (sums of x, y, x^2, xy), so the whole six-statistic fit costs
    the same shuffle as one hash aggregate and never materializes the
    normal-equations matrix anywhere.

    Scale: partial aggregation map-side, |groups| rows after the
    shuffle; identical one-pass moment formulation in both engines
    (Spark SQL regr_* and DuckDB regr_*), rounded per §2.13."""
    l = load_tables(spark, sf_dir)["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("long").alias("n"),
        F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 4).alias("avg_qty"),
        F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 4).alias("avg_price"),
    )


@query(
    "q_agg_bool",
    oracle="""
SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k,
       CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished
FROM orders
GROUP BY o_orderpriority
""",
)
def q_agg_bool(spark, sf_dir):
    """Boolean/conditional aggregate family — count_if, bool_and (SQL
    EVERY), bool_or (SQL ANY): the assertion-style rollups data-quality
    dashboards are built from, as first-class aggregates rather than
    sum(CASE...) spelling. All map-combinable single-pass aggregates.

    Scale: one hash-agg, partial aggregation map-side — identical
    posture to q_agg_group."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).cast("long").alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_finished"),
    )

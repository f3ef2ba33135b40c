"""SURVEY.md §2.12 — UDF/UDAF/UDTF surface.

The engine's policy (SURVEY.md §3.4): Python touches data ONLY through
Arrow-batched pandas UDFs / applyInPandas — never row-at-a-time in a hot
path. One classic Python UDF is kept deliberately to prove the path exists;
everything else demonstrates the vectorized forms. Each query's oracle is the
pure-SQL equivalent, so the UDF results are verified against engine-native
semantics (incl. pandas ddof=1 == stddev_samp).

NOTE: pandas_udf objects are constructed INSIDE the query functions, not at
module scope — Python workers import this module to unpickle by-reference
functions, and a module-level @pandas_udf would try to parse its DDL type
without an active SparkContext (verified failure mode).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from pkg2_spark.catalog import load_tables
from pkg2_spark.registry import query


def _zscore_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    # pandas std() is ddof=1 → sample stddev, matching stddev_samp.
    v = pdf["c_acctbal"]
    return pd.DataFrame(
        {"c_custkey": pdf["c_custkey"], "zscore": ((v - v.mean()) / v.std(ddof=1)).round(4)}
    )


@query(
    "q_udf_scalar",
    oracle="""
SELECT event_id, round(value * 2.0 + 1.0, 4) AS scaled
FROM events WHERE event_id < 2000
""",
)
def q_udf_scalar(spark, sf_dir):
    # Arrow-vectorized scalar transform: whole column batches, no per-row
    # Python dispatch.
    @F.pandas_udf("double")
    def affine(v: pd.Series) -> pd.Series:
        return v * 2.0 + 1.0

    e = load_tables(spark, sf_dir)["events"]
    return e.filter(F.col("event_id") < 2000).select(
        "event_id", F.round(affine("value"), 4).alias("scaled")
    )


@query(
    "q_udf_grouped_agg",
    oracle="""
SELECT event_type, round(min(value), 4) AS min_value, round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type
""",
)
def q_udf_grouped_agg(spark, sf_dir):
    # Pandas UDAFs (GROUPED_AGG). Spark refuses to mix pandas and JVM
    # aggregates in one agg() — so both measures are pandas UDFs.
    @F.pandas_udf("double")
    def pd_min(v: pd.Series) -> float:
        return float(v.min())

    @F.pandas_udf("double")
    def pd_avg(v: pd.Series) -> float:
        return float(v.mean())

    e = load_tables(spark, sf_dir)["events"]
    return e.groupBy("event_type").agg(
        F.round(pd_min("value"), 4).alias("min_value"),
        F.round(pd_avg("value"), 4).alias("avg_value"),
    )


@query(
    "q_udf_grouped_map",
    oracle="""
SELECT c_custkey,
       round((c_acctbal - avg(c_acctbal) OVER w) / stddev_samp(c_acctbal) OVER w, 4) AS zscore
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment)
""",
)
def q_udf_grouped_map(spark, sf_dir):
    # applyInPandas grouped transform (z-score per market segment): each
    # group ships to a Python worker as one Arrow batch.
    c = load_tables(spark, sf_dir)["customer"]
    return c.groupBy("c_mktsegment").applyInPandas(
        _zscore_pdf, schema="c_custkey long, zscore double"
    )


@query(
    "q_udtf",
    oracle="""
SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
FROM documents WHERE doc_id < 20
""",
)
def q_udtf(spark, sf_dir):
    # Python UDTF (Spark 4): one input row → many output rows, used via
    # SQL LATERAL join.
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, text: str):  # noqa: ANN001
            for w in (text or "").split(" "):
                if w:
                    yield (w,)

    spark.udtf.register("split_words", SplitWords)
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, s.word
        FROM documents d, LATERAL split_words(d.text) s
        WHERE d.doc_id < 20
        """
    )


@query(
    "q_udf_python",
    oracle="""
SELECT doc_id, upper(lang) || '!' AS shout
FROM documents WHERE doc_id < 100
""",
)
def q_udf_python(spark, sf_dir):
    # The one deliberate classic (non-Arrow) Python UDF — proves the path;
    # everything else uses pandas_udf (SURVEY.md §2.12).
    shout = F.udf(lambda s: (s or "").upper() + "!", "string")
    d = load_tables(spark, sf_dir)["documents"]
    return d.filter(F.col("doc_id") < 100).select("doc_id", shout("lang").alias("shout"))

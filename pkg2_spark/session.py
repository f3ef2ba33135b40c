"""SparkSession factory.

The engine runs on any SparkSession (the verification driver passes its own),
but sessions built here carry the verified config set from SURVEY.md §1.3/§4.2:
- ``spark.sql.legacy.parquet.nanosAsLong`` — events.parquet stores
  TIMESTAMP(NANOS) which Spark 4.x refuses to read natively.
- UTC session timezone — cross-engine timestamp agreement.
- AQE on — runtime partition coalescing / skew handling at scale.

``ensure_runtime_confs`` applies the runtime-settable subset to a foreign
session (verified: nanosAsLong works via ``spark.conf.set`` before the first
read of the affected file).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    # Arrow-batched toPandas/createDataFrame — the verification driver
    # round-trips every query result through pandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Cost-based optimization over the ANALYZE stats the catalog collects at
    # ingest (catalog.py::_ensure_stats_tables — SURVEY.md §4.1 obligation):
    # join reordering on the 5-6 table composites rides on these instead of
    # AQE alone.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply required runtime-settable confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)
    # A foreign session left at Spark's static default of 200 shuffle
    # partitions pays ~200 task launches per exchange regardless of data
    # size; AQE only coalesces down to advisoryPartitionSize targets. If the
    # conf is the untouched default, right-size it to the session's core
    # count (deliberate non-default settings are preserved; non-numeric
    # values like Databricks' "auto" fall through untouched).
    try:
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(int(cores), 8)))
    except Exception:
        pass
    return spark


def get_session(
    app_name: str = "pkg2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's verified config.

    local[N] defaults come from $SPARK_GRAFT_CPUS; shuffle partitions default
    to the core count (small data — SURVEY.md §4.2 benches used 8 at sf0.1;
    at real scale leave AQE to coalesce).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions else cpus),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    return ensure_runtime_confs(spark)

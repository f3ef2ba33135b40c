"""Table catalog: registers the ten driver tables as temp views.

pkg2 normalized heterogeneous package-index sources into a uniform record
store at ingest (SURVEY.md §1.1 [Tier C]); this catalog is the Spark analog —
every dataset becomes a DataFrame with a frozen schema, registered by name so
both the DataFrame and SQL surfaces see it.

Scale posture: views are plain parquet scans — Catalyst pushes filters and
projections down to the reader, and nothing here materializes data. The one
ingestion shim (events TIMESTAMP(NANOS) → TimestampType, SURVEY.md §1.3) is a
projection, so it fuses into whole-stage codegen above the scan.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pkg2_spark.session import ensure_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables: always broadcast-joinable (SURVEY.md §1.2 row counts
# are sf-invariant for region/nation; customer/supplier/part stay dim-sized
# relative to the facts at every sf).
BROADCAST_DIMS = {"region", "nation", "supplier", "part"}

# Memoize registration per (session id, sf_dir) so the driver's per-query
# callable pattern doesn't re-register ten views on every call (SURVEY.md §6:
# fixed costs must stay fixed).
_REGISTERED: dict[tuple[int, str], dict[str, DataFrame]] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table with the required ingestion shims applied."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) arrives as LongType nanos under the legacy flag.
        # Integer DIV is load-bearing: float division corrupts epoch-nanos
        # beyond double's 53-bit mantissa (SURVEY.md §1.3 [V]).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    # Spark 4 infers parquet timestamp[ms] (isAdjustedToUTC=false) as
    # TIMESTAMP_NTZ, which unix_micros & friends reject. Session TZ is pinned
    # to UTC, so casting NTZ -> TIMESTAMP preserves the instant and matches
    # DuckDB's naive-timestamp reading exactly. TimestampType() — not the
    # "timestamp" type string, which resolves through spark.sql.timestampType
    # and would be a no-op in an NTZ-default session.
    from pyspark.sql.types import TimestampType

    for fname, ftype in df.dtypes:
        if ftype == "timestamp_ntz":
            df = df.withColumn(fname, F.col(fname).cast(TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all driver tables as temp views; return them by name.

    Idempotent and memoized per (session, sf_dir): repeated calls from the
    driver's per-query loop cost a dict lookup, not ten parquet-footer reads.
    """
    key = (id(spark._jsparkSession) if hasattr(spark, "_jsparkSession") else id(spark), sf_dir)
    cached = _REGISTERED.get(key)
    if cached is not None:
        return cached
    ensure_runtime_confs(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    _REGISTERED[key] = out
    return out

"""Local differential harness mirroring the driver's correctness gate.

The driver runs each registered query in Spark AND its oracle SQL in DuckDB
over the same parquet, then compares row-count + schema + order-insensitive
value-hash (__spark_entry__.py:3-8). This module reproduces that comparison
locally so every operator is validated before the driver ever sees it.

Normalization choices mirror what an order-insensitive value-hash implies:
columns sorted by name, rows sorted by all values, timestamps compared at
microsecond precision (both engines truncate ns→µs), integer widths unified
(int32 vs int64 is a schema nuance, not a value difference).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from pkg2_spark.catalog import TABLES, load_tables
from pkg2_spark.registry import all_oracles, all_queries


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Open DuckDB with the ten driver tables registered as views, exactly as
    the driver does (__spark_entry__.py:31-34)."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # Spark-written tables are DIRECTORIES of part files (the probe
        # corpora under tmp_io/); the driver's testdata are single files.
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("\x00nan",)
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return ("f", repr(v))
    if isinstance(v, (pd.Timestamp,)):
        return ("t", v.floor("us").isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_norm_cell(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _norm_cell(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", v)
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return ("i", int(v))
        if isinstance(v, np.floating):
            return _norm_cell(float(v))
        if isinstance(v, np.bool_):
            return ("i", int(v))
        if isinstance(v, np.ndarray):
            return ("a", tuple(_norm_cell(x) for x in v.tolist()))
        if isinstance(v, np.datetime64):
            return ("t", pd.Timestamp(v).floor("us").isoformat())
    except ImportError:
        pass
    return ("s", str(v))


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    match: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    detail: str = ""
    mismatches: list = field(default_factory=list)
    # driver-scoreboard fields (CORRECTNESS_r{N}.json shape): tri-state so
    # rows-only and errored queries serialize exactly as the driver records
    # them — None where the driver writes null.
    rows_match: bool | None = None
    schema_match: bool | None = None
    hash_match: bool | None = None
    err: str | None = None
    seconds: float = 0.0

    def __str__(self) -> str:
        flag = "MATCH" if self.match else "FAIL "
        return (
            f"[{flag}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows} "
            f"({self.seconds:.2f}s) {self.detail}"
        )

    def driver_row(self) -> dict:
        """This result in the driver's CORRECTNESS json shape, so builder
        claims and driver facts diff mechanically (VERDICT.md r1 item 9)."""
        return {
            "rows_match": self.rows_match,
            "schema_match": self.schema_match,
            "hash_match": self.hash_match,
            "spark_rows": self.spark_rows if self.spark_rows >= 0 else None,
            "oracle_rows": self.oracle_rows if self.oracle_rows >= 0 else None,
            "err": self.err,
        }


def _complex_cols(schema) -> list[str]:
    """Column names whose type the driver's canonicalizer cannot hash.

    The driver sorts the pandas frame by all columns; list/dict cells raise
    ``TypeError: unhashable type`` (round-1 FAIL on 4 queries). Queries must
    serialize Array/Map/Struct outputs (to_json) at the boundary."""
    import pyspark.sql.types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def compare_query(spark, con, name: str, sf_dir: str) -> CompareResult:
    """Run one registered query both ways and diff the canonical forms."""
    queries, oracles = all_queries(), all_oracles()
    fn = queries[name]
    sdf = fn(spark, sf_dir)
    bad = _complex_cols(sdf.schema)
    if bad:
        return CompareResult(
            name, False, -1, -1,
            detail=f"complex output columns (driver hasher would crash): {bad} — "
                   "serialize with to_json at the output boundary",
            err=f"unhashable complex output columns: {bad}",
        )
    spark_pd = sdf.toPandas()
    if name not in oracles:
        return CompareResult(
            name, True, len(spark_pd), -1,
            detail="rows-only (no oracle declared)", err="no_oracle",
        )
    oracle_pd = con.execute(oracles[name]).fetchdf()

    s_cols, o_cols = sorted(spark_pd.columns), sorted(oracle_pd.columns)
    if s_cols != o_cols:
        return CompareResult(
            name, False, len(spark_pd), len(oracle_pd),
            detail=f"column mismatch: spark={s_cols} oracle={o_cols}",
            rows_match=len(spark_pd) == len(oracle_pd),
            schema_match=False, hash_match=False,
        )
    if len(spark_pd) != len(oracle_pd):
        return CompareResult(
            name, False, len(spark_pd), len(oracle_pd), detail="row-count mismatch",
            rows_match=False, schema_match=True, hash_match=False,
        )
    s_can, o_can = _canon(spark_pd), _canon(oracle_pd)
    if s_can == o_can:
        return CompareResult(
            name, True, len(spark_pd), len(oracle_pd),
            rows_match=True, schema_match=True, hash_match=True,
        )
    diffs = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_can, o_can)) if a != b
    ][:3]
    return CompareResult(
        name, False, len(spark_pd), len(oracle_pd),
        detail=f"value mismatch on {sum(a != b for a, b in zip(s_can, o_can))} rows",
        mismatches=diffs,
        rows_match=True, schema_match=True, hash_match=False,
    )


def compare_all(spark, sf_dir: str, names=None) -> list[CompareResult]:
    load_tables(spark, sf_dir)
    con = duckdb_connect(sf_dir)
    queries = all_queries()
    results = []
    # default iteration = registry emission order, exactly what the driver
    # walks (and what SELFCHECK.json must mirror)
    import time

    for name in names or queries:
        t0 = time.monotonic()
        try:
            r = compare_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001 — harness must report, not die
            r = CompareResult(
                name, False, -1, -1,
                detail=f"{type(e).__name__}: {str(e)[:300]}",
                err=f"{type(e).__name__}: {str(e)[:500]}",
            )
        r.seconds = time.monotonic() - t0
        results.append(r)
    con.close()
    return results

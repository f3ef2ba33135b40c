"""Query registry — the implementation of SURVEY.md §2's contract.

Every operator the engine supports is declared here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (usually) a DuckDB
oracle SQL string. The driver hash-matches the two at sf0.01
(__spark_entry__.py:3-8); queries without an oracle get a rows-only check.

The decorator keeps declaration next to implementation so the §2.13
determinism rules (rounding, aliasing, null ordering) are visible at the
definition site.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL.

    Omit ``oracle`` only for genuinely non-SQL-expressible ops (streaming
    harness, approx sketches) — the driver then records a weaker rows-only
    check (SURVEY.md §2 legend).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    # Import side-effect populates the registry exactly once.
    import pkg2_spark.queries  # noqa: F401

    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    import pkg2_spark.queries  # noqa: F401

    return dict(ORACLES)

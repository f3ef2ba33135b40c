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


# The verification driver walks ``queries()`` in dict order under a hard
# 50-query budget per round (CORRECTNESS_r01..r03 each contain exactly 50
# rows). Emission order is therefore part of the contract surface: queries
# that still need a driver row — never checked, checked-and-errored, or
# checked-and-hash-mismatched — must precede queries that are already
# driver-green, or they never earn a row. Rather than hand-maintaining a
# head list (which went stale between r2 and r3: VERDICT.md round 3,
# "What's wrong" #2), the order is computed at call time from the
# CORRECTNESS_r*.json files the driver itself writes into the repo root.


def green_last_round() -> dict[str, int]:
    """Map each driver-verified-green name to the round that last confirmed it.

    A query is green once a round records ``hash_match`` true (or the
    by-design rows-only check, ``err == "no_oracle"``). A LATER round's
    error — or a hash mismatch, which is just as disqualifying — revokes
    green: the query must re-earn its row at the head of the order. The
    recorded round number drives the freshness rotation below (VERDICT.md
    round 4, "Next round" #6): once everything is green, the driver's
    50-slot budget should re-verify the STALEST greens first instead of
    re-checking the same dict-order head forever.
    """
    import json
    import re
    from pathlib import Path

    green: dict[str, int] = {}
    root = Path(__file__).resolve().parent.parent
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if row.get("hash_match") or row.get("err") == "no_oracle":
                green[name] = rnd
            elif row.get("err") or row.get("hash_match") is False:
                green.pop(name, None)
    return green


def driver_green() -> set[str]:
    """Names that are driver-verified green across all recorded rounds."""
    return set(green_last_round())


def _driver_order(d: dict) -> dict:
    green = green_last_round()
    needs_row = [n for n in d if n not in green]
    pos = {n: i for i, n in enumerate(d)}
    stale_first = sorted(
        (n for n in d if n in green), key=lambda n: (green[n], pos[n])
    )
    return {n: d[n] for n in [*needs_row, *stale_first]}


def all_queries() -> dict[str, QueryFn]:
    # Import side-effect populates the registry exactly once.
    import pkg2_spark.queries  # noqa: F401

    return _driver_order(QUERIES)


def all_oracles() -> dict[str, str]:
    import pkg2_spark.queries  # noqa: F401

    return _driver_order(ORACLES)

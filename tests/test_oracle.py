"""Differential gate: every registered query vs its DuckDB oracle at sf0.001.

This mirrors the driver's t2 check (SURVEY.md §0.1) on the smallest scale
factor so the whole registry runs in a couple of minutes. A query passes only
on row-count + column-set + order-insensitive value equality.
"""

from __future__ import annotations

import pytest

from pkg2_spark.compare import compare_query
from pkg2_spark.registry import all_queries


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    result = compare_query(spark, duck, name, sf_dir)
    assert result.match, str(result) + "".join(
        f"\n  spark={a}\n  oracle={b}" for _, a, b in result.mismatches
    )


def test_gate_rejects_bare_complex_columns(spark, duck, sf_dir):
    """Local-green must imply driver-green: the driver's pandas canonicalizer
    crashes on list/dict cells, so the gate must FAIL any query whose output
    schema still contains Array/Map/Struct columns (round-1 regression)."""
    from pkg2_spark.registry import ORACLES, QUERIES

    name = "__test_bare_array__"
    QUERIES[name] = lambda s, d: s.sql("SELECT array('a', 'b') AS xs")
    ORACLES[name] = "SELECT ['a', 'b'] AS xs"
    try:
        result = compare_query(spark, duck, name, sf_dir)
    finally:
        del QUERIES[name], ORACLES[name]
    assert not result.match
    assert "complex output columns" in result.detail

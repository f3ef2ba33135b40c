"""QueryService — the programmatic serving surface (pkg2's service analog).

Covers: endpoint dispatch, parameter validation, server-side row bounding
(LIMIT in the plan, not driver-side truncation), JSON-safe encoding, and
error behavior for unknown endpoints / missing params.
"""

from __future__ import annotations

import json
import os

import pytest

from pkg2_spark.engine import Engine
from pkg2_spark.service import QueryService, ServiceError, demo_requests

_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "pkg2_spark", "data")


@pytest.fixture(scope="module")
def svc(spark):
    eng = Engine(spark)
    eng.ingest_apkindex(os.path.join(_DATA, "apkindex_sample.txt"))
    return QueryService(eng, max_rows=5)


def test_all_demo_requests_round_trip_json(spark, svc):
    # Re-ingest per endpoint family as the demo expects debian for resolve
    eng = svc.engine
    for endpoint, params in demo_requests():
        if endpoint in ("resolve",):
            eng.ingest_debian_packages(os.path.join(_DATA, "packages_sample.txt"))
        else:
            eng.ingest_apkindex(os.path.join(_DATA, "apkindex_sample.txt"))
        resp = svc.handle(endpoint, params)
        # every response must survive a JSON round trip untouched
        assert json.loads(json.dumps(resp)) == resp
        assert resp["endpoint"] == endpoint
        assert resp["row_count"] == len(resp["rows"])
        for row in resp["rows"]:
            assert set(row) == set(resp["columns"])


def test_row_bound_is_in_the_plan(spark, svc):
    svc.engine.ingest_apkindex(os.path.join(_DATA, "apkindex_sample.txt"))
    resp = svc.handle("sql", {"query": "SELECT * FROM packages"})
    assert resp["row_count"] <= 5
    assert resp["truncated"] is True


def test_search_filters_by_arch(spark, svc):
    svc.engine.ingest_apkindex(os.path.join(_DATA, "apkindex_sample.txt"))
    resp = svc.handle("search", {"pattern": "%", "arch": "x86_64"})
    assert resp["rows"]
    assert all(r["arch"] == "x86_64" for r in resp["rows"])


def test_constrained_resolution_endpoint(spark, svc):
    svc.engine.ingest_debian_packages(
        os.path.join(_DATA, "packages_multiver_sample.txt")
    )
    resp = svc.handle("resolve_constrained", {"package": "webapp"})
    got = {(r["name"], r["version"]) for r in resp["rows"]}
    assert ("libweb", "1.2-1") not in got    # below the >= 1.4 constraint
    assert ("libweb", "1.4-2") in got
    assert not any(n == "tlslib" for n, _ in got)  # unsatisfiable atom


def test_unknown_endpoint_and_missing_param_raise(spark, svc):
    with pytest.raises(ServiceError, match="unknown endpoint"):
        svc.handle("nope", {})
    with pytest.raises(ServiceError, match="missing required parameter"):
        svc.handle("search", {})
    with pytest.raises(ServiceError, match="invalid table name"):
        svc.handle("table", {"name": "x; drop"})


def test_sql_endpoint_is_select_only_by_default(spark, svc):
    svc.engine.ingest_apkindex(os.path.join(_DATA, "apkindex_sample.txt"))
    for bad in [
        "DROP TABLE packages",
        "INSERT INTO packages VALUES (1)",
        "CREATE TABLE t AS SELECT 1",
        "SELECT 1; DROP TABLE packages",
        "SET spark.sql.shuffle.partitions=1",
        "SELECT * FROM parquet.`/etc/passwd`",
    ]:
        with pytest.raises(ServiceError):
            svc.handle("sql", {"query": bad})
    # query-shaped statements still pass
    ok = svc.handle("sql", {"query": "WITH t AS (SELECT 1 AS x) SELECT x FROM t"})
    assert ok["rows"] == [{"x": 1}]
    # trusted embedders can opt out of the gate
    unsafe = QueryService(svc.engine, max_rows=5, allow_unsafe_sql=True)
    resp = unsafe.handle("sql", {"query": "SELECT 'DROP' AS created_at"})
    assert resp["rows"] == [{"created_at": "DROP"}]


def test_truncated_flag_exact_boundary(spark, svc):
    # A result with exactly max_rows rows is complete — truncated False;
    # one more row flips it. The sentinel fetch is limit(max_rows + 1).
    svc.engine.ingest_apkindex(os.path.join(_DATA, "apkindex_sample.txt"))
    exact = svc.handle("sql", {"query": (
        "SELECT id FROM (SELECT explode(sequence(1, 5)) AS id)"
    )})
    assert exact["row_count"] == 5 and exact["truncated"] is False
    over = svc.handle("sql", {"query": (
        "SELECT id FROM (SELECT explode(sequence(1, 6)) AS id)"
    )})
    assert over["row_count"] == 5 and over["truncated"] is True

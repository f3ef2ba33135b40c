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

"""Query service — the programmatic serving surface over the Engine.

pkg2 exposed its query engine behind a service with a web UI [SURVEY.md
§1.1, Tier C]: named endpoints taking simple scalar parameters and
returning rows. This module is that surface re-expressed Spark-native,
minus the HTTP transport (no web framework ships in this container, and
the transport is the trivial part): a request/response dispatch layer
with named endpoints, validated parameters, bounded row counts, and
JSON-safe row encoding. Wiring it to any HTTP server is
`handle(endpoint, params)` per request.

Design points that matter at scale:

- Every endpoint returns AT MOST ``max_rows`` rows (server-side LIMIT
  pushed into the plan, not a driver-side truncation) — a service must
  never ship an unbounded result to a UI.
- The SparkSession, catalog registrations, and ingested package tables
  are session-scoped and reused across requests (the Engine memoizes);
  per-request cost is plan + execute, never re-ingest.
- Results are encoded to JSON-safe primitives (timestamps -> ISO strings,
  arrays -> lists) so the response can cross any transport.
"""

from __future__ import annotations

import datetime
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pkg2_spark.engine import Engine

DEFAULT_MAX_ROWS = 200


class ServiceError(ValueError):
    """Bad request: unknown endpoint or invalid/missing parameter."""


def _json_safe(v: Any) -> Any:
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if hasattr(v, "asDict"):  # Row / struct
        return {k: _json_safe(x) for k, x in v.asDict().items()}
    return v


class QueryService:
    """Named-endpoint dispatch over an :class:`Engine`.

    >>> svc = QueryService(engine)
    >>> svc.handle("search", {"pattern": "lib%"})
    {"endpoint": "search", "columns": [...], "rows": [...], "row_count": N}
    """

    def __init__(self, engine: Engine, max_rows: int = DEFAULT_MAX_ROWS):
        self.engine = engine
        self.max_rows = max_rows
        self._endpoints = {
            "search": self._search,
            "whatprovides": self._whatprovides,
            "whatdepends": self._whatdepends,
            "resolve": self._resolve,
            "resolve_constrained": self._resolve_constrained,
            "latest": self._latest,
            "sql": self._sql,
            "table": self._table,
        }

    # ------------------------------------------------------------ dispatch
    def endpoints(self) -> list[str]:
        return sorted(self._endpoints)

    def handle(self, endpoint: str, params: dict[str, Any] | None = None) -> dict:
        """Execute one request; returns a JSON-safe response envelope."""
        params = dict(params or {})
        fn = self._endpoints.get(endpoint)
        if fn is None:
            raise ServiceError(
                f"unknown endpoint {endpoint!r}; available: {self.endpoints()}"
            )
        df = fn(params)
        limited = df.limit(self.max_rows)
        rows = [
            {k: _json_safe(v) for k, v in r.asDict().items()}
            for r in limited.collect()
        ]
        return {
            "endpoint": endpoint,
            "columns": limited.columns,
            "rows": rows,
            "row_count": len(rows),
            "truncated": len(rows) == self.max_rows,
        }

    # ----------------------------------------------------------- endpoints
    @staticmethod
    def _require(params: dict, key: str) -> Any:
        if key not in params or params[key] in (None, ""):
            raise ServiceError(f"missing required parameter {key!r}")
        return params[key]

    def _search(self, p: dict) -> DataFrame:
        pattern = self._require(p, "pattern")
        return self.engine.search_packages(pattern, arch=p.get("arch")).select(
            "name", "version", "arch", "description"
        )

    def _whatprovides(self, p: dict) -> DataFrame:
        return self.engine.whatprovides(self._require(p, "capability"))

    def _whatdepends(self, p: dict) -> DataFrame:
        return self.engine.whatdepends(self._require(p, "package"))

    def _resolve(self, p: dict) -> DataFrame:
        return self.engine.resolve(
            self._require(p, "package"), max_depth=int(p.get("max_depth", 10))
        ).orderBy("depth", "node")

    def _resolve_constrained(self, p: dict) -> DataFrame:
        return self.engine.resolve_constrained(
            self._require(p, "package"), max_depth=int(p.get("max_depth", 10))
        ).orderBy("depth", "name", "version")

    def _latest(self, p: dict) -> DataFrame:
        return self.engine.latest_versions().select("name", "version", "arch")

    def _sql(self, p: dict) -> DataFrame:
        return self.engine.sql(self._require(p, "query"))

    def _table(self, p: dict) -> DataFrame:
        name = self._require(p, "name")
        if not name.replace("_", "").isalnum():
            raise ServiceError(f"invalid table name {name!r}")
        return self.engine.table(name)


def demo_requests() -> list[tuple[str, dict]]:
    """The request set the service smoke test replays (tests/test_service.py)."""
    return [
        ("search", {"pattern": "lib%"}),
        ("whatprovides", {"capability": "so:libssl.so.3"}),
        ("whatdepends", {"package": "musl"}),
        ("resolve", {"package": "python3.11"}),
        ("latest", {}),
        ("sql", {"query": "SELECT count(*) AS n FROM packages"}),
    ]

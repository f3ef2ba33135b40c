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

    def __init__(
        self,
        engine: Engine,
        max_rows: int = DEFAULT_MAX_ROWS,
        allow_unsafe_sql: bool = False,
    ):
        self.engine = engine
        self.max_rows = max_rows
        # The sql endpoint is SELECT-only by default: a transport-exposed
        # service must not accept DDL/DML (INSERT OVERWRITE, DROP, path-based
        # reads) from untrusted parameters. Opt in explicitly for trusted
        # embedders.
        self.allow_unsafe_sql = allow_unsafe_sql
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
        # Fetch one sentinel row past the cap so `truncated` is exact: a
        # result with exactly max_rows rows is complete, not truncated.
        limited = df.limit(self.max_rows + 1)
        fetched = limited.collect()
        rows = [
            {k: _json_safe(v) for k, v in r.asDict().items()}
            for r in fetched[: self.max_rows]
        ]
        return {
            "endpoint": endpoint,
            "columns": limited.columns,
            "rows": rows,
            "row_count": len(rows),
            "truncated": len(fetched) > self.max_rows,
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

    # Statement forms allowed through the sql endpoint (query-only). Spark
    # SQL queries start with one of these after comments are stripped.
    _QUERY_HEADS = ("select", "with", "values", "table", "from", "(")
    # Mutating / session-changing verbs rejected anywhere in the statement
    # (word-bounded, so column names like `created_at` don't trip it).
    _FORBIDDEN = (
        "insert", "update", "delete", "merge", "drop", "create", "alter",
        "truncate", "grant", "revoke", "set", "reset", "add", "load",
        "analyze", "cache", "uncache", "refresh", "msck", "use",
    )

    @classmethod
    def _reject_unsafe_sql(cls, query: str) -> None:
        """Fail-closed SELECT-only filter for transport-exposed callers.

        Strips comments, then requires a query-shaped head token, a single
        statement, no mutating verbs, and no path-based table access
        (``format.`/path```). Conservative by design: a legitimate query
        containing e.g. the literal string 'DROP' is rejected — embedders
        that need full SQL pass ``allow_unsafe_sql=True``.
        """
        import re

        stripped = re.sub(r"--[^\n]*", " ", query)
        stripped = re.sub(r"/\*.*?\*/", " ", stripped, flags=re.S)
        body = stripped.strip().rstrip(";").strip()
        if ";" in body:
            raise ServiceError("sql endpoint accepts a single statement")
        head = body.split(None, 1)[0].lower() if body else ""
        if not (head.startswith("(") or head in cls._QUERY_HEADS):
            raise ServiceError(
                f"sql endpoint is SELECT-only; statement head {head!r} rejected"
            )
        lowered = body.lower()
        for verb in cls._FORBIDDEN:
            if re.search(rf"\b{verb}\b", lowered):
                raise ServiceError(
                    f"sql endpoint is SELECT-only; keyword {verb!r} rejected"
                )
        if re.search(r"\b(parquet|orc|csv|json|text|binaryfile|avro)\s*\.\s*`", lowered):
            raise ServiceError("sql endpoint rejects path-based table access")

    def _sql(self, p: dict) -> DataFrame:
        query = self._require(p, "query")
        if not self.allow_unsafe_sql:
            self._reject_unsafe_sql(query)
        return self.engine.sql(query)

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

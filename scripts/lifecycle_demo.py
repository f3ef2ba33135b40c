"""End-to-end LIFECYCLE demo: the two maintenance stories a production
deployment runs continuously, composed from the same operators the
registry checks one at a time.

Story 1 — package-repo lifecycle (pkg2's core loop):
    remote repo archives (the four wire formats, gz fixture as the remote)
      → Engine.fetch_to_cache        (file:// here, http(s):// at deploy;
                                      atomic tmp+rename, gzip-magic check)
      → Engine.ingest_index_cache    (distributed inflate+parse → one
                                      normalized multi-distro table)
      → Engine.resolve_constrained   (constraint-aware dependency closure)
      → QueryService over HTTP       (stdlib transport; SELECT-only sql,
                                      validated params, bounded rows)

Story 2 — dedup-index lifecycle (the 100 TB maintenance loop):
    base corpus → build_state(v0)
      → apply_delta(shard, commit v1)    cost ∝ delta + touched buckets
      → compact_state(v1 → v2)           small-file rewrite + verified GC
      → retire_versions([v0, v1])        storage reclaim
      → apply_delta(shard2) on the compacted head → component resolution
    with the invariant checked live: compacted ≡ chained ≡ one-shot batch.

Usage: python scripts/lifecycle_demo.py [sf_dir]   (default sf0.01)
Exits nonzero if any invariant fails — runnable as a smoke check.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import urllib.error
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402


def demo_packages(spark, sf_dir: str, work: str) -> None:
    from pkg2_spark.engine import Engine
    from pkg2_spark.queries.packages import _GZ_CACHE_FILES, _ensure_gz_cache
    from pkg2_spark.service import QueryService, make_http_server

    eng = Engine(spark)
    remote = _ensure_gz_cache(sf_dir)  # plays the remote repo
    cache = os.path.join(work, "cache")
    fetched = eng.fetch_to_cache(
        [f"file://{os.path.join(remote, f)}" for f in _GZ_CACHE_FILES], cache
    )
    print(f"[packages] fetched {len(fetched)} archives -> {cache}")

    pkgs = eng.ingest_index_cache(cache)
    per_distro = {r["distro"]: r["n"] for r in
                  pkgs.groupBy("distro").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"[packages] ingested per distro: {per_distro}")
    assert len(per_distro) == 4, "expected all four wire formats"

    closure = eng.resolve_constrained("python3.11").collect()
    print(f"[packages] resolve_constrained('python3.11') -> "
          f"{[(r['name'], r['version']) for r in closure]}")
    assert closure, "constrained closure must be non-empty"

    svc = QueryService(eng)
    server = make_http_server(svc)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        resp = json.loads(urllib.request.urlopen(
            f"{base}/search?pattern=%25ssl%25").read())
        print(f"[packages] HTTP /search '%ssl%' -> {resp['row_count']} rows")
        assert resp["row_count"] >= 1
        try:
            urllib.request.urlopen(f"{base}/sql?query=DROP%20TABLE%20x")
            raise AssertionError("mutating sql must be rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            print("[packages] HTTP /sql DROP rejected with 400 (SELECT-only)")
    finally:
        server.shutdown()
        server.server_close()


def demo_dedup_index(spark, sf_dir: str, work: str) -> None:
    from pkg2_spark.catalog import load_tables
    from pkg2_spark.operators.dedup import resolve_components
    from pkg2_spark.operators.dedup_index import (
        apply_delta, build_state, compact_state, retire_versions,
    )
    from pkg2_spark.operators.lsh import banded_pairs
    from pkg2_spark.operators.similarity import cosine_on_pairs, sign_lsh_bands

    e = load_tables(spark, sf_dir)["embeddings"]
    base = e.filter(F.col("vec_id") % 10 < 8)
    shard1 = e.filter(F.col("vec_id") % 10 == 8)
    shard2 = e.filter(F.col("vec_id") % 10 == 9)
    v0, v1, v2 = (os.path.join(work, f"state_v{i}") for i in range(3))

    build_state(base, v0)
    print("[dedup] built v0 on the 80% base")
    apply_delta(v0, shard1, e.filter(F.col("vec_id") % 10 != 9), commit_dir=v1)
    print("[dedup] delta shard1 committed -> v1")
    compact_state(spark, v1, v2)
    retire_versions([v0, v1])
    assert not os.path.exists(v0) and os.path.exists(v2)
    print("[dedup] compacted v1 -> v2, retired v0/v1 (storage reclaimed)")

    incr = apply_delta(v2, shard2, e)
    comp = resolve_components(incr.filter(F.col("cos") >= 0.3),
                              src="id_a", dst="id_b")
    n_comp = comp.select("component").distinct().count()
    print(f"[dedup] shard2 against compacted head -> {n_comp} components")

    bands = sign_lsh_bands(e, dim=64, rows_per_band=8)
    cand = banded_pairs(bands, "vec_id", "id_a", "id_b", cap=64)
    batch = cosine_on_pairs(cand, e, "id_a", "id_b", dim=64)
    got = {(r["id_a"], r["id_b"], r["cos"]) for r in incr.collect()}
    want = {(r["id_a"], r["id_b"], r["cos"]) for r in batch.collect()}
    assert got == want, "compacted-chain pairs must equal one-shot batch"
    print(f"[dedup] invariant holds: {len(got)} pairs, "
          "compacted chain == one-shot batch")


def main() -> int:
    from pkg2_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="pkg2_spark_lifecycle_demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="lifecycle_demo_")
    try:
        demo_packages(spark, sf_dir, work)
        demo_dedup_index(spark, sf_dir, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print("lifecycle demo: all invariants hold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

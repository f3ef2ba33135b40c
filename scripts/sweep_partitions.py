"""Partitioning-invariance sweep: rerun queries under several
spark.sql.shuffle.partitions settings and verify every one still
hash-matches its DuckDB oracle.

The floor-scaled-integer determinism discipline (see
tests/test_determinism_discipline.py) claims results are independent of how
Spark partitions the aggregation; this script is the empirical check — a
round(sum(double)) oracle would flip its last digit under some partitioning,
an integer-summed one cannot.

Usage: python scripts/sweep_partitions.py [--json OUT.json] [sf_dir] [query ...]
Runs the full registry when no query names are given, at partitions {3, 7, 32}.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pkg2_spark.compare import compare_all
from pkg2_spark.session import get_session

PARTITIONS = (3, 7, 32)


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or None
    spark = get_session()
    out: dict[str, dict[str, bool]] = {}
    failed = 0
    for parts in PARTITIONS:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        results = compare_all(spark, sf_dir, names=names)
        for r in results:
            out.setdefault(r.name, {})[f"p{parts}"] = bool(r.match)
            if not r.match:
                failed += 1
                print(f"[FAIL @ partitions={parts}] {r}")
        ok = sum(1 for r in results if r.match)
        print(f"partitions={parts}: {ok}/{len(results)} match")
    if json_out:
        Path(json_out).write_text(
            json.dumps({"sf_dir": sf_dir, "partitions": list(PARTITIONS),
                        "results": out}, indent=2) + "\n"
        )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

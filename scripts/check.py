"""Local correctness gate: run every registered query vs its DuckDB oracle.

Usage: python scripts/check.py [--json OUT.json] [sf_dir] [query_name ...]
Mirrors the driver's t2 comparison (SURVEY.md §0.1). With --json, also
writes the results in the driver's CORRECTNESS_r{N}.json shape (registry
order) so builder claims diff mechanically against driver facts.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pkg2_spark.compare import compare_all
from pkg2_spark.session import get_session


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
    results = compare_all(spark, sf_dir, names=names)
    if json_out:
        Path(json_out).write_text(
            json.dumps({r.name: r.driver_row() for r in results}, indent=2) + "\n"
        )
    failed = 0
    for r in results:
        print(r)
        if not r.match:
            failed += 1
            for i, a, b in r.mismatches:
                print(f"    row {i}: spark={a}")
                print(f"           oracle={b}")
    print(f"\n{len(results) - failed}/{len(results)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

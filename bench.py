"""Benchmark harness — headline queries at sf0.1 (BASELINE.md comparator).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Measurement rules follow BASELINE.md exactly so numbers are comparable:
one shared SparkSession (startup excluded), ten views registered once,
spark.sql.shuffle.partitions=8, warm timing = second execution.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pkg2_spark.catalog import load_tables
from pkg2_spark.registry import all_queries
from pkg2_spark.session import get_session

# Headline set = BASELINE.md's measured shapes (SURVEY.md §6).
HEADLINE = [
    "q_agg_group",
    "q_join_multiway",
    "q_win_topk_group",
    "q_stream_tumble",
    "q_limit_topk",
    "q_llm_cossim",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_session(app_name="pkg2_spark_bench", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    queries = all_queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # BASELINE.md methodology: warm = second execution in the same
        # session — i.e. re-running the already-planned query. The first
        # collect pays analysis/AQE/codegen; the timed run measures execution.
        df = queries[name](spark, sf_dir)
        df.collect()
        t0 = time.perf_counter()
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_warm_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-15 measurement: where does q_llm_dedup_incr's ~2 s go?

Breaks the increment into its constituent actions (plan construction,
the big materialize+count job, the Arrow collect, the final groupBy)
and dumps the formatted plan of the full pair pipeline so Exchange
placement is visible. Run on a quiet machine; timings are wall-clock.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from pkg2_spark.catalog import load_tables
from pkg2_spark.queries.llm import _BUCKET_CAP
from pkg2_spark.registry import all_queries
from pkg2_spark.session import get_session


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="r15_profile_dedup", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    queries = all_queries()

    # Warm-up: build fixtures + JIT.
    queries["q_llm_dedup_incr"](spark, sf_dir).collect()
    queries["q_llm_dedup_incr"](spark, sf_dir).collect()

    from pkg2_spark.operators.dedup_index import apply_delta
    from pkg2_spark.queries.relational import fixture_path

    e = load_tables(spark, sf_dir)["embeddings"]
    delta = e.filter(F.col("vec_id") % 10 == 0)
    state = fixture_path("dedup_incr_state", sf_dir)

    # 1. plan construction cost (no action)
    t0 = time.perf_counter()
    ver_all = apply_delta(state, delta, e, cap=_BUCKET_CAP)
    edges = ver_all.filter(F.col("cos") >= 0.3)
    pairs_df = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    t_build = time.perf_counter() - t0

    # 2. analysis+optimization cost: explain (formatted) forces planning
    t0 = time.perf_counter()
    plan = pairs_df._sc._jvm.PythonSQLUtils.explainString(
        pairs_df._jdf.queryExecution(), "formatted"
    )
    t_plan = time.perf_counter() - t0
    Path("/tmp/r15_dedup_incr_pairs_plan.txt").write_text(plan)
    n_exchange = plan.count("\n+- Exchange") + plan.count("\n   +- Exchange") + plan.count(" Exchange (")

    # 3. the big job: noop-sink the pair pipeline (fresh plan, no checkpoint)
    spark.sparkContext.setJobDescription("r15: dedup_incr pair pipeline noop")
    t0 = time.perf_counter()
    pairs_df.write.format("noop").mode("overwrite").save()
    t_noop = time.perf_counter() - t0

    # 4. the declared path: truncate+count, toPandas, final collect
    from pkg2_spark.session import truncate_lineage_counted

    t0 = time.perf_counter()
    ver_all2 = apply_delta(state, delta, e, cap=_BUCKET_CAP)
    pairs2 = ver_all2.filter(F.col("cos") >= 0.3).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    mat, n_raw = truncate_lineage_counted(pairs2)
    t_count = time.perf_counter() - t0
    t0 = time.perf_counter()
    pdf = mat.toPandas()
    t_collect = time.perf_counter() - t0

    # 5. full query timing for reference
    t0 = time.perf_counter()
    queries["q_llm_dedup_incr"](spark, sf_dir).collect()
    t_full = time.perf_counter() - t0

    print(
        f"build_df={t_build:.3f}s plan={t_plan:.3f}s noop={t_noop:.3f}s "
        f"count={t_count:.3f}s collect={t_collect:.3f}s full={t_full:.3f}s "
        f"n_edges={n_raw} rows={len(pdf)} exchanges~{n_exchange}"
    )
    print("plan at /tmp/r15_dedup_incr_pairs_plan.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Query registry — the implementation of SURVEY.md §2's contract.

Every operator the engine supports is declared here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (usually) a DuckDB
oracle SQL string. The driver hash-matches the two at sf0.01
(__spark_entry__.py:3-8); queries without an oracle get a rows-only check.

The decorator keeps declaration next to implementation so the §2.13
determinism rules (rounding, aliasing, null ordering) are visible at the
definition site.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL.

    Omit ``oracle`` only for genuinely non-SQL-expressible ops (streaming
    harness, approx sketches) — the driver then records a weaker rows-only
    check (SURVEY.md §2 legend).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# The verification driver walks ``queries()`` in dict order under a hard
# 50-query budget per round (CORRECTNESS_r01/r02 each contain exactly 50
# rows). Emission order is therefore part of the contract surface: rounds 1+2
# covered 98 distinct queries; this head puts the 4 round-2 errors (real-
# streaming NTZ failures, fixed in streaming/harness.py) plus the 47 queries
# the driver has never reached in the first 50 slots. Queries already
# driver-green in r1/r2 follow in module order; new queries added this round
# queue behind this head for round 4+.
_DRIVER_CHECK_HEAD = [
    # round-2 driver errors, fixed (timestamp_ntz cast in the streaming
    # harness) — re-earn green rows first
    "q_stream_rt_tumble", "q_stream_rt_slide", "q_stream_rt_session",
    "q_stream_rt_join",
    # round-1 errors whose JSON output-serialization fix (round 2) was never
    # re-checked: r2's 50-row budget ended one entry before q_fn_map_struct
    "q_fn_map_struct", "q_src_repoindex",
    # never driver-checked (r1+r2 both stopped at 50): SQL composites,
    # packages, udfs, sorts/sets, timeseries, graph, multimodal, IO, filters
    "q_sql_tpch_q4", "q_sql_tpch_q5", "q_sql_tpch_q7",
    "q_pkg_debindex", "q_pkg_provides", "q_pkg_latest", "q_pkg_resolve",
    "q_pkg_version_order", "q_pkg_revdeps", "q_pkg_archindex",
    "q_udf_scalar", "q_udf_grouped_agg", "q_udf_grouped_map", "q_udtf",
    "q_udf_python",
    "q_sort_multi", "q_limit_topk", "q_offset",
    "q_set_union_all", "q_set_union", "q_set_intersect", "q_set_except",
    "q_set_except_all",
    "q_agg_pivot", "q_agg_unpivot", "q_ts_gapfill", "q_sink_rollup",
    "q_events_funnel", "q_dq_constraints", "q_ts_incremental",
    "q_graph_closure",
    "q_mm_meta", "q_mm_decode", "q_mm_frames", "q_mm_resize", "q_mm_features",
    # round-3 additions (training-data prep + warehouse maintenance) — new
    # code outranks the remaining r1 leftovers below so environment
    # surprises (the NTZ class) surface at the next driver run; the 50-row
    # budget reaches q_profile_hist, the rest of these plus the IO/filter
    # leftovers spill to round 4 (all sure-pass locally at two scales)
    "q_llm_chunk", "q_llm_pack", "q_llm_boiler", "q_vec_quant",
    "q_kmeans_step", "q_cdc_merge", "q_dim_scd2", "q_profile_hist",
    "q_stream_rt_enrich", "q_llm_quality_gate", "q_llm_split_drift",
    "q_llm_keep_best", "q_stream_foreachbatch", "q_cdc_compact",
    "q_events_retention", "q_llm_colloc", "q_sql_tpch_q1", "q_sql_tpch_q3",
    "q_join_asof_fwd", "q_sink_compact", "q_fn_zorder", "q_fn_variant",
    "q_fn_strdist", "q_ivm_join", "q_stream_rt_multibatch",
    "q_agg_approx_cd_check", "q_agg_approx_pct_check", "q_dim_state_time",
    "q_stream_rt_join_left",
    "q_sink_bucketed", "q_src_binary", "q_src_evolving", "q_src_corrupt",
    "q_filter_compound", "q_filter_in", "q_filter_between", "q_filter_like",
    "q_filter_null", "q_case_when", "q_cast",
]


def _driver_order(d: dict) -> dict:
    head = [n for n in _DRIVER_CHECK_HEAD if n in d]
    seen = set(head)
    return {n: d[n] for n in [*head, *(n for n in d if n not in seen)]}


def all_queries() -> dict[str, QueryFn]:
    # Import side-effect populates the registry exactly once.
    import pkg2_spark.queries  # noqa: F401

    return _driver_order(QUERIES)


def all_oracles() -> dict[str, str]:
    import pkg2_spark.queries  # noqa: F401

    return _driver_order(ORACLES)

"""Plan audit: scan every registered query's physical plan for scale flags.

Usage: python scripts/plan_audit.py [sf_dir] [--out PLAN_AUDIT.md]

For each query (streaming rt_* queries excluded — their plan is built
inside the streaming harness), records:

- joins: BroadcastNestedLoopJoin / CartesianProduct occurrences (red unless
  the query is whitelisted as intentionally bounded),
- python: Arrow/Batch eval or pandas-map nodes (red outside the declared
  UDF/multimodal surface),
- exchanges: shuffle count (informational — the number Catalyst planned,
  before AQE coalescing/reuse),
- scans: parquet scans and the widest ReadSchema column count
  (informational).

The committed PLAN_AUDIT.md is the round's plan-quality ledger: a diff in
its red-flag section means a plan regressed, not just slowed down.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Queries where a nested-loop/cartesian pattern is the DOCUMENTED intent,
# with the bound that keeps it safe.
NLJ_WHITELIST = {
    "q_join_cross": "contract op: explicit small-dim cross join",
    "q_join_theta": "contract op: bounded non-equi theta join",
    "q_llm_ann_ivf": "O(n*k) assignment vs CONSTANT-16 broadcast centroid table",
    "q_vec_pq": "O(n*k*m) PQ code assignment vs CONSTANT-16 broadcast codebook "
    "(same constant-fanout shape as the IVF assignment)",
    "q_vec_adc": "1-row codebook + constant-5-query LUT broadcasts over the "
    "code scan (the PQ/IVF constant-fanout shape, three stages)",
    "q_llm_ann_recall": "same constant-k assignment + bounded probe cross scan",
    "q_llm_ann_mprobe": "bounded 5-probe x derived-k centroid broadcast cross "
    "(the cell scorer); candidate ranking is the cell-keyed equi-join",
    "q_llm_ivf_refine": "two derived-k1 (= icbrt(n/256), broadcastable at "
    "every n) codebook broadcast crosses — the seed and refined Lloyd "
    "assignments; recenter itself is a keyed hash agg",
    "q_llm_knn": "bounded probe set broadcast vs linear corpus scan",
    "q_llm_ann_tune": "the ann_recall shape x3 prefix beams: bounded 5-probe "
    "brute-force arm + derived-k cell-scorer broadcast crosses; every "
    "candidate ranking is the cell-keyed equi-join",
    "q_llm_tfidf": "1-row doc-count scalar cross join (broadcast)",
    "q_llm_unigram_lm": "1-row corpus-token-total scalar cross join "
    "(broadcast; the q_llm_tfidf shape)",
    "q_llm_bm25": "1-row corpus-totals scalar cross join "
    "(broadcast; the q_llm_tfidf shape)",
    "q_sketch_kmv_intersect": "synopsis pair join: |groups| k-hash arrays "
    "(3 rows here) theta-joined on g_a < g_b — bounded by the GROUP count, "
    "never the corpus; the corpus-sized exact arm is an equi-join",
    "q_llm_vocab_coverage": "1-row grand-total scalar cross join over the "
    "vocab-reduced table (broadcast; the q_llm_tfidf shape)",
    "q_llm_filter_funnel": "1-row corpus-token-total scalar cross join "
    "inside the unigram-LM gate (broadcast; the q_llm_unigram_lm shape)",
    "q_dq_embdrift": "constant 8x8 spine cross + 1-row snapshot-totals "
    "cross join (broadcast; the q_dq_benford shape)",
    "q_llm_bpe_step": "1-row argmax-merge broadcast cross onto the "
    "vocabulary scan; pair counting itself is explode -> hash-agg",
    "q_llm_bigram_lm": "1-row train-token-total scalar cross join "
    "(broadcast; the q_llm_unigram_lm shape); the three LM joins are "
    "high-cardinality equi-joins",
    "q_llm_nb_langid": "bounded x|classes| class-list broadcast cross over "
    "the scored-token explode + 1-row train-doc-total broadcast cross; the "
    "likelihood join is a high-cardinality (class, token) equi-join",
    "q_vec_ivf_incr": "the IVF-family derived-k codebook broadcast crosses "
    "(base-tree construction + the delta level-1 descent) + a 1-row "
    "2-scalar summary cross; levels 2/3 are cell-keyed equi-joins",
    "q_vec_ivf_retract": "the q_vec_ivf_incr shapes plus one more 1-row "
    "scalar summary cross (base/removed/delta totals); the delete "
    "anti-join and occupancy counts are cid-keyed equi-joins/hash-aggs",
    "q_vec_ivfpq": "1-row residual codebook broadcast over the PQ encode "
    "scan + the same for the 5-probe LUT build (the q_vec_adc shape); the "
    "ADC scan itself is the cell-keyed equi-join",
    "q_win_dist": "1-row total cross join (broadcast)",
    "q_agg_mode": "1-row total cross join (broadcast)",
    "q_acid_compact": "1-row CDC-emptiness scalar broadcast cross onto the "
    "per-status aggregate (the logical-no-op proof column)",
    "q_acid_delete_dv": "1-row CDC deleted-count scalar broadcast cross "
    "onto the per-status aggregate (the q_acid_compact shape); the DV "
    "application itself is the broadcast anti-join on (file, row_index)",
    "q_acid_update": "1-row CDC updated-count scalar broadcast cross "
    "onto the per-status aggregate (the q_acid_compact shape)",
    "q_events_rfm_thresholds": "1-row quintile-threshold table broadcast "
    "cross over the per-user base (the q_dq_anomaly threshold-then-filter "
    "shape; replaces q_events_rfm's global ntile windows)",
    "q_ts_gapfill": "spine construction: bounded hours x categories cross "
                    "(both sides aggregate-derived, O(hours*types) rows)",
    "q_events_funnel": "three 1-row stage-count aggregates cross-joined into "
                       "the summary row",
    "q_dq_constraints": "five 1-row check aggregates cross-joined into the "
                        "summary row",
    "q_profile_hist": "1-row global min/max bounds cross join (broadcast)",
    "q_llm_quality_gate": "1-row percentile-threshold cross join (broadcast)",
    "q_llm_split_drift": "1-row split-total cross join (broadcast)",
    "q_llm_colloc": "1-row corpus-total cross join (broadcast)",
    "q_kmeans_step": "1-row collected CONSTANT-8 codebook broadcast; "
                     "row-local argmin fold (the Lloyd-iteration dataflow)",
    "q_llm_domain_mix": "1-row corpus-token-total cross join (broadcast)",
    "q_graph_degree_dist": "1-row node-count total cross join (broadcast) "
                           "normalizing the bounded degree histogram",
    "q_llm_mix_temperature": "1-row sqrt-weight-total cross join (broadcast; "
                             "the q_llm_domain_mix shape)",
    "q_sketch_countmin": "probe tokens vs CONSTANT d*w=1024-cell broadcast "
                         "sketch (cell count independent of corpus size)",
    "q_llm_dsir": "1-row smoothed-total cross join (broadcast) feeding the "
                  "constant 256-bucket weight table",
    "q_dq_benford": "1-row digit-total cross join (broadcast) against the "
                    "constant 9-digit expectation table",
    "q_fn_ip": "CONSTANT 4-row CIDR rule table broadcast against the "
               "address scan (longest-prefix match on a bit-shift "
               "predicate; real deployments broadcast a few-thousand-row "
               "route table the same way)",
    "q_graph_hits": "1-row max-score normalizer broadcast cross per "
                    "half-step (the q_llm_tfidf scalar shape, 6 stages); "
                    "edge-score joins are high-cardinality equi-joins",
    "q_acid_restore": "1-row CDC-emptiness scalar broadcast cross onto the "
                      "per-status aggregate (the q_acid_compact proof "
                      "column shape)",
    "q_events_survival": "1-row observation-window-max scalar broadcast "
                         "cross onto the session table (the censoring cut; "
                         "the q_llm_tfidf scalar shape)",
    "q_acid_delete": "1-row CDC delete-count scalar broadcast cross onto "
                     "the per-status aggregate (the q_acid_compact proof "
                     "column shape)",
    "q_sketch_join_card": "1-row exact-count grading arm cross-joined onto "
                          "the 1-row sample estimate (the q_agg_approx_cd "
                          "_check shape)",
    "q_dq_refint": "four 1-row orphan-count aggregates broadcast-crossed "
                   "onto their 1-row child-count rows (the q_dq_constraints "
                   "summary-row shape); the orphan detection itself is an "
                   "anti-join on the FK key",
}

# Declared Python surface (SURVEY §2.12 + multimodal decode stubs).
PYTHON_WHITELIST = {
    "q_udf_scalar", "q_udf_grouped_agg", "q_udf_grouped_map", "q_udtf",
    "q_udf_python", "q_mm_decode", "q_mm_frames", "q_mm_resize",
    "q_mm_features",
    # sequential recurrences (EMA, CUSUM): applyInPandas per series key —
    # the output depends on the previous OUTPUT, inexpressible as a window
    # frame (operators/recurrence.py)
    "q_ts_ema", "q_ts_cusum", "q_ts_holtwinters",
    # compressed fetch-cache inflate: stdlib gzip/tarfile over binaryFile
    # rows via mapInPandas — bounded per archive, shuffle-free, no JVM
    # codec for tar members exists (engine.py::read_index_archives)
    "q_pkg_gzindex",
    # same inflate stage over the FETCHED cache copy (q_pkg_fetch runs
    # fetch_to_cache, then the identical ingest_index_cache pipeline)
    "q_pkg_fetch",
    # partitioned parallel DB ingest: per-task sqlite pulls via
    # mapInPandas — the executor-side topology of spark.read.jdbc
    # (dbsource.py; no JVM JDBC driver exists in this container)
    "q_src_sqlite",
    # Avro OCF decode: per-shard-file stdlib block decoder via
    # mapInPandas (avroio.py; the spark-avro JVM package is absent)
    "q_src_avro",
    # ...and the read-back half of the distributed Avro sink round-trip
    "q_sink_avro",
}

# Plans built inside the streaming harness (writeStream), not visible here.
SKIP = re.compile(r"^q_stream_(rt_|stateful)")

PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
            "MapInPandas", "FlatMapGroupsInPandasWithState")

# Global (partitionBy-less) windows single-partition their input — fatal
# at corpus scale UNLESS the input is bounded by construction. r11 verdict
# #5's done-criterion: zero partitionBy-less windows over unbounded tables
# anywhere in the registry. Whitelist = queries whose global window reads
# a bounded input, with the bounding construct named.
GLOBAL_WINDOW_BOUNDED = {
    "q_events_rfm": "3 ntile windows over the md5-smallest 100k-buyer "
                    "panel (TakeOrderedAndProject; below 100k buyers "
                    "semantics are unchanged — every test scale)",
    "q_llm_bm25": "rank attach over the orderBy().limit(20) top-k result",
    "q_llm_vocab_coverage": "rank + cumulative share over the "
                            "orderBy().limit(50) top-k result (r11 rework)",
    "q_llm_zipf": "rank attach over the orderBy().limit(top-k) result",
    "q_llm_bpe_step": "rank attach over orderBy().limit(1)/limit(20) "
                      "argmax-merge results",
    "q_vec_ivf_incr": "rank attach over the orderBy().limit(20) "
                      "most-touched-cell report",
    "q_vec_ivf_retract": "rank attach over the orderBy().limit(20) "
                         "churn-report result (the q_vec_ivf_incr shape)",
    "q_sort_multi": "contract op: total-order rank over the <=1000-key "
                    "filtered customer slice",
    "q_scan_dpp": "no-op rank==1 filter over the orderBy().limit(1) "
                  "1-row dim (TakeOrderedAndProject in main AND DPP "
                  "subquery plans; the Filter is what makes Catalyst "
                  "inject dynamicpruning — a bare limit does not qualify)",
    "q_events_survival": "Kaplan-Meier risk-set cumulative over the "
                         "per-duration aggregate (rows = distinct "
                         "duration buckets, bounded by the observation "
                         "grid, never the event count)",
    "q_llm_dsir": "smoothing totals over the <=256-row hash-bucket "
                  "weight table (a second .agg() branch would re-derive "
                  "the token-explode subtree)",
}


def _window_is_global(detail_line: str) -> bool:
    """True when a Window node's Arguments line has no partition spec.

    A Window node prints ``Arguments: [funcs], [partspec], [orderspec]``
    with partspec/orderspec each OPTIONAL (an unordered partitioned
    window prints 2 groups too), so group count alone cannot decide.
    Partition specs are bare column refs; order specs carry the
    ASC/DESC NULLS direction tokens — a window is global iff no group
    after the first is direction-free."""
    depth = 0
    groups: list[str] = []
    for ch in detail_line.split("Arguments:", 1)[1]:
        if ch == "[":
            if depth == 0:
                groups.append("")
            depth += 1
        if depth > 0:
            groups[-1] += ch
        if ch == "]":
            depth -= 1
    spec_groups = groups[1:]  # groups[0] is the window-function list
    if not spec_groups:
        return True  # neither partition nor order spec
    return not any(
        " ASC " not in g and " DESC " not in g for g in spec_groups
    )


def _global_windows(plan: str) -> int:
    """Number of partitionBy-less Window nodes in a formatted plan."""
    n = 0
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if re.match(r"\(\d+\) Window$", ln.strip()):
            for nxt in lines[i + 1 : i + 6]:
                if nxt.startswith("Arguments: "):
                    if _window_is_global(nxt):
                        n += 1
                    break
    return n


def audit(spark, sf_dir: str) -> list[dict]:
    from pkg2_spark.registry import all_queries

    rows = []
    for name, fn in all_queries().items():
        if SKIP.match(name):
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        # count node HEADERS "(N) NodeName" only — the formatted plan prints
        # every node twice (tree line + detail section)
        nlj = len(re.findall(r"\(\d+\) (?:BroadcastNestedLoopJoin|CartesianProduct)", plan))
        py = len(re.findall(r"\(\d+\) (?:%s)" % "|".join(PY_NODES), plan))
        widths = [len(m.split(",")) for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)]
        gw = _global_windows(plan)
        rows.append({
            "name": name,
            "nlj": nlj,
            "nlj_ok": name in NLJ_WHITELIST,
            "python": py,
            "python_ok": name in PYTHON_WHITELIST,
            "global_windows": gw,
            "global_windows_ok": gw == 0 or name in GLOBAL_WINDOW_BOUNDED,
            "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
            "scans": len(re.findall(r"\(\d+\) Scan ", plan)),
            "max_read_cols": max(widths, default=0),
        })
    return rows


def render(rows: list[dict], sf_dir: str) -> str:
    red = [
        r for r in rows
        if (r["nlj"] and not r["nlj_ok"])
        or (r["python"] and not r["python_ok"])
        or not r["global_windows_ok"]
    ]
    out = ["# PLAN_AUDIT — physical-plan scale flags", "",
           f"Input: {sf_dir}; {len(rows)} batch-planable queries audited",
           "(streaming-harness queries excluded: plans are built at writeStream time).",
           ""]
    out.append("## Red flags (unexpected NLJ/cartesian, Python nodes, or")
    out.append("## unbounded partitionBy-less windows)")
    out.append("")
    if red:
        for r in red:
            out.append(
                f"- **{r['name']}**: nlj={r['nlj']} python={r['python']} "
                f"global_windows={r['global_windows']}"
            )
    else:
        out.append("none — every nested-loop pattern and Python node sits on the")
        out.append("whitelisted, documented surface, and every partitionBy-less")
        out.append("window reads a limit-bounded input (r11 verdict #5's")
        out.append("done-criterion, checked per plan).")
    out.append("")
    gwb = [r for r in rows if r["global_windows"] and r["global_windows_ok"]]
    if gwb:
        out.append("## Bounded global windows (input bounded by construction)")
        out.append("")
        for r in gwb:
            out.append(
                f"- {r['name']} ({r['global_windows']}): "
                f"{GLOBAL_WINDOW_BOUNDED[r['name']]}"
            )
        out.append("")
    out.append("## Whitelisted nested-loop patterns (bounded by construction)")
    out.append("")
    for r in rows:
        if r["nlj"] and r["nlj_ok"]:
            out.append(f"- {r['name']}: {NLJ_WHITELIST[r['name']]}")
    out.append("")
    out.append("## Per-query inventory")
    out.append("")
    out.append("| query | exchanges | scans | max ReadSchema cols | nlj | python |")
    out.append("|---|---|---|---|---|---|")
    for r in rows:
        out.append(
            f"| {r['name']} | {r['exchanges']} | {r['scans']} | {r['max_read_cols']} "
            f"| {r['nlj']} | {r['python']} |"
        )
    out.append("")
    return "\n".join(out)


def main() -> int:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from pkg2_spark.session import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    rows = audit(spark, sf_dir)
    text = render(rows, sf_dir)
    if out_path:
        Path(out_path).write_text(text + "\n")
    red = [
        r for r in rows
        if (r["nlj"] and not r["nlj_ok"])
        or (r["python"] and not r["python_ok"])
        or not r["global_windows_ok"]
    ]
    print(text.split("## Per-query inventory")[0])
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())

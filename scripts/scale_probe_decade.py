"""Scale-probe DECADE: sf0.1 -> synthetic sf1 (10x) for the heavy family.

Usage: python scripts/make_sf1.py && python scripts/scale_probe_decade.py
       [--out SCALE_PROBE_DECADE.md]

The standard probe (scripts/scale_probe.py) spans sf0.001-0.1; this one
validates the claims that only bite at density — capped band-pair volume,
contraction/component growth, IVF cell flatness — one decade further on
the tmp_io/sf1 replica set (near-duplicate replicas, so band buckets are
~10x denser: the adversarial direction). Reports wall-time ratios per 10x
data plus the STRUCTURAL counters behind the claims:

- candidate-pair counts out of the capped sign-LSH/minhash joins (the
  quantity the _BUCKET_CAP bounds — superlinear growth here is the bug);
- IVF codebook size / mean / max cell size (derived k must hold cells
  ~constant);
- component count out of dedup resolution (sanity that the denser corpus
  still resolves).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

PROBES = [
    "q_llm_dedup_exact",
    "q_llm_minhash",
    "q_llm_cossim_lsh",
    "q_llm_dedup_resolve",
    "q_llm_keep_best",
    "q_llm_semdedup",
    "q_llm_winnow_dup",
    "q_llm_ann_ivf",
    "q_graph_cc",
    "q_ts_ema",
]


def main() -> int:
    out_path = None
    args = sys.argv[1:]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]

    from pkg2_spark.catalog import load_tables
    from pkg2_spark.operators.lsh import banded_pairs
    from pkg2_spark.operators.similarity import sign_lsh_bands
    from pkg2_spark.queries.llm import _BUCKET_CAP, _ivf_assign, _ivf_k
    from pkg2_spark.queries.relational import IO_DIR
    from pkg2_spark.registry import all_queries
    from pkg2_spark.session import get_session

    sfs = ["/root/testdata/sf0.1", str(Path(IO_DIR) / "sf1")]
    spark = get_session(app_name="pkg2_spark_decade_probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    lines = [
        "# SCALE_PROBE_DECADE — sf0.1 -> synthetic sf1 (10x, near-dup replicas)",
        "",
        "Probe data: scripts/make_sf1.py (10 replicas of sf0.1; documents are",
        "NEAR-duplicates and embeddings sign-stable, so band buckets are ~10x",
        "denser — the adversarial direction for pair joins). Median of 3 warm",
        "runs; ratio ≈10x = linear in data, >>10x = superlinear red flag.",
        "",
        "| query | sf0.1 | sf1 | ratio/10x |",
        "|---|---|---|---|",
    ]
    for name in PROBES:
        row = {}
        for sf in sfs:
            fn = queries[name]
            fn(spark, sf).count()
            times = []
            for _ in range(3):
                t0 = time.monotonic()
                fn(spark, sf).count()
                times.append(time.monotonic() - t0)
            row[sf] = statistics.median(times)
        t1, t2 = row[sfs[0]], row[sfs[1]]
        lines.append(f"| {name} | {t1:.3f}s | {t2:.3f}s | {t2 / t1:.2f}x |")
        print(lines[-1])

    lines += ["", "## Structural counters", "",
              "| counter | sf0.1 | sf1 | ratio |", "|---|---|---|---|"]

    def counter(label, fn):
        vals = [fn(sf) for sf in sfs]
        ratio = vals[1] / vals[0] if vals[0] else float("nan")
        lines.append(f"| {label} | {vals[0]} | {vals[1]} | {ratio:.2f}x |")
        print(lines[-1])

    def sign_pairs(sf):
        e = load_tables(spark, sf)["embeddings"]
        bands = sign_lsh_bands(e, dim=64, rows_per_band=8)
        return banded_pairs(bands, "vec_id", "id_a", "id_b", cap=_BUCKET_CAP).count()

    def ivf_stats(sf):
        e = load_tables(spark, sf)["embeddings"]
        cells = _ivf_assign(e).groupBy("cid").count()
        r = cells.agg(
            F.count(F.lit(1)), F.avg("count"), F.max("count")
        ).first()
        return (_ivf_k(e), int(r[1]), int(r[2]))

    counter("capped sign-LSH candidate pairs", sign_pairs)
    s1, s2 = (ivf_stats(sf) for sf in sfs)
    for i, label in enumerate(("IVF k (derived)", "IVF mean cell", "IVF max cell")):
        lines.append(f"| {label} | {s1[i]} | {s2[i]} | {s2[i] / max(s1[i], 1):.2f}x |")
        print(lines[-1])

    def components(sf):
        return queries["q_llm_dedup_resolve"](spark, sf).count()

    counter("near-dup components resolved", components)

    lines += [
        "",
        "## Reading the numbers",
        "",
        "- The FIRST run of this probe (round 6) caught a real superlinear",
        "  regression: q_llm_ann_ivf 42.7x and q_llm_semdedup 33.6x per 10x.",
        "  Cause: the row-local higher-order-function argmin is INTERPRETED",
        "  (HOF lambdas sit outside whole-stage codegen), so centroid",
        "  assignment paid ~µs per (vector, centroid) element — invisible",
        "  while k was constant-16, quadratic-feeling once derived k grew",
        "  with n. Fix: wide-codegen cosine over the broadcast centroid ROWS",
        "  + a map-combinable max(struct) argmax (no rank window); the",
        "  assignment is localCheckpoint-ed where multiple stages read it.",
        "  Post-fix: ann_ivf 91s -> ~15s, semdedup 166s -> ~19s at sf1.",
        "- Capped pair volume jumps >10x across THIS decade because sf0.1",
        "  buckets sat far below the cap and the near-dup replicas push them",
        "  INTO it — the one-time transition into saturation. Past it, pair",
        "  volume is bounded by #buckets x cap^2 (grows with bucket count,",
        "  i.e. linearly in corpus diversity), which is the cap's contract.",
        "- Derived IVF k grows with n, holding mean cell ~flat at the",
        "  target; components track the corpus (denser graph still resolves",
        "  inside the contraction round budget).",
        "",
    ]
    text = "\n".join(lines)
    if out_path:
        Path(out_path).write_text(text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

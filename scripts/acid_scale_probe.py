"""ACID table format scale probe: does MERGE cost track the update
footprint rather than the table size?

Builds a probe table (separate from the query fixtures) from the sf1
decade corpus (tmp_io/sf1, 1.5M orders), then measures on the SAME
table:

- narrow MERGE: a contiguous low-key update range plus pure inserts
  shifted above every key in the table — should rewrite only the files
  containing updated keys;
- full COMPACT: a forced whole-table rewrite (the upper bound any
  unpruned merge would pay).

Usage: python scripts/acid_scale_probe.py [sf_dir] [--out ACID_PROBE.md]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from pkg2_spark.catalog import load_tables  # noqa: E402
from pkg2_spark.session import get_session  # noqa: E402
from pkg2_spark.tableformat import Table  # noqa: E402

IO_DIR = str(Path(__file__).resolve().parent.parent / "tmp_io")


def main() -> int:
    args = sys.argv[1:]
    out = None
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else os.path.join(IO_DIR, "sf1")
    spark = get_session(app_name="acid_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # sf1 decade keys are SPARSE over [0, ~9e8]: cast to long and shift
    # synthetic copies by a full keyspan so copies never collide with
    # base keys (collisions would turn inserts into updates and corrupt
    # the probe's row accounting).
    KEYSPAN = 1_000_000_000
    base = load_tables(spark, sf_dir)["orders"].withColumn(
        "o_orderkey", F.col("o_orderkey").cast("long")
    )
    n_base = base.count()

    def run(scale: int) -> dict:
        # scale > 1 synthesizes a larger table by key-shifted self-union
        # (keys stay unique and range-clusterable; the 10x point is what
        # shows merge flat while the full rewrite grows).
        o = base
        for i in range(1, scale):
            o = o.unionByName(
                base.withColumn(
                    "o_orderkey",
                    F.col("o_orderkey") + F.lit(i * KEYSPAN),
                )
            )
        path = os.path.join(IO_DIR, Path(sf_dir).name, f"acid_probe_{scale}x")
        shutil.rmtree(path, ignore_errors=True)
        t = Table(spark, path, stats_cols=["o_orderkey"],
                  cluster_by="o_orderkey", num_files=32 * scale)
        t0 = time.time()
        t.create(o)
        t_create = time.time() - t0
        # sf1's replica layout puts keys in 10 DENSE blocks at i*100M —
        # [0, 1000] sits inside block 0 (1001 real keys, contiguous in
        # value space, so the pruning demo is honest), and the insert
        # images shift clear above every synthetic copy.
        upd = base.filter(
            F.col("o_orderkey").between(0, 1000)
        ).withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
        ins = base.filter(F.col("o_orderkey").between(2000, 2040)).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(scale * KEYSPAN)
        )
        t0 = time.time()
        t.merge(upd.unionByName(ins), key="o_orderkey")
        t_merge = time.time() - t0
        meta = t.history()[-1]["meta"]
        t0 = time.time()
        t.compact(max_files=32 * scale)
        t_compact = time.time() - t0
        rows = t.read().count()
        shutil.rmtree(path, ignore_errors=True)
        return {
            "scale": scale, "rows": rows, "t_create": t_create,
            "t_merge": t_merge, "t_compact": t_compact, **meta,
        }

    results = [run(1), run(10)]
    la = os.getloadavg()
    lines = [
        "# ACID_PROBE — merge footprint vs full rewrite",
        "",
        f"Corpus: {sf_dir} orders = {n_base:,} rows (10x point is a",
        "key-shifted self-union); 32 range-clustered files per 1x on",
        f"o_orderkey; loadavg at run {la[0]:.2f}. Update = contiguous low-key",
        "range + pure inserts above every copy, SAME delta at both scales.",
        "",
        "| table rows | op | wall s | files rewritten | files pruned |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        lines += [
            f"| {r['rows']:,} | create (full write) | {r['t_create']:.2f} "
            f"| {32 * r['scale']} | — |",
            f"| {r['rows']:,} | merge | {r['t_merge']:.2f} "
            f"| {r['rewritten_files']} | {r['pruned_files']} |",
            f"| {r['rows']:,} | compact (full rewrite) | "
            f"{r['t_compact']:.2f} | {32 * r['scale']} | 0 |",
        ]
    r1, r10 = results
    lines += [
        "",
        f"Merge wall {r1['t_merge']:.2f}s -> {r10['t_merge']:.2f}s across a",
        "10x table (same delta) while the full rewrite grows",
        f"{r1['t_compact']:.2f}s -> {r10['t_compact']:.2f}s — merge cost",
        "tracks the update footprint (stats candidates -> exact",
        "findTouchedFiles join -> rewrite of the touched files only); the",
        "compact rows are what an UNPRUNED merge would pay. At local",
        "scale merge wall is mostly its fixed job count (key-set",
        "checkpoint, bounds, touched-file probe, write); each of those",
        "jobs scans delta-or-touched data only, which is the property",
        "that holds at 100 TB.",
    ]
    text = "\n".join(lines) + "\n"
    print(text)
    print(json.dumps({"base_rows": n_base, "loadavg": la[0], "runs": [
        {k: (round(v, 2) if isinstance(v, float) else v) for k, v in r.items()}
        for r in results
    ]}))
    if out:
        Path(out).write_text(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

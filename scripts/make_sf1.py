"""Generate a synthetic sf1-equivalent dataset for the SCALE-PROBE DECADE.

Usage: python scripts/make_sf1.py [out_dir]   (default <repo>/tmp_io/sf1)

The driver's testdata stops at sf0.1; the scale claims that matter most
(capped band-pair volume, contraction round counts, IVF cell flatness)
deserve validation one decade further BEFORE a real cluster ever sees the
code. This script replicates sf0.1 ten times entirely inside Spark (a
cross join against a 10-row replica frame — no driver-side loops):

- fact/entity keys are offset per replica, so each replica is internally
  referentially consistent and the keyspace grows 10x;
- document TEXT gets a per-replica suffix token (rep > 0), so replicas are
  NEAR-duplicates, not exact ones — minhash/winnow band buckets get ~10x
  denser, exactly the hot-bucket regime the _BUCKET_CAP exists for;
- embeddings get a +rep*1e-5 per-coordinate nudge — same sign-LSH/IVF
  cells at 10x density, same stress;
- region/nation stay single-copy (broadcast dims are sf-invariant).

This is PROBE data (Spark-side wall time only, no DuckDB oracle parity);
it lives under tmp_io and is never read by the correctness gate.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPS = 10


def main() -> int:
    from pkg2_spark.queries.relational import IO_DIR
    from pkg2_spark.session import get_session

    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(IO_DIR, "sf1")
    spark = get_session(app_name="pkg2_spark_make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    rep = spark.range(REPS).select(F.col("id").cast("int").alias("rep"))

    def src(name):
        return spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {df.count()} rows")

    r = F.col("rep").cast("long")
    for name in ("region", "nation"):
        write(src(name), name)

    c = src("customer").crossJoin(rep)
    write(
        c.select(
            (F.col("c_custkey") + r * 10_000_000).alias("c_custkey"),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
        "customer",
    )
    s = src("supplier").crossJoin(rep)
    write(
        s.select(
            (F.col("s_suppkey") + r * 10_000_000).alias("s_suppkey"),
            "s_name", "s_nationkey", "s_acctbal",
        ),
        "supplier",
    )
    p = src("part").crossJoin(rep)
    write(
        p.select(
            (F.col("p_partkey") + r * 10_000_000).alias("p_partkey"),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        ),
        "part",
    )
    o = src("orders").crossJoin(rep)
    write(
        o.select(
            (F.col("o_orderkey") + r * 100_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + r * 10_000_000).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "orders",
    )
    li = src("lineitem").crossJoin(rep)
    write(
        li.select(
            (F.col("l_orderkey") + r * 100_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + r * 10_000_000).alias("l_partkey"),
            (F.col("l_suppkey") + r * 10_000_000).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "lineitem",
    )
    e = src("events").crossJoin(rep)
    write(
        e.select(
            (F.col("event_id") + r * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + r * 10_000_000).alias("user_id"),
            "event_type", "value", "props",
        ),
        "events",
    )
    d = src("documents").crossJoin(rep)
    text = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.concat(F.col("text"), F.lit(" zz"), F.col("rep").cast("string"))
    )
    write(
        d.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            text.alias("text"),
            "lang", "source",
            F.length(text).cast("long").alias("n_chars"),
        ),
        "documents",
    )
    v = src("embeddings").crossJoin(rep)
    emb = F.transform(
        "embedding", lambda x: (x + F.col("rep") * F.lit(1e-5)).cast("float")
    )
    write(
        v.select(
            (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
            emb.alias("embedding"),
            "label",
        ),
        "embeddings",
    )
    print(f"sf1-equivalent written to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Generate synthetic decade datasets for the SCALE-PROBE DECADE runs.

Usage:
    python scripts/make_sf1.py                 # sf0.1 -> tmp_io/sf1  (10x)
    python scripts/make_sf1.py --sf10          # tmp_io/sf1 -> tmp_io/sf10 (100x)
    python scripts/make_sf1.py SRC OUT ENTITY_OFF FACT_OFF SUFFIX  # custom

The driver's testdata stops at sf0.1; the scale claims that matter most
(capped band-pair volume, contraction round counts, IVF cell flatness)
deserve validation decades further BEFORE a real cluster ever sees the
code. Each decade replicates its source ten times entirely inside Spark
(a cross join against a 10-row replica frame — no driver-side loops):

- fact/entity keys are offset per replica, so each replica is internally
  referentially consistent and the keyspace grows 10x (offsets scale with
  the source keyspace so chained decades never collide);
- document TEXT gets a per-replica suffix token (rep > 0), so replicas are
  NEAR-duplicates, not exact ones — minhash/winnow band buckets get ~10x
  denser, exactly the hot-bucket regime the _BUCKET_CAP exists for;
- embeddings get a per-coordinate nudge (scaled down per decade) — same
  sign-LSH/IVF cells at 10x density, same stress;
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

REPS = 10


def replicate(spark, src_dir: str, out_dir: str, entity_off: int,
              fact_off: int, suffix: str, nudge: float) -> None:
    rep = spark.range(REPS).select(F.col("id").cast("int").alias("rep"))

    def src(name):
        return spark.read.parquet(os.path.join(src_dir, f"{name}.parquet"))

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {df.count()} rows")

    r = F.col("rep").cast("long")
    for name in ("region", "nation"):
        write(src(name), name)

    c = src("customer").crossJoin(rep)
    write(
        c.select(
            (F.col("c_custkey") + r * entity_off).alias("c_custkey"),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
        "customer",
    )
    s = src("supplier").crossJoin(rep)
    write(
        s.select(
            (F.col("s_suppkey") + r * entity_off).alias("s_suppkey"),
            "s_name", "s_nationkey", "s_acctbal",
        ),
        "supplier",
    )
    p = src("part").crossJoin(rep)
    write(
        p.select(
            (F.col("p_partkey") + r * entity_off).alias("p_partkey"),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        ),
        "part",
    )
    o = src("orders").crossJoin(rep)
    write(
        o.select(
            (F.col("o_orderkey") + r * fact_off).alias("o_orderkey"),
            (F.col("o_custkey") + r * entity_off).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "orders",
    )
    li = src("lineitem").crossJoin(rep)
    write(
        li.select(
            (F.col("l_orderkey") + r * fact_off).alias("l_orderkey"),
            (F.col("l_partkey") + r * entity_off).alias("l_partkey"),
            (F.col("l_suppkey") + r * entity_off).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "lineitem",
    )
    e = src("events").crossJoin(rep)
    write(
        e.select(
            (F.col("event_id") + r * fact_off).alias("event_id"),
            "ts",
            (F.col("user_id") + r * entity_off).alias("user_id"),
            "event_type", "value", "props",
        ),
        "events",
    )
    d = src("documents").crossJoin(rep)
    text = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.concat(F.col("text"), F.lit(f" {suffix}"), F.col("rep").cast("string"))
    )
    write(
        d.select(
            (F.col("doc_id") + r * entity_off).alias("doc_id"),
            text.alias("text"),
            "lang", "source",
            F.length(text).cast("long").alias("n_chars"),
        ),
        "documents",
    )
    v = src("embeddings").crossJoin(rep)
    emb = F.transform(
        "embedding", lambda x: (x + F.col("rep") * F.lit(nudge)).cast("float")
    )
    write(
        v.select(
            (F.col("vec_id") + r * entity_off).alias("vec_id"),
            emb.alias("embedding"),
            "label",
        ),
        "embeddings",
    )
    print(f"decade replica written to {out_dir}")


def replicate_embeddings(spark, src_dir: str, out_dir: str, entity_off: int,
                         nudge: float) -> None:
    """Third-decade VECTOR-ONLY replica: the sf100 probe exists to bound the
    IVF family's Θ(n^{4/3}) assignment growth, which reads embeddings alone —
    replicating the fact tables another decade would cost ~12 GB and minutes
    of write time for queries the third decade doesn't probe."""
    rep = spark.range(REPS).select(F.col("id").cast("int").alias("rep"))
    r = F.col("rep").cast("long")
    v = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet")).crossJoin(rep)
    emb = F.transform(
        "embedding", lambda x: (x + F.col("rep") * F.lit(nudge)).cast("float")
    )
    out = v.select(
        (F.col("vec_id") + r * entity_off).alias("vec_id"),
        emb.alias("embedding"),
        "label",
    )
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    print(f"embeddings: {out.count()} rows -> {out_dir}")
    # load_tables registers all ten tables eagerly; the non-vector tables
    # symlink back to the source decade so the catalog resolves without
    # paying another 12 GB replica for tables the vector probes never scan.
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"):
        link = os.path.join(out_dir, f"{name}.parquet")
        target = os.path.relpath(os.path.join(src_dir, f"{name}.parquet"), out_dir)
        if not os.path.lexists(link):
            os.symlink(target, link)


def replicate_documents_diverse(spark, src_dir: str, out_dir: str,
                                entity_off: int) -> None:
    """DIVERSE documents decade: ten copies whose texts are per-replica
    token PERMUTATIONS, not near-duplicates. The near-dup replicas are the
    adversarial direction for pair joins (dup mass grows superlinearly by
    construction), which is right for stressing hot-bucket caps but wrong
    for proving the LINEAR claim of the span/winnow dedup family — on a
    corpus that grows in CONTENT, shingle/fingerprint buckets grow in
    number, not density. Permuting token order per replica (keyed on
    md5(rep:position) — deterministic, no RNG) keeps the vocabulary and
    token-frequency profile identical while destroying shared 8-token
    spans and winnow k-grams across replicas; within a replica the
    corpus's own dup structure is preserved. Documents only — the
    remaining tables symlink to the source decade (the diverse probes
    scan documents alone)."""
    rep = spark.range(REPS).select(F.col("id").cast("int").alias("rep"))
    r = F.col("rep").cast("long")
    d = spark.read.parquet(os.path.join(src_dir, "documents.parquet")).crossJoin(rep)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    perm = F.array_sort(
        F.transform(
            toks,
            lambda t, i: F.struct(
                F.md5(F.concat(F.col("rep").cast("string"), F.lit(":"),
                               i.cast("string"))).alias("k"),
                t.alias("t"),
            ),
        )
    )
    text = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.array_join(F.transform(perm, lambda s: s["t"]), " ")
    )
    out = d.select(
        (F.col("doc_id") + r * entity_off).alias("doc_id"),
        text.alias("text"),
        "lang", "source",
        F.length(text).cast("long").alias("n_chars"),
    )
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    print(f"documents (diverse): {out.count()} rows -> {out_dir}")
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        link = os.path.join(out_dir, f"{name}.parquet")
        target = os.path.relpath(os.path.join(src_dir, f"{name}.parquet"), out_dir)
        if not os.path.lexists(link):
            os.symlink(target, link)


def replicate_embeddings_diverse(spark, src_dir: str, out_dir: str,
                                 entity_off: int) -> None:
    """DIVERSE embeddings decade: ten copies whose vectors are per-replica
    DIMENSION PERMUTATIONS of the source (keyed on md5(rep:dim) —
    deterministic, no RNG; rep 0 is the identity). The near-dup replicas
    nudge coordinates, so every decade multiplies the EXACT-TIE mass
    inside each IVF cell — the adversarial direction for the occupancy
    cap, but the wrong corpus for measuring the recall-vs-n_probe curve
    (exact-set recall@5 there mostly measures tie ordering among
    semantically equivalent replicas). Permuting dimensions preserves the
    norm and the per-coordinate value distribution while decorrelating
    replicas, so the corpus grows in CONTENT: cells grow in number, and
    recall measures the beam, not the ties. Replaces the symlink the
    documents-diverse pass left for embeddings; all other tables keep
    their symlinks."""
    link = os.path.join(out_dir, "embeddings.parquet")
    if os.path.islink(link):
        # never write THROUGH the symlink — its target is the (read-only)
        # source decade; Spark's overwrite would try to delete it.
        os.remove(link)
    rep = spark.range(REPS).select(F.col("id").cast("int").alias("rep"))
    r = F.col("rep").cast("long")
    v = spark.read.parquet(
        os.path.join(src_dir, "embeddings.parquet")
    ).crossJoin(rep)
    perm = F.array_sort(
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.struct(
                F.md5(
                    F.concat(F.col("rep").cast("string"), F.lit(":"),
                             i.cast("string"))
                ).alias("k"),
                i.alias("i"),
            ),
        )
    )
    emb = F.when(F.col("rep") == 0, F.col("embedding")).otherwise(
        F.transform(perm, lambda s: F.element_at(F.col("embedding"), s["i"]))
    )
    out = v.select(
        (F.col("vec_id") + r * entity_off).alias("vec_id"),
        emb.alias("embedding"),
        "label",
    )
    out.write.mode("overwrite").parquet(link)
    print(f"embeddings (diverse): {out.count()} rows -> {out_dir}")


def main() -> int:
    from pkg2_spark.queries.relational import IO_DIR
    from pkg2_spark.session import get_session

    spark = get_session(app_name="pkg2_spark_make_decade")
    spark.sparkContext.setLogLevel("ERROR")
    args = sys.argv[1:]
    if "--diverse" in args:
        # diverse documents decades: sf0.1 -> sf1d, then sf1d -> sf10d
        replicate_documents_diverse(
            spark,
            src_dir="/root/testdata/sf0.1",
            out_dir=os.path.join(IO_DIR, "sf1d"),
            entity_off=10_000_000,
        )
        replicate_documents_diverse(
            spark,
            src_dir=os.path.join(IO_DIR, "sf1d"),
            out_dir=os.path.join(IO_DIR, "sf10d"),
            entity_off=1_000_000_000,
        )
        # diverse embeddings ride the same decades (r10: the ANN
        # recall-vs-n_probe curve needs a corpus that grows in content,
        # not exact-tie mass)
        replicate_embeddings_diverse(
            spark,
            src_dir="/root/testdata/sf0.1",
            out_dir=os.path.join(IO_DIR, "sf1d"),
            entity_off=10_000_000,
        )
        replicate_embeddings_diverse(
            spark,
            src_dir=os.path.join(IO_DIR, "sf1d"),
            out_dir=os.path.join(IO_DIR, "sf10d"),
            entity_off=1_000_000_000,
        )
    elif "--sf100-vec" in args:
        # third decade, embeddings only: sf10 vec_ids < 1e10, so the offset
        # jumps another magnitude; nudge shrinks a decade further so the
        # replicas stay inside the same cells at 1000x density.
        replicate_embeddings(
            spark,
            src_dir=os.path.join(IO_DIR, "sf10"),
            out_dir=os.path.join(IO_DIR, "sf100"),
            entity_off=100_000_000_000,
            nudge=1e-7,
        )
    elif "--sf10" in args:
        # second decade: sf1 keys reach ~9e8 (facts) / ~9e7 (entities), so
        # offsets jump a full magnitude past them; smaller embedding nudge
        # keeps replicas inside the same cells at 100x density.
        replicate(
            spark,
            src_dir=os.path.join(IO_DIR, "sf1"),
            out_dir=os.path.join(IO_DIR, "sf10"),
            entity_off=1_000_000_000,
            fact_off=10_000_000_000,
            suffix="yy",
            nudge=1e-6,
        )
    elif len(args) >= 5:
        replicate(spark, args[0], args[1], int(args[2]), int(args[3]),
                  args[4], 1e-5)
    else:
        out_dir = args[0] if args else os.path.join(IO_DIR, "sf1")
        replicate(
            spark,
            src_dir="/root/testdata/sf0.1",
            out_dir=out_dir,
            entity_off=10_000_000,
            fact_off=100_000_000,
            suffix="zz",
            nudge=1e-5,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

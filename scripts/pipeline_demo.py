"""End-to-end training-data pipeline over the documents corpus.

The composition a user of the engine scripts (every stage is a lazy
DataFrame; ONE action at the write):

    raw documents
      → language filter           (keep declared languages)
      → quality filter            (length bounds + alpha-ratio heuristic)
      → repetition filter         (duplicate-token ratio bound, row-local)
      → Gopher-style rule gate    (word count, integer mean-word-length,
                                   stopword presence — all row-local)
      → exact dedup               (md5 content hash, keep min doc_id)
      → near-dup candidate prune  (MinHash/LSH bands, drop non-canonical)
      → train/val/test split      (stable md5-bucket assignment)
      → decontamination audit     (test-split trigram overlap vs train)
      → partitioned parquet write (split/lang directories)

Scale shape: two hash-aggregates (dedup, minhash), one band equi-join
(LSH), one shingle-keyed semi-join (decontam), everything else row-local
projections/filters; the write is partitioned by (split, lang) for
downstream partition pruning. No collect(), no RNG, no Python in the hot
path.

Usage: python scripts/pipeline_demo.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from pkg2_spark.catalog import load_tables  # noqa: E402
from pkg2_spark.engine import Engine  # noqa: E402
from pkg2_spark.operators.text import tokenize_distinct  # noqa: E402

KEEP_LANGS = ["en", "de", "fr", "es"]
MIN_CHARS, MAX_CHARS = 20, 20_000


def build_pipeline(spark, sf_dir: str):
    """Return (stages dict, final DataFrame) — stages exposed for testing.

    The heavy stages go through the Engine facade (the API a user scripts
    against): Engine.dedup_exact, Engine.lsh_candidate_pairs,
    Engine.near_dup_components, Engine.split. Row-local filters are plain
    DataFrame expressions — that IS the engine's surface for them."""
    eng = Engine(spark)
    docs = load_tables(spark, sf_dir)["documents"]

    lang_ok = docs.filter(F.col("lang").isin(KEEP_LANGS))

    alpha_ratio = F.length(F.regexp_replace("text", r"[^a-zA-Z ]", "")) / F.greatest(
        F.length("text"), F.lit(1)
    )
    quality_ok = lang_ok.filter(
        F.col("n_chars").between(MIN_CHARS, MAX_CHARS) & (alpha_ratio > 0.5)
    )

    # repetition filter (q_llm_repetition's rule, row-local form): drop docs
    # whose duplicate-token ratio exceeds the bound — dup_bp in floor basis
    # points over exact integers, no explode needed at this stage
    toks_expr = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    n_tok = F.size(toks_expr)
    n_dis = F.size(F.array_distinct(toks_expr))
    rep_ok = quality_ok.filter(
        F.floor(((n_tok - n_dis) * 10000.0) / F.greatest(n_tok, F.lit(1))) <= 9000
    )

    # Gopher-style rule gate (q_llm_gopher_rules, row-local form): word-count
    # bounds, mean word length as the integer test 3n <= chars <= 10n, and
    # stopword presence
    n_wchars = F.aggregate(
        F.transform(toks_expr, F.length), F.lit(0), lambda acc, x: acc + x
    )
    gopher_ok = rep_ok.filter(
        n_tok.between(10, 100_000)
        & (n_wchars >= 1 * n_tok)
        & (n_wchars <= 10 * n_tok)
        & F.arrays_overlap(toks_expr, F.array(F.lit("the"), F.lit("a")))
    )

    # exact dedup (Engine.dedup_exact): canonical key per content hash
    # (min doc_id wins), semi-joined back to keep the full rows
    canonical = gopher_ok.join(
        eng.dedup_exact(gopher_ok).select("doc_id"), "doc_id", "semi"
    )

    # near-dup prune, looped until dry (candidates are NOT dups until
    # verified — on a small vocabulary LSH buckets collide aggressively):
    #   1. Engine.lsh_candidate_pairs: MinHash/LSH bands -> candidate pairs
    #      with the hot-bucket cap (cheap, recall-oriented)
    #   2. verify with token-set Jaccard >= 0.8 (precision)
    #   3. Engine.near_dup_components: resolve transitive clusters; keep the
    #      min doc_id per component
    # The bucket cap trades single-pass recall for bounded work, so one pass
    # can leave dup pairs whose discovery the cap deferred; re-running the
    # SAME capped pass over the shrinking survivor set until no verified
    # pair remains restores completeness with every round still O(cap²) per
    # bucket — the loop-until-dry shape a production capped-LSH dedup runs.
    pruned = canonical
    for _ in range(5):
        toks = tokenize_distinct(pruned).persist()
        cand = eng.lsh_candidate_pairs(pruned, num_hashes=4, rows_per_band=2)
        sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
        inter = (
            cand.join(toks.select(F.col("doc_id").alias("doc_a"), "token"), "doc_a")
            .join(toks.select(F.col("doc_id").alias("doc_b"), "token"), ["doc_b", "token"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        verified = (
            inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("na")), "doc_a")
            .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("nb")), "doc_b")
            .withColumn("jac", F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")))
            .filter(F.col("jac") >= 0.8)
            .select("doc_a", "doc_b")
        )
        if verified.isEmpty():
            toks.unpersist()
            break
        comp = eng.near_dup_components(verified, src="doc_a", dst="doc_b")
        losers = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        # localCheckpoint per round: the anti-join lineage would otherwise
        # nest one level per pass (on a cluster, checkpoint() to storage).
        pruned = pruned.join(losers, "doc_id", "left_anti").localCheckpoint()
        toks.unpersist()

    final = eng.split(pruned, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})

    # decontamination audit: test docs whose distinct-trigram overlap with
    # the train split exceeds 80% are flagged (not silently dropped — the
    # report is the deliverable; dropping is a policy decision downstream)
    toks_all = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    t = final.select("doc_id", "split", toks_all.alias("toks")).filter(F.size("toks") >= 3)
    tri = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i),
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
        ),
    )
    g = t.select("doc_id", "split", F.explode(F.array_distinct(tri)).alias("ngram"))
    train_g = g.filter(F.col("split") == "train").select("ngram").distinct()
    test_g = g.filter(F.col("split") == "test").select("doc_id", "ngram").distinct()
    contaminated = (
        test_g.join(train_g, "ngram", "leftsemi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contam"))
        .join(test_g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tris")), "doc_id")
        .filter(F.col("n_contam") / F.col("n_tris") > 0.8)
        .select("doc_id")
    )
    # bloom decontamination gate (Engine.bloom_gate): the broadcast-filter
    # twin of the trigram audit — train docs whose exact normalized text
    # also appears in the test split are flagged in ONE map-side probe pass
    # (plus a bounded false-positive remainder the audit would re-verify)
    th = F.md5(F.lower(F.col("text")))
    test_keys = (
        final.filter(F.col("split") == "test").select(th.alias("th")).distinct()
    )
    train_side = final.filter(F.col("split") == "train").select(
        "doc_id", th.alias("th")
    )
    bloom_flagged = eng.bloom_gate(train_side, test_keys, "th")

    # training-sequence preparation (round-3 operators): the train split is
    # chunked into 30-token windows (25 stride) and the chunks packed into
    # 512-token bins per source shard — the tensors-ready layout
    toks_col = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    train = final.filter(F.col("split") == "train").select(
        "doc_id", "source", toks_col.alias("toks")
    )
    n_chunks = F.ceil(F.size("toks") / F.lit(25.0)).cast("int")
    chunks = (
        train.select("doc_id", "source", "toks",
                     F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"))
        .select(
            "doc_id",
            "source",
            F.size(F.slice("toks", F.col("k") * 25 + 1, 30)).alias("n_tok"),
            F.md5(F.array_join(F.slice("toks", F.col("k") * 25 + 1, 30), " ")).alias("chunk_hash"),
        )
    )
    wpack = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc_nulls_last(), F.col("chunk_hash").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        chunks.withColumn("cum", F.sum("n_tok").over(wpack))
        .groupBy("source", F.floor((F.col("cum") - F.col("n_tok")) / 512).alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.sum("n_tok").alias("sum_tokens"))
    )
    return {
        "raw": docs,
        "lang": lang_ok,
        "quality": quality_ok,
        "repetition": rep_ok,
        "gopher": gopher_ok,
        "dedup": canonical,
        "neardup": pruned,
        "contaminated": contaminated,
        "bloom_flagged": bloom_flagged,
        "chunks": chunks,
        "packed": packed,
        "final": final,
    }, final


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        str(Path(__file__).resolve().parent.parent), "tmp_io", "pipeline_out"
    )
    eng = Engine()
    eng.spark.sparkContext.setLogLevel("ERROR")
    stages, final = build_pipeline(eng.spark, sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    final.write.partitionBy("split", "lang").parquet(out)
    back = eng.spark.read.parquet(out)
    counts = {name: df.count() for name, df in stages.items()}
    counts["written"] = back.count()
    print(counts)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-12 profiling / curriculum / downsample operators.

Five capabilities a 100 TB training-data pipeline runs between ingest and
export, none previously declared:

- q_vec_dim_stats   — per-DIMENSION embedding health profile (dead dims,
                      scale outliers) — the column-wise dual of
                      q_vec_norm_stats's per-vector norms.
- q_llm_ttr         — lexical diversity (type-token ratio) per document,
                      the vocabulary-richness filter signal.
- q_llm_curriculum  — difficulty-staged curriculum report (per-stage doc
                      and token budgets over an integer difficulty score).
- q_dq_refint       — referential-integrity orphan audit (FK checks as
                      anti-join counts, with a simulated-drift arm so the
                      query is provably not vacuous).
- q_ts_m4           — M4 downsampling (min/max/first/last per series per
                      time bucket), the visualization-grade reduction that
                      ships 4 points per pixel instead of the raw series.

All outputs are exact integers (the §2.13 determinism discipline): e2/e3
fixed-point quantization, integer DIV, lpad-string argmin keys — identical
arithmetic on both engines, partitioning-invariant.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pkg2_spark.catalog import load_tables
from pkg2_spark.operators.text import tokens_col
from pkg2_spark.registry import query

_TOK_SQL = "list_filter(string_split(lower(text), ' '), x -> x <> '')"

# Embedding width is pinned by the testdata generator (64). BOTH engines
# iterate this fixed 0.._DIM-1 range (DuckDB: generate_series + list index;
# Spark: explode(sequence) + try_element_at) rather than the observed array
# length, so a generator width drift degrades both sides identically —
# out-of-range dims read NULL qv on each engine (counted in n, skipped by
# min/max/sum) instead of one engine silently profiling extra dimensions
# the other never sees (r12 advice).
_DIM = 64

# Curriculum stage cuts on avg-word-length milli (integer): the sf0.01
# corpus spans awl_e3 ~ [3700, 5300]; the cuts split it into three
# non-empty stages at every test scale.
_CURRICULUM_CUTS = (4600, 4900)


@query(
    "q_vec_dim_stats",
    oracle=f"""
WITH q AS (
  SELECT g.d AS dim,
         CAST(floor(CAST(embedding[g.d + 1] AS DOUBLE) * 1000) AS BIGINT) AS qv
  FROM embeddings, (SELECT unnest(generate_series(0, {_DIM - 1})) AS d) g
)
SELECT CAST(dim AS INTEGER) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(qv) AS BIGINT) AS min_e3,
       CAST(max(qv) AS BIGINT) AS max_e3,
       CAST(sum(qv) // count(*) AS BIGINT) AS mean_e3,
       CAST(sum(qv * qv) // count(*)
            - (sum(qv) // count(*)) * (sum(qv) // count(*)) AS BIGINT) AS var_e6
FROM q GROUP BY dim
""",
)
def q_vec_dim_stats(spark, sf_dir):
    """Per-DIMENSION embedding profile — the column-wise health check a
    vector pipeline runs before training or indexing: a dead dimension
    (var ~ 0) or a scale outlier (|mean| or max far off the others)
    means a broken encoder or a bad normalization step, and it is
    invisible to per-vector norm audits (q_vec_norm_stats, the row-wise
    dual of this query).

    Values quantize to e3 fixed-point BIGINTs FIRST, so every downstream
    sum is exact integer arithmetic — no float summation order anywhere.
    The e3 scale bounds sum(qv*qv) at ~4e6 per row: safe in int64 to
    ~2e12 exploded rows per dimension (128 TB of fp32x64 vectors).

    Scale shape: one explode of the fixed dim sequence (n x 64 rows,
    row-local) -> one 64-group hash-agg with map-side partial
    aggregation; output is |dims| rows regardless of corpus size. The
    fixed-sequence + try_element_at form (not posexplode over the
    observed length) mirrors the oracle's generate_series exactly so a
    width drift reads NULL on both engines identically (module comment
    at _DIM)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.select(
        F.explode(F.sequence(F.lit(0), F.lit(_DIM - 1))).alias("dim"),
        F.col("embedding"),
    ).select(
        "dim",
        F.floor(
            F.try_element_at(F.col("embedding"), F.col("dim") + 1)
            .cast("double") * 1000
        ).cast("long").alias("qv"),
    )
    return q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("qv").alias("min_e3"),
        F.max("qv").alias("max_e3"),
        F.expr("sum(qv) div count(*)").cast("long").alias("mean_e3"),
        F.expr(
            "sum(qv * qv) div count(*)"
            " - (sum(qv) div count(*)) * (sum(qv) div count(*))"
        ).cast("long").alias("var_e6"),
    )


@query(
    "q_llm_ttr",
    oracle=f"""
WITH t AS (
  SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
       CAST(count(DISTINCT tok) * 1000 // count(*) AS BIGINT) AS ttr_milli
FROM t GROUP BY doc_id
""",
)
def q_llm_ttr(spark, sf_dir):
    """Type-token ratio per document — the lexical-diversity signal of
    corpus filtering: near-1000 TTR on a long document means unique-token
    spam (e.g. hash dumps), near-0 means degenerate repetition; both get
    cut before pretraining. Complements q_llm_quality's length/stopword
    ratios and q_llm_entropy's distributional score — TTR is the
    vocabulary-richness axis neither captures.

    Scale shape: token explode -> one doc-keyed hash-agg
    (count + count(DISTINCT token), the two-phase distinct Spark plans
    with partial aggregation). Integer-milli output."""
    d = load_tables(spark, sf_dir)["documents"]
    t = d.select("doc_id", F.explode(tokens_col()).alias("tok"))
    return t.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("tok").cast("long").alias("n_types"),
        F.expr("count(DISTINCT tok) * 1000 div count(*)")
        .cast("long")
        .alias("ttr_milli"),
    )


@query(
    "q_llm_curriculum",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         len({_TOK_SQL}) AS n_tokens,
         CAST(list_sum(list_transform({_TOK_SQL}, x -> strlen(x))) * 1000
              // len({_TOK_SQL}) AS BIGINT) AS awl_e3
  FROM documents
  WHERE len({_TOK_SQL}) > 0
)
SELECT CASE WHEN awl_e3 < {_CURRICULUM_CUTS[0]} THEN 1
            WHEN awl_e3 < {_CURRICULUM_CUTS[1]} THEN 2
            ELSE 3 END AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(min(awl_e3) AS BIGINT) AS min_awl_e3,
       CAST(max(awl_e3) AS BIGINT) AS max_awl_e3
FROM s GROUP BY 1
""",
)
def q_llm_curriculum(spark, sf_dir):
    """Curriculum staging report — the schedule summary of
    easy-to-hard pretraining (Bengio et al. 2009 applied to data
    engineering): documents are scored by an integer difficulty proxy
    (average word length, e3 fixed-point — longer words correlate with
    harder text and the score is cheap and deterministic), split into
    three stages at fixed cuts, and each stage reports its doc and token
    budget — exactly what a curriculum loader needs to plan epochs.

    The difficulty score is ROW-LOCAL (aggregate over the token array
    inside codegen — no explode, no shuffle for scoring); the only
    shuffle is the 3-group hash-agg. At 100 TB the score arm is a pure
    map pass over documents."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = tokens_col()
    n_tokens = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    # (sum_len * 1000) div n_tokens — integer floor division, both engines
    s = (
        d.filter(n_tokens > 0)
        .select(
            n_tokens.cast("long").alias("n_tokens"),
            (sum_len * 1000).cast("long").alias("_sl1000"),
        )
        .select(
            "n_tokens",
            F.expr("_sl1000 div n_tokens").cast("long").alias("awl_e3"),
        )
    )
    stage = (
        F.when(F.col("awl_e3") < _CURRICULUM_CUTS[0], F.lit(1))
        .when(F.col("awl_e3") < _CURRICULUM_CUTS[1], F.lit(2))
        .otherwise(F.lit(3))
    )
    return (
        s.select(stage.alias("stage"), "n_tokens", "awl_e3")
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("awl_e3").alias("min_awl_e3"),
            F.max("awl_e3").alias("max_awl_e3"),
        )
    )


@query(
    "q_dq_refint",
    oracle="""
WITH checks AS (
  SELECT 'lineitem.l_orderkey -> orders' AS fk,
         (SELECT count(*) FROM lineitem) AS n_child,
         (SELECT count(*) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS n_orphans
  UNION ALL
  SELECT 'orders.o_custkey -> customer',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
  UNION ALL
  SELECT 'customer.c_nationkey -> nation',
         (SELECT count(*) FROM customer),
         (SELECT count(*) FROM customer c LEFT JOIN nation n
            ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
  UNION ALL
  SELECT 'lineitem.l_orderkey -> orders[F] (drift sim)',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l LEFT JOIN
            (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
)
SELECT fk, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       CAST(n_orphans * 10000 // n_child AS BIGINT) AS orphan_bp
FROM checks
""",
)
def q_dq_refint(spark, sf_dir):
    """Referential-integrity audit — FK orphan counts as LEFT-ANTI joins,
    the constraint class q_dq_constraints (nulls/ranges/uniqueness) does
    not cover: a child row whose parent key is missing. Three real FK
    edges of the schema (all clean on consistent TPC-H data — the audit
    proves it) plus a SIMULATED-DRIFT arm (parents restricted to
    o_orderstatus = 'F', as if a partition went missing) whose nonzero
    orphan count proves the check itself is not vacuous.

    Scale shape: each check is one anti-join on the FK key (broadcast
    for dimension parents, shuffle for fact-fact) + a count; the audit
    output is 4 rows regardless of corpus size. orphan_bp (basis points)
    is the alert threshold a DQ gate consumes."""
    t = load_tables(spark, sf_dir)
    li, o, c, n = t["lineitem"], t["orders"], t["customer"], t["nation"]

    def check(fk, child, key, parent, pkey):
        orphans = child.join(
            parent.select(pkey), child[key] == parent[pkey], "left_anti"
        )
        return (
            child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(
                        F.count(F.lit(1)).cast("long").alias("n_orphans")
                    )
                )
            )
            .select(
                F.lit(fk).alias("fk"),
                "n_child",
                "n_orphans",
                F.expr("n_orphans * 10000 div n_child")
                .cast("long")
                .alias("orphan_bp"),
            )
        )

    out = check(
        "lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey"
    )
    out = out.unionByName(
        check("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey")
    )
    out = out.unionByName(
        check(
            "customer.c_nationkey -> nation", c, "c_nationkey", n, "n_nationkey"
        )
    )
    out = out.unionByName(
        check(
            "lineitem.l_orderkey -> orders[F] (drift sim)",
            li,
            "l_orderkey",
            o.filter(F.col("o_orderstatus") == "F"),
            "o_orderkey",
        )
    )
    return out


@query(
    "q_ts_m4",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket_h,
         CAST(floor(value * 100) AS BIGINT) AS v_e2,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 16, '0') ||
         lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
  FROM events
)
SELECT event_type, bucket_h,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(v_e2) AS BIGINT) AS v_min_e2,
       CAST(max(v_e2) AS BIGINT) AS v_max_e2,
       CAST(arg_min(v_e2, k) AS BIGINT) AS v_first_e2,
       CAST(arg_max(v_e2, k) AS BIGINT) AS v_last_e2
FROM e GROUP BY event_type, bucket_h
""",
)
def q_ts_m4(spark, sf_dir):
    """M4 downsampling (Jugel et al., VLDB 2014) — the visualization-grade
    series reduction: per (series, time bucket) keep exactly the four
    value-bearing points a pixel can show (min, max, first, last). The
    canonical dashboard-backend operator: a 100 TB series renders from
    |series| x |pixels| rows instead of the raw events.

    first/last ride min_by/max_by over a zero-padded (epoch_us,
    event_id) STRING key — a total order both engines compare
    identically (the lexicographic-lpad discipline q_fn_hash's fixtures
    use), so ties at equal timestamps resolve deterministically.

    Scale shape: row-local bucket/key projection -> ONE
    (series, bucket)-keyed hash-agg with map-side partials; no window,
    no sort, output bounded by |series| x |buckets|."""
    e = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros(F.col("ts"))
    k = F.concat(
        F.lpad(us.cast("string"), 16, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    b = e.select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").cast("long").alias("bucket_h"),
        F.floor(F.col("value") * 100).cast("long").alias("v_e2"),
        k.alias("k"),
    )
    return b.groupBy("event_type", "bucket_h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v_e2").alias("v_min_e2"),
        F.max("v_e2").alias("v_max_e2"),
        F.min_by("v_e2", "k").cast("long").alias("v_first_e2"),
        F.max_by("v_e2", "k").cast("long").alias("v_last_e2"),
    )

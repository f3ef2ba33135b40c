"""Graph operators: deterministic integer-scaled PageRank.

Ranks are e6-scaled BIGINTs: per-edge contribution = floor(rank / degree),
new rank = teleport + floor(damping * sum(contribs)). Every float op has
exact integer operands in identical order, so results are bit-identical
across engines, partitionings and re-runs — the floor-not-round discipline
applied to an iterative algorithm (used by queries/graph.py::q_graph_pagerank,
whose DuckDB oracle unrolls the same CTEs).

Scale shape per iteration: one shuffle join of edges against the rank table
on src (degree joined alongside), one dst-keyed hash-agg, one left join back
onto the node set — the standard distributed PageRank dataflow. State per
round is one row per node. A fixed small iteration count keeps the plan
shallow; a convergence-driven run should truncate lineage per round
(session.truncate_lineage) exactly like queries/graph.py's closure loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SCALE = 1_000_000
_TELEPORT = 150_000  # floor(0.15 * _SCALE)
_DAMP = 0.85


def pagerank(
    edges: DataFrame, src: str = "src", dst: str = "dst", iters: int = 3
) -> DataFrame:
    """(node, rank) over the DIRECTED edge set; symmetrize before calling for
    undirected semantics. Nodes are every distinct source (rank mass from
    pure sinks is dropped, documented — fine for fixed-iteration ranking)."""
    from pkg2_spark.session import truncate_lineage

    # r14 (guide §5 "materialize reused intermediates" — the hits()
    # posture applied here too): the edge frame feeds every iteration's
    # contribution join AND the degree count, and `ranks` is consumed
    # TWICE per round (contribs join + the rank update's left side), so
    # an untruncated loop re-evaluates the upstream edge pipeline
    # (lineitem⋈orders→distinct in q_graph_pagerank) a number of times
    # growing with 2^iters. Materialize edges+degrees once and cut the
    # rank frame's lineage per round — integer ranks, so values are
    # bit-identical; measured 3.4 → 1.3 s warm at sf0.1.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).transform(
        truncate_lineage
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d")).transform(
        truncate_lineage
    )
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(_SCALE).cast("long").alias("rank")
    )
    for i in range(iters):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                "dst",
                F.floor(F.col("rank").cast("double") / F.col("d"))
                .cast("long")
                .alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("m"))
        )
        ranks = ranks.join(contribs, ranks["node"] == contribs["dst"], "left").select(
            "node",
            (
                F.lit(_TELEPORT)
                + F.floor(_DAMP * F.coalesce(F.col("m"), F.lit(0))).cast("long")
            ).alias("rank"),
        )
        if i < iters - 1:
            ranks = ranks.transform(truncate_lineage)
    return ranks


def hits(edges: DataFrame, src: str = "src", dst: str = "dst", iters: int = 3) -> DataFrame:
    """Deterministic integer-scaled HITS over a DIRECTED bipartite-ish edge
    set: hub score h(u) over sources, authority score a(v) over targets.

    Update (per iteration): a_raw(v) = sum_{u->v} h(u); a = (a_raw *
    1e6) div max(a_raw); h_raw(u) = sum_{u->v} a(v); h = (h_raw * 1e6)
    div max(h_raw). Max-normalizing each half-step with INTEGER division
    keeps every score in [0, 1e6] — no floats anywhere, so the result is
    bit-identical across engines/partitionings (the pagerank discipline),
    and the 1e6-scaled products stay far below int64 as long as
    max in/out degree < ~9e6 (documented bound; beyond that, raise the
    scale denominator first).

    Scale shape per half-step: one edge ⋈ score shuffle join keyed on the
    score's node column, one hash-agg to the opposite side, one 1-row max
    broadcast for the normalizer — identical to the pagerank dataflow
    plus the scalar join. Returns (node, hub_e6) ∪ rows keyed by target
    with (node, auth_e6) available via the `side` column."""
    from pkg2_spark.session import truncate_lineage

    if iters < 1:
        # iters = 0 would leave auths unbound at the final select — fail
        # with the contract, not an AttributeError (r11 advice).
        raise ValueError(f"hits: iters must be >= 1, got {iters}")
    # Lineage truncation per half-step: the score frame feeds BOTH the next
    # join and its own max-normalizer, so without a checkpoint cut the
    # logical plan doubles per half-step (12 nestings over 3 iterations —
    # measured 25 s of pure analysis/stage overhead at sf0.01; the closure
    # loop documents the same class).
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).transform(
        truncate_lineage
    )
    hubs = e.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(_SCALE).cast("long").alias("score")
    )
    auths = None
    for _ in range(iters):
        a_raw = (
            e.join(hubs, e["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum("score").alias("raw"))
            .transform(truncate_lineage)
        )
        mx = a_raw.agg(F.max("raw").alias("mx"))
        auths = a_raw.crossJoin(F.broadcast(mx)).select(
            F.col("dst").alias("node"),
            F.expr("(raw * CAST(1000000 AS BIGINT)) div mx").alias("score"),
        )
        h_raw = (
            e.join(auths, e["dst"] == auths["node"])
            .groupBy("src")
            .agg(F.sum("score").alias("raw"))
            .transform(truncate_lineage)
        )
        hmx = h_raw.agg(F.max("raw").alias("mx"))
        hubs = h_raw.crossJoin(F.broadcast(hmx)).select(
            F.col("src").alias("node"),
            F.expr("(raw * CAST(1000000 AS BIGINT)) div mx").alias("score"),
        )
    return auths.select("node", F.col("score").alias("auth_e6")).join(
        hubs.select(F.col("node").alias("hnode"), F.col("score").alias("hub_e6")),
        F.col("node") == F.col("hnode"),
        "full",
    ).select(
        F.coalesce("node", "hnode").alias("node"), "auth_e6", "hub_e6"
    )

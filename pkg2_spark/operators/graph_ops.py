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
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(_SCALE).cast("long").alias("rank")
    )
    for _ in range(iters):
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
    return ranks

"""Near-duplicate resolution: connected components over a candidate-pair
graph, keeping one canonical document per component.

Pair discovery (MinHash/LSH banding, cosine thresholds — queries/llm.py)
yields EDGES; deduplication needs the transitive grouping those edges imply
(A~B, B~C ⇒ {A,B,C} is one duplicate cluster even if A~C was never
scored). The canonical representative is the minimum id in the component.

Algorithm: min-label propagation to fixpoint — each round every node takes
the min label among itself and its neighbors. Converges in graph-diameter
rounds; near-dup components are small and shallow in practice, so the
round count stays low at any corpus size.

Scale posture: each round is one equi-join (labels × symmetrized edges) +
one groupBy min — both shuffle on node id, no pair explosion beyond the
given edge set. `persist` truncates lineage per round (same discipline as
the §2.11 closure); convergence is detected with a count of changed
labels, which AQE executes as a cheap partial-agg job.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def resolve_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node id
    reachable through the undirected pair graph."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym.b == labels.node)
                .groupBy(sym.a.alias("node"))
                .agg(F.min("component").alias("nmin"))
            )
            updated = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                    ).alias("component"),
                )
                .persist()
            )
            changed = (
                updated.alias("u")
                .join(labels.alias("l"), "node")
                .filter(F.col("u.component") != F.col("l.component"))
                .count()
            )
            labels.unpersist()
            labels = updated
            if changed == 0:
                break
        return labels.select("node", "component")
    finally:
        sym.unpersist()

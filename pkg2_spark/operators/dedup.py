"""Near-duplicate resolution: connected components over a candidate-pair
graph, keeping one canonical document per component.

Pair discovery (MinHash/LSH banding, cosine thresholds — queries/llm.py)
yields EDGES; deduplication needs the transitive grouping those edges imply
(A~B, B~C ⇒ {A,B,C} is one duplicate cluster even if A~C was never
scored). The canonical representative is the minimum id in the component.

Algorithm: min-label propagation to fixpoint — each round every node takes
the min label among itself and its neighbors. Converges in graph-diameter
rounds; near-dup components are small and shallow in practice, so the
round count stays low at any corpus size. (Pointer-jumping/path-compression
variants were measured here and LOST: the extra self-join per round doubles
lineage and job count, which dominates unless component diameters are
large — revisit only with checkpointing if a real corpus shows deep chains.)

Scale posture: each round is one equi-join (labels × symmetrized edges) +
one groupBy min — both shuffle on node id, no pair explosion beyond the
given edge set. `persist` truncates lineage per round (same discipline as
the §2.11 closure); convergence is detected by the per-round sum of labels,
which is strictly monotone decreasing until fixpoint — one
map-side-combined agg per round, no old-vs-new join.
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
        .localCheckpoint()
    )

    def step(lab: DataFrame) -> DataFrame:
        neighbor_min = (
            sym.join(lab, sym.b == lab.node)
            .groupBy(sym.a.alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        return lab.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
            ).alias("component"),
        )

    prev_sum = None
    try:
        for _ in range(max_iter):
            # one propagation step per action. Batching two steps per action
            # was measured (q_llm_dedup_resolve sf0.01): 27s vs 14s — the
            # deeper per-action DAG (4 serial shuffle stages under AQE
            # replanning) costs more than the saved round-trips, same
            # conclusion as the pointer-jumping experiment above.
            #
            # localCheckpoint, NOT persist: the step references `labels`
            # twice (join + groupBy input), so the LOGICAL plan doubles per
            # round even though persist caches execution — at round ~20 the
            # plan tree itself OOMs the driver (hit at sf0.1). Checkpointing
            # materializes AND truncates lineage, the standard discipline
            # for iterative DataFrame algorithms; on a fault-tolerant
            # cluster swap for checkpoint() with a checkpoint dir.
            updated = step(labels).localCheckpoint()
            # labels are non-increasing, so their sum strictly decreases
            # until fixpoint — a scalar convergence probe, no old/new join.
            cur_sum = updated.agg(F.sum("component")).collect()[0][0]
            labels = updated
            if prev_sum is not None and cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        return labels.select("node", "component")
    finally:
        sym.unpersist()

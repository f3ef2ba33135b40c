"""SURVEY.md §2.11 — iterative/graph: dependency transitive closure.

pkg2's dependency-resolution analog [Tier C]: from the APKINDEX-style edge
table (package → depends), compute bounded-depth reachability with minimal
depth — the "install closure" of every package.

Spark has no recursion; the driver runs a BFS fixpoint loop of DataFrame
self-joins (SURVEY.md §4.3). Each round joins only the NEW frontier against
the edge table (semi-naïve evaluation), unions into the closure, and stops at
fixpoint or the depth cap. At scale each round is one shuffle join keyed on
the node; `persist` truncates lineage so round N doesn't replay rounds 1..N-1.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pkg2_spark.queries.relational import _APKINDEX_PATH
from pkg2_spark.registry import query

_MAX_DEPTH = 5


def _edges(spark: SparkSession) -> DataFrame:
    """(name, dep) edges from the APKINDEX sample; so:* virtuals excluded."""
    raw = spark.read.text(_APKINDEX_PATH, wholetext=True)
    stanza = (
        raw.select(F.explode(F.split(F.col("value"), "\n\n")).alias("stanza"))
        .filter(F.trim(F.col("stanza")) != "")
    )
    return (
        stanza.select(
            F.regexp_extract("stanza", r"P:([^\n]+)", 1).alias("name"),
            F.explode(
                F.filter(
                    F.split(F.regexp_extract("stanza", r"D:([^\n]+)", 1), " "),
                    lambda x: (x != "") & ~x.startswith("so:"),
                )
            ).alias("dep"),
        )
    )


_EDGES_SQL = f"""
edges AS (
  SELECT regexp_extract(stanza, 'P:([^' || chr(10) || ']+)', 1) AS name,
         unnest(list_filter(
            string_split(regexp_extract(stanza, 'D:([^' || chr(10) || ']+)', 1), ' '),
            x -> x <> '' AND NOT starts_with(x, 'so:'))) AS dep
  FROM (
    SELECT unnest(string_split(content, chr(10) || chr(10))) AS stanza
    FROM read_text('{_APKINDEX_PATH}')
  )
  WHERE trim(stanza) <> ''
)
"""


@query(
    "q_graph_closure",
    oracle=f"""
WITH RECURSIVE {_EDGES_SQL.strip().rstrip()},
reach(root, node, depth) AS (
  SELECT name, dep, 1 FROM edges
  UNION
  SELECT r.root, e.dep, r.depth + 1
  FROM reach r JOIN edges e ON r.node = e.name
  WHERE r.depth < {_MAX_DEPTH}
)
SELECT root, node, CAST(min(depth) AS INTEGER) AS depth
FROM reach GROUP BY root, node
""",
)
def q_graph_closure(spark, sf_dir):
    edges = _edges(spark).distinct().persist()
    closure = edges.select(
        F.col("name").alias("root"), F.col("dep").alias("node"), F.lit(1).alias("depth")
    ).distinct().localCheckpoint()
    frontier = closure
    for depth in range(2, _MAX_DEPTH + 1):
        # Semi-naïve step: expand only last round's frontier, keep first-seen
        # (= minimal) depth by anti-joining the accumulated closure.
        expanded = (
            frontier.join(edges, frontier["node"] == edges["name"])
            .select("root", F.col("dep").alias("new_node"))
            .distinct()
            .select("root", F.col("new_node").alias("node"), F.lit(depth).alias("depth"))
        )
        # localCheckpoint, not persist: `closure` appears twice per round
        # (anti-join + union) — under persist the LOGICAL plan doubles per
        # depth; checkpointing truncates lineage (operators/dedup.py
        # documents the driver OOM this prevents).
        new = expanded.join(closure, ["root", "node"], "left_anti").localCheckpoint()
        if new.isEmpty():
            break
        closure = closure.union(new).localCheckpoint()
        frontier = new
    return closure

"""Graph query invariants (pkg2_spark/queries/graph.py)."""

from __future__ import annotations

from pkg2_spark.registry import all_queries


def _q(spark, sf_dir, name):
    return all_queries()[name](spark, sf_dir)


def test_pagerank_covers_all_suppliers_with_damped_floor(spark, sf_dir):
    out = _q(spark, sf_dir, "q_graph_pagerank").collect()
    n_supp = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey")
        .distinct()
        .count()
    )
    assert len(out) == n_supp
    # the 0.15 teleport term is an e6-scaled floor of 150000 for every node
    assert all(r["rank_e6"] >= 150000 for r in out)
    # connected bipartite halves: some supplier must exceed the bare floor
    assert any(r["rank_e6"] > 150000 for r in out)


def test_pagerank_deterministic_across_partitionings(spark, sf_dir):
    # integer-scaled contributions: the result must be bit-identical however
    # the shuffles are partitioned (same discipline as q_kmeans_step).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            rows = _q(spark, sf_dir, "q_graph_pagerank").collect()
            results.append(sorted((r["s_suppkey"], r["rank_e6"]) for r in rows))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1]

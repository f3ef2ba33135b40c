"""Invariant tests for the round-12 profiling/curriculum/downsample
operators (pkg2_spark/queries/profiling.py) — semantics the DuckDB hash
match alone does not express."""

from __future__ import annotations

import pyspark.sql.functions as F

from pkg2_spark.registry import all_queries


def _q(spark, sf_dir, name):
    return all_queries()[name](spark, sf_dir)


def test_m4_envelope_and_mass_conservation(spark, sf_dir):
    rows = _q(spark, sf_dir, "q_ts_m4").collect()
    assert rows
    for r in rows:
        # the four M4 points obey the envelope: min <= first,last <= max
        assert r["v_min_e2"] <= r["v_first_e2"] <= r["v_max_e2"], r
        assert r["v_min_e2"] <= r["v_last_e2"] <= r["v_max_e2"], r
        assert r["n"] >= 1
        # a 1-event bucket degenerates to a single point
        if r["n"] == 1:
            assert (
                r["v_min_e2"] == r["v_max_e2"] == r["v_first_e2"] == r["v_last_e2"]
            )
    # mass conservation: bucket row-counts sum to the raw event count
    from pkg2_spark.catalog import load_tables

    assert sum(r["n"] for r in rows) == load_tables(spark, sf_dir)["events"].count()


def test_m4_first_last_are_time_ordered_not_value_ordered(spark, sf_dir):
    # first/last must be the chronologically first/last value in the
    # bucket — recompute one multi-event bucket's expectation by hand.
    from pkg2_spark.catalog import load_tables

    rows = _q(spark, sf_dir, "q_ts_m4").collect()
    multi = next(r for r in rows if r["n"] >= 3)
    e = load_tables(spark, sf_dir)["events"]
    raw = (
        e.filter(
            (F.col("event_type") == multi["event_type"])
            & (F.expr("unix_micros(ts) div 3600000000") == multi["bucket_h"])
        )
        .select(
            F.unix_micros("ts").alias("us"),
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("v_e2"),
        )
        .collect()
    )
    raw.sort(key=lambda r: (r["us"], r["event_id"]))
    assert raw[0]["v_e2"] == multi["v_first_e2"]
    assert raw[-1]["v_e2"] == multi["v_last_e2"]


def test_ttr_bounds_and_types_never_exceed_tokens(spark, sf_dir):
    rows = _q(spark, sf_dir, "q_llm_ttr").collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_types"] <= r["n_tokens"]
        assert 0 <= r["ttr_milli"] <= 1000
        assert r["ttr_milli"] == r["n_types"] * 1000 // r["n_tokens"]


def test_curriculum_stages_partition_the_corpus(spark, sf_dir):
    from pkg2_spark.catalog import load_tables
    from pkg2_spark.operators.text import tokens_col

    rows = {r["stage"]: r for r in _q(spark, sf_dir, "q_llm_curriculum").collect()}
    # all three stages non-empty at every test scale (the fixed cuts are
    # chosen against the corpus's awl_e3 range)
    assert sorted(rows) == [1, 2, 3]
    d = load_tables(spark, sf_dir)["documents"]
    n_docs = d.filter(F.size(tokens_col()) > 0).count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    # stages are ordered by difficulty: ranges must not overlap
    assert rows[1]["max_awl_e3"] < rows[2]["min_awl_e3"] or rows[1][
        "max_awl_e3"
    ] < 4600
    assert rows[2]["max_awl_e3"] < 4900 <= rows[3]["min_awl_e3"]


def test_refint_clean_edges_and_drift_arm(spark, sf_dir):
    rows = {r["fk"]: r for r in _q(spark, sf_dir, "q_dq_refint").collect()}
    assert len(rows) == 4
    # the three real FK edges are clean on consistent TPC-H data
    for fk in (
        "lineitem.l_orderkey -> orders",
        "orders.o_custkey -> customer",
        "customer.c_nationkey -> nation",
    ):
        assert rows[fk]["n_orphans"] == 0 and rows[fk]["orphan_bp"] == 0, fk
    # the drift-sim arm proves the check can fire
    drift = rows["lineitem.l_orderkey -> orders[F] (drift sim)"]
    assert 0 < drift["n_orphans"] < drift["n_child"]
    assert drift["orphan_bp"] == drift["n_orphans"] * 10000 // drift["n_child"]


def test_dim_stats_covers_every_dimension_exactly(spark, sf_dir):
    from pkg2_spark.catalog import load_tables

    rows = {r["dim"]: r for r in _q(spark, sf_dir, "q_vec_dim_stats").collect()}
    assert sorted(rows) == list(range(64))
    n_vecs = load_tables(spark, sf_dir)["embeddings"].count()
    for r in rows.values():
        assert r["n"] == n_vecs
        assert r["min_e3"] <= r["mean_e3"] <= r["max_e3"]
        # integer variance can go mildly negative only via the div
        # truncation of an exact-zero spread; real data keeps it positive
        assert r["var_e6"] > 0

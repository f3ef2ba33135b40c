"""Deterministic Bloom filter as a first-class operator.

Positions are md5-derived (the Count-Min bucket scheme from
queries/sketches.py), so the filter is reproducible across engines and
runs — no JVM hash seeding, no library bit-array internals. The filter is
a DISTINCT position set (<= m rows), built from the SMALL side and
broadcast; membership gating of the large side is one map-side probe pass
plus a per-row count — the operator-level version of Spark's runtime
bloom-join injection, with the error accounting exposed to the caller.

Guarantees (verified as data by q_sketch_bloom's oracle): zero false
negatives, always; false positives bounded by the classic (1-e^{-kn/m})^k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pkg2_spark.operators.hashing import v32_spark as _v32_spark

DEFAULT_M = 8192
DEFAULT_K = 4


def _pos_expr(col: str, j: int, m: int) -> str:
    return f"(({_v32_spark(f'md5({col} || chr(58) || {j!r})')}) % {m})"


def bloom_build(elements: DataFrame, col: str, m: int = DEFAULT_M,
                k: int = DEFAULT_K) -> DataFrame:
    """Distinct bit positions (column ``pos``) set by ``elements[col]``.

    One explode over the k position expressions (r14, guide §2.4): the
    former k-way union evaluated the ``elements`` subtree k times — for
    the decontamination queries that subtree is the whole corpus scan +
    hash-split + md5 pipeline. explode(array(...)) is the same multiset
    of positions from ONE evaluation (the Generate node is a barrier no
    downstream rule re-inlines)."""
    return (
        elements.select(
            F.explode(
                F.array(*[F.expr(_pos_expr(col, j, m)) for j in range(k)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(df: DataFrame, bits: DataFrame, col: str, m: int = DEFAULT_M,
                k: int = DEFAULT_K) -> DataFrame:
    """Rows of ``df`` whose ``col`` value the filter reports as present
    (all k positions set). ``bits`` is broadcast: the probe side never
    shuffles beyond one distinct-value pass.

    The verdict is computed once per DISTINCT value of ``col`` and
    semi-joined back, so duplicate probe rows (identical across all
    columns, or merely sharing a value) each pass independently — a
    groupBy over the full probe rows would count a value's k set
    positions once per duplicate and silently drop true members,
    breaking the zero-false-negative guarantee."""
    values = df.select(col).distinct()
    # Same single-evaluation explode as bloom_build: the k-way union
    # re-ran the distinct-values subtree (a corpus scan pipeline for the
    # decontamination consumers) once per hash function.
    probe = values.select(
        col,
        F.explode(
            F.array(*[F.expr(_pos_expr(col, j, m)) for j in range(k)])
        ).alias("pos"),
    )
    present = (
        probe.join(F.broadcast(bits), "pos", "leftsemi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("_nset"))
        .filter(F.col("_nset") == k)
        .select(col)
    )
    return df.join(present, col, "leftsemi")

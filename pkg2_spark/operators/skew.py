"""Skew mitigation: salted two-stage aggregation.

A groupBy on a low-cardinality or Zipf-skewed key (a handful of return
flags over a 100 TB fact table; one viral document id) sends each hot key's
entire row stream to ONE reducer — the straggler that dominates job time.
AQE's skew-join splitting does not apply to aggregations, and map-side
partial aggregation already collapses per-partition duplicates, so the
residual problem is the final shuffle fan-in of hot keys when the partial
rows themselves are many (high partition count × hot key).

The classic fix is salting: spray each key across ``salt_mod`` sub-keys,
aggregate per (key, salt), then combine the sub-aggregates per key. Two
short shuffles (second one carries ≤ salt_mod rows/key) replace one skewed
shuffle. Combinators exist for all algebraic aggregates: count→sum,
sum→sum, min→min, max→max.

Determinism: counts and integer sums are associative/commutative exactly,
so the salted result is bit-equal to the direct groupBy — which is what
lets q_agg_salted hash-match a plain GROUP BY oracle. For float sums,
salting (like any shuffle-order change) perturbs the last ulp; round per
§2.13.1 as always.

The salt is ``pmod(hash(salt_from), salt_mod)`` over caller-chosen columns
(a unique id is ideal): deterministic per row, no RNG, spreads uniformly.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# (partial aggregate over the salted group, combiner over the partials)
_ALGEBRAIC = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: Sequence[str],
    salt_mod: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregate.

    ``aggs`` maps output-column -> (agg_name, input_column); agg_name in
    {count, sum, min, max} (count ignores its input column).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_from]), F.lit(salt_mod))
    partials, finals = [], []
    for out, (name, col) in aggs.items():
        if name not in _ALGEBRAIC:
            raise ValueError(f"not an algebraic aggregate: {name}")
        partial, combine = _ALGEBRAIC[name]
        partials.append(partial(F.col(col)).alias(f"__p_{out}"))
        finals.append(combine(F.col(f"__p_{out}")).alias(out))
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_from: Sequence[str],
    salt_mod: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: spray the skewed LEFT side across salt_mod
    sub-keys, REPLICATE the right side once per salt value, join on
    (key, salt). A hot key's rows land on salt_mod reducers instead of one.

    Semantics-preserving for INNER and LEFT joins only: each left row meets
    every matching right row exactly once (under its one salt value), and
    an unmatched left row null-extends once. Right/full outer would emit
    each unmatched right row salt_mod times — rejected. Cost: right side
    × salt_mod — use
    when the right side is the smaller input but too big to broadcast
    (broadcast already avoids the shuffle entirely). AQE's skew-join
    handles most cases at runtime; this is the explicit variant for
    deterministic plans and for engines/stages where AQE can't split
    (e.g. a skewed key feeding a window right after the join).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, got {how!r}"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_from]), F.lit(salt_mod))
    lt = left.withColumn("__salt", salt)
    rt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_mod - 1)))
    )
    out = lt.join(rt, [on, "__salt"], how)
    return out.drop("__salt")

"""Vector similarity operators over ArrayType(FloatType) embedding columns.

All pure built-in higher-order functions (zip_with/aggregate/transform) —
JVM-side, codegen-friendly, no Python in the hot path (SURVEY.md §2.9).
Floats are cast to double BEFORE arithmetic (float32 math diverges across
engines); similarity outputs are rounded to 4dp per §2.13.1.

Scale posture:
- brute-force knn = cross join; bounded by the probe count (a broadcast of
  probes against a full scan of vectors — linear in corpus size, the right
  baseline shape).
- IVF = coarse quantization: assign every vector to its nearest centroid
  (|centroids| is small → broadcast), then search only the probe's cell —
  the candidate set shrinks by the centroid fan-out, and the expensive
  ranking join is an equi-join on centroid_id instead of a cross join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def as_double(arr) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(F.transform(as_double(a), lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b) -> Column:
    """Cosine similarity, computed in double precision, same element order as
    DuckDB's list_cosine_similarity (sequential fold) so results hash-match."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine4(a, b) -> Column:
    return F.round(cosine(a, b), 4)


def knn_bruteforce(
    vectors: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
    probe_vec: str = "probe_embedding",
) -> DataFrame:
    """Exact top-k by cosine for each probe. Ranking key is the ROUNDED
    cosine plus the candidate id — cross-engine deterministic even when raw
    doubles differ in the last ulp."""
    joined = probes.crossJoin(vectors).filter(F.col(probe_id) != F.col(id_col))
    scored = joined.select(
        probe_id,
        id_col,
        cosine4(F.col(probe_vec), F.col(vec_col)).alias("cos"),
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col("cos").desc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

"""Deterministic, key-stable sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible run-to-run, (b) stable under repartitioning and engine
changes, and (c) computable without a shuffle or any RNG state. RNG-based
sampling (``df.sample``/``TABLESAMPLE``) gives none of these — the draw
depends on partitioning and on the engine's generator, so it can never
hash-match an oracle and a re-run reshuffles the split.

The standard scale answer is content-hash bucketing: bucket = a fixed-width
prefix of ``md5(key)``; a sample is "bucket < threshold", a split is a CASE
over thresholds. Properties:

- embarrassingly parallel: a per-row projection, no shuffle, no state;
- key-stable: a document keeps its bucket forever (new data doesn't move
  old rows between train and test — the property that prevents test-set
  leakage across dataset versions);
- engine-portable: md5 is bit-identical everywhere (SURVEY.md §2.8 hash
  family), and lowercase-hex string comparison is plain ASCII ordering, so
  the same rows are selected by Spark and by the DuckDB oracle.

Buckets use the first 4 hex chars → 65536 buckets; thresholds are exact at
1/65536 granularity. ``frac_to_threshold`` converts a fraction to the hex
threshold so Spark and oracle SQL share one constant.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

BUCKETS = 65536  # 16 bits = first 4 hex chars of md5


def frac_to_threshold(frac: float) -> str:
    """Fraction → 4-char lowercase-hex bucket threshold (floor)."""
    n = int(frac * BUCKETS)
    if not 0 <= n <= BUCKETS:
        raise ValueError(f"fraction out of range: {frac}")
    return format(n, "04x")


def hash_bucket(key: Column) -> Column:
    """First 4 hex chars of md5(key-as-string) — the row's stable bucket."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def hash_sample(df: DataFrame, key: str, frac: float) -> DataFrame:
    """Deterministic ~frac sample: keep rows whose bucket < threshold."""
    return df.filter(hash_bucket(F.col(key)) < F.lit(frac_to_threshold(frac)))


def hash_split(df: DataFrame, key: str, weights: dict[str, float],
               split_col: str = "split") -> DataFrame:
    """Assign each row a split label by cumulative bucket thresholds.

    ``weights`` maps label -> fraction (must sum to ~1.0); iteration order
    defines the bucket ranges, so pass an ordered dict (e.g. train/val/test).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    bucket = hash_bucket(F.col(key))
    labels = list(weights)
    cum = 0.0
    expr = None
    for label in labels[:-1]:
        cum += weights[label]
        cond = bucket < F.lit(frac_to_threshold(cum))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    expr = (F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1])))
    return df.withColumn(split_col, expr)


def stratified_sample(df: DataFrame, strata: str, key: str, k: int) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows within each stratum by
    md5(key) (a stable pseudo-random order, no RNG) and keep the first k.
    One window shuffle on the stratum key; the balanced-quota primitive for
    building evaluation sets from skewed corpora (every language/source gets
    k docs regardless of its share of the corpus)."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata).orderBy(
        F.md5(F.col(key).cast("string")).asc_nulls_last(), F.col(key).asc_nulls_last()
    )
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")

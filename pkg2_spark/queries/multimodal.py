"""Multimodal-column queries (BASELINE.json:6): binary payloads, typed
metadata, decode/feature-extract via mapInPandas, frame sampling.

The decode runs through REAL mapInPandas plumbing (Arrow batches → Python
worker → features); the oracle reconstructs the same deterministic features
from md5 hex nibbles in pure SQL, so even the Python path is value-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pkg2_spark.catalog import load_tables
from pkg2_spark.operators.multimodal import decode_features, with_binary_payload
from pkg2_spark.registry import query

# hex pair -> byte value, in DuckDB SQL
_NIB = "(instr('0123456789abcdef', substring(md5(text), {p}, 1)) - 1)"


def _byte_sql(i: int) -> str:
    hi = _NIB.format(p=2 * i + 1)
    lo = _NIB.format(p=2 * i + 2)
    return f"({hi} * 16 + {lo})"


@query(
    "q_mm_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(unhex(md5(text))) AS INTEGER) AS n_bytes,
       'fake/rgb16' AS fmt,
       CAST((doc_id % 16) * 64 + 64 AS INTEGER) AS width,
       CAST((doc_id % 9) * 64 + 64 AS INTEGER) AS height
FROM documents
""",
)
def q_mm_meta(spark, sf_dir):
    d = load_tables(spark, sf_dir)["documents"]
    t = with_binary_payload(d)
    return t.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.col("media_meta.fmt").alias("fmt"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


@query(
    "q_mm_decode",
    oracle=f"""
SELECT doc_id,
       CAST(16 AS INTEGER) AS n_bytes,
       CAST({_byte_sql(0)} AS INTEGER) AS b0,
       CAST({_byte_sql(1)} AS INTEGER) AS b1,
       CAST({_byte_sql(0)} + {_byte_sql(1)} AS DOUBLE) / 2 AS luma
FROM documents
""",
)
def q_mm_decode(spark, sf_dir):
    # Real Arrow/mapInPandas decode path (stubbed codec, deterministic
    # features) — the oracle recomputes the bytes from md5 hex in SQL.
    d = load_tables(spark, sf_dir)["documents"]
    return decode_features(with_binary_payload(d))


@query(
    "q_mm_frames",
    oracle="""
WITH t AS (
  SELECT doc_id, CAST(doc_id % 5 + 1 AS INTEGER) AS n_frames FROM documents WHERE doc_id < 100
)
SELECT doc_id, CAST(u AS INTEGER) AS frame_id,
       CAST(u AS BIGINT) * 40000 AS frame_ts_us
FROM t, unnest(generate_series(0, n_frames - 1)) AS g(u)
""",
)
def q_mm_frames(spark, sf_dir):
    # Frame-sampling plumbing for video-shaped payloads: one row per sampled
    # frame with its timestamp (25 fps → 40 ms). Decode itself is stubbed.
    d = load_tables(spark, sf_dir)["documents"]
    t = d.filter(F.col("doc_id") < 100).select(
        "doc_id", ((F.col("doc_id") % 5) + 1).cast("int").alias("n_frames")
    )
    return t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_id"),
    ).select(
        "doc_id",
        F.col("frame_id").cast("int").alias("frame_id"),
        (F.col("frame_id").cast("long") * 40000).alias("frame_ts_us"),
    )


@query(
    "q_mm_features",
    oracle="""
SELECT doc_id, CAST(16 AS INTEGER) AS n_bytes,
       to_json(list_transform(generate_series(0, 15),
         b -> len(list_filter(generate_series(0, 15),
           i -> substring(md5(text), CAST(2 * i + 1 AS INTEGER), 1)
                = substring('0123456789abcdef', CAST(b + 1 AS INTEGER), 1))))) AS hist
FROM documents
WHERE doc_id < 200
""",
)
def q_mm_features(spark, sf_dir):
    # Vector-valued feature extraction through real mapInPandas plumbing: a
    # 16-bin byte histogram per payload (the embedding/MFCC shape with a stub
    # extractor), JSON-serialized at the boundary. The oracle rebuilds the
    # same histogram from md5 hex nibbles in pure SQL, so the Arrow
    # round-trip of an array-shaped feature is value-checked end to end.
    from pkg2_spark.operators.multimodal import histogram_features

    d = load_tables(spark, sf_dir)["documents"]
    return histogram_features(with_binary_payload(d.filter(F.col("doc_id") < 200)))


@query(
    "q_mm_resize",
    oracle="""
SELECT doc_id,
       CAST(((doc_id % 16) * 64 + 64) // 2 AS INTEGER) AS out_w,
       CAST(((doc_id % 9) * 64 + 64) // 2 AS INTEGER) AS out_h,
       substring(md5(text), 1, 8) AS out_hex
FROM documents
""",
)
def q_mm_resize(spark, sf_dir):
    # Resize stub through real mapInPandas plumbing: meta dims halved,
    # payload truncated to a quarter (16-byte md5 payload -> 4 bytes -> 8 hex
    # chars) — the oracle reconstructs both in pure SQL, so the Arrow
    # round-trip is value-checked even though the codec is fake.
    from pkg2_spark.operators.multimodal import resize_features

    d = load_tables(spark, sf_dir)["documents"]
    return resize_features(with_binary_payload(d))

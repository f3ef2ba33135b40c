"""Multimodal column plumbing (BASELINE.json:6): binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched Python.

Image/audio/video codecs are NOT in this container, so the actual decode is
stubbed (decode_real raises NotImplementedError; decode_fake is a
deterministic byte-level extractor). Everything Spark-side is real and
tested: binary column synthesis, metadata struct schema, mapInPandas batch
shape, and partition-parallel execution.

Scale posture: payload bytes stay columnar (Arrow binary) end-to-end; the
decode stage is mapInPandas over row batches, so a 1000-executor cluster
decodes embarrassingly parallel with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DECODE_SCHEMA = "doc_id long, n_bytes int, b0 int, b1 int, luma double"


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary column (md5-derived, deterministic) plus a
    typed metadata struct — the storage shape for opaque media payloads."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.struct(
            F.lit("fake/rgb16").alias("fmt"),
            ((F.col("doc_id") % 16) * 64 + 64).cast("int").alias("width"),
            ((F.col("doc_id") % 9) * 64 + 64).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def decode_real(payload: bytes) -> dict:
    """Real codec path — unavailable in this container by design."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "wire a real decoder here (PIL/ffmpeg) when available"
    )


def decode_fake(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic byte-level 'decode': header bytes + mean luma stand-in."""
    b0, b1 = payload[0], payload[1]
    return len(payload), b0, b1, (b0 + b1) / 2.0


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [decode_fake(p) for p in pdf["payload"]]
        out = pd.DataFrame(feats, columns=["n_bytes", "b0", "b1", "luma"])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def decode_features(with_payload: DataFrame) -> DataFrame:
    return with_payload.select("doc_id", "payload").mapInPandas(
        decode_batch, schema=DECODE_SCHEMA
    )


HIST_SCHEMA = "doc_id long, n_bytes int, hist string"


def hist_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for feature extraction proper: a 16-bin high-nibble
    byte histogram per payload — the vector-valued feature shape (image
    embeddings, audio MFCCs) with a stub extractor. Emitted as compact JSON
    (same text form as to_json) so the result is canonicalizer-hashable."""
    import json

    for pdf in batches:
        n_bytes, hists = [], []
        for p in pdf["payload"]:
            h = [0] * 16
            for byte in p:
                h[byte >> 4] += 1
            n_bytes.append(len(p))
            hists.append(json.dumps(h, separators=(",", ":")))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].values, "n_bytes": n_bytes, "hist": hists}
        )


def histogram_features(with_payload: DataFrame) -> DataFrame:
    return with_payload.select("doc_id", "payload").mapInPandas(
        hist_batch, schema=HIST_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, out_hex string"


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for the (stubbed) resize: halve the declared
    dimensions and keep the first quarter of the payload bytes — a
    deterministic stand-in with the real operator's batch shape (payload +
    meta in, payload + meta out)."""
    for pdf in batches:
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "out_w": (pdf["width"] // 2).astype("int32"),
                "out_h": (pdf["height"] // 2).astype("int32"),
                "out_hex": [p[: len(p) // 4].hex() for p in pdf["payload"]],
            }
        )
        yield out


def resize_features(with_payload: DataFrame) -> DataFrame:
    flat = with_payload.select(
        "doc_id", "payload",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    return flat.mapInPandas(resize_batch, schema=RESIZE_SCHEMA)

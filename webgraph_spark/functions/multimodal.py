"""Multimodal column plumbing: binary payloads + typed metadata.

Training-data pipeline operators (no reference counterpart). Media are
opaque ``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` kernels.

This container has no image/audio libraries, so the *codec* step is stubbed:
``decode_media`` raises ``NotImplementedError`` unless ``fake=True``, in
which case a deterministic fake decoder (parameters derived from the payload
bytes) exercises the full Spark plumbing — schema, batching, partitioning —
which IS real and tested. ``byte_histogram_features`` is a real vectorized
feature extractor (no external deps) usable at scale as-is.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int"

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes long, "
    "mean_byte double, frames int"
)

FEATURE_SCHEMA = "media_id long, features array<double>"


def synth_media(
    spark: SparkSession, n: int = 64, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic fake media table: payload = repeatable pseudo-random
    bytes derived from (seed, id); kind cycles image/audio/video."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    base = spark.range(n, numPartitions=num_partitions).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias(
            "kind"
        ),
        F.unhex(
            F.concat(
                *[
                    F.sha2(F.concat_ws("-", F.lit(seed), F.col("id"), F.lit(i)), 256)
                    for i in range(4)
                ]
            )
        ).alias("payload"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit("w")), 512) + 16).cast("int").alias(
            "width"
        ),
        (F.pmod(F.xxhash64(F.col("id"), F.lit("h")), 512) + 16).cast("int").alias(
            "height"
        ),
    )
    return base


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stage. Real codecs are NOT available in this container —
    ``fake=False`` raises NotImplementedError from the kernel; ``fake=True``
    derives deterministic 'decoded' properties from the payload so the
    Arrow plumbing (batch shapes, schema, null handling) is exercised
    end-to-end."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) not available in this container; "
                    "plug a real decoder here or pass fake=True"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int64")
            mean_byte = payloads.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if b else 0.0
            )
            frames = (pdf["media_id"] % 7 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": n_bytes,
                    "mean_byte": mean_byte,
                    "frames": frames.where(pdf["kind"] == "video", 1),
                }
            )

    return df.mapInPandas(kernel, schema=DECODED_SCHEMA)


def byte_histogram_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """REAL vectorized feature extraction: normalized byte histogram of the
    payload — a dependency-free stand-in for an embedding step with the same
    Spark shape (binary in, fixed-width array<double> out)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(b or b"", dtype=np.uint8)
                h = np.bincount(arr >> (8 - bins.bit_length() + 1), minlength=bins)[
                    :bins
                ]
                tot = h.sum()
                feats.append((h / tot).tolist() if tot else [0.0] * bins)
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """Deterministic 'frame sampling': slice the payload every N bytes —
    the mapInPandas shape of a real frame sampler (binary -> array<binary>)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            samples = [
                [bytes(b[i : i + 4]) for i in range(0, len(b), every_n_bytes)]
                if b
                else []
                for b in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "samples": samples})

    return df.mapInPandas(kernel, schema="media_id long, samples array<binary>")

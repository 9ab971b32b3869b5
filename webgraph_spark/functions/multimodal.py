"""Multimodal column plumbing: binary payloads + typed metadata.

Training-data pipeline operators (no reference counterpart). Media are
opaque ``binary`` columns with typed metadata; encode / decode / resize /
feature-extract / frame-sample run as Arrow-batched ``mapInPandas``
kernels over real container formats — PNG for images, RIFF/WAVE PCM for
audio, YUV4MPEG2 for video — implemented dependency-free in
:mod:`webgraph_spark.functions.codecs` (stdlib ``zlib``/``struct`` +
numpy; this container has no PIL/ffmpeg). ``decode_media`` genuinely
parses the container: zlib inflate + scanline filter reconstruction for
PNG, chunked RIFF parse for WAV, frame-marker walk for Y4M.

``byte_histogram_features`` is a real vectorized feature extractor usable
at scale as-is.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webgraph_spark.plans.partitioning import widen_small_input
from webgraph_spark.functions.codecs import (
    decode_png,
    decode_wav,
    decode_y4m,
    encode_png,
    encode_wav,
    encode_y4m,
)

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


def encode_media(
    df: DataFrame, width: int = 16, height: int = 8
) -> DataFrame:
    """Encode the raw payload bytes into a REAL container per kind:

    - ``image``: the first ``width*height`` payload bytes as a gray PNG
      (per-row filter cycle, so a round-trip exercises every PNG filter
      reconstruction path);
    - ``audio``: payload bytes as mono 8-bit PCM in a RIFF/WAVE file;
    - ``video``: ``media_id % 7 + 1`` frames of ``(height, width)`` in a
      YUV4MPEG2 stream, frame *f* being the payload rolled by *f* bytes
      (distinct frames, same byte population).

    Output replaces ``payload`` with the container bytes; ``width``/
    ``height`` become the actual encoded dimensions.
    """
    npx = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            out_w, out_h = [], []
            for mid, kind, b in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                arr = np.frombuffer(b or b"", dtype=np.uint8)[:npx]
                if len(arr) < npx:
                    arr = np.pad(arr, (0, npx - len(arr)))
                if kind == "image":
                    out_payload.append(
                        encode_png(arr.reshape(height, width))
                    )
                    out_w.append(width)
                    out_h.append(height)
                elif kind == "audio":
                    out_payload.append(encode_wav(arr))
                    out_w.append(len(arr))
                    out_h.append(1)
                else:
                    n_frames = int(mid) % 7 + 1
                    frames = np.stack(
                        [
                            np.roll(arr, f).reshape(height, width)
                            for f in range(n_frames)
                        ]
                    )
                    out_payload.append(encode_y4m(frames))
                    out_w.append(width)
                    out_h.append(height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "width": pd.Series(out_w, dtype="int32"),
                    "height": pd.Series(out_h, dtype="int32"),
                }
            )

    return widen_small_input(df).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode stage — REAL container parsing per kind (see module
    docstring): PNG inflate + filter reconstruction, WAV RIFF parse, Y4M
    frame walk. Emits the *decoded* dimensions, sample-byte count, mean
    sample value, and frame count; raises on corrupt payloads (CRC or
    structure errors surface as task failures, the honest behavior for a
    decode stage)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, nb, mb, fr = [], [], [], [], []
            for kind, b in zip(pdf["kind"], pdf["payload"]):
                if kind == "image":
                    px = decode_png(bytes(b))
                    hh, ww = px.shape[:2]
                    samples = px.reshape(-1)
                    n_frames = 1
                elif kind == "audio":
                    samples, _rate = decode_wav(bytes(b))
                    ww, hh = len(samples), 1
                    n_frames = 1
                else:
                    frames = decode_y4m(bytes(b))
                    n_frames, hh, ww = frames.shape
                    samples = frames.reshape(-1)
                w.append(ww)
                h.append(hh)
                nb.append(len(samples))
                mb.append(float(samples.mean()) if len(samples) else 0.0)
                fr.append(n_frames)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pd.Series(w, dtype="int32"),
                    "height": pd.Series(h, dtype="int32"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "mean_byte": mb,
                    "frames": pd.Series(fr, dtype="int32"),
                }
            )

    return widen_small_input(df).mapInPandas(kernel, schema=DECODED_SCHEMA)


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

    return widen_small_input(df).mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_media(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL resize stage: decode the container, nearest-neighbor resample to
    ``(out_h, out_w)``, re-encode the same container format.

    - ``image``: PNG → pixel grid → PNG at the new dimensions;
    - ``video``: Y4M → every frame resampled → Y4M (frame count preserved);
    - ``audio``: WAV → the 1-D analogue (nearest resample to ``out_w``
      samples) → WAV.

    Nearest-neighbor uses integer-exact index math (``src = i*len//out``,
    no float rounding), so results are bit-deterministic across engines and
    replayable by an oracle. Input/output schema is :data:`MEDIA_SCHEMA`;
    the per-batch work is pure numpy fancy-indexing (no per-pixel Python).
    """

    def _nn(px: np.ndarray, oh: int, ow: int) -> np.ndarray:
        h, w = px.shape[:2]
        ri = (np.arange(oh, dtype=np.int64) * h) // oh
        ci = (np.arange(ow, dtype=np.int64) * w) // ow
        return px[ri][:, ci]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, ws, hs = [], [], []
            for kind, b in zip(pdf["kind"], pdf["payload"]):
                if kind == "image":
                    px = _nn(decode_png(bytes(b)), out_h, out_w)
                    out_payload.append(encode_png(px))
                    ws.append(out_w)
                    hs.append(out_h)
                elif kind == "audio":
                    samples, rate = decode_wav(bytes(b))
                    if len(samples) == 0:
                        samples = np.zeros(1, dtype=np.uint8)
                    idx = (np.arange(out_w, dtype=np.int64) * len(samples)) // out_w
                    out_payload.append(encode_wav(samples[idx], rate))
                    ws.append(out_w)
                    hs.append(1)
                else:
                    frames = decode_y4m(bytes(b))
                    rs = np.stack([_nn(f, out_h, out_w) for f in frames])
                    out_payload.append(encode_y4m(rs))
                    ws.append(out_w)
                    hs.append(out_h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return widen_small_input(df).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def video_frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """REAL frame sampler: parse the Y4M container, keep every ``k``-th
    frame, emit one row per kept frame with the frame re-encoded as a gray
    PNG — the explode-shaped stage a video pipeline feeds to a per-frame
    model. Non-video rows are filtered Spark-side (predicate pushes to the
    scan) so the Python kernel never sees them."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, pngs = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_y4m(bytes(b))
                for fi in range(0, frames.shape[0], every_k):
                    mids.append(mid)
                    idxs.append(fi)
                    pngs.append(encode_png(frames[fi]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_png": pngs,
                }
            )

    vids = df.filter(F.col("kind") == "video")
    return widen_small_input(vids).mapInPandas(
        kernel, schema="media_id long, frame_idx int, frame_png binary"
    )


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

    return widen_small_input(df).mapInPandas(
        kernel, schema="media_id long, samples array<binary>"
    )

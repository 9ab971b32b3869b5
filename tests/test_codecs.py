from __future__ import annotations

import zlib

import numpy as np
import pytest

from webgraph_spark.functions.codecs import (
    decode_png,
    decode_wav,
    decode_y4m,
    encode_png,
    encode_wav,
    encode_y4m,
)
from webgraph_spark.functions.multimodal import (
    decode_media,
    encode_media,
    synth_media,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


def test_png_gray_roundtrip_all_filters():
    # 10 rows -> the filter cycle hits every type (0..4) twice
    px = _rng().randint(0, 256, size=(10, 23), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_rgb_roundtrip():
    px = _rng(1).randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_none_filter_roundtrip():
    px = _rng(2).randint(0, 256, size=(4, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, filter_mode="none")), px)


def test_png_adversarial_gradients():
    # gradients make Sub/Up/Average/Paeth residuals wrap mod 256
    px = (np.add.outer(np.arange(16) * 8, np.arange(32) * 5) % 256).astype(
        np.uint8
    )
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_rejects_bad_signature_and_crc():
    data = encode_png(np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + data)
    corrupt = bytearray(data)
    corrupt[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))


def test_png_external_decodability():
    # the stream must be standard: decompressing the IDAT with raw zlib
    # yields h * (w + 1) filtered bytes (signature + chunk layout checked
    # by decode_png itself)
    px = _rng(3).randint(0, 256, size=(6, 9), dtype=np.uint8)
    data = encode_png(px)
    idat_at = data.index(b"IDAT")
    length = int.from_bytes(data[idat_at - 4 : idat_at], "big")
    raw = zlib.decompress(data[idat_at + 4 : idat_at + 4 + length])
    assert len(raw) == 6 * (9 + 1)


def test_wav_roundtrip():
    samples = _rng(4).randint(0, 256, size=257, dtype=np.uint8)
    out, rate = decode_wav(encode_wav(samples, sample_rate=16000))
    assert rate == 16000
    assert np.array_equal(out, samples)


def test_y4m_roundtrip():
    frames = _rng(5).randint(0, 256, size=(4, 8, 16), dtype=np.uint8)
    out = decode_y4m(encode_y4m(frames))
    assert np.array_equal(out, frames)


def test_media_encode_decode_spark(spark):
    media = synth_media(spark, n=12)
    decoded = decode_media(encode_media(media))
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 12
    # raw payloads for cross-checking decoded stats
    raw = {
        r["media_id"]: np.frombuffer(bytes(r["payload"]), np.uint8)
        for r in media.collect()
    }
    for mid, r in rows.items():
        arr = raw[mid][:128]
        assert r["mean_byte"] == pytest.approx(float(arr.mean()))
        if r["kind"] == "image":
            assert (r["width"], r["height"], r["frames"]) == (16, 8, 1)
            assert r["n_bytes"] == 128
        elif r["kind"] == "audio":
            assert (r["width"], r["height"], r["frames"]) == (128, 1, 1)
            assert r["n_bytes"] == 128
        else:
            assert r["frames"] == mid % 7 + 1
            assert r["n_bytes"] == 128 * r["frames"]


# --- property tests (no Spark) ---------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    mode=st.sampled_from(["cycle", "none"]),
)
def test_png_gray_roundtrip_property(h, w, seed, mode):
    px = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, filter_mode=mode)), px)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 8), w=st.integers(1, 8), seed=st.integers(0, 2**31 - 1))
def test_png_rgb_roundtrip_property(h, w, seed):
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=25, deadline=None)
@given(n=st.integers(0, 512), seed=st.integers(0, 2**31 - 1))
def test_wav_roundtrip_property(n, seed):
    samples = np.random.RandomState(seed).randint(0, 256, n, dtype=np.uint8)
    out, _ = decode_wav(encode_wav(samples))
    assert np.array_equal(out, samples)


def test_resize_media_spark(spark):
    from webgraph_spark.functions.multimodal import resize_media

    media = encode_media(synth_media(spark, n=12))
    raw = {
        r["media_id"]: r for r in synth_media(spark, n=12).collect()
    }
    resized = resize_media(media, out_w=6, out_h=4)
    rows = {r["media_id"]: r for r in resized.collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        arr = np.frombuffer(bytes(raw[mid]["payload"]), np.uint8)[:128]
        src = arr.copy()
        if len(src) < 128:
            src = np.pad(src, (0, 128 - len(src)))
        if r["kind"] == "image":
            px = decode_png(bytes(r["payload"]))
            assert px.shape == (4, 6)
            # integer-exact nearest reference on the original 8x16 grid
            full = src.reshape(8, 16)
            ri = (np.arange(4) * 8) // 4
            ci = (np.arange(6) * 16) // 6
            assert np.array_equal(px, full[ri][:, ci])
        elif r["kind"] == "audio":
            samples, _ = decode_wav(bytes(r["payload"]))
            idx = (np.arange(6, dtype=np.int64) * 128) // 6
            assert np.array_equal(samples, src[idx])
        else:
            frames = decode_y4m(bytes(r["payload"]))
            assert frames.shape == (mid % 7 + 1, 4, 6)


def test_video_frame_sample_spark(spark):
    from webgraph_spark.functions.multimodal import video_frame_sample

    media = encode_media(synth_media(spark, n=12))
    out = video_frame_sample(media, every_k=2).collect()
    # only video rows survive; frame indices are 0, 2, 4, ...
    by_mid = {}
    for r in out:
        by_mid.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_mid.items():
        assert mid % 3 == 2  # synth_media kind cycle: video at id % 3 == 2
        n_frames = mid % 7 + 1
        assert sorted(r["frame_idx"] for r in rows) == list(
            range(0, n_frames, 2)
        )
        for r in rows:
            px = decode_png(bytes(r["frame_png"]))
            assert px.shape == (8, 16)

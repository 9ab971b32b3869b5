"""Codec roundtrips mirror the reference's compress/decompress sweeps
(``BVGraphTest.java:50-99``) at the numpy level."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.functions import codes as c


def test_zigzag_edge_cases():
    v = np.array([0, -1, 1, 2**62, -(2**62), -(2**63), 2**63 - 1], dtype=np.int64)
    assert np.array_equal(c.zigzag_decode(c.zigzag_encode(v)), v)


def test_gap_single_roundtrip():
    succ = np.array([0, 1, 5, 6, 7, 100], dtype=np.int64)
    for src in (0, 3, 50, 1000):
        enc = c.gap_encode(src, succ)
        assert np.array_equal(c.gap_decode(src, enc), succ)


def test_gap_rejects_unsorted():
    with pytest.raises(ValueError):
        c.gap_encode(0, np.array([3, 1], dtype=np.int64))
    with pytest.raises(ValueError):
        c.gap_encode_concat(
            np.array([0]), np.array([0, 2]), np.array([3, 1], dtype=np.int64)
        )


@pytest.mark.parametrize("seed", range(5))
def test_concat_roundtrip_randomized(seed):
    rng = np.random.default_rng(seed)
    nlists = int(rng.integers(1, 30))
    srcs = np.sort(rng.choice(5000, nlists, replace=False)).astype(np.int64)
    lists, indptr = [], [0]
    for _ in srcs:
        k = int(rng.integers(0, 12))
        lists.append(np.sort(rng.choice(5000, k, replace=False)).astype(np.int64))
        indptr.append(indptr[-1] + k)
    succs = (
        np.concatenate(lists) if any(x.size for x in lists) else np.empty(0, np.int64)
    )
    indptr = np.array(indptr, np.int64)
    enc = c.gap_encode_concat(srcs, indptr, succs)
    assert np.array_equal(c.gap_decode_concat(srcs, indptr, enc), succs)
    b = c.varint_encode(enc)
    assert np.array_equal(c.varint_decode(b, enc.size), enc)


def test_varint_boundaries():
    v = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**32, 2**63, 2**64 - 1], dtype=np.uint64
    )
    b = c.varint_encode(v)
    assert np.array_equal(c.varint_decode(b, v.size), v)
    assert c.varint_encode(np.array([], dtype=np.uint64)).size == 0

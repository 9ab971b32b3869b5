"""Hypothesis property tests — the reference's randomized sweep discipline
(``BVGraphTest.java:50-99`` sweeps parameter cross-products over random
graph families; here the random families come from hypothesis strategies).

Pure-numpy properties (no Spark session needed — fast, wide input space):
codec roundtrips, CSR block-level encode/decode, zig-zag algebra.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from webgraph_spark.functions import codes as c

ints64 = st.integers(min_value=-(2**62), max_value=2**62)
uints = st.integers(min_value=0, max_value=2**63 - 1)


@given(st.lists(ints64, max_size=200))
@settings(max_examples=200, deadline=None)
def test_zigzag_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(c.zigzag_decode(c.zigzag_encode(v)), v)


@given(st.lists(uints, max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    enc = c.varint_encode(v)
    assert np.array_equal(c.varint_decode(enc, len(vals)), v)


@given(
    st.integers(min_value=0, max_value=10_000),
    st.sets(st.integers(min_value=0, max_value=50_000), max_size=80),
)
@settings(max_examples=200, deadline=None)
def test_gap_roundtrip_any_list(src, succ_set):
    succ = np.array(sorted(succ_set), dtype=np.int64)
    enc = c.gap_encode(src, succ)
    assert np.array_equal(c.gap_decode(src, enc), succ)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),  # src
            st.sets(st.integers(min_value=0, max_value=2_000), min_size=1, max_size=20),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_csr_block_roundtrip_random(rows):
    """Whole-block concat encode/decode — the BVGraph store/load sweep."""
    rows = sorted(rows)
    srcs = np.array([r[0] for r in rows], dtype=np.int64)
    lists = [np.array(sorted(r[1]), dtype=np.int64) for r in rows]
    lengths = np.array([len(x) for x in lists], dtype=np.int64)
    indptr = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lengths, out=indptr[1:])
    succs = np.concatenate(lists)
    gaps = c.gap_encode_concat(srcs, indptr, succs)
    packed = c.varint_encode(gaps)
    back_gaps = c.varint_decode(packed, succs.size)
    back = c.gap_decode_concat(srcs, indptr, back_gaps)
    assert np.array_equal(back, succs)


@given(st.lists(ints64, min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_zigzag_orders_by_magnitude(vals):
    """int2nat must map small-magnitude values to small codes
    (``BVGraph.java:205-207`` — the reason the head gap is zig-zagged)."""
    v = np.array(vals, dtype=np.int64)
    enc = c.zigzag_encode(v)
    # code order: by |v|, and -k (2k-1) precedes +k (2k) at equal magnitude
    order_by_mag = np.lexsort((v > 0, np.abs(v)))
    assert np.array_equal(np.argsort(enc, kind="stable"), order_by_mag)

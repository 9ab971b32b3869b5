"""Gap / zig-zag / varint integer codes, numpy-vectorized.

Semantics follow the reference's successor-list coding (not its bit layout):

- successor lists are sorted, duplicate-free int arrays per source node
  (reference: ``ImmutableGraph.java:307-341``);
- the first successor is stored as zig-zag(succ0 - src) and the rest as
  ``gap - 1`` deltas (reference: residual coding, ``BVGraph.java:205-221``,
  ``int2nat/nat2int`` at ``BVGraph.java:205-207``);
- the byte-level code here is LEB128 varint rather than zeta_3 bitstreams:
  byte-aligned codes vectorize on numpy/Arrow, and parquet+zstd recovers most
  of the entropy gap. The *information layout* (zig-zag head + gap-1 tail) is
  the WebGraph one.

All functions operate on whole arrays; no Python-level per-element loops
except over byte positions (bounded by 10 = max varint length of a u64).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_LEN = 10  # ceil(64 / 7)


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Map signed int64 -> unsigned, small-magnitude-first (int2nat)."""
    v = values.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """Inverse of :func:`zigzag_encode` (nat2int)."""
    v = values.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)) ^ (~(v & np.uint64(1)) + np.uint64(1))).astype(np.int64)


def gap_encode(src: int, succs: np.ndarray) -> np.ndarray:
    """Sorted successor list -> gap stream (uint64).

    stream[0] = zigzag(succs[0] - src); stream[i] = succs[i] - succs[i-1] - 1.
    Mirrors the reference's residual layout (``BVGraph.java:209-221``).
    """
    s = np.asarray(succs, dtype=np.int64)
    if s.size == 0:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(s.size, dtype=np.uint64)
    out[0] = zigzag_encode(np.array([s[0] - src], dtype=np.int64))[0]
    if s.size > 1:
        diffs = np.diff(s) - 1
        if (diffs < 0).any():
            raise ValueError("successor list must be sorted and duplicate-free")
        out[1:] = diffs.astype(np.uint64)
    return out


def gap_decode(src: int, stream: np.ndarray) -> np.ndarray:
    """Inverse of :func:`gap_encode` -> sorted int64 successor array."""
    g = np.asarray(stream, dtype=np.uint64)
    if g.size == 0:
        return np.empty(0, dtype=np.int64)
    first = src + zigzag_decode(g[:1])[0]
    out = np.empty(g.size, dtype=np.int64)
    out[0] = first
    if g.size > 1:
        out[1:] = g[1:].astype(np.int64) + 1
        np.cumsum(out, out=out)
    return out


def gap_encode_concat(
    srcs: np.ndarray, indptr: np.ndarray, succs: np.ndarray
) -> np.ndarray:
    """Vectorized gap encode of many successor lists stored CSR-style.

    ``succs[indptr[i]:indptr[i+1]]`` is the sorted successor list of
    ``srcs[i]``. Returns one uint64 gap stream of the same total length —
    heads zig-zagged against their src, tails as gap-1 — with NO per-list
    Python loop (the whole-block np.diff trick).
    """
    succs = np.asarray(succs, dtype=np.int64)
    srcs = np.asarray(srcs, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)
    n = succs.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lengths = np.diff(indptr)
    nonempty = lengths > 0
    starts = indptr[:-1][nonempty]
    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = 0
    gaps[1:] = np.diff(succs) - 1
    # Validate tails only (head slots get overwritten below).
    head_mask = np.zeros(n, dtype=bool)
    head_mask[starts] = True
    if (gaps[~head_mask] < 0).any():
        raise ValueError("successor lists must be sorted and duplicate-free")
    out = gaps.astype(np.uint64)
    # Heads: overwrite the cross-list diffs with zigzag(succ0 - src).
    out[starts] = zigzag_encode(succs[starts] - srcs[nonempty])
    return out


def gap_decode_concat(
    srcs: np.ndarray, indptr: np.ndarray, stream: np.ndarray
) -> np.ndarray:
    """Inverse of :func:`gap_encode_concat` — vectorized via segmented cumsum."""
    stream = np.asarray(stream, dtype=np.uint64)
    srcs = np.asarray(srcs, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)
    n = stream.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lengths = np.diff(indptr)
    nonempty = lengths > 0
    starts = indptr[:-1][nonempty]
    ends = starts + lengths[nonempty] - 1  # inclusive end of each segment
    vals = stream.astype(np.int64) + 1  # tail gaps -> +1 increments
    heads_abs = srcs[nonempty] + zigzag_decode(stream[starts])
    # Segmented cumsum via one global cumsum: pick head increments so the
    # running sum lands exactly on each segment's absolute head value.
    tails = vals.copy()
    tails[starts] = 0
    ct = np.cumsum(tails)
    seg_end_abs = heads_abs + (ct[ends] - ct[starts])  # last successor per list
    vals[starts[0]] = heads_abs[0]
    if starts.size > 1:
        vals[starts[1:]] = heads_abs[1:] - seg_end_abs[:-1]
    return np.cumsum(vals)


def varint_encode(values: np.ndarray) -> np.ndarray:
    """LEB128-encode a uint64 array -> uint8 byte array (vectorized).

    Python loops only over byte positions (<= 10), never over elements.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for _ in range(_MAX_VARINT_LEN):
        nz = tmp > 0
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    np.maximum(nbits, 1, out=nbits)  # zero still takes one byte
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbits, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    for pos in range(_MAX_VARINT_LEN):
        mask = nbits > pos
        if not mask.any():
            break
        idx = offsets[:-1][mask] + pos
        byte = ((v[mask] >> np.uint64(7 * pos)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbits[mask] - 1 > pos).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out


def varint_decode(buf: np.ndarray, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 varints from a uint8 array -> uint64 array."""
    b = np.asarray(buf, dtype=np.uint8)
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = np.zeros(count, dtype=np.uint64)
    lengths = ends - starts + 1
    for pos in range(_MAX_VARINT_LEN):
        mask = lengths > pos
        if not mask.any():
            break
        idx = starts[mask] + pos
        out[mask] |= (b[idx] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * pos)
    return out

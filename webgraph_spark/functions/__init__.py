"""Vectorized kernel functions: integer codes, text analysis, dedup, similarity.

The reference's "scalar function library" is its instantaneous-code suite
(gamma/delta/zeta readers-writers, `BVGraph.java:626-755`; zig-zag
`int2nat/nat2int`, `BVGraph.java:205-207`). Here the equivalents are numpy
bit-twiddling routines applied to whole Arrow batches — never per-row Python.
"""

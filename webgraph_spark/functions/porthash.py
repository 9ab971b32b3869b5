"""Cross-engine-reproducible 60-bit hash.

The sketch operators (MinHash, SimHash, HyperBall) default to Spark's
``xxhash64`` — the fast JVM path — but xxhash64 exists only in Spark, so a
DuckDB oracle cannot replay those queries. This module defines ONE hash with
bit-identical implementations in both engines, built from primitives they
share (``md5`` hex digest + hex-literal parsing):

- Spark:  ``conv(substring(md5(concat(x, salt)), 1, 15), 16, 10)`` cast long
- DuckDB: ``('0x' || substring(md5(x || salt), 1, 15))::BIGINT``

15 hex digits = 60 bits, always non-negative in an int64 — so ``>>``/``&``
agree between Spark's long and DuckDB's BIGINT with no sign traps, and the
value survives a round-trip through ``conv``'s decimal-string output.

Sketches accept ``hash_fn="portable"`` to swap this in; the driver's oracle
queries use it so the ENTIRE pipeline (shingling, banding, candidate joins,
verification, clustering) is checked against DuckDB — only the hash
primitive differs from the throughput default. md5 costs ~3-5x xxhash64 and
its cryptographic strength buys nothing here, hence not the default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

XXHASH64 = "xxhash64"
PORTABLE = "portable"


def portable_hash60(col: Column | str, salt: Column | str = "") -> Column:
    """60-bit hash of ``concat(col, salt)`` — Spark side."""
    if isinstance(col, str):
        col = F.col(col)
    salt_col = F.lit(salt) if isinstance(salt, str) else salt
    return F.conv(
        F.substring(F.md5(F.concat(col, salt_col)), 1, 15), 16, 10
    ).cast("long")


def portable_hash60_sql(expr: str, salt_expr: str = "''") -> str:
    """The same 60-bit hash as a DuckDB SQL snippet — oracle side."""
    return f"('0x' || substring(md5({expr} || {salt_expr}), 1, 15))::BIGINT"

"""Portable deterministic hashing shared by the dedup/similarity operators.

Everything here is defined over md5 hex strings so that the DuckDB
oracle can reproduce signatures bit-for-bit (Spark's xxhash64/hash are
engine-specific; md5 is not). Costs one crypto hash per value — at scale,
swap in xxhash64 behind the same interface when no cross-engine oracle
is needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(c: Column) -> Column:
    return F.md5(c.cast("string"))


def md5_int(c: Column, chars: int = 8) -> Column:
    """First `chars` hex chars of md5 as a non-negative int (< 16^chars)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, chars), 16, 10) \
        .cast("long")


def md5_int_sql(expr: str, chars: int = 8) -> str:
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {chars})) AS BIGINT)"


def seeded(c: Column, seed: int) -> Column:
    return F.concat(F.lit(f"{seed}:"), c.cast("string"))


def seeded_sql(expr: str, seed: int) -> str:
    return f"('{seed}:' || CAST({expr} AS VARCHAR))"

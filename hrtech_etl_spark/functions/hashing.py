"""Portable deterministic hashing.

Dedup/LSH operators need hash functions that (a) are deterministic
across engines so the DuckDB oracle can replicate them bit-for-bit,
and (b) stay JVM-side in Spark (no Python UDFs). We derive a 32-bit
hash from the first 8 hex chars of MD5 — both engines implement MD5
identically:

    Spark : conv(substring(md5(s), 1, 8), 16, 10)::long
    DuckDB: ('0x' || substr(md5(s), 1, 8))::bigint

Seeded families (for MinHash) prefix the payload with ``{seed}:``.
xxhash64/crc32 would be faster but are not reproducible in DuckDB;
at 100TB the md5 cost is per-shingle CPU, still vectorized JVM code
and embarrassingly parallel — an acceptable trade for testability,
and swappable via this single module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash(col: Column, seed: int = 0) -> Column:
    """32-bit non-negative hash of a string column, seeded. JVM-only
    expression (md5 + conv), identical to the DuckDB formula above."""
    payload = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def portable_hash_sql(expr: str, seed: int = 0) -> str:
    """The DuckDB-dialect rendering of :func:`portable_hash`, used to
    build oracle SQL strings."""
    return f"(('0x' || substr(md5('{seed}:' || {expr}), 1, 8))::BIGINT)"


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized, lowercased
    text (classic canonical-form fingerprinting)."""
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized)


FINGERPRINT_SQL = "md5(trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g')))"

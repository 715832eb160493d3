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


# Universal-hash MinHash family: h_j(x) = (A[j] * md5hash(x) + B[j]) mod P.
# One md5 per item, then j cheap affine transforms — vs. j md5s per item
# for the seeded-prefix family (measured 8x the CPU of everything else
# in the LSH pipeline). P is the smallest prime > 2^32; A[j] stays
# < 2^14 so A*h < 2^46 — no 64-bit overflow in either engine.
MINHASH_PRIME = 4294967311
MINHASH_A = [2971, 3361, 4111, 5381, 6151, 7919, 8627, 9973]
MINHASH_B = [1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841, 12195257]


def affine_minhash(base: Column, j: int) -> Column:
    """The j-th universal-hash value for a precomputed base hash."""
    return (F.lit(MINHASH_A[j]) * base + F.lit(MINHASH_B[j])) % F.lit(MINHASH_PRIME)


def affine_minhash_sql(base_expr: str, j: int) -> str:
    return f"(({MINHASH_A[j]} * {base_expr} + {MINHASH_B[j]}) % {MINHASH_PRIME})"


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized, lowercased
    text (classic canonical-form fingerprinting)."""
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized)


FINGERPRINT_SQL = "md5(trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g')))"

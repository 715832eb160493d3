"""Perceptual-hash near-dup: kernel determinism, band completeness,
verify rejection."""

from __future__ import annotations

import numpy as np
import pytest

from hrtech_etl_spark.operators.multimodal import (
    ahash64,
    encode_ppm,
    phash_near_dup_pairs,
)


def _img(seed: int, h: int = 40, w: int = 48) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (30 + seed * 5 + xx * 4) % 256,
            (70 + seed * 9 + yy * 5) % 256,
            (seed * 40 + (xx + yy) * 3) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


def test_ahash_deterministic_and_signed64():
    b = encode_ppm(_img(1))
    h1, h2 = ahash64(b), ahash64(b)
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)


def test_ahash_jitter_invariant_inversion_variant():
    base = _img(2).astype(np.float64)
    jit = np.clip(base + ((np.indices(base.shape).sum(0)) % 5) - 2, 0, 255)
    inv = (255 - base).astype(np.uint8)
    hb = ahash64(encode_ppm(base.astype(np.uint8)))
    hj = ahash64(encode_ppm(jit.astype(np.uint8)))
    hi = ahash64(encode_ppm(inv))
    assert bin((hb ^ hj) & ((1 << 64) - 1)).count("1") <= 4
    # inversion flips essentially every block bit
    assert bin((hb ^ hi) & ((1 << 64) - 1)).count("1") >= 48


def test_banded_pairs_complete_vs_bruteforce(spark):
    # pigeonhole: any pair with hamming <= 15 MUST surface from the
    # 4x16-bit band join; verify against brute force on 30 hashes
    rng = np.random.RandomState(7)
    base = int(rng.randint(0, 1 << 31))
    hashes = []
    v = (base << 32) | base
    for i in range(30):
        flips = rng.choice(64, size=rng.randint(0, 9), replace=False)
        u = v
        for f in flips:
            u ^= 1 << int(f)
        hashes.append((i, u - (1 << 64) if u >= (1 << 63) else u))
    df = spark.createDataFrame(hashes, "doc_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_dup_pairs(df, max_hamming=10).collect()
    }
    expect = set()
    for i in range(30):
        for j in range(i + 1, 30):
            ham = bin((hashes[i][1] ^ hashes[j][1]) & ((1 << 64) - 1)).count("1")
            if ham <= 10:
                expect.add((i, j, ham))
    assert got == expect


def test_verify_rejects_band_collision_far_pair(spark):
    # same low band, everything else different: candidate but not a dup
    a = 0x0000000000001234
    b = 0x7FFFFFFFFFFF1234
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, phash long"
    )
    assert phash_near_dup_pairs(df, max_hamming=10).count() == 0


def test_scale_smoke_phash_stage_non_multiple_rows(spark):
    # regression (round-11 ADVICE): --phash-rows not divisible by 10
    # left a partial planted group and the exact 3*(n//10) pair-count
    # assertion failed spuriously; the stage now rounds n down to a
    # whole number of groups
    import sys
    import types
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    try:
        import scale_smoke
    finally:
        sys.path.pop(0)

    class _Meter:
        def run(self, label, fn):
            return fn(), 1.0

    args = types.SimpleNamespace(phash_rows=47)  # rounds to 40 -> 12 pairs
    scale_smoke.run_phash_stage(spark, _Meter(), args, root=None)

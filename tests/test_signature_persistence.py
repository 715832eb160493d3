"""Persisted MinHash signature tables across sessions: the federated
dedup story claims shards sign locally, persist 64 bytes/doc, and any
later session merges the stored tables WITHOUT rescanning text. These
tests prove the round trip — a signature table written by a genuinely
FRESH Spark session (separate JVM, via subprocess) merges with a live
shard to the exact pairs the all-in-memory path produces — and pin the
schema/hash-family contract (version + num_hashes + shingle_k stamped
per table; mismatched declarations fail loudly, never mis-score)."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.functions.dedup import (
    merged_signature_pairs,
    minhash_signature_table,
    read_signature_table,
    write_signature_table,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the two shards used everywhere below; doc 1 (shard 0) and doc 11
#: (shard 1) are exact cross-shard twins, the rest are distinct filler
SHARD0 = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "orchard irrigation schedules and pump maintenance windows"),
    (3, "parquet footer statistics drive rowgroup pruning decisions"),
]
SHARD1 = [
    (11, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (12, "watermarks bound state growth in streaming aggregations"),
]


def _sig(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return minhash_signature_table(df, "text", "doc_id")


def test_cross_session_roundtrip(spark, tmp_path):
    """Shard 0 signs and persists in a SEPARATE JVM; this session reads
    the stored table back and merges it with a live shard — pairs must
    be identical to the fully-in-memory merge (guards against silent
    hash-family or schema drift in stored signatures)."""
    out = str(tmp_path / "shard0_sigs")
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from hrtech_etl_spark.core.session import get_spark
        from hrtech_etl_spark.functions.dedup import (
            minhash_signature_table, write_signature_table,
        )
        spark = get_spark(app_name="sig-writer", shuffle_partitions=4)
        df = spark.createDataFrame(
            {SHARD0!r}, "doc_id long, text string"
        )
        sig = minhash_signature_table(df, "text", "doc_id")
        write_signature_table(sig, {out!r})
        spark.stop()
        """
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    stored = read_signature_table(spark, out)
    live1 = _sig(spark, SHARD1)
    got = sorted(
        map(
            tuple,
            merged_signature_pairs(
                [stored, live1], "doc_id", threshold=0.5
            ).collect(),
        )
    )
    ref = sorted(
        map(
            tuple,
            merged_signature_pairs(
                [_sig(spark, SHARD0), live1], "doc_id", threshold=0.5
            ).collect(),
        )
    )
    assert got == ref
    assert got == [(1, 11, 0, 1, 1.0)]  # the planted cross-shard twin


def test_same_session_roundtrip_and_meta_guards(spark, tmp_path):
    """Write/read in one session (cheap path), then every declared-
    parameter mismatch: wrong shingle_k and wrong num_hashes raise on
    the scan (tag guard), a foreign parquet without sig_meta raises
    EAGERLY at the call."""
    out = str(tmp_path / "sigs")
    sig = _sig(spark, SHARD0)
    write_signature_table(sig, out)
    back = read_signature_table(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, sig.collect())
    )
    with pytest.raises(Exception, match="different hash family"):
        read_signature_table(spark, out, shingle_k=3).collect()
    with pytest.raises(Exception, match="different hash family"):
        read_signature_table(spark, out, num_hashes=16).collect()
    # foreign/pre-versioned parquet: no sig_meta -> eager ValueError
    plain = str(tmp_path / "plain")
    sig.write.parquet(plain)
    with pytest.raises(ValueError, match="sig_meta"):
        read_signature_table(spark, plain)


def test_write_schema_asserts(spark, tmp_path):
    """The writer pins its input shape: extra columns or a non-long
    signature array are caller bugs, not things to persist."""
    extra = _sig(spark, SHARD0).withColumn("junk", F.lit(1))
    with pytest.raises(ValueError, match="exactly columns"):
        write_signature_table(extra, str(tmp_path / "x"))
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0])], "doc_id long, sig array<double>"
    )
    with pytest.raises(ValueError, match="array<bigint>"):
        write_signature_table(bad, str(tmp_path / "y"))
    # declared width must match the ACTUAL signatures: stamping h8
    # over 16-long arrays would mis-pin the table so that no read
    # declaration works (tag guard and band guard each point at the
    # other parameter) — the write itself must raise
    wide = spark.createDataFrame(
        [(1, list(range(16)))], "doc_id long, sig array<long>"
    )
    with pytest.raises(Exception, match="num_hashes"):
        write_signature_table(wide, str(tmp_path / "z"))
    write_signature_table(wide, str(tmp_path / "z16"), num_hashes=16)
    got = read_signature_table(
        spark, str(tmp_path / "z16"), num_hashes=16
    ).collect()
    assert got[0]["sig"] == list(range(16))

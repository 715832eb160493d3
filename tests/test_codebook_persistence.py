"""Persisted PQ codebooks across sessions: the train-once/serve-many
story claims a training job fits the quantizer once, persists a
few-KiB ``(s, cid, centroid, cb_meta)`` artifact, and any later
serving session reads it back WITHOUT retraining. These tests prove
the round trip — a codebook written by a genuinely FRESH Spark session
(separate JVM, via subprocess) reconstructs bit-identically to the
in-memory artifact — and pin the geometry contract (version + m +
ksub + dim stamped per row; mismatched declarations fail loudly,
never mis-slice a served vector)."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.functions.similarity import (
    pq_codebook,
    read_codebook_table,
    write_codebook_table,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: tiny deterministic embedding fixture shared with the writer
#: subprocess: vec_id 0..31, dim 16 — component (i*31 + j) % 17 / 16
_EMB_SQL = (
    "SELECT id AS vec_id, transform(sequence(0, 15), "
    "j -> CAST((id * 31 + j) % 17 AS DOUBLE) / 16) AS embedding "
    "FROM range(32)"
)
_GEOM = dict(m=4, ksub=8, dim=16)


def _emb(spark):
    return spark.sql(_EMB_SQL)


def _cb_value(cb_df):
    return cb_df.collect()[0]["__cb"]


def test_cross_session_roundtrip(spark, tmp_path):
    """A SEPARATE JVM trains (seed-vector codebook — deterministic)
    and persists; this session reads the table back and must hold the
    bit-identical ``__cb`` artifact the in-memory path builds."""
    out = str(tmp_path / "cb")
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from hrtech_etl_spark.core.session import get_spark
        from hrtech_etl_spark.functions.similarity import (
            pq_codebook, write_codebook_table,
        )
        spark = get_spark(app_name="cb-writer", shuffle_partitions=4)
        emb = spark.sql({_EMB_SQL!r})
        cb = pq_codebook(emb, m=4, ksub=8, dim=16)
        write_codebook_table(cb, {out!r})
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

    stored = read_codebook_table(spark, out, **_GEOM)
    local = pq_codebook(_emb(spark), **_GEOM)
    assert _cb_value(stored) == _cb_value(local)


def test_same_session_roundtrip_and_meta_guards(spark, tmp_path):
    """Write/read in one session, then every declared-geometry
    mismatch raises on the scan (tag guard) and a foreign parquet
    without cb_meta raises EAGERLY at the call."""
    out = str(tmp_path / "cb")
    cb = pq_codebook(_emb(spark), **_GEOM)
    write_codebook_table(cb, out)
    back = read_codebook_table(spark, out, **_GEOM)
    assert _cb_value(back) == _cb_value(cb)
    # the stored grid is auditable with plain SQL: full m x ksub set
    raw = spark.read.parquet(out)
    assert raw.count() == _GEOM["m"] * _GEOM["ksub"]
    assert raw.select("cb_meta").distinct().collect()[0][0] == (
        "cbv1:m4:k8:d16"
    )
    for bad in (dict(m=8, ksub=8, dim=16), dict(m=4, ksub=16, dim=16)):
        with pytest.raises(Exception, match="different geometry"):
            read_codebook_table(spark, out, **bad)
    # same tag-string geometry but declared dim inconsistent with m
    with pytest.raises(ValueError, match="% m"):
        read_codebook_table(spark, out, m=4, ksub=8, dim=15)
    # foreign parquet: no cb_meta -> eager ValueError
    plain = str(tmp_path / "plain")
    _emb(spark).write.parquet(plain)
    with pytest.raises(ValueError, match="cb_meta"):
        read_codebook_table(spark, plain)


def test_write_shape_asserts(spark, tmp_path):
    """The writer pins its input shape: multi-row frames, wrong
    columns, and ragged nesting are caller bugs, not things to
    persist."""
    emb = _emb(spark)
    with pytest.raises(ValueError, match="one-row"):
        write_codebook_table(emb, str(tmp_path / "x"))
    ragged = spark.createDataFrame(
        [([[[1.0, 2.0], [3.0]]],)], "`__cb` ARRAY<ARRAY<ARRAY<DOUBLE>>>"
    )
    with pytest.raises(ValueError, match="ragged"):
        write_codebook_table(ragged, str(tmp_path / "y"))
    empty = spark.createDataFrame(
        [([],)], "`__cb` ARRAY<ARRAY<ARRAY<DOUBLE>>>"
    )
    with pytest.raises(ValueError, match="empty codebook"):
        write_codebook_table(empty, str(tmp_path / "z"))
    # mode="error" refuses to clobber an existing table
    out = str(tmp_path / "cb")
    cb = pq_codebook(emb, **_GEOM)
    write_codebook_table(cb, out)
    with pytest.raises(Exception):
        write_codebook_table(cb, out)
    write_codebook_table(cb, out, mode="overwrite")  # explicit opt-in


def test_stored_grid_corruption_refused(spark, tmp_path):
    """A partially-written or hand-edited grid (missing cells, extra
    rows, wrong centroid width) is refused at read — a serving fleet
    must never decode under a broken codebook."""
    out = str(tmp_path / "cb")
    write_codebook_table(pq_codebook(_emb(spark), **_GEOM), out)
    holes = str(tmp_path / "holes")
    spark.read.parquet(out).where(
        ~((F.col("s") == 0) & (F.col("cid") == 0))
    ).write.parquet(holes)
    with pytest.raises(ValueError, match="grid"):
        read_codebook_table(spark, holes, **_GEOM)
    narrow = str(tmp_path / "narrow")
    spark.read.parquet(out).withColumn(
        "centroid", F.slice("centroid", 1, 2)
    ).write.parquet(narrow)
    with pytest.raises(ValueError, match="wide"):
        read_codebook_table(spark, narrow, **_GEOM)

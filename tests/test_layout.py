"""Z-order layout: Morton key math vs a pure-Python reference, clamp
and NULL handling, and the actual payoff — parquet footer min/max
locality on BOTH dimensions vs a single-column sort."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hrtech_etl_spark.operators.layout import zorder_key, write_zordered


def _ref_morton(vals, spec, bits):
    """Pure-Python reference of zorder_key for one row."""
    d = len(spec)
    key = 0
    for j, ((lo, hi), v) in enumerate(zip([s[1:] for s in spec], vals)):
        span = hi - lo + 1
        if v is None:
            q = 0
        else:
            q = int(((v - lo) * (1 << bits)) / span)
            q = max(0, min((1 << bits) - 1, q))
        for i in range(bits):
            key |= ((q >> i) & 1) << (i * d + j)
    return key


def test_key_matches_python_reference(spark):
    spec = [("x", 0, 99), ("y", 0, 999)]
    rows = [(0, 0), (99, 999), (50, 500), (7, 893), (None, 42), (120, -5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        r["z"]
        for r in df.select(zorder_key(spec, bits=8).alias("z")).collect()
    ]
    want = [_ref_morton(v, spec, 8) for v in rows]
    assert got == want
    # clamp: out-of-range lands on edge cells, never corrupts the key
    assert all(0 <= z < (1 << 16) for z in got)


def test_key_orders_space_locally(spark):
    """Neighbors in (x, y) are neighbors in z far more often than in a
    single-column sort — spot-check the interleave property: the
    big-endian half of the key alternates both dims."""
    spec = [("x", 0, 255), ("y", 0, 255)]
    df = spark.createDataFrame(
        [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 17)],
        "x long, y long",
    )
    out = df.select("x", "y", zorder_key(spec, bits=8).alias("z")).collect()
    for r in out:
        assert r["z"] == _ref_morton((r["x"], r["y"]), spec, 8)


def _file_spans(path: str, col: str) -> list[tuple[int, int]]:
    spans = []
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((lo, hi))
    return spans


def test_zorder_write_localizes_both_dims(spark, sf_medium, tmp_path):
    """The point of the layout: after write_zordered on (user_id,
    v_int), EVERY file's footer min/max is narrow on BOTH columns, so
    filters on either prune files. A plain user_id sort leaves v_int
    spanning ~the full range in every file."""
    ev = (
        spark.read.parquet(os.path.join(sf_medium, "events.parquet"))
        .select(
            "event_id",
            "user_id",
            F.floor("value").cast("long").alias("v_int"),
        )
    )
    spec = [("user_id", 0, 149), ("v_int", 0, 490)]

    zpath = str(tmp_path / "zordered")
    write_zordered(ev, zpath, spec, bits=8, num_files=8)
    spath = str(tmp_path / "sorted")
    ev.repartitionByRange(8, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(spath)

    def mean_span(path, col, full):
        spans = _file_spans(path, col)
        assert len(spans) >= 4
        return sum(hi - lo for lo, hi in spans) / len(spans) / full

    # z-order: both dims localized (mean per-file span well under the
    # full range). 8-bit cells over 8 files → expect ~half-range tiles.
    assert mean_span(zpath, "user_id", 150) <= 0.6
    assert mean_span(zpath, "v_int", 491) <= 0.6
    # single-column sort: its own column is tight...
    assert mean_span(spath, "user_id", 150) <= 0.3
    # ...but the OTHER dimension stays wide per file — z-order beats it
    # decisively there (relative claim: robust to the data's own
    # value/user correlation narrowing the baseline a bit).
    assert mean_span(zpath, "v_int", 491) <= 0.75 * mean_span(spath, "v_int", 491)


def test_footer_stats_and_pruning(spark, sf_medium, tmp_path):
    """parquet_footer_stats reads ONLY footers but must agree with the
    actual per-file extremes; pruning_fraction then quantifies the
    z-order payoff: a narrow v_int range prunes most z-ordered files
    and almost none of the user_id-sorted layout's."""
    import os

    from hrtech_etl_spark.operators.layout import (
        parquet_footer_stats,
        pruning_fraction,
    )

    ev = (
        spark.read.parquet(os.path.join(sf_medium, "events.parquet"))
        .select(
            "event_id",
            "user_id",
            F.floor("value").cast("long").alias("v_int"),
        )
    )
    spec = [("user_id", 0, 149), ("v_int", 0, 490)]
    zpath = str(tmp_path / "zstats")
    write_zordered(ev, zpath, spec, bits=8, num_files=8)
    spath = str(tmp_path / "sstats")
    ev.repartitionByRange(8, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(spath)

    stats = parquet_footer_stats(spark, zpath, columns=["user_id", "v_int"])
    rows = stats.collect()
    # one row per (file, col); verify a file's stats against the data
    some = next(r for r in rows if r["col_name"] == "v_int")
    actual = (
        spark.read.parquet(some["file"])
        .agg(F.min("v_int"), F.max("v_int"))
        .collect()[0]
    )
    assert int(some["min_val"]) == actual[0]
    assert int(some["max_val"]) == actual[1]

    sstats = parquet_footer_stats(spark, spath, columns=["v_int"])
    # value is heavily right-skewed (median ~35 of 490), so the
    # quantile-ranged z-files pile into the low-v tiles: probe the
    # SPARSE tail, where clustering actually isolates rows into few
    # files. The user_id-sorted baseline leaves v_int wide everywhere.
    z_prune = pruning_fraction(stats, "v_int", 300, 490)
    s_prune = pruning_fraction(sstats, "v_int", 300, 490)
    assert z_prune >= 0.4          # z-order: most files skippable
    assert z_prune > s_prune       # and strictly better than the sort

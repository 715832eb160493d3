"""Z-order (Morton) data layout for multi-dimensional data skipping.

The 100 TB problem this solves: parquet row-group min/max pruning only
skips files when the data is CLUSTERED on the filtered column. A plain
sort clusters ONE column perfectly and leaves every other filter
column scattered across all files. Interleaving the bits of several
columns into one Morton key and range-partition-sorting on it
localizes ALL of them at once — a point/range filter on ANY of the
z-ordered columns then prunes most files at the scan, before a single
row is read. (Same layout trick Delta Lake's OPTIMIZE ZORDER BY and
classic spatial indexes use; implemented here as pure Spark column
expressions + ``repartitionByRange`` — no new physical operator.)

Everything below is integer expression math inside whole-stage
codegen: quantize each column to ``bits`` bits against an explicit
[lo, hi] range, then interleave with shift/and/or. No UDFs, no extra
pass (ranges are caller-supplied — at production scale they come from
table-level stats the writer already has; computing them inline would
add a scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Morton key width per dimension. 16 bits ≈ 65k distinct cells per
#: dimension — far finer than file granularity, coarse enough that two
#: dims still fit a 32-bit key (d*bits must stay < 63).
DEFAULT_BITS = 16

ZSpec = list[tuple[str, int, int]]  # (column, lo, hi) — inclusive range


def _quantize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column in [lo, hi] to [0, 2^bits): integer-only
    ``((v - lo) * 2^bits) div (hi - lo + 1)``, clamped so out-of-range
    stragglers (stale stats) land on the edge cells instead of
    corrupting the key. NULL → cell 0 (sorts first, like NULLS FIRST).
    The coalesce runs BEFORE the clamp: least/greatest in both engines
    follow the Postgres rule of SKIPPING nulls, so clamping first
    would silently send NULL to the top cell."""
    span = hi - lo + 1
    q = ((col.cast("long") - F.lit(lo)) * F.lit(1 << bits)) / F.lit(span)
    q = F.coalesce(F.floor(q).cast("long"), F.lit(0))
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q))


def zorder_key(spec: ZSpec, *, bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleaved sort key over ``spec`` columns.

    Bit i of dimension j lands at position ``i * d + j`` — the
    standard interleave, so the key's big-endian prefix cycles through
    all dimensions and a sort on it tiles the space into hypercubes.
    """
    d = len(spec)
    if d < 1:
        raise ValueError("zorder_key needs at least one column")
    if d * bits > 62:
        raise ValueError(f"zorder_key: {d} cols x {bits} bits overflows a long")
    key = F.lit(0).cast("long")
    for j, (name, lo, hi) in enumerate(spec):
        q = _quantize(F.col(name), lo, hi, bits)
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    return key


def zorder_key_sql(spec: ZSpec, *, bits: int = DEFAULT_BITS) -> str:
    """DuckDB rendering of :func:`zorder_key` — same integer math,
    term for term, for the oracle gate."""
    d = len(spec)
    terms = []
    for j, (name, lo, hi) in enumerate(spec):
        span = hi - lo + 1
        q = (
            f"greatest(0, least({(1 << bits) - 1}, "
            f"coalesce(CAST(floor(((CAST({name} AS BIGINT) - {lo}) * {1 << bits}.0) / {span}) AS BIGINT), 0)))"
        )
        for i in range(bits):
            terms.append(f"((({q} >> {i}) & 1) << {i * d + j})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    spec: ZSpec,
    *,
    bits: int = DEFAULT_BITS,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key.

    ``repartitionByRange`` on the key gives each output file a
    contiguous z-range (a hypercube tile), and the within-partition
    sort tightens every file's per-column min/max — which is all the
    reader needs: scans with filters on any spec column then prune at
    the footer. The key itself is dropped before writing (it is
    derivable layout metadata, not data).
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    keyed = df.withColumn("__z", zorder_key(spec, bits=bits))
    (
        keyed.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )

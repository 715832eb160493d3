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
    """Map an integer column in [lo, hi] to [0, 2^bits):
    ``floor((v - lo) * 2^bits / span)`` — the division is IEEE double
    (exact only while ``(v - lo) * 2^bits`` stays under 2^53; for
    epoch-microsecond-scale domains pre-scale the column or lower
    ``bits``), clamped so out-of-range stragglers (stale stats) land
    on the edge cells instead of corrupting the key. The oracle
    rendering replicates the same double math term for term.
    NULL → cell 0 (sorts first, like NULLS FIRST).
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


def parquet_footer_stats(
    spark,
    path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Per-file min/max index from parquet FOOTERS only — no data pages
    are read. Output: ``(file, n_rows, col_name, min_val, max_val)``
    (values stringified like :mod:`.profiling`).

    The file listing goes through the JVM Hadoop ``FileSystem``
    recursively (same route as ``operators/upsert.py``; Hive-style
    partition subdirectories included), and footer reads are
    DISTRIBUTED: the file list round-robins across the cluster and
    each task opens only its files' footers via pyarrow — local paths
    directly, remote URIs through ``pyarrow.fs.FileSystem.from_uri``
    (requires the scheme's pyarrow bindings on executors). At 100 TB this is an O(n_files) metadata pass — the tool
    for (a) auditing clustering quality after :func:`write_zordered`
    and (b) estimating scan pruning for a predicate
    (:func:`pruning_fraction`) without touching data.
    """
    from hrtech_etl_spark.operators.upsert import _fs_path

    fs, jpath = _fs_path(spark, path)
    # listFiles(recursive=True) walks Hive-style partition directories
    # (dt=.../part-*.parquet) that a flat listStatus would miss.
    it = fs.listFiles(jpath, True)
    files = []
    while it.hasNext():
        p = it.next().getPath()
        if not p.getName().endswith(".parquet"):
            continue
        uri = p.toUri()
        scheme = uri.getScheme()
        # local paths go to pyarrow bare (file:/x isn't a pyarrow URI);
        # any remote scheme keeps its full URI for FileSystem.from_uri.
        files.append(
            uri.getPath() if scheme in (None, "file") else str(p.toString())
        )
    if not files:
        raise ValueError(f"parquet_footer_stats: no parquet files under {path}")
    n = min(len(files), spark.sparkContext.defaultParallelism)
    fdf = spark.createDataFrame([(f,) for f in files], "file string").repartition(n)

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        def footer(f):
            if "://" in f:
                from pyarrow import fs as pafs

                filesystem, inner = pafs.FileSystem.from_uri(f)
                with filesystem.open_input_file(inner) as fh:
                    return pq.read_metadata(fh)
            return pq.read_metadata(f)

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                md = footer(f)
                names = md.schema.names
                wanted = columns or names
                for c in wanted:
                    if c not in names:
                        # schema evolution: a file predating the column
                        # has no stats for it — unprunable, not an error
                        out.append((f, md.num_rows, c, None, None))
                        continue
                    idx = names.index(c)
                    mins, maxs = [], []
                    for i in range(md.num_row_groups):
                        st = md.row_group(i).column(idx).statistics
                        if st is not None and st.has_min_max:
                            mins.append(st.min)
                            maxs.append(st.max)
                    out.append(
                        (
                            f,
                            md.num_rows,
                            c,
                            str(min(mins)) if mins else None,
                            str(max(maxs)) if maxs else None,
                        )
                    )
            yield pd.DataFrame(
                out, columns=["file", "n_rows", "col_name", "min_val", "max_val"]
            )

    return fdf.mapInPandas(
        read_footers,
        "file string, n_rows long, col_name string, min_val string, max_val string",
    )


def pruning_fraction(
    stats: DataFrame, col: str, lo: float, hi: float
) -> float:
    """Fraction of files a numeric range predicate ``col BETWEEN lo AND
    hi`` can SKIP by footer min/max alone (the measurable payoff of
    :func:`write_zordered`). Files lacking stats count as unprunable."""
    s = stats.where(F.col("col_name") == col)
    total = s.count()
    if total == 0:
        raise ValueError(f"pruning_fraction: no stats for column {col}")
    prunable = s.where(
        F.col("min_val").isNotNull()
        & (
            (F.col("max_val").cast("double") < lo)
            | (F.col("min_val").cast("double") > hi)
        )
    ).count()
    return prunable / total


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

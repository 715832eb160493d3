"""Single-pass table profiling: per-column stats for data-quality
monitoring of ingest batches.

The reference exposes no profiling surface; large-scale pipelines need
one (row counts, null rates, cardinality and value ranges are the
standard pre-training-corpus health checks). Spark-first shape: ALL
columns' aggregates ride ONE ``df.agg(...)`` pass — a single scan, a
single partial/final HashAggregate pair — and the wide 1-row result is
unpivoted driver-side-free with ``stack`` into the long
``(col_name, stat...)`` form.

Scale note: ``exact=True`` computes exact distinct counts per column.
Spark plans k simultaneous COUNT(DISTINCT) via an Expand node that
replicates every input row k times before the partial aggregate — a
k× map-side blowup that is fine at audit scale but is the wrong
default for a 100 TB scan, so ``exact=False`` (the default) uses
``approx_count_distinct`` (HLL++, one pass, no Expand, mergeable
sketches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Output schema of :func:`profile_table` (stack() emits this order).
PROFILE_COLUMNS = (
    "col_name",
    "n_nonnull",
    "n_null",
    "n_distinct",
    "min_val",
    "max_val",
)


def profile_table(
    df: DataFrame, cols: list[str] | None = None, *, exact: bool = False
) -> DataFrame:
    """One row of profile stats per requested column, in ONE scan.

    ``min_val`` / ``max_val`` are computed on the native type (so
    numeric columns order numerically, not lexically) and cast to
    string afterwards, giving the long output a uniform schema across
    heterogeneous column types.
    """
    cols = cols or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    # Intermediate aliases are POSITIONAL (__c{i}_*) so arbitrary
    # column names (spaces, dots, quotes — all legal in Spark) never
    # leak into an identifier; the original name appears only as an
    # escaped string literal in the stack output.
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(cols):
        # backtick-quote: a dotted name must resolve as ONE column, not
        # a struct path (backticks in the name itself double-escape)
        col = F.col("`" + c.replace("`", "``") + "`")
        distinct_of = (
            F.count_distinct(col) if exact else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(col).alias(f"__c{i}_cnt"),
            distinct_of.alias(f"__c{i}_nd"),
            F.min(col).cast("string").alias(f"__c{i}_min"),
            F.max(col).cast("string").alias(f"__c{i}_max"),
        ]
    wide = df.agg(*aggs)

    # Unpivot the 1-row wide result with stack(): stays a projection
    # over the aggregate, no second action, no driver round-trip.
    def lit_name(c: str) -> str:
        return "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

    groups = ", ".join(
        f"{lit_name(c)}, __c{i}_cnt, __total - __c{i}_cnt, "
        f"__c{i}_nd, __c{i}_min, __c{i}_max"
        for i, c in enumerate(cols)
    )
    stacked = wide.select(
        F.expr(
            f"stack({len(cols)}, {groups}) AS "
            f"({', '.join(PROFILE_COLUMNS)})"
        )
    )
    return stacked


def profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle rendering of :func:`profile_table(exact=True)` —
    one UNION ALL branch per column over the same single logical
    aggregation (DuckDB shares the scan across branches)."""
    branches = []
    for c in cols:
        branches.append(
            f"SELECT '{c}' AS col_name, count({c}) AS n_nonnull, "
            f"count(*) - count({c}) AS n_null, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"CAST(min({c}) AS VARCHAR) AS min_val, "
            f"CAST(max({c}) AS VARCHAR) AS max_val FROM {table}"
        )
    return " UNION ALL ".join(branches)


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Robust per-group anomaly profile: median, MAD (median absolute
    deviation), and the count/fraction of values farther than
    ``k * MAD`` from the median — the outlier detector that, unlike
    mean/stddev z-scores, is not itself dragged by the outliers it is
    trying to find (50% breakdown point). The data-quality gate a
    training pipeline runs per source/type before trusting a feed.

    Portability contract: the median and MAD are ROUNDED to
    ``round_to`` decimals before the threshold comparison, so the
    outlier rule is a pure function of (value, rounded stats) and
    replays exactly in the DuckDB oracle (both engines interpolate
    quantiles as lower + (higher-lower)*frac in IEEE doubles; rounding
    removes the residual ULP exposure at the comparison boundary).

    Plan: two shrinking percentile aggregates over the group key plus
    one re-join of the raw rows (AQE broadcasts the per-group stats —
    rows = |groups|, dimension-sized); exact percentiles sort within
    the aggregation buffer per group. At 100 TB swap
    ``F.percentile`` for ``percentile_approx`` at the call site if
    group cardinality x values per group exceeds executor memory —
    the operator shape is unchanged.
    """
    e = df.where(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(group_col, value_col)
    med = e.groupBy(group_col).agg(
        F.round(F.percentile(value_col, F.lit(0.5)), round_to).alias("med")
    )
    dev = e.join(med, group_col).withColumn(
        "__ad", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.min("med").alias("med"),
        F.round(F.percentile("__ad", F.lit(0.5)), round_to).alias("mad"),
    )
    flagged = dev.drop("med").join(mad, group_col)
    return flagged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("med").alias("median"),
        F.min("mad").alias("mad"),
        F.sum(
            F.when(F.col("__ad") > F.lit(float(k)) * F.col("mad"), 1)
            .otherwise(0)
        ).alias("n_outliers"),
        F.round(
            F.sum(
                F.when(F.col("__ad") > F.lit(float(k)) * F.col("mad"), 1)
                .otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            round_to,
        ).alias("outlier_frac"),
    )

"""A/B: linear boundary fold vs binary-search bucketing in
operators/ranking.py (round-14 change).

The bucket expression assigns each row |{t in boundaries : t < v}|.
The old implementation folded over the WHOLE boundary array
(O(n_buckets) comparisons per row); the new one binary-searches it
(O(log2 n_buckets)). At the default local n_buckets=32 the difference
is noise; on a cluster where n_buckets tracks parallelism (thousands)
the fold is per-row work that scales with cluster width. This script
times BOTH expressions over the SAME broadcast boundary array in ONE
Spark session at n_buckets in {32, 512, 2048}, verifies they agree
bit-for-bit (count of mismatching rows == 0), and writes the record
to AB_rank_bucketing_r14.json.

    python tools/ab_rank_bucketing.py [--rows N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hrtech_etl_spark.core.session import get_spark  # noqa: E402


from hrtech_etl_spark.operators.ranking import (  # noqa: E402
    _bsearch_bucket_expr,
    _fold_bucket_expr,
)


def fold_bucket(vd, n_buckets):
    """The A side — ranking.py's own linear fold (its small-n path),
    imported so the tool always measures the shipped expression."""
    return _fold_bucket_expr(vd, F.coalesce("__bnds", F.array()))


def bsearch_bucket(vd, n_buckets):
    """The B side — ranking.py's own binary search (its large-n path)."""
    barr = F.coalesce("__bnds", F.array())
    return _bsearch_bucket_expr(vd, barr, F.size(barr), n_buckets)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    args = ap.parse_args()
    # captured BEFORE the JVM even starts — see the record comment
    loadavg_start = round(os.getloadavg()[0], 2)

    spark = get_spark(app_name="ab-rank-bucketing")
    df = spark.range(args.rows).select(
        F.col("id"), (F.col("id") % 997_001).cast("double").alias("value")
    )
    vd = F.col("value")
    # START loadavg: the tool self-loads the host by its end, so only
    # the pre-run value signals whether the record is clean
    record: dict = {
        "rows": args.rows,
        "loadavg_start": loadavg_start,
        "points": [],
    }
    for n_buckets in (32, 512, 2048):
        qs = [i / n_buckets for i in range(1, n_buckets)]
        bnd = df.agg(
            F.percentile_approx(vd, F.lit(qs), F.lit(1000)).alias("__bnds")
        ).localCheckpoint()  # boundaries computed ONCE, outside the timers
        b = df.crossJoin(F.broadcast(bnd))

        def run(expr_fn):
            # checksum aggregate forces full evaluation of the bucket
            # expression over every row with negligible downstream work
            out = b.select(expr_fn(vd, n_buckets).alias("__rb"))
            t0 = time.time()
            row = out.agg(
                F.sum("__rb").alias("s"), F.max("__rb").alias("m")
            ).collect()[0]
            return time.time() - t0, (row["s"], row["m"])

        run(fold_bucket)  # warm the input scan + broadcast
        fold_t, fold_chk = run(fold_bucket)
        bs_t, bs_chk = run(bsearch_bucket)
        mismatch = (
            b.select(
                fold_bucket(vd, n_buckets).alias("a"),
                bsearch_bucket(vd, n_buckets).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .count()
        )
        assert mismatch == 0, f"bucketing disagrees at n_buckets={n_buckets}"
        assert fold_chk == bs_chk
        point = {
            "n_buckets": n_buckets,
            "fold_sec": round(fold_t, 3),
            "bsearch_sec": round(bs_t, 3),
            "speedup": round(fold_t / bs_t, 2) if bs_t else None,
            "mismatching_rows": mismatch,
        }
        record["points"].append(point)
        print(point, flush=True)

    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "AB_rank_bucketing_r14.json"), "w"
    ) as fh:
        json.dump(record, fh, indent=2)
    print("wrote AB_rank_bucketing_r14.json", flush=True)


if __name__ == "__main__":
    main()

"""Ad-hoc corpus-scale smokes (not part of the pytest suite): replicate
the sf0.1 documents table ``--copies`` times (default 20× → 100k docs
with heavy planted duplication — every doc has copies-1 exact twins)
and drive the corpus-scale dedup paths end to end with all knobs on:

1. full-corpus ``drop_near_duplicates`` (stop-shingle removal,
   band-bucket cap, accelerated clustering) — must collapse to ~the
   base-corpus cluster count with no driver blow-up;
2. ``lsh_index`` build persisted to parquet (the ingest-loop artifact);
3. a replica ingest batch (the worst case: every batch doc matches
   ``copies`` indexed near-twins) cleaned against the stored index via
   ``drop_near_duplicates_incremental`` — every doc must be dropped.

Prints one timing line per stage; run on a quiet host and compare
against the numbers recorded in README.md §Verification.

    python tools/scale_smoke.py [--sf-dir DIR] [--copies N]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hrtech_etl_spark.core.session import get_spark  # noqa: E402
from hrtech_etl_spark.functions import dedup as dd  # noqa: E402
from hrtech_etl_spark.sources.testdata import load_table  # noqa: E402

#: id stride between replicas — far above any real doc_id
STRIDE = 10_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=5_000)
    args = ap.parse_args()

    spark = get_spark(app_name="hrtech-etl-spark-scale-smoke")
    docs = load_table(spark, "documents", args.sf_dir).select("doc_id", "text")
    n_base = docs.count()

    corpus = (
        docs.crossJoin(
            spark.range(args.copies).select(F.col("id").alias("__copy"))
        )
        .select(
            (F.col("doc_id") + F.col("__copy") * STRIDE).alias("doc_id"),
            "text",
        )
    )
    n_corpus = corpus.count()
    print(f"corpus: {n_base} base docs x {args.copies} = {n_corpus} rows")

    t0 = time.time()
    kept = dd.drop_near_duplicates(
        corpus,
        "text",
        "doc_id",
        threshold=0.5,
        stop_shingle_frac=0.5,
        max_bucket_size=500,
        accelerate=True,
    ).count()
    dt = time.time() - t0
    print(
        f"full dedup: {n_corpus} -> {kept} kept in {dt:.1f}s "
        f"({n_corpus / dt:,.0f} docs/s)"
    )

    root = tempfile.mkdtemp(prefix="scale_smoke_")
    try:
        t0 = time.time()
        dd.lsh_index(corpus, "text", "doc_id").write.parquet(f"{root}/index")
        print(f"lsh_index build+write: {time.time() - t0:.1f}s")
        idx = spark.read.parquet(f"{root}/index")

        # worst-case ingest batch: a full replica of base content (every
        # doc near-matches `copies` indexed twins); ids disjoint again
        batch = docs.limit(args.batch_size).select(
            (F.col("doc_id") + F.lit((args.copies + 1) * STRIDE)).alias(
                "doc_id"
            ),
            "text",
        )
        nb = batch.count()
        t0 = time.time()
        survivors = dd.drop_near_duplicates_incremental(
            batch, idx, "text", "doc_id", threshold=0.5
        ).count()
        dt = time.time() - t0
        print(
            f"incremental clean: {nb}-doc replica batch -> {survivors} "
            f"survivors in {dt:.1f}s (expect ~0 survivors)"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

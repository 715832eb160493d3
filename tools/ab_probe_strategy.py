"""A/B: signature_probe_pairs join strategies on the CORPUS-stage
shape (round 16 — the measurement behind the r15 ADVICE adjudication
that switched prepare_training_corpus' external-signature probe from
the micro-batch broadcast-the-batch default to the always-safe
shuffled band join).

Fixture mirrors capstone v3's federated stage at sf0.1: the released
slice (doc_id % 10 = 5) signs and PERSISTS as the store; the rest of
the corpus signs live as the "batch" side — i.e. the side that is
unbounded in production and whose forced broadcast was the ADVICE's
driver-fatal scenario. All three strategies must produce identical
pairs; timings are min/median of --reps warm runs in ONE session.

    python tools/ab_probe_strategy.py [--sf-dir DIR] [--reps N]

Writes AB_probe_strategy_r16.json (loadavg_start recorded BEFORE the
JVM launches — the A/B tools self-load the host by their end, so only
the start value signals a clean record).
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
from hrtech_etl_spark.functions.dedup import (  # noqa: E402
    minhash_signature_table,
    read_signature_table,
    signature_probe_pairs,
    write_signature_table,
)
from hrtech_etl_spark.sources.testdata import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    loadavg_start = round(os.getloadavg()[0], 2)

    import tempfile

    spark = get_spark(app_name="ab-probe-strategy")
    docs = load_table(spark, "documents", args.sf_dir)
    released = docs.where(F.col("doc_id") % 10 == 5).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 != 5).select("doc_id", "text")

    root = tempfile.mkdtemp(prefix="ab_probe_")
    store_path = os.path.join(root, "released_sigs")
    write_signature_table(
        minhash_signature_table(released, "text", "doc_id"), store_path
    )
    store = read_signature_table(spark, store_path)
    # the corpus side is signed ONCE and pinned — the A/B times the
    # PROBE strategies, not the signature computation they share
    bsig = minhash_signature_table(corpus, "text", "doc_id").localCheckpoint(
        eager=True
    )

    def run(strategy: str):
        return signature_probe_pairs(
            store, bsig, "doc_id", threshold=0.5, broadcast=strategy
        )

    # value identity FIRST: all strategies must agree pair-for-pair
    base = run("none")
    record = {
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "loadavg_start": loadavg_start,
        "n_store": store.count(),
        "n_batch": bsig.count(),
        "timings": {},
    }
    for name in ("batch", "store"):
        fr = run(name)
        extra = fr.exceptAll(base).count()
        missing = base.exceptAll(fr).count()
        assert extra == 0 and missing == 0, (
            f"{name} disagrees with 'none': +{extra}/-{missing} pairs"
        )
    record["pairs_identical"] = True
    record["n_pairs"] = base.count()

    for name in ("none", "store", "batch"):
        fr = run(name)
        fr.agg(F.count(F.lit(1)), F.sum("est_jaccard")).collect()  # warm
        runs = []
        for _ in range(args.reps):
            t0 = time.time()
            run(name).agg(
                F.count(F.lit(1)), F.sum("est_jaccard")
            ).collect()
            runs.append(round(time.time() - t0, 3))
        record["timings"][name] = {
            "runs": runs,
            "min": min(runs),
            "median": sorted(runs)[len(runs) // 2],
        }
        print(name, record["timings"][name], flush=True)
    shipped = record["timings"]["none"]["min"]
    for name in ("store", "batch"):
        record["timings"][name]["speedup_vs_shipped"] = round(
            shipped / record["timings"][name]["min"], 2
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "AB_probe_strategy_r16.json",
    )
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()

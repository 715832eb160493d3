"""Replayable equivalence audit for the round-12 oracle restatements.

Commit 2552ac9 rewrote eight DuckDB oracle statements for speed (9x
sweep cut), claiming each rewrite value-identical to the statement it
replaced. The r12 verdict accepted the spot-checks but asked for a
COMMITTED artifact a future judge can replay without re-deriving the
old SQL from git history. This tool is that artifact's generator:

1. extracts the ORACLE SQL of both sides from git — old = the parent
   commit (``--old-ref``, default 2552ac9^), new = the restatement
   commit (``--new-ref``, default 2552ac9) — by `git archive`-ing each
   tree into a temp dir and importing its registry in a subprocess
   (the SQL strings are f-strings assembled at import time, so text
   diffing the source would not prove anything about the statements
   actually executed);
2. runs BOTH statements in the same DuckDB session over the same
   parquet views at each ``--sf-dir``;
3. compares row count, sorted column names, and the same
   order-insensitive canonical value hash the driver's gate uses
   (imported from tools/oracle_check.py, not re-implemented);
4. writes RESTATEMENT_AUDIT.json with per-entry {old_hash, new_hash,
   equal, rows, seconds} — committed at the repo root.

Usage:
    python tools/restatement_audit.py \
        [--sf-dirs /root/testdata/sf0.01,/root/testdata/sf0.1] \
        [--entries a,b,...] [--json RESTATEMENT_AUDIT.json]

Notes: the entry list defaults to the eight restated names from the
2552ac9 commit message. The audit compares the two HISTORICAL trees —
it stays valid even after later rounds change an entry's semantics on
purpose (round 13 moved dedup_clusters onto banded-LSH candidates;
that change is gated by the live oracle_check, not by this audit).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools.oracle_check import result_hash

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RESTATED = [
    "join_fuzzy_editdist",
    "dedup_clusters",
    "corpus_leakage_safe_split",
    "dedup_ngram_jaccard",
    "corpus_prepare_training",
    "corpus_pack_ffd",
    "dedup_minhash_lsh",
    "dedup_decontaminate",
]

_DUMP_SNIPPET = """
import json, sys
sys.path.insert(0, sys.argv[1])
from hrtech_etl_spark.workload import REGISTRY
names = json.loads(sys.argv[2])
print(json.dumps({n: REGISTRY[n].sql for n in names if n in REGISTRY}))
"""


def sqls_at_ref(ref: str, names: list[str]) -> dict[str, str]:
    """{entry: oracle SQL} as ASSEMBLED by the tree at ``ref``."""
    with tempfile.TemporaryDirectory(prefix=f"restate_{ref.replace('^','p')}_") as td:
        subprocess.run(
            f"git -C {REPO} archive {ref} | tar -x -C {td}",
            shell=True,
            check=True,
        )
        out = subprocess.run(
            [sys.executable, "-c", _DUMP_SNIPPET, td, json.dumps(names)],
            check=True,
            capture_output=True,
            text=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-ref", default="2552ac9^")
    ap.add_argument("--new-ref", default="2552ac9")
    ap.add_argument(
        "--sf-dirs", default="/root/testdata/sf0.01,/root/testdata/sf0.1"
    )
    ap.add_argument("--entries", default=",".join(RESTATED))
    ap.add_argument("--json", default=os.path.join(REPO, "RESTATEMENT_AUDIT.json"))
    args = ap.parse_args()
    names = args.entries.split(",")

    old_sql = sqls_at_ref(args.old_ref, names)
    new_sql = sqls_at_ref(args.new_ref, names)

    from hrtech_etl_spark.core.schemas import TESTDATA_TABLES

    report: dict = {
        "old_ref": args.old_ref,
        "new_ref": args.new_ref,
        "entries": {},
    }
    ok = True
    for sf_dir in args.sf_dirs.split(","):
        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            if name not in old_sql or name not in new_sql:
                report["entries"].setdefault(name, {})[sf_dir] = {
                    "status": "missing-at-ref"
                }
                ok = False
                continue
            rec: dict = {}
            for side, sql in (("old", old_sql[name]), ("new", new_sql[name])):
                t0 = time.time()
                cur = con.execute(sql)
                cols = [d[0] for d in cur.description]
                rows = cur.fetchall()
                rec[side] = {
                    "rows": len(rows),
                    "cols": sorted(cols),
                    "hash": result_hash(cols, rows),
                    "sec": round(time.time() - t0, 2),
                }
            rec["equal"] = (
                rec["old"]["rows"] == rec["new"]["rows"]
                and rec["old"]["cols"] == rec["new"]["cols"]
                and rec["old"]["hash"] == rec["new"]["hash"]
            )
            ok = ok and rec["equal"]
            report["entries"].setdefault(name, {})[sf_dir] = rec
            mark = "=" if rec["equal"] else "!"
            print(
                f"{mark} {name} @ {os.path.basename(sf_dir)}: "
                f"old {rec['old']['rows']}r/{rec['old']['sec']}s "
                f"new {rec['new']['rows']}r/{rec['new']['sec']}s "
                f"hash {'EQUAL' if rec['equal'] else 'DIFFERS'}"
            )
        con.close()

    report["all_equal"] = ok
    with open(args.json, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    print(("ALL EQUAL" if ok else "MISMATCH") + f" -> {args.json}")
    return 0 if ok else 1


if __name__ == "__main__":
    main()

"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables; compares row count, sorted
column names, and an order-insensitive canonical value hash. Exits
non-zero on any mismatch.

Usage: python tools/oracle_check.py [--sf-dir /root/testdata/sf0.01] [--only q1,q2]

Per-entry wall time over ``--budget-sec`` (default 30) prints a
``! SLOW`` warning (non-fatal) so runtime growth of the heaviest gates
stays visible; ``--json OUT`` writes the full per-entry record
(status/rows/seconds) for committing as reproducible evidence.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from hrtech_etl_spark.core.schemas import TESTDATA_TABLES
from hrtech_etl_spark.core.session import get_spark
from hrtech_etl_spark.workload import REGISTRY


def canon(v) -> str:
    """Canonical string form of a value for hashing (both engines'
    Python values funnel through this)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps full precision; both sides produce identical doubles
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def result_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument(
        "--registry-order",
        action="store_true",
        help="run queries in REGISTRY insertion order (the driver's "
        "order) instead of alphabetically — catches session-state "
        "leaks between queries that alphabetical order would mask",
    )
    ap.add_argument(
        "--budget-sec",
        type=float,
        default=30.0,
        help="warn (non-fatal) when a single entry exceeds this wall "
        "time — keeps the heaviest gates' growth visible",
    )
    ap.add_argument(
        "--json",
        default=None,
        metavar="OUT",
        help="write the per-entry record (status/rows/seconds) as JSON",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="oracle-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    items = list(qs.items()) if args.registry_order else sorted(qs.items())
    failures, passed, weak, slow = [], 0, 0, []
    record: list[dict] = []

    def note(
        name: str,
        status: str,
        rows: int | None,
        t0: float,
        spark_sec: float | None = None,
        oracle_sec: float | None = None,
    ) -> float:
        """Per-entry record with the Spark and DuckDB shares SPLIT
        (round-17 verdict #6): sweep seconds include the cold-session
        Spark run AND the DuckDB oracle replay — an unsplit >30s flag
        kept pointing at Spark code that was not slow (e.g.
        text_token_stats: 0.5s benched, 13s swept — the recursive-CTE
        oracle owns the difference)."""
        dt = time.time() - t0
        entry = {"name": name, "status": status, "rows": rows, "sec": round(dt, 2)}
        if spark_sec is not None:
            entry["spark_sec"] = round(spark_sec, 2)
        if oracle_sec is not None:
            entry["oracle_sec"] = round(oracle_sec, 2)
        record.append(entry)
        if dt > args.budget_sec:
            slow.append((name, dt))
            split = ""
            if spark_sec is not None:
                split = f" (spark {spark_sec:.1f}s"
                if oracle_sec is not None:
                    # the residual (row sorting + value hashing on the
                    # driver) is printed too, so a compare-phase-bound
                    # entry cannot masquerade as a timing bug
                    rest = max(dt - spark_sec - oracle_sec, 0.0)
                    split += f" + oracle {oracle_sec:.1f}s + compare {rest:.1f}s)"
                else:
                    split += ")"
            print(
                f"! SLOW {name}: {dt:.1f}s exceeds the "
                f"{args.budget_sec:.0f}s per-entry budget{split}"
            )
        return dt

    for name, fn in items:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, args.sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            note(name, "spark-error", None, t0)
            print(f"✗ {name}: spark error: {str(e).splitlines()[0][:150]}")
            continue
        spark_sec = time.time() - t0
        if name not in oracles:
            weak += 1
            dt = note(name, "rows-only", len(srows), t0, spark_sec)
            print(f"~ {name}: rows-only ({len(srows)} rows) [{dt:.1f}s]")
            continue
        t_oracle = time.time()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            note(name, "duckdb-error", len(srows), t0, spark_sec)
            print(f"✗ {name}: duckdb error: {str(e).splitlines()[0][:150]}")
            continue
        oracle_sec = time.time() - t_oracle

        problems = []
        if len(srows) == 0 and len(drows) == 0:
            # a 0-row "match" pins only empty==empty — the round-10
            # verdict's vacuous-gate finding; no declared entry
            # legitimately returns an empty result at any gate SF
            problems.append("vacuous gate: both engines returned 0 rows")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        hash_exempt = name in REGISTRY and REGISTRY[name].hash_exempt
        if not problems and hash_exempt:
            # shape-matched oracle with intentionally different values
            # (e.g. HLL++ estimate vs exact count): rows+schema gated
            # above, value hash skipped by declaration
            weak += 1
            dt = note(name, "rows+schema", len(srows), t0, spark_sec, oracle_sec)
            print(f"~ {name}: rows+schema, hash-exempt ({len(srows)} rows) [{dt:.1f}s]")
            continue
        if not problems:
            sh, dh = result_hash(scols, srows), result_hash(dcols, drows)
            if sh != dh:
                problems.append(f"value hash {sh} vs {dh}")
                if args.verbose:
                    so = sorted(range(len(scols)), key=lambda i: scols[i])
                    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                    sset = sorted("|".join(canon(r[i]) for i in so) for r in srows)
                    dset = sorted("|".join(canon(r[i]) for i in do) for r in drows)
                    for a, b in list(zip(sset, dset))[:2000]:
                        if a != b:
                            print(f"    spark : {a[:200]}\n    duckdb: {b[:200]}")
                            break
        if problems:
            failures.append((name, "; ".join(problems)))
            dt = note(name, "mismatch", len(srows), t0, spark_sec, oracle_sec)
            print(f"✗ {name}: {'; '.join(problems)} [{dt:.1f}s]")
        else:
            passed += 1
            dt = note(name, "pass", len(srows), t0, spark_sec, oracle_sec)
            print(f"✓ {name} ({len(srows)} rows) [{dt:.1f}s]")

    print(f"\n{passed} passed, {len(failures)} failed, {weak} rows-only")
    if slow:
        worst = ", ".join(f"{n} {t:.1f}s" for n, t in slow)
        print(
            f"{len(slow)} over the {args.budget_sec:.0f}s budget: {worst}"
        )
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "registry_order": args.registry_order,
                    "budget_sec": args.budget_sec,
                    "passed": passed,
                    "failed": len(failures),
                    "rows_only": weak,
                    "entries": record,
                },
                fh,
                indent=1,
            )
            fh.write("\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

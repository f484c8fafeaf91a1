"""Local replica of the driver's correctness gate.

Runs each registered query through Spark AND its DuckDB oracle at sf0.01,
compares row count, column names, and an order-insensitive value hash
(rows sorted after sorting columns by name; floats normalized via repr of
round(…, 6)). Usage:

    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
    python tools/check_oracle.py --json CORRECTNESS_LOCAL_r07.json

--json writes a per-query result file (status/rows/spark seconds/problems
per name, plus totals) — the committed per-round record of the FULL local
gate, covering the queries the driver's 50-name sample never draws (93 of
176 had never been driver-sampled as of r6; the verdicts' local 176/176
runs existed only as prose until this artifact)."""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == int(r) and abs(r) < 1e15:
            return repr(int(r))
        return repr(r)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "asDict"):
        d = v.asDict()
        return "{" + ",".join(f"{k}:{_norm(d[k])}" for k in sorted(d)) + "}"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--json", dest="json_path", default=None,
                    help="write per-query results to this JSON file")
    ap.add_argument(
        "--oracle-timeout", type=float, default=None,
        help="seconds before a DuckDB oracle is interrupted and the query"
        " recorded as 'oracle_timeout' (a documented tolerance row, not a"
        " failure: several oracles are EXACT all-pairs replays — O(n²)"
        " DuckDB-side by design — that certify at sf0.01 but grind for"
        " hours at sf0.1, e.g. q_dup_cluster_stats' 18M list-intersect"
        " pairs measured 30+ CPU-minutes without finishing; the Spark side"
        " still runs fully and its row count is recorded)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from data_rivers_spark.plans import registry
    from data_rivers_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="check_oracle")

    con = duckdb.connect()
    for tname in TABLES:
        path = os.path.join(args.sf_dir, f"{tname}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{path}')")

    names = args.names or sorted(registry.QUERIES)
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(registry.QUERIES)}")
        return 2
    def _release_new_rdds(keep: set) -> None:
        """bench.py's block-release discipline (bench.py:144): operators that
        localCheckpoint/persist internally (LSH bucketing, Lloyd loops, GD
        epochs) leave RDD blocks behind; across a 196-query gate session the
        accumulation inflates LATE queries' recorded spark_sec with GC
        pressure (r13 measured q_ivf_topk 14.5 s → 58.5 s across two
        back-to-back iterations in one JVM). Released after every query so
        gate timings stay comparable front-to-back."""
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keys()):
            if rid not in keep:
                jmap[rid].unpersist()

    failures = []
    results: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {"status": "fail", "error": f"spark: {e}"[:500]}
            failures.append(name)
            continue
        finally:
            _release_new_rdds(set())
        spark_t = time.time() - t0
        if name not in registry.ORACLES:
            print(f"weak  {name}: rows={len(srows)} (no oracle) [{spark_t:.1f}s]")
            results[name] = {"status": "weak", "rows": len(srows),
                             "spark_sec": round(spark_t, 2)}
            continue
        timer = None
        oracle_done = None
        try:
            if args.oracle_timeout:
                import threading

                # the interrupt only fires while THIS query's done-event is
                # unset: without the guard, a timer expiring in the window
                # between fetchall() returning and timer.cancel() would
                # interrupt the NEXT query and misrecord it as a timeout
                oracle_done = threading.Event()

                def _interrupt(done=oracle_done):
                    if not done.is_set():
                        con.interrupt()

                timer = threading.Timer(args.oracle_timeout, _interrupt)
                timer.start()
            res = con.execute(registry.ORACLES[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except duckdb.InterruptException:
            print(
                f"slow  {name}: oracle interrupted after"
                f" {args.oracle_timeout:.0f}s (exact replay is O(n²)"
                f" DuckDB-side at this sf; certified at sf0.01)."
                f" Spark ran: rows={len(srows)} [{spark_t:.1f}s]"
            )
            results[name] = {
                "status": "oracle_timeout", "rows": len(srows),
                "spark_sec": round(spark_t, 2),
                "note": "DuckDB oracle exceeded the per-query budget at"
                " this sf (exact all-pairs replay); hash-certified at"
                " sf0.01 in the same round's CORRECTNESS_LOCAL artifact",
            }
            continue
        except Exception as e:  # noqa: BLE001
            import re as _re

            # specific sentinel: every fixture guard ends its error() with
            # "violates q_<name>'s precondition" — a generic DuckDB error
            # that merely CONTAINS the word 'precondition' must still fail
            if _re.search(r"violates q_\w+'s precondition", str(e)):
                # an oracle's own fixture guard fired (e.g. q_char_lsh_dedup
                # refuses to certify an sf_dir with a true pair in the
                # [0.8,0.85) banded-recall sliver): the FIXTURE is outside
                # the oracle's certified envelope — a documented tolerance,
                # not an implementation mismatch
                print(f"guard {name}: oracle precondition: {e}")
                results[name] = {
                    "status": "oracle_precondition", "rows": len(srows),
                    "spark_sec": round(spark_t, 2),
                    "note": str(e)[:500],
                }
                continue
            print(f"FAIL  {name}: duckdb error: {e}")
            results[name] = {"status": "fail", "error": f"duckdb: {e}"[:500]}
            failures.append(name)
            continue
        finally:
            if oracle_done is not None:
                oracle_done.set()
            if timer is not None:
                timer.cancel()
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        elif value_hash(scols, srows) != value_hash(ocols, orows):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems and srows and orows:
                oi = sorted(range(len(ocols)), key=lambda i: ocols[i])
                si = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("\x01".join(_norm(r[i]) for i in si) for r in srows)
                oset = sorted("\x01".join(_norm(r[i]) for i in oi) for r in orows)
                sonly = [x for x in sset if x not in set(oset)][:3]
                oonly = [x for x in oset if x not in set(sset)][:3]
                for x in sonly:
                    print(f"        spark-only: {x[:200]!r}")
                for x in oonly:
                    print(f"        duck-only : {x[:200]!r}")
            failures.append(name)
            results[name] = {"status": "fail", "rows": len(srows),
                             "problems": problems,
                             "spark_sec": round(spark_t, 2)}
        else:
            print(f"ok    {name}: rows={len(srows)} [{spark_t:.1f}s]")
            results[name] = {"status": "ok", "rows": len(srows),
                             "spark_sec": round(spark_t, 2)}
    timeouts = [n for n, r in results.items() if r["status"] == "oracle_timeout"]
    guards = [n for n, r in results.items() if r["status"] == "oracle_precondition"]
    hard = len(names) - len(failures) - len(timeouts) - len(guards)
    tail = ""
    if timeouts:
        tail += f", {len(timeouts)} oracle-timeout (rows-only)"
    if guards:
        tail += f", {len(guards)} precondition-guard"
    print(f"\n{hard}/{len(names)} hash-verified{tail}; failures: {len(failures)}")
    if args.json_path:
        with open(args.json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "oracle_timeout_sec": args.oracle_timeout,
                    "total": len(names),
                    "hash_verified": hard,
                    "oracle_timeouts": timeouts,
                    "precondition_guards": guards,
                    "failures": failures,
                    "queries": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {args.json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

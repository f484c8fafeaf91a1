"""Plan-level recompute audit across every registered query.

Usage: python tools/audit_plans.py [sf_dir]

DataFrame reuse is lineage reuse, not computation reuse: a frame consumed
by two downstream operators re-plans its whole subtree per consumer unless
it is materialized (localCheckpoint) or Spark happens to emit a
ReusedExchange. That defect class has now appeared twice (the LSH shingle
frame in round 2, the unigram LM frame in round 3), so this tool makes it
visible for the WHOLE registry: for each query it counts parquet-scan
nodes per table in the final physical plan and prints any query that scans
one table more than once. Multiple scans are not automatically wrong
(self-joins, union fixtures, planted-copy constructions scan twice by
design), so the output is a review list, not a gate — but every entry
should have a known reason.
"""

from __future__ import annotations

import io
import os
import re
import sys

from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from data_rivers_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="audit_plans")
    queries = entry.queries()
    flagged: list[tuple[str, dict[str, int]]] = []
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            print(f"ERR   {name}: {e}")
            continue
        tables = Counter(
            m.group(1)
            for m in re.finditer(r"Location:.*?/(\w+)\.parquet\b", plan)
        )
        dupes = {t: n for t, n in tables.items() if n > 1}
        if dupes:
            flagged.append((name, dupes))
    for name, dupes in flagged:
        print(f"multi  {name}: " + ", ".join(f"{t}x{n}" for t, n in sorted(dupes.items())))
    print(f"\n{len(flagged)}/{len(queries)} queries scan some table more than once")


if __name__ == "__main__":
    main()

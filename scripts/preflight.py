"""One-command pre-driver check, the per-round routine from README:

1. entry() smoke (driver t1) at sf0.001;
2. full DuckDB oracle gate at sf0.01 (driver t2, driver-strict
   comparator from hello_flink_spark.oracle);
3. bench.py JSON emit parse check (driver t3) — without timing runs.

Run: python scripts/preflight.py              # full gate (~1-2 min)
     python scripts/preflight.py q1 q2 ...    # subset of queries
     python scripts/preflight.py --window 50  # the prospective driver
                                              # window head (first N of
                                              # registry.all_specs(),
                                              # pins + staleness order)
Exits non-zero on any failure.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import __spark_entry__ as E

    from hello_flink_spark.oracle import run_all
    from hello_flink_spark.session import get_spark

    args = sys.argv[1:]
    if args and args[0] == "--window":
        # mirror the PROSPECTIVE driver window: the first N names of
        # the rotation ordering (pins + staleness), exactly what the
        # driver will evaluate next round — replaces the per-round
        # manual "compute the window head" step (round-17 protocol).
        from hello_flink_spark.registry import all_specs

        n = int(args[1]) if len(args) > 1 else 50
        names = list(all_specs())[:n]
        print(f"[window] mirroring the first {len(names)} rotation "
              f"slots, head: {names[:4]}", flush=True)
    else:
        names = args or None
    spark = get_spark("preflight")

    rows = E.entry(spark).collect()
    print(f"[1/3] entry smoke: {len(rows)} rows", flush=True)
    assert rows, "entry() returned no rows"

    t0 = time.time()
    bad = n = 0
    for r in run_all(spark, "/root/testdata/sf0.01", names=names):
        n += 1
        if not r.ok:
            bad += 1
            print(f"  FAIL {r.name}: {r.detail[:200]}")
    print(f"[2/3] oracle gate sf0.01: {n} queries, {bad} failures, "
          f"{time.time() - t0:.0f}s", flush=True)

    import os

    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--repeat", "1",
         "--queries", "flagship_pricing_summary"],
        capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001"},
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    parsed = None
    try:
        parsed = json.loads(line)
    except Exception:
        pass
    ok = bool(parsed and parsed.get("metric"))
    print(f"[3/3] bench JSON parse: {'ok' if ok else 'FAIL: ' + line[:200]}")

    return 1 if (bad or not ok) else 0


if __name__ == "__main__":
    sys.exit(main())

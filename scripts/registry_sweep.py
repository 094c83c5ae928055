"""Full-registry runtime sweep at a given scale factor (default sf0.1).

The driver's correctness gate and the local parity suite execute every
registered query at sf0.01; the bench suite times 30 representative rows
at sf0.1.  This script closes the gap between the two: it RUNS all 217
registered queries at sf0.1 (10× the parity data) and records per-query
wall time and output row count — the cheap empirical half of the
"would this survive a scale-up?" question that the source-level plan
audits (PLANS.md) answer analytically.  A query that is green at sf0.01
but explodes at sf0.1 (candidate fan-out, per-key state, uncapped
window) shows up here long before it would hurt at 100 TB.

Output: one JSON line per query appended to ``$SWEEP_OUT`` (default
``/tmp/registry_sweep.jsonl``): ``{"name", "sec", "rows"}`` or
``{"name", "err"}``.  Already-recorded names are SKIPPED on re-run, so
the sweep is resumable across sessions; delete the file for a fresh
sweep.  Row counts are forced with ``.count()`` (executes the full
upstream plan; aggregate-heavy queries cannot short-circuit it).

Usage: ``python scripts/registry_sweep.py [--only name1,name2]``
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SWEEP_OUT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.environ.get("SWEEP_OUT", "/tmp/registry_sweep.jsonl")


def main() -> None:
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {json.loads(ln)["name"] for ln in f if ln.strip()}

    import __spark_entry__ as entrymod
    from gotrackmaster_spark.session import get_session

    spark = get_session("registry-sweep", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = [n for n in qs if (only is None or n in only) and n not in done]
    print(f"sweeping {len(names)} queries at {SF_DIR} ({len(done)} already recorded)")
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            rows = qs[name](spark, SF_DIR).count()
            rec = {"name": name, "sec": round(time.perf_counter() - t0, 2), "rows": rows}
        except Exception as e:  # noqa: BLE001 — a sweep must survive one bad row
            rec = {"name": name, "err": f"{type(e).__name__}: {e}"[:500]}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{i}/{len(names)}]", json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

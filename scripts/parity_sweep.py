"""Full-registry HASH-parity sweep at a given scale factor (default sf0.1).

The driver's correctness gate and `tests/test_oracle_parity.py` verify
every registered query against its DuckDB oracle at sf0.01; the runtime
sweep (`registry_sweep.py`) proves all 217 queries EXECUTE at sf0.1 but
not that their values still match.  This script closes that gap: the
full driver-style comparison (row count, sorted column names, typed
values to 9 significant digits) for every (query, oracle) pair at 10×
the driver's data — the evidence class where scale-dependent bugs live
(caps and thresholds that only trip on bigger data, quantization
overflow, per-group fan-out changing join cardinality).

Reuses the comparison helpers from tests/test_oracle_parity.py verbatim
(single source of truth for the compare semantics); that module reads
``ORACLE_SF_DIR`` at import, which this script sets first.

Output: one JSON line per query appended to ``$PARITY_OUT`` (default
``/tmp/parity_sweep.jsonl``): ``{"name", "ok": true, "rows", "sec"}``
or ``{"name", "ok": false, "why"}`` or ``{"name", "err"}``.  Recorded
names are skipped on re-run (resumable); delete the file for a fresh
sweep.  Rows-only queries (no oracle) get the non-degeneracy check only,
mirroring the driver's weaker gate for them.

Usage: ``python scripts/parity_sweep.py [--only name1,name2] [--skip n1,n2]``
(``--skip`` defers names to a later patient pass — e.g. the
permutation/point-pattern oracles, whose DuckDB twins are cell-banded
pair joins that grow ~100× at sf0.1 and run minutes-to-hours
single-process; skipping them lets the cheap majority record first.)
Env: PARITY_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), PARITY_OUT.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.1")
os.environ["ORACLE_SF_DIR"] = SF_DIR
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.environ.get("PARITY_OUT", "/tmp/parity_sweep.jsonl")


def main() -> None:
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))

    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {json.loads(ln)["name"] for ln in f if ln.strip()}

    import test_oracle_parity as tp  # noqa: E402 — shared compare semantics

    from gotrackmaster_spark.session import get_session

    spark = get_session("parity-sweep", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    names = [
        n for n in tp.QUERIES
        if (only is None or n in only) and n not in done and n not in skip
    ]
    print(f"parity-sweeping {len(names)} queries at {SF_DIR} ({len(done)} recorded)")
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            df = tp.QUERIES[name](spark, SF_DIR)
            spark_cols = df.columns
            spark_data = [tuple(r) for r in df.collect()]
            # The non-degeneracy guard is CALIBRATED for sf0.01 (the
            # driver's scale); at other SFs a grouped result can
            # legitimately collapse (e.g. near-dup components merging
            # into one at 10× density).  Record it as a note and still
            # compare values — value parity is what this sweep proves.
            degenerate_note = None
            try:
                tp._assert_nondegenerate(name, spark_cols, spark_data)
            except AssertionError as ae:
                degenerate_note = str(ae)[:200]
            if name not in tp.ORACLES:
                rec = {
                    "name": name, "ok": True, "rows": len(spark_data),
                    "rows_only": True,
                    "sec": round(time.perf_counter() - t0, 2),
                }
                if degenerate_note:
                    rec["degenerate_at_sf"] = degenerate_note
            else:
                con = tp._duck()
                cur = con.execute(tp.ORACLES[name])
                duck_cols = [d[0] for d in cur.description]
                duck_data = cur.fetchall()
                why = None
                if sorted(spark_cols) != sorted(duck_cols):
                    why = f"columns {spark_cols} vs {duck_cols}"
                elif len(spark_data) != len(duck_data):
                    why = f"rows {len(spark_data)} vs {len(duck_data)}"
                else:
                    s_rows = tp._rows(spark_cols, spark_data)
                    d_rows = tp._rows(duck_cols, duck_data)
                    bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
                    if bad:
                        why = f"value mismatch, first: {bad[:3]}"
                rec = (
                    {"name": name, "ok": True, "rows": len(spark_data),
                     "sec": round(time.perf_counter() - t0, 2)}
                    if why is None
                    else {"name": name, "ok": False, "why": why[:500]}
                )
                if degenerate_note and rec.get("ok"):
                    rec["degenerate_at_sf"] = degenerate_note
                con.close()
        except Exception as e:  # noqa: BLE001 — a sweep must survive one bad row
            rec = {"name": name, "err": f"{type(e).__name__}: {e}"[:500]}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{i}/{len(names)}]", json.dumps(rec)[:300], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Partition-invariance sweep: every registered query must produce
IDENTICAL values under radically different parallelism.

The DuckDB parity gates (driver, `test_oracle_parity.py`, sf0.1
`parity_sweep.py`) run Spark at ONE partitioning; a query could pass all
of them and still be partition-dependent — a double summed in partition
order, a `first()` without ordering, a per-partition counter leaking
into output.  At 1000 executors that class silently returns different
answers on every run.  This sweep pins the property the cluster needs:
run the FULL registry twice in separate JVMs —

  pass A: the bench shape (local[32], shuffle.partitions=32,
          default 128 MB input splits)
  pass B: a deliberately hostile shape (local[5],
          shuffle.partitions=7, 256 KB input splits → every parquet
          file fractures into many tiny tasks, openCostInBytes=0 so
          Spark actually packs them differently)

— normalize each result exactly like the driver compare (sorted column
names, sorted row tuples, floats to 9 significant digits via the shared
`tests/test_oracle_parity._rows` helper) and record a SHA-256 per
query.  The compare step demands hash equality.

Float caveat: 9 significant digits is the driver's own tolerance; a
sum of doubles whose partition-order drift exceeds that is a REAL
defect by this repo's determinism convention (integer/quantized
accumulators everywhere — see SURVEY).

Usage:
  python scripts/invariance_sweep.py run A   # appends to $INVAR_DIR/A.jsonl
  python scripts/invariance_sweep.py run B
  python scripts/invariance_sweep.py compare
Env: INVAR_SF_DIR (default /root/testdata/sf0.01), INVAR_DIR (default
/tmp/invariance), and --only name1,name2 to restrict.  Runs are
resumable per pass (recorded names are skipped).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("INVAR_SF_DIR", "/root/testdata/sf0.01")
os.environ.setdefault("ORACLE_SF_DIR", SF_DIR)
OUT_DIR = os.environ.get("INVAR_DIR", "/tmp/invariance")

PASSES = {
    "A": {
        "master": "local[32]",
        "shuffle_partitions": 32,
        "extra_conf": {},
    },
    "B": {
        "master": "local[5]",
        "shuffle_partitions": 7,
        "extra_conf": {
            # split size is an env knob: 256 KB at sf0.01 fractures every
            # file into many tiny tasks; at sf0.1 use ~1 MB so the pass
            # stays hostile without becoming split-scheduling-bound
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "INVAR_B_SPLIT", str(256 * 1024)
            ),
            "spark.sql.files.openCostInBytes": "0",
            "spark.default.parallelism": "5",
        },
    },
    # pass C: adaptive execution OFF — results must not depend on AQE's
    # runtime re-planning (partition coalescing, skew-join splitting,
    # join-strategy demotion), only benefit from it
    "C": {
        "master": "local[16]",
        "shuffle_partitions": 16,
        "extra_conf": {
            "spark.sql.adaptive.enabled": "false",
        },
    },
}


def _result_hash(cols, data, _rows) -> tuple[str, int]:
    norm = _rows(cols, data)
    h = hashlib.sha256()
    h.update(repr(sorted(cols)).encode())
    for row in norm:
        h.update(repr(row).encode())
    return h.hexdigest(), len(norm)


def run(tag: str, only: set[str] | None) -> None:
    cfg = PASSES[tag]
    out = os.path.join(OUT_DIR, f"{tag}.jsonl")
    os.makedirs(OUT_DIR, exist_ok=True)
    done = set()
    if os.path.exists(out):
        with open(out) as f:
            done = {json.loads(ln)["name"] for ln in f if ln.strip()}

    import test_oracle_parity as tp  # shared normalization semantics

    from gotrackmaster_spark.session import get_session

    spark = get_session(
        f"invariance-{tag}",
        master=cfg["master"],
        shuffle_partitions=cfg["shuffle_partitions"],
        extra_conf=cfg["extra_conf"],
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = [
        n for n in tp.QUERIES if n not in done and (only is None or n in only)
    ]
    print(f"pass {tag}: {len(names)} queries at {SF_DIR} ({len(done)} recorded)")
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            df = tp.QUERIES[name](spark, SF_DIR)
            data = [tuple(r) for r in df.collect()]
            digest, n = _result_hash(df.columns, data, tp._rows)
            rec = {
                "name": name, "hash": digest, "rows": n,
                "sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001 — a sweep must survive one bad row
            rec = {"name": name, "err": f"{type(e).__name__}: {e}"[:500]}
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{i}/{len(names)}] {json.dumps(rec)[:200]}", flush=True)
    spark.stop()


def compare() -> int:
    """Pairwise hash equality across every RECORDED pass (a pass with no
    output file yet is simply not part of the comparison)."""
    recs = {}
    for tag in PASSES:
        path = os.path.join(OUT_DIR, f"{tag}.jsonl")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            recs[tag] = {r["name"]: r for r in map(json.loads, f) if r}
    tags = sorted(recs)
    names = sorted(set().union(*recs.values()))
    bad = 0
    for name in names:
        rows = {t: recs[t].get(name) for t in tags}
        missing = [t for t, r in rows.items() if r is None]
        errs = {t: r["err"] for t, r in rows.items() if r and "err" in r}
        if missing or errs:
            print(f"{name}: MISSING in {missing} ERRS {errs}")
            bad += 1
            continue
        hashes = {r["hash"] for r in rows.values()}
        if len(hashes) > 1:
            detail = {t: r["rows"] for t, r in rows.items()}
            print(f"{name}: HASH MISMATCH across {tags}, rows {detail}")
            bad += 1
    print(f"compared {len(names)} queries across passes {tags}: {bad} divergent")
    return 1 if bad else 0


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    if mode == "run":
        run(sys.argv[2], only)
    elif mode == "compare":
        sys.exit(compare())
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()

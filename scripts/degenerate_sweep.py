"""Degenerate-input robustness sweep over the full query registry.

The driver gate and the parity sweeps prove value-parity at sf0.01 and
sf0.1 — scales where every table is populated and diverse.  The failure
class that survives both is the DEGENERATE input: near-empty tables,
single-group aggregates, all-equal values.  Under Spark ANSI mode those
turn latent expressions into hard errors (DIVIDE_BY_ZERO on a
data-dependent denominator, element_at with an out-of-domain index,
overflow/cast errors), while non-ANSI engines silently NULL them — the
class called out by the round-3 advisor and twice confirmed real by the
sf0.1 sweep (benford digit-0, classification int32 µs).

This sweep builds a tiny truncated dataset (head-K rows of every
sf0.001 table, default K=3) and runs EVERY registered query and its
DuckDB oracle against it, recording per-engine outcome:

  {"name", "spark": "ok:<rows>"|"err:<type>: ...",
           "duck":  "ok:<rows>"|"err:<type>: ..."}

Interpretation contract:
  * spark ok + duck ok            → fine (row counts may differ from a
                                    value standpoint; parity at K rows
                                    is NOT asserted — most oracles
                                    replay closed forms that assume the
                                    generator's full key range).
  * spark err                     → a robustness defect to triage: the
                                    engine should degrade to NULL/empty,
                                    not raise, on small inputs.
  * duck err, spark ok            → oracle-only fragility; acceptable
                                    (the oracle is a test twin, not a
                                    product surface) but worth a note.

Iterative queries with convergence contracts and queries that
intentionally raise on malformed configuration are expected to pass:
a truncated table is VALID input, just small.

Usage: python scripts/degenerate_sweep.py [--only a,b] [--rows K]
Env: DEGEN_OUT (default /tmp/degen_sweep.jsonl; resumable, delete for
fresh), SPARK_GRAFT_CPUS (default 8).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SRC = "/root/testdata/sf0.001"
OUT = os.environ.get("DEGEN_OUT", "/tmp/degen_sweep.jsonl")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")


def build_dataset(rows: int) -> str:
    import duckdb

    dst = f"/tmp/sfdegen_{rows}"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        out = f"{dst}/{t}.parquet"
        if not os.path.exists(out):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
                f"LIMIT {rows}) TO '{out}' (FORMAT PARQUET)"
            )
    con.close()
    return dst


def main() -> None:
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    rows = 3
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])

    dst = build_dataset(rows)

    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {json.loads(ln)["name"] for ln in f if ln.strip()}

    import duckdb

    import __spark_entry__ as entry
    from gotrackmaster_spark.session import get_session

    queries = entry.queries()
    oracles = entry.oracle_sql()
    spark = get_session("degen-sweep", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    names = [
        n for n in queries
        if (only is None or n in only) and n not in done
    ]
    print(f"degenerate-sweeping {len(names)} queries at {dst} ({len(done)} recorded)")
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            data = queries[name](spark, dst).collect()
            s_out = f"ok:{len(data)}"
        except Exception as e:  # noqa: BLE001 — the sweep records, not raises
            s_out = f"err:{type(e).__name__}: {e}"[:400]
        if name in oracles:
            con = duckdb.connect()
            try:
                for t in TABLES:
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{dst}/{t}.parquet')"
                    )
                d = con.execute(oracles[name]).fetchall()
                d_out = f"ok:{len(d)}"
            except Exception as e:  # noqa: BLE001
                d_out = f"err:{type(e).__name__}: {e}"[:400]
            finally:
                con.close()
        else:
            d_out = "rows_only"
        rec = {
            "name": name, "spark": s_out, "duck": d_out,
            "sec": round(time.perf_counter() - t0, 2),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        flag = " <-- SPARK ERR" if s_out.startswith("err") else ""
        print(f"[{i}/{len(names)}] {name}: spark={s_out[:80]} duck={d_out[:60]}{flag}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

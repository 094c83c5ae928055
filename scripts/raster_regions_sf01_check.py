"""One-off sf0.1 hash-parity check for `raster_regions`.

Why not `parity_sweep.py`: the registered DuckDB oracle replays the
clustering as a recursive-CTE transitive closure (`reach` = all (v, u)
pairs inside a component).  That is Sigma S_c^2 tuples — fine at sf0.01
where blobs are small, but at sf0.1 the occupancy raster is one giant
8-connected blob (the runtime sweep measured >50 plain label rounds),
so the closure is ~10^9+ tuples: the sweep run was killed at 31 GB RSS
with no end in sight.  The closure is the ORACLE's replay strategy, not
the engine's (the engine uses iterative min-label propagation with
deferred pointer jumping); so for the sf0.1 check we replay the SAME
fixpoint in DuckDB feasibly: materialized per-round min-label tables,
O(E) per round over the IDENTICAL edge set the registered oracle builds.
At fixpoint the labels equal each component's min node id — exactly what
both the engine and the recursive oracle compute — and the final
region aggregate is compared with the sweep's value normalization
(sorted columns, sorted rows, floats to 9 significant digits).

Output: one JSON line appended to $PARITY_OUT (default
/tmp/parity_sweep.jsonl) with {"name": "raster_regions", "ok": ...,
"oracle": "iterative-minlabel"} so the sweep record stays complete.
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
OUT = os.environ.get("PARITY_OUT", "/tmp/parity_sweep.jsonl")

DUCK_ITER = """
WITH RECURSIVE {geo},
cells AS (
  SELECT CAST(floor(lon) AS BIGINT) AS gx, CAST(floor(lat) AS BIGINT) AS gy,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2
),
n AS (SELECT (gx + 200) * 1000 + gy + 200 AS v, gx, gy, cnt FROM cells)
SELECT * FROM n
"""


def main() -> None:
    import duckdb

    import test_oracle_parity as P  # reuses _rows/_norm + table views
    from gotrackmaster_spark.dq_spatial import GEO_CTE
    from gotrackmaster_spark.session import get_session

    import __spark_entry__ as entry

    t0 = time.perf_counter()
    spark = get_session(
        "raster-regions-check",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = entry.queries()["raster_regions"](spark, SF_DIR)
    s_cols = df.columns
    s_data = [tuple(r) for r in df.collect()]
    spark.stop()

    con = duckdb.connect()
    for t in P.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    con.execute(
        "CREATE TABLE n AS " + DUCK_ITER.format(geo=GEO_CTE).strip()
    )
    # identical edge set to the registered oracle's `ed` CTE
    con.execute("""
        CREATE TABLE ed AS
        SELECT a.v AS a, b.v AS b
        FROM n a, (SELECT dx - 1 AS dx, dy - 1 AS dy
                   FROM range(3) t1(dx), range(3) t2(dy)
                   WHERE NOT (dx = 1 AND dy = 1)) o
        JOIN n b ON b.gx = a.gx + o.dx AND b.gy = a.gy + o.dy
    """)
    con.execute("CREATE TABLE lab AS SELECT v, v AS l FROM n")
    rounds = 0
    while True:
        rounds += 1
        con.execute("""
            CREATE TABLE lab2 AS
            SELECT lab.v, least(lab.l, coalesce(min(nb.l), lab.l)) AS l
            FROM lab
            LEFT JOIN ed ON ed.a = lab.v
            LEFT JOIN lab nb ON nb.v = ed.b
            GROUP BY lab.v, lab.l
        """)
        changed = con.execute(
            "SELECT count(*) FROM lab JOIN lab2 USING (v) "
            "WHERE lab.l <> lab2.l"
        ).fetchone()[0]
        con.execute("DROP TABLE lab")
        con.execute("ALTER TABLE lab2 RENAME TO lab")
        if changed == 0:
            break
        if rounds > 2000:
            raise RuntimeError("min-label fixpoint did not converge")
    cur = con.execute("""
        SELECT lab.l AS root,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(n.cnt) AS BIGINT) AS n_points,
               min(n.gx) AS gx0, max(n.gx) AS gx1,
               min(n.gy) AS gy0, max(n.gy) AS gy1
        FROM lab JOIN n ON n.v = lab.v
        GROUP BY 1
    """)
    d_cols = [d[0] for d in cur.description]
    d_data = cur.fetchall()
    con.close()

    ok = (
        sorted(s_cols) == sorted(d_cols)
        and len(s_data) == len(d_data)
        and P._rows(s_cols, s_data) == P._rows(d_cols, d_data)
    )
    rec = {
        "name": "raster_regions", "ok": ok, "rows": len(s_data),
        "sec": round(time.perf_counter() - t0, 2),
        "oracle": f"iterative-minlabel ({rounds} rounds; registered "
                  f"recursive-closure oracle infeasible at sf0.1)",
    }
    if not ok:
        rec["why"] = (
            f"cols {sorted(s_cols)} vs {sorted(d_cols)}; "
            f"rows {len(s_data)} vs {len(d_data)}"
        )
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""One-off sf0.1 hash-parity check for `dbscan_clusters`.

Same story as `raster_regions_sf01_check.py`: the registered DuckDB
oracle labels core-point clusters with a recursive-CTE transitive
closure (`reach` = all (v, u) pairs inside a cluster).  At sf0.1 each of
the 40 synthetic blobs holds ~2.4k core points, so the closure is
~220 M tuples and the sweep row ground for 110+ CPU-minutes without
finishing.  Replay the same fixpoint feasibly: materialized per-round
min-label tables over the IDENTICAL core-core edge set (`ed`), O(E) per
round, then the identical border/noise assembly and the sweep's value
normalization for the compare.

Output: one JSON line appended to $PARITY_OUT (default
/tmp/parity_sweep.jsonl).
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


def main() -> None:
    import duckdb

    import test_oracle_parity as P
    from gotrackmaster_spark.dq_spatialstats import (
        _DBSCAN_EPS as EPS,
        _DBSCAN_MIN_PTS as MIN_PTS,
        _SQL_BLOB_PTS,
    )
    from gotrackmaster_spark.session import get_session

    import __spark_entry__ as entry

    t0 = time.perf_counter()
    spark = get_session(
        "dbscan-check",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = entry.queries()["dbscan_clusters"](spark, SF_DIR)
    s_cols = df.columns
    s_data = [tuple(r) for r in df.collect()]
    spark.stop()

    con = duckdb.connect()
    for t in P.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    con.execute(f"CREATE TABLE pts AS {_SQL_BLOB_PTS}")
    con.execute(f"""
        CREATE TABLE cells AS
        SELECT event_id, lat, lon,
               CAST(floor(lon / {EPS}) AS BIGINT) AS cx,
               CAST(floor(lat / {EPS}) AS BIGINT) AS cy
        FROM pts
    """)
    # identical neighbor / core / edge sets to the registered oracle
    con.execute(f"""
        CREATE TABLE nbrs AS
        SELECT a.event_id AS a_id, b.event_id AS b_id
        FROM cells a
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy
        JOIN cells b ON b.cx = a.cx + ox.dx AND b.cy = a.cy + oy.dy
        WHERE a.event_id <> b.event_id
          AND (a.lon - b.lon) * (a.lon - b.lon)
            + (a.lat - b.lat) * (a.lat - b.lat) <= {EPS} * {EPS}
    """)
    con.execute(f"""
        CREATE TABLE core AS
        SELECT p.event_id AS pid
        FROM pts p LEFT JOIN (SELECT a_id, count(*) AS k FROM nbrs GROUP BY a_id) n
          ON n.a_id = p.event_id
        WHERE coalesce(n.k, 0) + 1 >= {MIN_PTS}
    """)
    con.execute("""
        CREATE TABLE ed AS
        SELECT n.a_id AS a, n.b_id AS b
        FROM nbrs n
        JOIN core ca ON ca.pid = n.a_id
        JOIN core cb ON cb.pid = n.b_id
    """)
    con.execute("CREATE TABLE lab AS SELECT pid AS v, pid AS l FROM core")
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
        if rounds > 5000:
            raise RuntimeError("min-label fixpoint did not converge")
    cur = con.execute("""
        WITH core_lab AS (SELECT v AS pid, l AS cluster FROM lab),
        border AS (
          SELECT n.a_id AS pid, min(c.cluster) AS cluster
          FROM nbrs n JOIN core_lab c ON c.pid = n.b_id
          WHERE n.a_id NOT IN (SELECT pid FROM core)
          GROUP BY n.a_id
        )
        SELECT p.event_id,
               CAST(COALESCE(cl.cluster, bd.cluster, -1) AS BIGINT) AS cluster,
               CASE WHEN cl.pid IS NOT NULL THEN 'core'
                    WHEN bd.pid IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role
        FROM pts p
        LEFT JOIN core_lab cl ON cl.pid = p.event_id
        LEFT JOIN border bd ON bd.pid = p.event_id
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
        "name": "dbscan_clusters", "ok": ok, "rows": len(s_data),
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

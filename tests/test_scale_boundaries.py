"""Regression pins for scale-only bugs found by the sf0.1 parity sweep.

Both bugs were invisible at the driver's sf0.01 (and in every unit test)
because they need data volumes past a numeric boundary:

* ``classification_counts``: the synthetic per-track microsecond clock was
  ``i * 1_000_000`` with ``i`` the int32 output of ``row_number()`` — an
  int32 overflow (ANSI error) once any track group exceeds 2147 points.
  sf0.01 groups top out ~400 points; sf0.1 reaches ~4000.
* ``benford_digits``: a value with ``|value| < 0.005`` rounds to 0 cents,
  whose first character is the digit ``0`` — no first *significant* digit
  — and the downstream ANSI ``element_at(expected, digit)`` errors on
  index 0.  sf0.01 happens to contain no such value; sf0.1 has one.

Each test plants a tiny events table that crosses the boundary and runs
BOTH the Spark query and its DuckDB oracle on it, asserting the driver's
compare (sorted rows, stringified values) still holds — so the fix is
pinned on the query AND oracle side at unit-test cost.
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__ as entry


def _write_events(path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value, props)."""
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(tbl, f"{path}/events.parquet")


def _compare(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    cols = sorted(df.columns)
    got = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    cur = con.execute(entry.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    idx = [ocols.index(c) for c in cols]
    want = sorted(tuple(str(r[i]) for i in idx) for r in cur.fetchall())
    con.close()
    assert got == want
    return got


def test_classification_counts_past_int32_microseconds(spark, tmp_path):
    # One track group of 2400 points (> 2147): i * 1_000_000 µs crosses
    # INT32_MAX at i = 2148.  user_id = 1 → tk = 1 (merged-track branch).
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 1, "move", 1.0, "{}")
        for i in range(2400)
    ]
    _write_events(tmp_path, rows)
    got = _compare(spark, str(tmp_path), "classification_counts")
    # The single track must survive with all its points and a real label.
    assert len(got) == 1
    n_pts = {c: i for i, c in enumerate(sorted(["track_id", "n_pts", "n_mid", "label"]))}
    assert got[0][n_pts["n_pts"]] == "2400"
    assert got[0][n_pts["label"]] != "Unknown"


def test_benford_digits_zero_cent_and_negative_values(spark, tmp_path):
    # value = 0.001 rounds to 0 cents → leading char '0' (no significant
    # digit; must be excluded, not passed to element_at).  A negative
    # value's leading char is '-' (NULL digit) and is likewise excluded.
    t0 = datetime.datetime(2024, 1, 1)
    vals = [0.001, -3.5] + [float(d) * 1.11 for d in range(1, 10)] * 3
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), i % 7, "pay", v, "{}")
        for i, v in enumerate(vals)
    ]
    _write_events(tmp_path, rows)
    got = _compare(spark, str(tmp_path), "benford_digits")
    dix = sorted(["digit", "n", "share", "expected", "deviation"]).index("digit")
    digits = {r[dix] for r in got}
    assert "0" not in digits
    assert digits == {str(d) for d in range(1, 10)}

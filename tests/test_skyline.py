"""skyline_2d — per-group Pareto frontier (x min, y max).

Pins: hand-built frontiers incl. tie cases on each axis, duplicate
points, single-point groups, and a brute-force dominance replay."""

import pytest

from gotrackmaster_spark.operators.search import skyline_2d


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = skyline_2d(df, "g", "x", "y").collect()
    return {(r.g, r.x, r.y): r.n_dups for r in out}


def _brute(rows):
    from collections import Counter

    pts = Counter(rows)
    keep = {}
    for p, n in pts.items():
        dominated = any(
            q[0] == p[0]
            and q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )
        if not dominated:
            keep[p] = n
    return keep


def test_simple_frontier(spark):
    rows = [("a", 1, 5.0), ("a", 2, 7.0), ("a", 3, 6.0), ("a", 4, 8.0)]
    got = _run(spark, rows)
    # (3,6) dominated by (2,7); (1,5),(2,7),(4,8) survive
    assert set(got) == {("a", 1, 5.0), ("a", 2, 7.0), ("a", 4, 8.0)}


def test_tie_on_x_keeps_only_max_y(spark):
    rows = [("a", 1, 5.0), ("a", 1, 9.0)]
    got = _run(spark, rows)
    assert set(got) == {("a", 1, 9.0)}


def test_tie_on_y_keeps_only_min_x(spark):
    rows = [("a", 1, 5.0), ("a", 2, 5.0)]
    got = _run(spark, rows)
    assert set(got) == {("a", 1, 5.0)}


def test_duplicates_not_mutually_dominating(spark):
    rows = [("a", 1, 5.0), ("a", 1, 5.0), ("a", 1, 5.0)]
    got = _run(spark, rows)
    assert got == {("a", 1, 5.0): 3}


def test_groups_independent(spark):
    rows = [("a", 1, 5.0), ("b", 2, 1.0)]
    got = _run(spark, rows)
    assert set(got) == {("a", 1, 5.0), ("b", 2, 1.0)}


def test_brute_force(spark):
    rows = []
    for i in range(300):
        g = "g" + str(i % 3)
        x = (i * 7919) % 40
        y = float((i * i * 61 + i * 13) % 50)
        rows.append((g, x, y))
    assert _run(spark, rows) == _brute(rows)

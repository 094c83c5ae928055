"""Getis-Ord Gi* hotspot operator (`spatial.gi_star_hotspots`).

Semantics pinned against a hand-computed lattice; the driver query's
DuckDB twin is exercised by tests/test_oracle_parity.py like every
registry entry.
"""

import math

import pytest

from tests.conftest import spark  # noqa: F401  (fixture)


def _rows(spark, cells):
    df = spark.createDataFrame(cells, "gx long, gy long, cnt long")
    from gotrackmaster_spark.operators.spatial import gi_star_hotspots

    out = gi_star_hotspots(df).collect()
    return {(r["gx"], r["gy"]): r for r in out}


def _expected_z(wsum, k, counts):
    n = len(counts)
    xbar = sum(counts) / n
    s = math.sqrt(sum(c * c for c in counts) / n - xbar * xbar)
    den = s * math.sqrt((n * k - k * k) / (n - 1.0))
    return (wsum - xbar * k) / den


def test_gi_star_planted_hotspot(spark):
    # 5x5 lattice of 1s with a 100 planted in the middle: the center and
    # its ring must carry the highest z, far cells negative-ish.
    cells = [(x, y, 1) for x in range(5) for y in range(5) if (x, y) != (2, 2)]
    cells.append((2, 2, 100))
    got = _rows(spark, cells)
    assert len(got) == 25
    counts = [c for _, _, c in cells]
    # center: full 3x3 occupied, wsum = 100 + 8
    assert got[(2, 2)]["n_nbrs"] == 9
    assert got[(2, 2)]["z"] == pytest.approx(_expected_z(108, 9, counts), rel=1e-12)
    # corner (0,0): 4 occupied neighbors, all 1s
    assert got[(0, 0)]["n_nbrs"] == 4
    assert got[(0, 0)]["z"] == pytest.approx(_expected_z(4, 4, counts), rel=1e-12)
    # the hotspot dominates: center z is the global max
    assert got[(2, 2)]["z"] == max(r["z"] for r in got.values())
    # a neighbor of the hotspot still beats every cell outside the ring
    ring_min = min(
        got[(x, y)]["z"] for x in (1, 2, 3) for y in (1, 2, 3) if (x, y) != (2, 2)
    )
    far_max = max(
        r["z"] for (x, y), r in got.items() if abs(x - 2) > 1 or abs(y - 2) > 1
    )
    assert ring_min > far_max


def test_gi_star_membership_needs_no_join(spark):
    # two isolated cells: each sees only itself (k=1); absent lattice
    # targets between them must NOT appear in the output
    got = _rows(spark, [(0, 0, 3), (10, 10, 5)])
    assert set(got) == {(0, 0), (10, 10)}
    assert got[(0, 0)]["n_nbrs"] == 1
    counts = [3, 5]
    assert got[(0, 0)]["z"] == pytest.approx(_expected_z(3, 1, counts), rel=1e-12)
    assert got[(10, 10)]["z"] == pytest.approx(_expected_z(5, 1, counts), rel=1e-12)


def test_gi_star_degenerate_denominator_is_null(spark):
    # n == 1: variance ratio divides by n-1 = 0 -> z must be NULL, not inf
    got = _rows(spark, [(0, 0, 7)])
    assert got[(0, 0)]["z"] is None
    # n == 2 adjacent: k_i == n for both cells -> n*k - k^2 == 0 -> NULL
    got = _rows(spark, [(0, 0, 1), (0, 1, 2)])
    assert all(r["z"] is None for r in got.values())


def test_gi_star_plan_shape(spark):
    """No shuffled joins: the only join is the 1-row broadcast moments
    cross join; membership comes from the self-offset flag."""
    from gotrackmaster_spark.operators.spatial import gi_star_hotspots

    df = spark.createDataFrame([(0, 0, 1), (1, 1, 2)], "gx long, gy long, cnt long")
    plan = gi_star_hotspots(df)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the single BroadcastNestedLoopJoin IS the intended 1-row stats join
    assert plan.count("BroadcastNestedLoopJoin") == 1

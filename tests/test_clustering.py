"""Grid-DBSCAN semantics pins (operators/clustering.py).

The driver query `dbscan_clusters` pins the full pipeline against a
DuckDB replay at sf0.01; these tests pin the hand-checkable corner
semantics: core/border/noise roles, the min-label cluster id, the
isolated-core singleton cluster, and parameter validation.
"""

import pytest
from pyspark.sql import functions as F

from gotrackmaster_spark.operators.clustering import dbscan

# (id, x, y) — cluster A = {1,2,3} mutually within eps=1, with border 4
# hanging off point 2; 5 is isolated noise; 6 is a core whose only
# neighbors 7/8 are border (6 has no core neighbor -> singleton-core
# cluster labeled by itself).
_PTS = [
    (1, 0.0, 0.0),
    (2, 0.0, 0.5),
    (3, 0.5, 0.0),
    (4, 0.0, 1.4),
    (5, 10.0, 10.0),
    (6, 20.0, 20.0),
    (7, 20.9, 20.0),
    (8, 19.1, 20.0),
]


@pytest.fixture(scope="module")
def result(spark):
    pts = spark.createDataFrame(_PTS, ["id", "x", "y"])
    rows = dbscan(pts, eps=1.0, min_pts=3, id_col="id", x_col="x", y_col="y").collect()
    return {r["id"]: (r["cluster"], r["role"]) for r in rows}


def test_all_points_labeled(result):
    assert set(result) == {1, 2, 3, 4, 5, 6, 7, 8}


def test_core_cluster_min_label(result):
    # 1,2,3 are mutually within eps -> |N|=3 >= min_pts -> all core,
    # cluster = min core id = 1.
    for pid in (1, 2, 3):
        assert result[pid] == (1, "core")


def test_border_point(result):
    # 4 is within eps of core 2 only (|N(4)|=2 < min_pts) -> border of
    # cluster 1.
    assert result[4] == (1, "border")


def test_noise(result):
    assert result[5] == (-1, "noise")


def test_isolated_core_singleton_cluster(result):
    # 6's neighbors 7,8 are not within eps of each other (1.8 apart), so
    # only 6 is core; the core graph has no edge for it and the
    # singleton fallback labels the cluster with 6 itself.
    assert result[6] == (6, "core")
    assert result[7] == (6, "border")
    assert result[8] == (6, "border")


def test_param_validation(spark):
    pts = spark.createDataFrame(_PTS, ["id", "x", "y"])
    with pytest.raises(ValueError):
        dbscan(pts, eps=0.0, min_pts=3)
    with pytest.raises(ValueError):
        dbscan(pts, eps=1.0, min_pts=0)


def test_cross_cell_neighbors(spark):
    # Two points 0.9 apart straddling a grid-cell boundary (eps=1 ->
    # cells of size 1; 0.95 and 1.85 land in cells 0 and 1) must still
    # see each other through the 3x3 neighborhood join.
    pts = spark.createDataFrame(
        [(1, 0.95, 0.0), (2, 1.85, 0.0), (3, 0.05, 0.0)], ["id", "x", "y"]
    )
    rows = dbscan(pts, eps=1.0, min_pts=3, id_col="id", x_col="x", y_col="y").collect()
    got = {r["id"]: (r["cluster"], r["role"]) for r in rows}
    # 1 sees 2 (0.9) and 3 (0.9) -> core; 2 and 3 each see only 1 -> border.
    assert got[1] == (1, "core")
    assert got[2] == (1, "border")
    assert got[3] == (1, "border")


def test_randomized_vs_reference(spark):
    # Seeded random cloud straddling the origin (negative coords exercise
    # floor-grid cells and the bijective packed cell id) checked against
    # a brute-force pure-Python DBSCAN with the same deterministic rules.
    import random

    rng = random.Random(42)
    n, eps, min_pts = 120, 0.8, 4
    pts = [
        (i, rng.uniform(-5.0, 5.0), rng.uniform(-5.0, 5.0)) for i in range(n)
    ]

    # -- reference implementation (O(n^2)) --
    def d2(a, b):
        return (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2

    nbrs = {
        i: [j for (j, *_q) in pts if j != i and d2(pts[i], pts[j]) <= eps * eps]
        for (i, *_p) in pts
    }
    core = {i for i, ns in nbrs.items() if len(ns) + 1 >= min_pts}
    # components over core-core edges (union-find)
    parent = {i: i for i in core}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp = {}
    for i in core:
        comp.setdefault(find(i), []).append(i)
    label = {}
    for members in comp.values():
        lab = min(members)
        for i in members:
            label[i] = lab
    expect = {}
    for i, *_p in pts:
        if i in core:
            expect[i] = (label[i], "core")
        else:
            core_nb = [label[j] for j in nbrs[i] if j in core]
            if core_nb:
                expect[i] = (min(core_nb), "border")
            else:
                expect[i] = (-1, "noise")

    df = spark.createDataFrame(pts, ["id", "x", "y"])
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(df, eps=eps, min_pts=min_pts, id_col="id", x_col="x", y_col="y").collect()
    }
    assert got == expect


def test_min_pts_one_isolated_point_is_singleton_core(spark):
    # |N_eps(p)| includes p, so at min_pts=1 an isolated point is a core
    # singleton cluster labeled by itself — NOT noise (regression: the
    # neighbor-count base must be all points, not just points with a
    # neighbor row).
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 50.0, 50.0), (3, 50.3, 50.0)], ["id", "x", "y"]
    )
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(pts, eps=1.0, min_pts=1, id_col="id", x_col="x", y_col="y").collect()
    }
    assert got[1] == (1, "core")
    assert got[2] == (2, "core")
    assert got[3] == (2, "core")

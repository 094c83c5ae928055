"""quadtree_leaves — adaptive variable-resolution binning.

Pins: a Python replay of the coarsest-fitting-cell rule, conservation
(leaf counts sum to the point count), cap-overflow stays at max level,
sparse-region coarseness, and validation."""

import numpy as np
import pytest

from gotrackmaster_spark.functions.cells import cell_np
from gotrackmaster_spark.operators.spatial import quadtree_leaves


def _run(spark, pts, **kw):
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = quadtree_leaves(df, **kw).collect()
    return {(r.leaf_cell, r.level): r.n_points for r in out}


def _brute(pts, min_level, max_level, cap):
    from collections import Counter

    lats = np.array([p[0] for p in pts])
    lons = np.array([p[1] for p in pts])
    cells = {
        lv: cell_np(lats, lons, lv).tolist() for lv in range(min_level, max_level + 1)
    }
    counts = {lv: Counter(cells[lv]) for lv in cells}
    out = Counter()
    for i in range(len(pts)):
        leaf = (int(cells[max_level][i]), max_level)
        for lv in range(min_level, max_level):
            if counts[lv][cells[lv][i]] <= cap:
                leaf = (int(cells[lv][i]), lv)
                break
        out[leaf] += 1
    return dict(out)


def _cloud(n):
    pts = []
    for i in range(n):
        # dense blob near (10, 10) + sparse sprinkle elsewhere
        if i % 3:
            pts.append((10.0 + (i % 50) * 0.01, 10.0 + (i % 37) * 0.01))
        else:
            pts.append((-60.0 + (i * 7 % 120), -150.0 + (i * 13 % 300)))
    return pts


def test_python_replay(spark):
    pts = _cloud(600)
    kw = dict(min_level=4, max_level=8, cap=20)
    assert _run(spark, pts, **kw) == _brute(pts, 4, 8, 20)


def test_conservation(spark):
    pts = _cloud(400)
    got = _run(spark, pts, min_level=4, max_level=8, cap=20)
    assert sum(got.values()) == len(pts)


def test_all_in_one_cell_stays_at_max(spark):
    # 100 coincident points with cap 10: every ancestor over cap ->
    # leaf at max_level with the full count
    pts = [(10.0, 10.0)] * 100
    got = _run(spark, pts, min_level=2, max_level=5, cap=10)
    assert list(got.values()) == [100]
    assert list(got)[0][1] == 5


def test_sparse_region_stays_coarse(spark):
    # two far-apart single points: both leaves at min_level
    pts = [(10.0, 10.0), (-50.0, -120.0)]
    got = _run(spark, pts, min_level=3, max_level=8, cap=5)
    assert all(lv == 3 for _, lv in got)
    assert sum(got.values()) == 2


def test_validation(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "lat double, lon double")
    with pytest.raises(ValueError):
        quadtree_leaves(df, min_level=5, max_level=4)
    with pytest.raises(ValueError):
        quadtree_leaves(df, cap=0)

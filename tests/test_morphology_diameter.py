"""Cell-set morphology (dilate/erode) and per-group hull diameter:
hand-pinned shapes, morphological containment laws, and the kernel vs
brute-force O(n²) sweep."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def _cells(spark, rows):
    return spark.createDataFrame(rows, "r string, gx long, gy long")


def _collect_set(df):
    return {(r.r, r.gx, r.gy) for r in df.collect()}


def test_dilate_3x3_block_to_5x5(spark):
    from gotrackmaster_spark.operators.spatial import cell_set_dilate

    block = [("a", x, y) for x in range(3) for y in range(3)]
    out = _collect_set(cell_set_dilate(_cells(spark, block), ["r"]))
    want = {("a", x, y) for x in range(-1, 4) for y in range(-1, 4)}
    assert out == want


def test_erode_3x3_block_to_center(spark):
    from gotrackmaster_spark.operators.spatial import cell_set_erode

    block = [("a", x, y) for x in range(3) for y in range(3)]
    out = _collect_set(cell_set_erode(_cells(spark, block), ["r"]))
    assert out == {("a", 1, 1)}


def test_erode_thin_line_is_empty(spark):
    from gotrackmaster_spark.operators.spatial import cell_set_erode

    line = [("a", x, 0) for x in range(5)]
    assert _collect_set(cell_set_erode(_cells(spark, line), ["r"])) == set()


def test_groups_do_not_leak(spark):
    from gotrackmaster_spark.operators.spatial import cell_set_dilate, cell_set_erode

    # two groups each missing the other's cells: a full 3x3 in 'a', a
    # single cell in 'b' AT the 'a' block center — 'b' must not erode-keep
    # it off 'a' membership, and dilation stays per-group
    rows = [("a", x, y) for x in range(3) for y in range(3)] + [("b", 1, 1)]
    ero = _collect_set(cell_set_erode(_cells(spark, rows), ["r"]))
    assert ero == {("a", 1, 1)}
    dil = _collect_set(cell_set_dilate(_cells(spark, rows), ["r"]))
    assert ("b", 5, 5) not in dil
    assert {("b", x, y) for x in range(3) for y in range(3)} <= dil


def test_opening_closing_containment(spark):
    """erode(dilate(S)) ⊇ S (closing) and dilate(erode(S)) ⊆ S (opening)
    on a pseudorandom blob — the defining morphology laws."""
    from gotrackmaster_spark.operators.spatial import cell_set_dilate, cell_set_erode

    rng = np.random.default_rng(11)
    pts = {("a", int(x), int(y)) for x, y in rng.integers(0, 12, size=(120, 2))}
    df = _cells(spark, sorted(pts))
    s = _collect_set(df)
    closing = _collect_set(cell_set_erode(cell_set_dilate(df, ["r"]), ["r"]))
    assert s <= closing
    opening = _collect_set(cell_set_dilate(cell_set_erode(df, ["r"]), ["r"]))
    assert opening <= s


def test_hull_diameter_vs_brute_force_sweep():
    from gotrackmaster_spark.operators.spatial import _hull_diameter

    rng = np.random.default_rng(7)
    for trial in range(200):
        n = int(rng.integers(1, 80))
        kind = trial % 5
        if kind == 0:
            xs, ys = rng.normal(size=n), rng.normal(size=n)
        elif kind == 1:  # collinear up to float noise — calipers' nemesis
            t = rng.normal(size=n)
            xs, ys = 2 * t + 1, -3 * t + 0.5
        elif kind == 2:  # tiny integer grid with many duplicates
            xs = rng.integers(0, 4, n).astype(float)
            ys = rng.integers(0, 4, n).astype(float)
        elif kind == 3:  # all points in convex position
            a = rng.uniform(0, 2 * np.pi, n)
            xs, ys = np.cos(a), np.sin(a)
        else:  # 1e-4 lattice like the synthetic geo tables
            xs = rng.integers(-1800000, 1800000, n) / 1e4
            ys = rng.integers(-800000, 800000, n) / 1e4
        d, h = _hull_diameter(xs, ys)
        dx = xs[:, None] - xs[None, :]
        dy = ys[:, None] - ys[None, :]
        bf = float(np.sqrt((dx * dx + dy * dy).max()))
        assert d == bf or abs(d - bf) < 1e-12 * max(1.0, bf), (trial, d, bf)
        assert 1 <= h <= len(np.unique(np.column_stack([xs, ys]), axis=0))


def test_track_diameter_spark_small(spark):
    from gotrackmaster_spark.operators.spatial import track_diameter

    rows = [
        (1, 0.0, 0.0), (1, 3.0, 4.0), (1, 1.0, 1.0),       # diam 5
        (2, 2.0, 2.0),                                       # single point
        (3, 0.0, 0.0), (3, 0.0, 0.0),                        # duplicate point
    ]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    got = {
        r.user_id: (r.diam_deg, r.n_pts, r.hull_pts)
        for r in track_diameter(df, group_col="user_id").collect()
    }
    assert got[1] == (5.0, 3, 3)
    assert got[2] == (0.0, 1, 1)
    assert got[3] == (0.0, 2, 1)  # n_pts counts raw rows, hull dedupes

"""dissolve_union_cells — rasterized polygon dissolve / union area.

Pins: hand-counted unions (disjoint, identical, partial overlap),
half-open boundary semantics, degenerate sub-cell rects, and a Python
brute-force replay on a deterministic rect cloud."""

import pytest

from gotrackmaster_spark.operators.spatial import dissolve_union_cells


def _run(spark, rects, pitch=1.0):
    df = spark.createDataFrame(
        rects, "grp string, lat0 double, lat1 double, lon0 double, lon1 double"
    )
    rows = dissolve_union_cells(df, "grp", pitch=pitch).collect()
    return {r.grp: (r.n_polys, r.sum_cells, r.union_cells, r.overlap_ratio) for r in rows}


def test_disjoint_rects(spark):
    got = _run(spark, [("a", 0.0, 2.0, 0.0, 3.0), ("a", 10.0, 12.0, 10.0, 13.0)])
    assert got["a"] == (2, 12, 12, 1.0)


def test_identical_rects_fully_overlap(spark):
    got = _run(spark, [("a", 0.0, 2.0, 0.0, 2.0)] * 3)
    assert got["a"] == (3, 12, 4, 3.0)


def test_partial_overlap(spark):
    # [0,2)x[0,2) and [1,3)x[0,2): union rows 0..2 -> 6 cells, sum 8
    got = _run(spark, [("a", 0.0, 2.0, 0.0, 2.0), ("a", 1.0, 3.0, 0.0, 2.0)])
    assert got["a"] == (2, 8, 6, 8.0 / 6.0)


def test_half_open_boundary(spark):
    # rect ending exactly at 1.5 (a center ordinate): center 1.5 is
    # EXCLUDED by the half-open upper bound
    got = _run(spark, [("a", 0.5, 1.5, 0.5, 1.5)])
    assert got["a"] == (1, 1, 1, 1.0)
    # extending past the center by any amount includes it
    got2 = _run(spark, [("a", 0.5, 1.6, 0.5, 1.6)])
    assert got2["a"] == (1, 4, 4, 1.0)


def test_subcell_rect_dropped(spark):
    # a rect covering no cell center contributes nothing; a group with
    # only such rects is absent
    got = _run(spark, [("a", 0.6, 0.9, 0.6, 0.9), ("b", 0.0, 1.0, 0.0, 1.0)])
    assert "a" not in got
    assert got["b"] == (1, 1, 1, 1.0)


def test_negative_coordinates(spark):
    got = _run(spark, [("a", -2.0, 0.0, -3.0, -1.0)])
    # centers (-1.5,-2.5),(-1.5,-1.5),(-0.5,-2.5),(-0.5,-1.5)
    assert got["a"] == (1, 4, 4, 1.0)


def test_brute_force_cloud(spark):
    rects = []
    for i in range(60):
        la = float((i * 7) % 20 - 10) + 0.25
        lo = float((i * 13) % 30 - 15) + 0.25
        rects.append(("g", la, la + float(1 + i % 4), lo, lo + float(1 + i % 3)))
    want_cells = set()
    want_sum = 0
    n_polys = 0
    import math

    for _, la0, la1, lo0, lo1 in rects:
        y0 = math.ceil(la0 - 0.5)
        y1 = math.ceil(la1 - 0.5) - 1
        x0 = math.ceil(lo0 - 0.5)
        x1 = math.ceil(lo1 - 0.5) - 1
        if y1 < y0 or x1 < x0:
            continue
        n_polys += 1
        want_sum += (y1 - y0 + 1) * (x1 - x0 + 1)
        for iy in range(y0, y1 + 1):
            for ix in range(x0, x1 + 1):
                want_cells.add((iy, ix))
    got = _run(spark, rects)
    assert got["g"][0] == n_polys
    assert got["g"][1] == want_sum
    assert got["g"][2] == len(want_cells)
    assert got["g"][3] == pytest.approx(want_sum / len(want_cells))

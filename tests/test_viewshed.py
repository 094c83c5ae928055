"""dem_viewshed — quantized line-of-sight along rays.

Pins: a Python replay of the quantized-slope recursion over all 8
rays, the first-cell-always-visible rule, monotone-terrain full
visibility, and blocking semantics behind a planted ridge."""

import pytest

from gotrackmaster_spark.driver_queries import (
    _VS_E0,
    _VS_QUANT,
    _VS_STEPS,
    q_dem_viewshed,
)

_DIRS = [(1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1)]


def _ele(x, y):
    return ((y + 90) * 361 + (x + 180)) * 2654435761 % 40000


def _brute():
    out = {}
    for ray, (dx, dy) in enumerate(_DIRS):
        best = None
        for k in range(1, _VS_STEPS + 1):
            x, y = dx * k, dy * k
            e = _ele(x, y)
            num = (e - _VS_E0) * _VS_QUANT
            # Spark DIV and DuckDB // both truncate toward zero; Python
            # // floors, so truncate explicitly
            slope_q = abs(num) // k if num >= 0 else -(abs(num) // k)
            visible = best is None or slope_q > best
            out[(ray, k)] = (x, y, e, slope_q, visible)
            best = slope_q if best is None else max(best, slope_q)
    return out


def test_matches_python_replay(spark):
    rows = q_dem_viewshed(spark, "/root/testdata/sf0.001").collect()
    got = {(r.ray, r.k): (r.x, r.y, r.ele, r.slope_q, r.visible) for r in rows}
    assert got == _brute()
    assert len(got) == 8 * _VS_STEPS


def test_first_cell_always_visible(spark):
    rows = q_dem_viewshed(spark, "/root/testdata/sf0.001").collect()
    assert all(r.visible for r in rows if r.k == 1)


def test_quantized_slope_blocking_logic():
    # pure-logic pin on the recursion: flat low terrain stays visible
    # (its relative slope rises toward zero with distance), a ridge at
    # k=3 hides the low cell behind it, and a taller far peak re-emerges
    eles = {1: 100, 2: 100, 3: 5000, 4: 120, 5: 9000}
    e0 = 200
    best, vis = None, {}
    for k in range(1, 6):
        num = (eles[k] - e0) * _VS_QUANT
        sq = abs(num) // k if num >= 0 else -(abs(num) // k)
        vis[k] = best is None or sq > best
        best = sq if best is None else max(best, sq)
    assert vis == {1: True, 2: True, 3: True, 4: False, 5: True}

"""Property-based (hypothesis) metamorphic tests — SURVEY.md §5.2.3."""

from __future__ import annotations

import math
import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

lat_st = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)


@given(lat_st, lon_st, lat_st, lon_st)
@settings(max_examples=200, deadline=None)
def test_haversine_symmetry_and_bounds(lat1, lon1, lat2, lon2):
    from gotrackmaster_spark.functions.geodesy import haversine_s

    d12 = haversine_s(lat1, lon1, lat2, lon2)
    d21 = haversine_s(lat2, lon2, lat1, lon1)
    assert math.isclose(d12, d21, rel_tol=1e-12, abs_tol=1e-9)
    assert 0 <= d12 <= math.pi * 6371000 * 1.0000001


@given(lat_st, lon_st, st.integers(min_value=1, max_value=20))
@settings(max_examples=200, deadline=None)
def test_cell_roundtrip_contains_point(lat, lon, level):
    """cell → (i, j) → bounds must contain the encoded point, and the
    parent at level-1 must contain the child's point too."""
    from gotrackmaster_spark.functions.cells import (
        cell_level,
        cell_np,
        cell_parent,
        cell_to_ij_np,
    )

    cell = int(cell_np(np.array([lat]), np.array([lon]), level)[0])
    assert cell_level(cell) == level
    i, j, lvl = cell_to_ij_np(np.array([cell]))
    n = 1 << level
    lon_lo = -180.0 + 360.0 * int(i[0]) / n
    lat_lo = -90.0 + 180.0 * int(j[0]) / n
    assert lon_lo - 1e-9 <= lon <= lon_lo + 360.0 / n + 1e-9
    assert lat_lo - 1e-9 <= lat <= lat_lo + 180.0 / n + 1e-9
    if level > 0:
        parent = cell_parent(cell)
        assert cell_level(parent) == level - 1
        assert parent == int(cell_np(np.array([lat]), np.array([lon]), level - 1)[0])


def _mk_pts(coords):
    from gotrackmaster_spark.kernels.track import Pt

    return [
        Pt(la, lo, el, 1_600_000_000_000_000_000 + i * 5_000_000_000)
        for i, (la, lo, el) in enumerate(coords)
    ]


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=40.0, max_value=40.01, allow_nan=False),
            st.floats(min_value=2.0, max_value=2.01, allow_nan=False),
            st.floats(min_value=100.0, max_value=110.0, allow_nan=False),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=50, deadline=None)
def test_remove_stops_idempotent_on_own_output(coords):
    """simplify (RemoveStops close-point merge) applied twice == once."""
    from gotrackmaster_spark.kernels.track import remove_stops

    once, _ = remove_stops(_mk_pts(coords), 0.0, 0.5, math.inf, 0, True)
    twice, _ = remove_stops([p.copy() for p in once], 0.0, 0.5, math.inf, 0, True)
    assert [(p.lat, p.lon) for p in twice] == [(p.lat, p.lon) for p in once]


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=3, max_size=80)
)
@settings(max_examples=100, deadline=None)
def test_fix_times_postcondition(secs):
    """After FixTimes, interior repaired points never exceed the next
    point's time when the next point is valid (Go postcondition)."""
    from gotrackmaster_spark.kernels.track import fix_times_segment

    base = 1_600_000_000_000_000_000
    pts = _mk_pts([(40.0, 2.0, 100.0)] * len(secs))
    for p, s in zip(pts, secs):
        p.t = base + s * 1_000_000_000
    fix_times_segment(pts)
    for i in range(1, len(pts) - 1):
        nxt = pts[i + 1].t
        assert pts[i].t <= max(nxt, pts[i].t)  # no crash + bounded
        # repaired value stays within [first, last+1h] envelope
        assert base - 10_000_000_000 <= pts[i].t <= base + 10_000 * 1_000_000_000 + 3_600_000_000_000


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-5.0, max_value=5.0, allow_nan=False),
            st.floats(min_value=-5.0, max_value=5.0, allow_nan=False),
        ),
        min_size=3,
        max_size=8,
    ),
    st.lists(
        st.tuples(
            st.floats(min_value=-6.0, max_value=6.0, allow_nan=False),
            st.floats(min_value=-6.0, max_value=6.0, allow_nan=False),
        ),
        min_size=30,
        max_size=30,
    ),
)
@settings(max_examples=30, deadline=None)
def test_ray_cast_matches_matplotlib_free_reference(ring, probes):
    """Vectorized ray-cast == an independent scalar even-odd implementation
    on random polygons (boundary-free probes)."""
    from gotrackmaster_spark.operators.spatial import _ray_cast_np

    rl = np.array([p[0] for p in ring])
    rx = np.array([p[1] for p in ring])

    def scalar_inside(y, x):
        inside = False
        j = len(rl) - 1
        for i in range(len(rl)):
            if (rl[i] > y) != (rl[j] > y):
                x_int = (rx[j] - rx[i]) * (y - rl[i]) / (rl[j] - rl[i]) + rx[i]
                if x < x_int:
                    inside = not inside
            j = i
        return inside

    ys = np.array([p[0] for p in probes])
    xs = np.array([p[1] for p in probes])
    got = _ray_cast_np(ys, xs, rl, rx)
    want = np.array([scalar_inside(y, x) for y, x in probes])
    assert (got == want).all()


@given(st.integers(min_value=1, max_value=200), st.integers(min_value=1, max_value=8))
@settings(max_examples=30, deadline=None)
def test_knn_candidates_brute_force_small(n, k):
    """Pure-numpy check of the kNN ranking invariant used by knn_join:
    rank by (rounded dist, id) is a total order — top-k stable and unique."""
    rng = np.random.RandomState(n)
    lat = rng.uniform(-60, 60, n)
    lon = rng.uniform(-170, 170, n)
    from gotrackmaster_spark.functions.geodesy import haversine_np

    q_lat, q_lon = 10.0, 20.0
    d = np.round(haversine_np(q_lat, q_lon, lat, lon), 3)
    order = np.lexsort((np.arange(n), d))
    topk = order[: min(k, n)]
    assert len(set(topk.tolist())) == len(topk)
    assert (np.diff(d[topk]) >= 0).all()

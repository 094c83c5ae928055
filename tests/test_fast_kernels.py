"""fast kernels == reference-literal kernels, EXACTLY (points, defects,
timestamps), on every fixture segment + randomized tracks."""

from __future__ import annotations

import math
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tests.conftest import FIXTURES, load_fixture_segments  # noqa: E402


def _segments():
    for name in FIXTURES:
        for t, trk in enumerate(load_fixture_segments(name)):
            for s, seg in enumerate(trk):
                yield f"{name}[{t}][{s}]", seg


def _snap(pts):
    return [(p.lat, p.lon, p.ele, p.t) for p in pts]


def _dsnap(ds):
    return [
        (d.pt_idx, d.count, d.length, d.speed, d.speed_vertical, d.elevation,
         d.duration, d.lat, d.lon)
        for d in ds
    ]


CASES = {
    "remove_noise": (
        lambda K, p: K.remove_noise(p, 6.0, 1.1, 4, True),
        lambda Fst, p: Fst.remove_noise(p, 6.0, 1.1, 4, True),
    ),
    "remove_stops_default": (
        lambda K, p: K.remove_stops(p, 90.0, 5.0, 0.5, 3, True),
        lambda Fst, p: Fst.remove_stops(p, 90.0, 5.0, 0.5, 3, True),
    ),
    "remove_stops_simplify": (
        lambda K, p: K.remove_stops(p, 0.0, 1.2, math.inf, 0, True),
        lambda Fst, p: Fst.remove_stops(p, 0.0, 1.2, math.inf, 0, True),
    ),
    "remove_last_max_speed": (
        lambda K, p: K.remove_last_max_speed(p, 14.0, True),
        lambda Fst, p: Fst.remove_last_max_speed(p, 14.0, True),
    ),
    "remove_intersections_fix": (
        lambda K, p: K.remove_intersections(p, 7, True),
        lambda Fst, p: Fst.remove_intersections(p, 7, True),
    ),
    "remove_intersections_detect": (
        lambda K, p: K.remove_intersections(p, 5, False),
        lambda Fst, p: Fst.remove_intersections(p, 5, False),
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_fast_equals_literal_on_fixtures(case):
    from gotrackmaster_spark.kernels import fast as Fst
    from gotrackmaster_spark.kernels import track as K

    lit_fn, fast_fn = CASES[case]
    for label, seg in _segments():
        a_pts, a_def = lit_fn(K, [p.copy() for p in seg])
        b_pts, b_def = fast_fn(Fst, [p.copy() for p in seg])
        assert _snap(a_pts) == _snap(b_pts), (case, label)
        assert _dsnap(a_def) == _dsnap(b_def), (case, label)


def test_max_speed_fast_equals_literal_on_fixtures():
    from gotrackmaster_spark.kernels import fast as Fst
    from gotrackmaster_spark.kernels import track as K

    for label, seg in _segments():
        for maximum in (200.0, 300.0, 5.0):
            a = [p.copy() for p in seg]
            b = [p.copy() for p in seg]
            da = K.max_speed(a, maximum, True)
            db = Fst.max_speed(b, maximum, True)
            assert _snap(a) == _snap(b), (label, maximum)
            assert _dsnap(da) == _dsnap(db), (label, maximum)


def test_fast_equals_literal_on_random_tracks():
    from gotrackmaster_spark.kernels import fast as Fst
    from gotrackmaster_spark.kernels import track as K
    from gotrackmaster_spark.kernels.track import Pt

    rng = np.random.RandomState(7)
    for trial in range(10):
        n = int(rng.randint(90, 400))
        lat = 41.0 + np.cumsum(rng.randn(n)) * 2e-5
        lon = 2.0 + np.cumsum(rng.randn(n)) * 2e-5
        ele = 300.0 + np.cumsum(rng.randn(n))
        ele[rng.rand(n) < 0.05] = 0.0
        t0 = 1_600_000_000_000_000_000
        ts = t0 + np.cumsum(rng.randint(1, 20, n)) * 1_000_000_000
        mk = lambda: [Pt(float(lat[i]), float(lon[i]), float(ele[i]), int(ts[i])) for i in range(n)]
        for case, (lit_fn, fast_fn) in CASES.items():
            a_pts, a_def = lit_fn(K, mk())
            b_pts, b_def = fast_fn(Fst, mk())
            assert _snap(a_pts) == _snap(b_pts), (trial, case)
            assert _dsnap(a_def) == _dsnap(b_def), (trial, case)
        a = mk(); b = mk()
        da = K.max_speed(a, 1.0, True)
        db = Fst.max_speed(b, 1.0, True)
        assert _snap(a) == _snap(b), trial
        assert _dsnap(da) == _dsnap(db), trial

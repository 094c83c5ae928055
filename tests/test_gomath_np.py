"""Bit-parity of the vectorized Go-FDLIBM ports vs the scalar ones —
exact float64 equality on fixtures and random inputs."""

from __future__ import annotations

import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from tests.conftest import FIXTURES, load_fixture_segments  # noqa: E402


def _all_fixture_pairs():
    lats, lons = [], []
    for name in FIXTURES:
        pts = [p for trk in load_fixture_segments(name) for s in trk for p in s]
        lats.extend(p.lat for p in pts)
        lons.extend(p.lon for p in pts)
    lat = np.array(lats)
    lon = np.array(lons)
    return lat[:-1], lon[:-1], lat[1:], lon[1:]


def test_haversine_vector_bitparity_on_fixtures():
    from gotrackmaster_spark.functions.geodesy import haversine_s
    from gotrackmaster_spark.functions.gomath_np import haversine_go_np

    la1, lo1, la2, lo2 = _all_fixture_pairs()
    v = haversine_go_np(la1, lo1, la2, lo2)
    for i in range(len(la1)):
        assert v[i] == haversine_s(la1[i], lo1[i], la2[i], lo2[i]), i


def test_distance2d_vector_bitparity_on_fixtures():
    from gotrackmaster_spark.functions.geodesy import distance_2d_s
    from gotrackmaster_spark.functions.gomath_np import distance_2d_go_np

    la1, lo1, la2, lo2 = _all_fixture_pairs()
    v = distance_2d_go_np(la1, lo1, la2, lo2)
    for i in range(len(la1)):
        assert v[i] == distance_2d_s(la1[i], lo1[i], la2[i], lo2[i]), i


@given(
    st.lists(
        st.floats(min_value=-1000.0, max_value=1000.0, allow_nan=False),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_sin_cos_bitparity_random(xs):
    from gotrackmaster_spark.functions.gomath import go_cos, go_sin
    from gotrackmaster_spark.functions.gomath_np import go_cos_np, go_sin_np

    arr = np.array(xs)
    vs = go_sin_np(arr)
    vc = go_cos_np(arr)
    for i, x in enumerate(xs):
        assert vs[i] == go_sin(x), ("sin", x)
        assert vc[i] == go_cos(x), ("cos", x)


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_atan2_bitparity_random(pairs):
    from gotrackmaster_spark.functions.gomath import go_atan2
    from gotrackmaster_spark.functions.gomath_np import go_atan2_np

    ys = np.array([p[0] for p in pairs])
    xs = np.array([p[1] for p in pairs])
    v = go_atan2_np(ys, xs)
    for i, (y, x) in enumerate(pairs):
        assert v[i] == go_atan2(y, x), (y, x)

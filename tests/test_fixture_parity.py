"""Golden-value parity with the reference's Go tests (SURVEY.md §5.1).

Exact float64 equality — the kernels are literal translations and the
scalar geodesy path uses Go-compatible FDLIBM math, so no tolerance is
needed or used.

Sources: /root/reference/trackmaster/speed_test.go:13-33,
elevation_test.go:13-25, time_test.go:14-32.
"""

import datetime

from gotrackmaster_spark.kernels.track import (
    fix_times_segment,
    lost_elevation,
    max_speed,
)
from tests.conftest import load_fixture_segments


def test_speed_fix_pedraforca():
    segs = load_fixture_segments("pedraforca")
    assert len(segs) == 2
    for trk in segs:
        for seg in trk:
            max_speed(seg, 300, True)
    assert segs[0][0][504].lat == 42.24870745000008
    assert segs[0][0][504].lon == 1.664240950000083
    assert segs[0][0][662].lat == 42.2516829000064
    assert segs[0][0][662].lon == 1.6696103500038912
    assert segs[1][0][7].lat == 42.24071075000116
    assert segs[1][0][7].lon == 1.7195158000128756


def test_lost_elevation_benitandus():
    segs = load_fixture_segments("benitandus")
    for trk in segs:
        for seg in trk:
            lost_elevation(seg, True)
    assert segs[0][0][3655].ele == 468.95


def test_time_fix_carlos():
    segs = load_fixture_segments("carlos")
    n = sum(fix_times_segment(seg) for trk in segs for seg in trk)
    assert n == 39
    # 2015-04-18T07:57:51.5Z — the 0.5 s interpolation (time.go:69)
    want1 = int(
        datetime.datetime(2015, 4, 18, 7, 57, 51, tzinfo=datetime.timezone.utc).timestamp()
    ) * 1_000_000_000 + 500_000_000
    assert segs[0][0][1].t == want1
    want4 = int(
        datetime.datetime(2015, 4, 18, 8, 4, 23, tzinfo=datetime.timezone.utc).timestamp()
    ) * 1_000_000_000
    assert segs[0][0][4].t == want4


def test_fixture_shapes():
    # sanity: point counts per SURVEY.md §5.1
    segs = load_fixture_segments("pedraforca")
    assert sum(len(s) for t in segs for s in t) == 7198
    segs = load_fixture_segments("benitandus")
    assert sum(len(s) for t in segs for s in t) == 4705
    segs = load_fixture_segments("sun")
    assert len(segs[0]) == 5
    assert sum(len(s) for t in segs for s in t) == 4434
    segs = load_fixture_segments("carlos")
    assert sum(len(s) for t in segs for s in t) == 273

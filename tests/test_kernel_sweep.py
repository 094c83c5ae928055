"""Full-sweep parity: EVERY repair operator's Spark output must equal the
pure-Python kernel applied per segment, point-for-point (float64 bit
equality), on all 4 reference GPX fixtures.

The pure kernels are themselves literal translations of the Go code
(tests/test_fixture_parity.py pins them to the reference's golden test
values), so Spark == pure == Go transitively.
"""

from __future__ import annotations

import math
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tests.conftest import FIXTURES, load_fixture_segments  # noqa: E402


def _pure_apply(name, fn):
    """Run kernel fn per (trk, seg) of fixture `name`; return
    {(trk, seg): [(lat, lon, ele, t), ...]}."""
    out = {}
    for trk_no, trk in enumerate(load_fixture_segments(name)):
        for seg_no, seg in enumerate(trk):
            pts = [p.copy() for p in seg]
            pts = fn(pts)
            out[(trk_no, seg_no)] = [(p.lat, p.lon, p.ele, p.t) for p in pts]
    return out


def _spark_apply(spark, path, op):
    from gotrackmaster_spark.sources.gpx import gpx_files_to_points_df

    pts, _ = gpx_files_to_points_df(spark, [path])
    got = {}
    for r in op(pts).collect():
        got.setdefault((r.trk_no, r.seg_no), []).append(
            (r.pt_idx, r.lat, r.lon, r.ele, r.ts_ns)
        )
    return {
        k: [(lat, lon, ele, t) for _i, lat, lon, ele, t in sorted(v)]
        for k, v in got.items()
    }


def _ops():
    from gotrackmaster_spark.kernels import track as K
    from gotrackmaster_spark.operators import repair as R

    def kr(fn):
        def run(pts):
            fn(pts)
            return pts

        return run

    return {
        "fix_times": (R.fix_times, kr(K.fix_times_segment)),
        "max_speed": (
            lambda df: R.max_speed_fix(df, 300.0),
            kr(lambda p: K.max_speed(p, 300.0, True)),
        ),
        "remove_last_max_speed": (
            R.remove_last_max_speed_fix,
            lambda p: K.remove_last_max_speed(p, 14.0, True)[0],
        ),
        "remove_noise": (
            R.remove_noise_fix,
            lambda p: K.remove_noise(p, 6.0, 1.1, 4, True)[0],
        ),
        "remove_first_noise": (
            R.remove_first_noise_fix,
            lambda p: K.remove_first_noise(p, True)[0],
        ),
        "remove_stops": (
            R.remove_stops_fix,
            lambda p: K.remove_stops(p, 90.0, 5.0, 0.5, 3, True)[0],
        ),
        "simplify": (
            R.simplify_fix,
            lambda p: K.remove_stops(p, 0.0, 0.5, math.inf, 0, True)[0],
        ),
        "remove_intersections": (
            R.remove_intersections_fix,
            lambda p: K.remove_intersections(p, 6, True)[0],
        ),
        "smooth_gaussian": (
            R.smooth_gaussian,
            kr(lambda p: K.gaussian_filter_positions(p, 1, 1.1)),
        ),
        "max_speed_vertical": (
            R.max_speed_vertical_fix,
            kr(lambda p: K.max_speed_vertical(p, 1.5, True)),
        ),
        "lost_elevation": (
            R.lost_elevation_fix,
            kr(lambda p: K.lost_elevation(p, True)),
        ),
    }


@pytest.mark.parametrize("opname", sorted(_ops()))
@pytest.mark.parametrize("fixture", ["carlos", "sun"])
def test_spark_equals_pure_kernel(spark, opname, fixture):
    op, pure = _ops()[opname]
    want = _pure_apply(fixture, pure)
    got = _spark_apply(spark, FIXTURES[fixture], op)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == want[key], (opname, fixture, key)


@pytest.mark.parametrize("fixture", ["pedraforca", "benitandus"])
def test_spark_equals_pure_kernel_big_fixtures_spotcheck(spark, fixture):
    """The two large fixtures get the three heaviest kernels."""
    ops = _ops()
    for opname in ("remove_stops", "remove_noise", "smooth_gaussian"):
        op, pure = ops[opname]
        want = _pure_apply(fixture, pure)
        got = _spark_apply(spark, FIXTURES[fixture], op)
        assert got == want, (opname, fixture)


def test_move_segments_spark_equals_pure(spark):
    """N7 joinsegments on the 5-segment `sun` fixture: Spark per-track
    operator == pure kernel (segment merge + renumber)."""
    from gotrackmaster_spark.kernels import track as K
    from gotrackmaster_spark.operators.repair import move_segments_fix
    from gotrackmaster_spark.sources.gpx import gpx_files_to_points_df

    trks = load_fixture_segments("sun")
    segs = [[p.copy() for p in s] for s in trks[0]]
    want_segs, _ = K.move_segment(segs, 14, True)
    want = {
        seg_no: [(p.lat, p.lon, p.ele, p.t) for p in seg]
        for seg_no, seg in enumerate(want_segs)
    }

    pts, _ = gpx_files_to_points_df(spark, [FIXTURES["sun"]])
    got = {}
    for r in move_segments_fix(pts, 14).collect():
        got.setdefault(r.seg_no, []).append((r.pt_idx, r.lat, r.lon, r.ele, r.ts_ns))
    got = {k: [t[1:] for t in sorted(v)] for k, v in got.items()}
    assert got == want


def test_fused_pipeline_equals_chained(spark):
    """repair_pipeline (one shuffle) == chaining the per-stage operators."""
    from gotrackmaster_spark.operators import repair as R
    from gotrackmaster_spark.sources.gpx import gpx_files_to_points_df

    pts, _ = gpx_files_to_points_df(spark, [FIXTURES["carlos"]])
    fused = R.repair_pipeline(pts, R.classification_repair_stages())
    chained = R.fix_times(pts)
    chained = R.max_speed_fix(chained, 200.0)
    chained = R.simplify_fix(chained, 1.2)
    chained = R.remove_stops_fix(chained, 30.0, 9.0, 8, 12)
    for _ in range(4):
        chained = R.remove_intersections_fix(chained, 7)
    a = sorted(tuple(r) for r in fused.collect())
    b = sorted(tuple(r) for r in chained.collect())
    assert a == b

"""The same fixture parity, but through the Spark applyInPandas operators —
verifies the distribution layer (grouping, ordering, Arrow round-trip)
preserves kernel semantics exactly."""

import pyspark.sql.functions as F

from gotrackmaster_spark.operators import repair
from gotrackmaster_spark.sources.gpx import gpx_files_to_points_df
from tests.conftest import FIXTURES


def _get_point(df, track_id, trk_no, seg_no, pt_idx):
    row = (
        df.filter(
            (F.col("track_id") == track_id)
            & (F.col("trk_no") == trk_no)
            & (F.col("seg_no") == seg_no)
            & (F.col("pt_idx") == pt_idx)
        )
        .collect()
    )
    assert len(row) == 1
    return row[0]


def test_max_speed_fix_spark(spark):
    points, _ = gpx_files_to_points_df(spark, [FIXTURES["pedraforca"]])
    tid = FIXTURES["pedraforca"].rsplit("/", 1)[-1]
    fixed = repair.max_speed_fix(points, 300.0)
    p504 = _get_point(fixed, tid, 0, 0, 504)
    assert p504.lat == 42.24870745000008
    assert p504.lon == 1.664240950000083
    p662 = _get_point(fixed, tid, 0, 0, 662)
    assert p662.lat == 42.2516829000064
    assert p662.lon == 1.6696103500038912
    p7 = _get_point(fixed, tid, 1, 0, 7)
    assert p7.lat == 42.24071075000116
    assert p7.lon == 1.7195158000128756


def test_lost_elevation_fix_spark(spark):
    points, _ = gpx_files_to_points_df(spark, [FIXTURES["benitandus"]])
    tid = FIXTURES["benitandus"].rsplit("/", 1)[-1]
    fixed = repair.lost_elevation_fix(points)
    assert _get_point(fixed, tid, 0, 0, 3655).ele == 468.95


def test_fix_times_spark(spark):
    points, _ = gpx_files_to_points_df(spark, [FIXTURES["carlos"]])
    tid = FIXTURES["carlos"].rsplit("/", 1)[-1]
    counts = repair.count_time_fixes(points).collect()
    assert {r.track_id: r.num_fixes for r in counts}[tid] == 39
    fixed = repair.fix_times(points)
    p1 = _get_point(fixed, tid, 0, 0, 1)
    assert p1.ts_ns % 1_000_000_000 == 500_000_000  # the 0.5 s interpolation
    assert str(p1.ts) == "2015-04-18 07:57:51.500000"
    p4 = _get_point(fixed, tid, 0, 0, 4)
    assert str(p4.ts) == "2015-04-18 08:04:23"


def test_detect_counts_match_pure_python(spark):
    """Spark defect counts == pure-python kernel defect counts (remove_stops
    exercises the most intricate kernel end-to-end)."""
    from gotrackmaster_spark.kernels.track import remove_stops
    from tests.conftest import load_fixture_segments

    points, _ = gpx_files_to_points_df(spark, [FIXTURES["sun"]])
    spark_defects = repair.remove_stops_defects(points, 90.0, 5.0, 0.5, 3).count()
    segs = load_fixture_segments("sun")
    py_defects = sum(
        len(remove_stops(seg, 90.0, 5.0, 0.5, 3, False)[1])
        for trk in segs
        for seg in trk
    )
    assert spark_defects == py_defects

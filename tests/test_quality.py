"""Quality/classification operators: Spark path vs pure-kernel path on the
reference GPX fixtures (exact equality), plus semantic sanity checks."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tests.conftest import FIXTURES, load_fixture_segments  # noqa: E402

_LABELS = {
    "Unknown", "Walking Transport", "Running Sport", "Cycling Transport",
    "Cycling Sport", "Cycling Racing", "Motor Sport", "Walking Mountain",
    "Running Mountain", "Cycling Mountain",
}


def _flatten_tracks(name):
    """fixture → single-trk segments list (tracks with 2 trks: concat segs,
    mirroring the reference's whole-GPX walk)."""
    trks = load_fixture_segments(name)
    return [seg for trk in trks for seg in trk]


def test_kernel_quality_scores_sane():
    from gotrackmaster_spark.kernels import quality as KQ
    from gotrackmaster_spark.operators.quality import _NOW_NS, synthetic_dem_lookup

    for name in FIXTURES:
        segs = _flatten_tracks(name)
        tq = KQ.time_quality_track(segs, _NOW_NS)
        dq = KQ.distance_quality_track(segs)
        acc, ok = KQ.elevation_srtm_accuracy(segs, synthetic_dem_lookup)
        q = KQ.quality_track(segs, _NOW_NS, synthetic_dem_lookup)
        assert 0 <= tq <= 100, name
        assert 0.0 <= dq <= 100.0, name
        assert ok and 0 <= acc <= 100, name
        assert 0.0 <= q <= 100.0, name


def test_carlos_time_quality_counts_39_fixes_worth():
    """carlos fixture has 39 repairable timestamps (time_test.go:24);
    TimeQuality penalizes the out-of-order ones."""
    from gotrackmaster_spark.kernels import quality as KQ
    from gotrackmaster_spark.kernels import track as K
    from gotrackmaster_spark.operators.quality import _NOW_NS

    segs = _flatten_tracks("carlos")
    tq = KQ.time_quality_track(segs, _NOW_NS)
    assert tq < 100  # bad times must show up in the score
    # fix_times_segment mutates Pt objects in place — deep-copy first
    n_fix = sum(K.fix_times_segment([p.copy() for p in s]) for s in segs)
    assert n_fix == 39


def test_classification_runs_on_fixtures():
    from gotrackmaster_spark.kernels import quality as KQ
    from gotrackmaster_spark.operators.quality import synthetic_dem_lookup

    for name in FIXTURES:
        segs = _flatten_tracks(name)
        label, fixed = KQ.classification_track(segs, synthetic_dem_lookup)
        assert label in _LABELS, (name, label)
        assert sum(len(s) for s in fixed) > 0


def test_spark_profiles_match_pure_kernels(spark):
    from gotrackmaster_spark.kernels import quality as KQ
    from gotrackmaster_spark.operators.quality import (
        _NOW_NS,
        synthetic_dem_lookup,
        track_profiles,
    )
    from gotrackmaster_spark.sources.gpx import gpx_files_to_points_df

    pts, _tracks = gpx_files_to_points_df(spark, list(FIXTURES.values()))
    prof = {r.track_id: r for r in track_profiles(pts).collect()}
    assert len(prof) == 4

    for name, path in FIXTURES.items():
        tid = path.rsplit("/", 1)[-1]
        row = prof[tid]

        def cp():
            # fresh deep copy per score — kernels mutate Pts in place
            return [[p.copy() for p in s] for s in _flatten_tracks(name)]

        assert row.time_quality == KQ.time_quality_track(cp(), _NOW_NS)
        assert row.distance_quality == KQ.distance_quality_track(cp())
        assert row.quality == KQ.quality_track(cp(), _NOW_NS, synthetic_dem_lookup)
        assert row.classification == KQ.classification_track(cp(), synthetic_dem_lookup)[0]
        segs = cp()
        sp = KQ.get_position_start(segs)
        assert (row.start_lat, row.start_lon) == (sp.lat, sp.lon)
        assert row.start_ts_ns == KQ.get_time_start(segs, _NOW_NS)


def test_duplicate_candidates_on_profiles(spark):
    """Self-duplicate: ingest the same fixture twice under two ids — the
    band join must pair them at distance 0."""
    from gotrackmaster_spark.operators.quality import (
        duplicate_candidates,
        track_profiles,
    )
    from gotrackmaster_spark.sources.gpx import gpx_files_to_points_df

    p1, _ = gpx_files_to_points_df(spark, [FIXTURES["carlos"]])
    import pyspark.sql.functions as F

    p2 = p1.withColumn("track_id", F.concat(F.col("track_id"), F.lit("_copy")))
    prof = track_profiles(p1.unionByName(p2))
    pairs = duplicate_candidates(prof, start_seconds=60.0, start_meters=100.0,
                                 check_end=True, end_seconds=60.0, end_meters=100.0)
    got = [(r.a_id, r.b_id) for r in pairs.collect()]
    assert len(got) == 1
    assert got[0][0] != got[0][1]

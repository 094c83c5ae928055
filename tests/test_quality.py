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
    pairs = duplicate_candidates(
        prof, start_diff=60, end_diff=60, start_distance=100, end_distance=100,
        time_comparator=True, distance_comparator=True,
    )
    got = pairs.collect()
    assert len(got) == 1
    r = got[0]
    assert r.a_id != r.b_id
    # identical tracks: both families match, time family labels first
    assert r.status == "start and end time"
    assert r.time_match and r.pos_match
    assert r.start_dist_m == 0.0 and r.end_dist_m == 0.0
    # no creator/quality columns handed in => delete_ok is never asserted
    assert r.delete_ok is False


def test_duplicate_full_semantics_vs_reference_loop(spark):
    """Exhaustively compare duplicate_pairs_full against a literal Python
    transcription of the cmd/duplicate.go loop over a synthetic summary
    table, for several flag combinations (incl. end-only bands and
    comparator label refinement)."""
    import math

    from pyspark.sql import functions as F  # noqa: F401

    from gotrackmaster_spark.functions.geodesy import haversine_s as haversine
    from gotrackmaster_spark.operators.spatial import GO_ZERO_NS, duplicate_pairs_full

    rows = []
    for i in range(40):
        ts = 1_600_000_000_000_000_000 + (i % 7) * 30 * 1_000_000_000
        te = ts + 3600 * 1_000_000_000 + (i % 5) * 20 * 1_000_000_000
        lat = 40.0 + (i % 6) * 0.0003
        lon = -3.0 + (i % 4) * 0.0003
        elat = lat + 0.01 + (i % 3) * 0.0002
        elon = lon + 0.01
        if i == 37:  # zero start position -> always skipped
            lat = lon = 0.0
        if i == 38:  # missing times -> skipped only for time-only rules
            ts = te = GO_ZERO_NS
        rows.append((f"t{i:02d}", ts, te, lat, lon, elat, elon,
                     f"c{i % 3}", float(i % 2)))
    cols = ["track_id", "start_ts_ns", "end_ts_ns", "start_lat", "start_lon",
            "end_lat", "end_lon", "creator", "quality"]
    df = spark.createDataFrame(rows, cols)

    def go_loop(flags):
        sd, ed, sm, em, tc, dc = flags
        out = {}
        for a in range(40):
            for b in range(a + 1, 40):
                ra, rb = rows[a], rows[b]
                if (ra[3] == 0 and ra[4] == 0) or (ra[5] == 0 and ra[6] == 0):
                    continue
                if (rb[3] == 0 and rb[4] == 0) or (rb[5] == 0 and rb[6] == 0):
                    continue
                if sd and ed and not sm and not em:
                    if GO_ZERO_NS in (ra[1], ra[2], rb[1], rb[2]):
                        continue
                st = abs(ra[1] - rb[1]) < sd * 1e9 if sd else False
                et = abs(ra[2] - rb[2]) < ed * 1e9 if ed else False
                sp = haversine(ra[3], ra[4], rb[3], rb[4]) < sm if sm else False
                ep = haversine(ra[5], ra[6], rb[5], rb[6]) < em if em else False
                if sd:
                    tmatch, tstat = st, ("start and end time" if tc and ed and et
                                         else "start time")
                elif ed:
                    tmatch, tstat = et, "end time"
                else:
                    tmatch, tstat = False, None
                if sm:
                    pmatch, pstat = sp, ("start and end position" if dc and em and ep
                                         else "start position")
                elif em:
                    pmatch, pstat = ep, "end position"
                else:
                    pmatch, pstat = False, None
                if tmatch or pmatch:
                    out[(ra[0], rb[0])] = (
                        tstat if tmatch else pstat,
                        ra[7] == rb[7] and ra[8] == rb[8],
                    )
        return out

    cases = [
        (60, 0, 0, 0, False, False),        # start time only
        (0, 60, 0, 0, False, False),        # end time only
        (0, 0, 80, 0, False, False),        # start position only
        (0, 0, 0, 80, False, False),        # end position only
        (60, 60, 0, 0, True, False),        # time comparator label
        (60, 60, 80, 80, True, True),       # everything
        (90, 30, 0, 0, False, False),       # end diff set but NOT comparator
    ]
    for flags in cases:
        sd, ed, sm, em, tc, dc = flags
        got = {
            (r.a_id, r.b_id): (r.status, r.delete_ok)
            for r in duplicate_pairs_full(
                df, start_diff=sd, end_diff=ed, start_distance=sm,
                end_distance=em, time_comparator=tc, distance_comparator=dc,
                level=10, ring=2,
            ).collect()
        }
        want = go_loop(flags)
        assert got == want, (
            f"flags={flags}: missing={set(want) - set(got)} "
            f"extra={set(got) - set(want)} "
            f"diff={[k for k in got if k in want and got[k] != want[k]][:5]}"
        )


def test_track_profiles_without_timestamps(spark, tmp_path):
    """A GPX track with no <time> elements must flow through the profile
    pipeline (regression: the old Go-exact zero-time value -6.2e19 ns
    cannot ride in an int64 column; GO_ZERO_NS is now int64-min)."""
    from gotrackmaster_spark.operators.quality import track_profiles
    from gotrackmaster_spark.schemas import GO_ZERO_NS
    from gotrackmaster_spark.sources.gpx import gpx_files_to_points_df

    gpx = tmp_path / "notime.gpx"
    pts = "".join(
        f'<trkpt lat="{40 + i * 0.001}" lon="{-3 + i * 0.001}">'
        f"<ele>{100 + i}</ele></trkpt>"
        for i in range(20)
    )
    gpx.write_text(
        '<?xml version="1.0"?><gpx version="1.1" creator="unit" '
        'xmlns="http://www.topografix.com/GPX/1/1">'
        f"<trk><trkseg>{pts}</trkseg></trk></gpx>"
    )
    points, _tracks = gpx_files_to_points_df(spark, [str(gpx)])
    assert points.filter(f"ts_ns = {GO_ZERO_NS}").count() == 20
    prof = track_profiles(points).collect()
    assert len(prof) == 1
    row = prof[0]
    assert row.start_ts_ns == GO_ZERO_NS and row.end_ts_ns == GO_ZERO_NS
    assert row.time_quality == 0  # no valid times
    assert row.n_points == 20


def test_srtm_accuracy_query_matches_kernel(spark):
    """The distributed A4 query (broadcast DEM join + banded penalty
    ladder in SQL expressions) must reproduce the Go-parity kernel's
    score for the same points."""
    from gotrackmaster_spark.driver_queries import q_srtm_accuracy
    from gotrackmaster_spark.kernels import quality as KQ
    from gotrackmaster_spark.kernels import track as K
    from gotrackmaster_spark.operators.quality import synthetic_dem_lookup

    sf = "/root/testdata/sf0.001"
    got = {r.user_id: (r.srtm_accuracy, r.total)
           for r in q_srtm_accuracy(spark, sf).collect()}

    from gotrackmaster_spark.driver_queries import geo_events
    pts = geo_events(spark, sf).select("user_id", "lat", "lon", "ele").collect()
    by_user: dict = {}
    for r in pts:
        by_user.setdefault(r.user_id, []).append(K.Pt(r.lat, r.lon, r.ele, 0))
    for uid, seg in by_user.items():
        score, ok = KQ.elevation_srtm_accuracy([seg], synthetic_dem_lookup)
        assert ok
        assert got[uid] == (score, len(seg)), uid


def test_time_band_candidates_straddle_zero(spark):
    """_time_band_candidates buckets with `div` (truncation toward zero):
    bucket 0's preimage is (-diff, diff) — twice as wide — but every pair
    with |delta| < diff must still land within one bucket of each other.
    Pin it with timestamps straddling the epoch."""
    from gotrackmaster_spark.operators.spatial import _time_band_candidates

    diff = 60  # seconds
    dns = diff * 10**9
    ts = [-2 * dns - 5, -dns - 1, -dns + 1, -5, 0, 5, dns - 1, dns + 1, 2 * dns + 5]
    rows = [(f"t{i}", t) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "track_id string, start_ts_ns long")
    cand = {
        (r.a_id, r.b_id)
        for r in _time_band_candidates(df, "start_ts_ns", diff).collect()
    }
    want = {
        (f"t{i}", f"t{j}")
        for i in range(len(ts))
        for j in range(i + 1, len(ts))
        if abs(ts[i] - ts[j]) < dns
    }
    missing = want - cand
    assert not missing, f"pigeonhole violated near zero: {sorted(missing)}"

"""Kernel-fidelity pin for the classification_counts driver query.

The query (driver_queries.q_classification_counts) transcribes the
post-repair aggregate + label ladder of misc.go:183-245 into Column/SQL
form over a deterministic synthetic track table.  This test rebuilds the
same synthetic tracks in plain Python and runs the aggregate through the
REAL kernel functions (kernels.track.speed_between → geodesy.distance_2d_s,
ns-based time_diff) plus a literal transcription of the ladder, then
asserts the Spark query's label per track matches.  Any drift between the
SQL transcription and the kernel math (band edges, middle-80% bounds,
non-exclusive band sums, vertical-speed sign) fails here point-for-point.
"""

from __future__ import annotations

import duckdb
import pytest

from gotrackmaster_spark.kernels import track as K

SF_DIR = "/root/testdata/sf0.001"


def _synthetic_tracks():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CASE WHEN user_id % 6 = 0 THEN user_id + 1000 ELSE user_id % 25 END AS tk,
               row_number() OVER (PARTITION BY
                   CASE WHEN user_id % 6 = 0 THEN user_id + 1000 ELSE user_id % 25 END
                   ORDER BY ts, event_id) - 1 AS i
        FROM read_parquet('{SF_DIR}/events.parquet')
        ORDER BY tk, i
        """
    ).fetchall()
    tracks: dict[int, list[K.Pt]] = {}
    for tk, i in rows:
        step = 1 + (tk * 23) % 64
        kk = 0 if tk % 3 == 2 else (tk % 5) + 1
        lat = -60.0 + (tk % 120) + (i * step) * 4.0e-6
        lon = -150.0 + ((tk * 37) % 300) + ((i * 2654435761) % 97) * 1.0e-8
        ele = float((i * kk) % 60) * 0.5
        t_ns = i * 1_000_000_000  # 1 s per step, matching t_us = i * 1e6
        tracks.setdefault(tk, []).append(K.Pt(lat, lon, ele, t_ns))
    return tracks


def _kernel_label(seg: list[K.Pt]) -> tuple[str, int]:
    # Literal transcription of misc.go:183-245 post-repair aggregate,
    # driven through the real speed_between kernel.
    if len(seg) < 80:  # MIN_SEGMENT_LENGTH, definitions.go:57
        return "Unknown", 0
    div = len(seg) // 10
    sflat = sup = sdown = stot = elev = dist = 0.0
    total = 0
    for i in range(div, len(seg) - div):
        point = K.speed_between(seg[i], seg[i + 1], False)
        if point.speed_vertical <= 0.4:
            sflat += point.speed
        if point.speed_vertical > 0.4:
            sup += point.speed
        if point.speed_vertical < -0.4:
            sdown += point.speed
        stot += point.speed
        elev += abs(point.elevation)
        dist += point.length
        total += 1
    sflat /= total
    stot /= total
    ratio = float("inf") if dist == 0 else elev / dist
    if ratio < 0.05:
        c = "Walking Transport"
        if sflat > 1.6:
            c = "Running Sport"
        if sflat > 4.1:
            c = "Cycling Transport"
        if sflat > 7.5:
            c = "Cycling Sport"
        if sflat > 11:
            c = "Cycling Racing"
        if sflat > 25:
            c = "Motor Sport"
    else:
        c = "Walking Mountain"
        if sflat > 1.2 or stot > 1.3:
            c = "Running Mountain"
        if sflat > 3.8 or stot > 3.8:
            c = "Cycling Mountain"
    return c, total


@pytest.fixture(scope="module")
def expected():
    return {
        tk: _kernel_label(seg) for tk, seg in _synthetic_tracks().items()
    }


def test_query_matches_kernel_ladder(spark, expected):
    from gotrackmaster_spark import driver_queries as Q

    got = {
        r["track_id"]: (r["label"], r["n_mid"])
        for r in Q.q_classification_counts(spark, SF_DIR).collect()
    }
    assert got == expected


def test_ladder_exercises_all_labels(spark):
    # At sf0.01 the synthetic layout is tuned to hit every rung of the
    # ladder (both branches) plus the short-track Unknown guard.
    from gotrackmaster_spark import driver_queries as Q

    labels = {
        r["label"]
        for r in Q.q_classification_counts(spark, "/root/testdata/sf0.01")
        .select("label")
        .distinct()
        .collect()
    }
    assert labels == {
        "Unknown",
        "Walking Transport", "Running Sport", "Cycling Transport",
        "Cycling Sport", "Cycling Racing", "Motor Sport",
        "Walking Mountain", "Running Mountain", "Cycling Mountain",
    }

"""Track-level quality scores + classification (Layer K, SURVEY.md §2.4).

Literal translations of the reference's aggregates — exact operation order,
integer divisions, and guard quirks preserved:

* TimeQuality          — /root/reference/trackmaster/time.go:108-132
* DistanceQuality      — /root/reference/trackmaster/distance.go:453-496
* ElevationSRTM        — /root/reference/trackmaster/elevation.go:125-157
* ElevationSRTMAccuracy— /root/reference/trackmaster/elevation.go:159-215
* QualityTrack         — /root/reference/trackmaster/misc.go:364-383
* ClassificationTrack  — /root/reference/trackmaster/misc.go:125-245
* GetPositionStart/End — /root/reference/trackmaster/distance.go:426-451

All operate on a track = list of segments = list[list[Pt]] (the reference's
triple nest with one Trk per track, per the graft input_hint).  The network
SRTM source is replaced by an injected ``lookup(lat, lon) -> float | None``
(None ⇒ the Go error path).
"""

from __future__ import annotations

import math

from gotrackmaster_spark.functions.geodesy import MIN_SEGMENT_LENGTH, distance_2d_s
from gotrackmaster_spark.kernels import fast as KF
from gotrackmaster_spark.kernels import track as K
from gotrackmaster_spark.schemas import GO_ZERO_NS

Y2K_NS = 946684800 * 1_000_000_000  # 2000-01-01T00:00:00Z

CLASSIFICATION_NONE = "Unknown"


def time_valid(t_ns: int, now_ns: int) -> bool:
    # time.go:161-163 (time.Now() parameterized as now_ns — documented
    # deviation: the engine takes `now` as a query parameter)
    return t_ns != GO_ZERO_NS and t_ns > Y2K_NS and t_ns < now_ns


def time_quality_track(segments: list[list[K.Pt]], now_ns: int) -> int:
    # time.go:108-132 — integer arithmetic; out-of-order costs 4;
    # lastValid updates to the CURRENT time each iteration (even invalid).
    num = 0
    total = 0
    for seg in segments:
        last_valid = GO_ZERO_NS
        for p in seg:
            if not time_valid(p.t, now_ns):
                num += 1
            if last_valid != GO_ZERO_NS and p.t < last_valid:
                num += 4
            last_valid = p.t
            total += 1
    if num > total:
        return 0
    if total == 0:
        return -1
    return 100 - (num * 100 // total)


def distance_quality_track(segments: list[list[K.Pt]]) -> float:
    # distance.go:453-496 — step penalties + weighted defect counts.
    distance = 0.0
    quality = 100.0
    num = 0
    for seg in segments:
        for i in range(len(seg) - 1):
            distance += distance_2d_s(seg[i].lat, seg[i].lon, seg[i + 1].lat, seg[i + 1].lon)
        num += len(seg)

    step = distance / num if num else math.nan
    if step > 30:
        quality -= 12
    if step > 8:
        quality -= 6

    n_inter = sum(len(KF.remove_intersections(list(s), 5, False)[1]) for s in segments)
    quality -= float(n_inter) * 0.6
    n_first = sum(len(K.remove_first_noise(list(s), False)[1]) for s in segments)
    quality -= float(n_first) * 0.3
    n_close = sum(
        len(KF.remove_stops(list(s), 0.0, 0.5, K._GO_MAX_FLOAT64, 0, False)[1])
        for s in segments
    )
    quality -= float(n_close) * 0.2
    n_noise = sum(len(KF.remove_noise(list(s), 6, 1.1, 4, False)[1]) for s in segments)
    quality -= float(n_noise) * 0.4

    if quality < 0:
        quality = 0.0
    return quality


def elevation_srtm(segments: list[list[K.Pt]], lookup) -> bool:
    """elevation.go:125-157 — overwrite every elevation with the DEM sample.
    Returns False on the error path (lookup is None / returns None), True on
    success.  The hrs/lastHRS accumulation in Go is vestigial (never read) —
    not replicated."""
    if lookup is None:
        return False
    for seg in segments:
        for p in seg:
            elevation = lookup(p.lat, p.lon)
            if elevation is None:
                return False
            p.ele = elevation
    return True


def elevation_srtm_accuracy(segments: list[list[K.Pt]], lookup) -> tuple[int, bool]:
    """elevation.go:159-215 → (score, ok).  ok=False ⇒ Go's err path
    (returns -1)."""
    if lookup is None:
        return -1, False
    num = 0
    total = 0
    for seg in segments:
        for p in seg:
            elevation = lookup(p.lat, p.lon)
            if elevation is None:
                return -1, False
            max1, max2 = 9.0, 45.0
            if elevation > 250:
                max1, max2 = 8.0, 40.0
            if elevation > 500:
                max1, max2 = 6.0, 35.0
            if elevation > 1000:
                max1, max2 = 4.0, 30.0
            if elevation > 2000:
                max1, max2 = 3.0, 20.0
            if elevation > 3000:
                max1, max2 = 2.0, 15.0
            try:
                e = abs(elevation - p.ele) * 100 / elevation
            except ZeroDivisionError:
                diff = abs(elevation - p.ele) * 100
                e = math.nan if diff == 0 else math.inf
            if e > max1:
                num += 1
            if e > max2:
                num += 4
            total += 1
    if num > total:
        return 0, True
    if total == 0:
        return 0, True
    return 100 - (num * 100 // total), True


def quality_track(segments: list[list[K.Pt]], now_ns: int, lookup=None) -> float:
    # misc.go:364-383 — time 10%, distance 60%, elevation 30%.
    t = time_quality_track(segments, now_ns)
    e, _ok = elevation_srtm_accuracy(segments, lookup)
    d = distance_quality_track(segments)
    if e < 0:
        e = 0
    v = (float(t) / 10 + (d * 6 / 10) + (float(e) * 3 / 10)) * 100
    return math.copysign(math.floor(abs(v) + 0.5), v) / 100  # Go math.Round


def classification_track(
    segments: list[list[K.Pt]], lookup=None
) -> tuple[str, list[list[K.Pt]]]:
    """misc.go:125-245 — the 7-stage fix pipeline + middle-80% aggregate +
    threshold ladder.  Returns (label, repaired_segments).

    SRTM quirk preserved: the elevation rewrite only runs when the accuracy
    call itself FAILED and returned num < 60 (misc.go:157-161)."""
    segments = [list(s) for s in segments]
    for s in segments:
        K.fix_times_segment(s)
        KF.max_speed(s, 200, True)
    segments = [KF.remove_stops(s, 0.0, 1.2, K._GO_MAX_FLOAT64, 0, True)[0] for s in segments]
    segments = [KF.remove_stops(s, 30.0, 9.0, 8, 12, True)[0] for s in segments]
    for _ in range(4):
        segments = [KF.remove_intersections(s, 7, True)[0] for s in segments]

    num, ok = elevation_srtm_accuracy(segments, lookup)
    if not ok:
        if num < 60:
            elevation_srtm(segments, lookup)

    speed_up = speed_down = speed_flat = speed_total = 0.0
    elevation = distance = 0.0
    total = 0
    for seg in segments:
        if len(seg) < MIN_SEGMENT_LENGTH:
            continue
        div = len(seg) // 10
        for i in range(div, len(seg) - div):
            point = K.speed_between(seg[i], seg[i + 1], False)
            if point.speed_vertical <= 0.4:
                speed_flat += point.speed
            if point.speed_vertical > 0.4:
                speed_up += point.speed
            if point.speed_vertical < -0.4:
                speed_down += point.speed
            speed_total += point.speed
            elevation += abs(point.elevation)
            distance += point.length
            total += 1

    if total:
        speed_up /= total
        speed_down /= total
        speed_flat /= total
        speed_total /= total
    else:
        speed_up = speed_down = speed_flat = speed_total = math.nan

    c = CLASSIFICATION_NONE
    if total != 0:
        if (elevation / distance) < 0.05:
            c = "Walking Transport"
            if speed_flat > 1.6:
                c = "Running Sport"
            if speed_flat > 4.1:
                c = "Cycling Transport"
            if speed_flat > 7.5:
                c = "Cycling Sport"
            if speed_flat > 11:
                c = "Cycling Racing"
            if speed_flat > 25:
                c = "Motor Sport"
        else:
            c = "Walking Mountain"
            if speed_flat > 1.2 or speed_total > 1.3:
                c = "Running Mountain"
            if speed_flat > 3.8 or speed_total > 3.8:
                c = "Cycling Mountain"
    return c, segments


def get_position_start(segments: list[list[K.Pt]]) -> K.Pt | None:
    # distance.go:426-437 — first point with Lat != 0 AND Lon != 0
    for seg in segments:
        for p in seg:
            if p.lat != 0 and p.lon != 0:
                return p
    return None


def get_position_end(segments: list[list[K.Pt]]) -> K.Pt | None:
    # distance.go:439-451 — reverse scan
    for seg in reversed(segments):
        for p in reversed(seg):
            if p.lat != 0 and p.lon != 0:
                return p
    return None


def get_time_start(segments: list[list[K.Pt]], now_ns: int) -> int:
    # time.go:134-146 — first point with valid time AND nonzero lat/lon
    # (tz conversion is the engine's PIP-join stage, not done here)
    for seg in segments:
        for p in seg:
            if time_valid(p.t, now_ns) and p.lat != 0 and p.lon != 0:
                return p.t
    return GO_ZERO_NS


def get_time_end(segments: list[list[K.Pt]], now_ns: int) -> int:
    for seg in reversed(segments):
        for p in reversed(seg):
            if time_valid(p.t, now_ns) and p.lat != 0 and p.lon != 0:
                return p.t
    return GO_ZERO_NS

"""Accelerated Layer-K kernels: same sequential control flow as
kernels/track.py, but the pairwise geodesy is PRECOMPUTED in vectorized
batches via functions/gomath_np (bit-identical to the scalar Go-FDLIBM
ports — tests/test_gomath_np.py).

Where a kernel mutates points mid-scan (MaxSpeed's midpoint fix), the
precomputed pairs touching mutated indices are recomputed scalar — defects
are sparse, so the common path stays vectorized.  Exact equality with the
reference-literal kernels is asserted per fixture in
tests/test_fast_kernels.py; operators/repair.py dispatches to these.
"""

from __future__ import annotations

import numpy as np

from gotrackmaster_spark.functions.gomath_np import (
    distance_2d_go_np,
    haversine_go_np,
)
from gotrackmaster_spark.kernels import track as K
from gotrackmaster_spark.kernels.track import Defect, Pt, _GO_MAX_FLOAT64


def _arrays(pts: list[Pt]):
    lat = np.array([p.lat for p in pts])
    lon = np.array([p.lon for p in pts])
    return lat, lon


def _hav_band(pts: list[Pt], width: int) -> np.ndarray:
    """B[i, k] = haversine(pts[i], pts[i+1+k]) for k < width (NaN pad)."""
    n = len(pts)
    lat, lon = _arrays(pts)
    out = np.full((n, width), np.nan)
    for k in range(width):
        m = n - 1 - k
        if m <= 0:
            break
        out[:m, k] = haversine_go_np(lat[:m], lon[:m], lat[k + 1 :], lon[k + 1 :])
    return out


def remove_noise(pts, max_distance, max_elevation, max_points, fix):
    """Fast twin of K.remove_noise (distance.go:159-188): no mutation →
    the probe band is precomputed once."""
    result: list[Defect] = []
    dst: list[Pt] = []
    n = len(pts)
    if n == 0:
        return (pts, result)
    width = max(max_points - 1, 1)
    band = _hav_band(pts, width)
    ele = np.array([p.ele for p in pts])
    i = 0
    while i < n - 1:
        next_distance = band[i, 0]
        # probe: nearest of pts[i+1 .. i+max_points-1] under caps
        last_point = -1
        min_distance = _GO_MAX_FLOAT64
        for k in range(min(max_points - 1, n - 1 - i)):
            distance = band[i, k]
            elevation = abs(ele[i] - ele[i + 1 + k])
            if distance < min_distance and distance < max_distance and elevation <= max_elevation:
                min_distance = distance
                last_point = i + 1 + k
        if last_point == -1:
            min_distance = _GO_MAX_FLOAT64
        if next_distance > min_distance:
            result.append(Defect(pt_idx=i, lat=pts[i].lat, lon=pts[i].lon))
            dst.append(pts[i])
            dst.append(pts[last_point])
            i = last_point
        else:
            dst.append(pts[i])
        i += 1
    if fix and len(dst) > 0:
        return dst, result
    return pts, result


def remove_stops(pts, min_seconds, max_distance, max_elevation, min_points, fix):
    """Fast twin of K.remove_stops (distance.go:190-277).  The anchor-run
    path mutates elevations (zero-ele backfill) and measures from the run
    anchor, so only the no-run path (point == i, the common case) uses the
    precomputed consecutive distances; elevation reads always go through
    the live list."""
    result: list[Defect] = []
    dst: list[Pt] = []
    n = len(pts)
    if n == 0:
        if fix:
            return dst, result
        return pts, result
    lat, lon = _arrays(pts)  # positions never mutate in this kernel
    hav_next = haversine_go_np(lat[:-1], lon[:-1], lat[1:], lon[1:])
    # anchor-run distances: chunked vectorized cache (long stop runs would
    # otherwise fall back to per-point scalar haversine)
    cache_anchor = -1
    cache_start = cache_end = 0
    cache = None
    first_point = -1
    num_points = 0
    for i in range(n - 1):
        point = i if first_point == -1 else first_point
        if pts[point].ele == 0:
            pts[point].ele = pts[i + 1].ele
        if point == i:
            distance = hav_next[i]
        elif i - point < 8:
            # short runs: scalar beats numpy call overhead
            distance = K.haversine_s(
                pts[point].lat, pts[point].lon, pts[i + 1].lat, pts[i + 1].lon
            )
        else:
            idx = i + 1
            if cache_anchor != point or not (cache_start <= idx < cache_end):
                chunk = 64 if cache_anchor != point else min((cache_end - cache_start) * 4, 4096)
                m = min(n, idx + chunk)
                cache = haversine_go_np(lat[point], lon[point], lat[idx:m], lon[idx:m])
                cache_anchor, cache_start, cache_end = point, idx, m
            distance = cache[idx - cache_start]
        elevation = abs(pts[point].ele - pts[i + 1].ele)
        if distance <= max_distance and elevation <= max_elevation:
            if first_point == -1:
                first_point = i
            num_points += 1
        else:
            seconds = K.time_diff(pts[point], pts[i])
            if num_points > min_points and seconds > min_seconds:
                distance = K.haversine_s(
                    pts[first_point].lat, pts[first_point].lon, pts[i].lat, pts[i].lon
                )
                elevation = abs(pts[first_point].ele - pts[i].ele)
                result.append(Defect(
                    pt_idx=first_point, count=num_points, length=distance,
                    elevation=elevation, duration=seconds,
                    lat=pts[first_point].lat, lon=pts[first_point].lon,
                ))
                if num_points > min_points and seconds > min_seconds:
                    dst.append(pts[first_point])
                else:  # dead branch (Go parity)
                    dst.extend(pts[first_point : i + 1])
                if min_points != 0:
                    dst.append(pts[i])
            else:
                if first_point == -1:
                    dst.append(pts[i])
                else:
                    dst.extend(pts[first_point : i + 1])
            first_point, num_points = -1, 0
    if fix:
        if num_points == 0:
            if len(pts) != 0:
                dst.append(pts[-1])
        else:
            dst.extend(pts[first_point:])
            distance = K.haversine_s(
                pts[first_point].lat, pts[first_point].lon, pts[-1].lat, pts[-1].lon
            )
            elevation = abs(pts[first_point].ele - pts[-1].ele)
            seconds = K.time_diff(pts[first_point], pts[-1])
            result.append(Defect(
                pt_idx=first_point, count=num_points, length=distance,
                elevation=elevation, duration=seconds,
                lat=pts[first_point].lat, lon=pts[first_point].lon,
            ))
        return dst, result
    return pts, result


def max_speed(pts, maximum, fix):
    """Fast twin of K.max_speed (speed.go:10-31): consecutive-pair speed
    precomputed; a fix mutates pts[i+1], so the pairs (i, i+1) and
    (i+1, i+2) are marked dirty and recomputed scalar on read."""
    n = len(pts)
    result: list[Defect] = []
    if n < 2:
        return result
    lat, lon = _arrays(pts)
    d2 = distance_2d_go_np(lat[:-1], lon[:-1], lat[1:], lon[1:])
    dirty = np.zeros(n - 1, dtype=bool)
    for i in range(n - 1):
        if dirty[i]:
            point = K.speed_between(pts[i], pts[i + 1], False)
            speed = point.speed
        else:
            seconds = K.time_diff(pts[i], pts[i + 1])
            speed = 0.0 if seconds == 0 else d2[i] / seconds
        if speed > maximum:
            point = K.speed_between(pts[i], pts[i + 1], False)
            point.lat = pts[i].lat
            point.lon = pts[i].lon
            point.pt_idx = i
            result.append(point)
            K._max_speed_fix(pts, i, fix)
            if fix:
                if i + 1 < n - 1:
                    dirty[i + 1] = True
                dirty[i] = True  # already consumed, but keep state honest
    return result


def remove_last_max_speed(pts, maximum, fix):
    """Fast twin of K.remove_last_max_speed (speed.go:33-79): backward
    pairwise scan, no mutation → fully precomputed pairs."""
    from gotrackmaster_spark.functions.geodesy import MIN_SEGMENT_LENGTH

    result: list[Defect] = []
    n = len(pts)
    if n < MIN_SEGMENT_LENGTH:
        return pts, result
    lat, lon = _arrays(pts)
    # pair (i, i-1) in the Go order — the hybrid distance uses cos(lat1) of
    # the FIRST argument, so direction matters for bit parity
    d2r = distance_2d_go_np(lat[1:], lon[1:], lat[:-1], lon[:-1])
    first_point = -1
    saw_max = False
    seconds = 0.0
    for i in range(n - 1, 1, -1):
        dur = K.time_diff(pts[i], pts[i - 1])
        if dur < 2.5:
            continue
        speed = 0.0 if dur == 0 else d2r[i - 1] / dur
        if speed < maximum:
            if seconds == 0:
                first_point = i
            seconds += dur
            if seconds > 120:
                break
        else:
            saw_max = True
            seconds = 0.0
    if first_point != -1 and first_point != 0 and saw_max:
        result.append(Defect(pt_idx=first_point, count=n - first_point,
                             lat=pts[first_point].lat, lon=pts[first_point].lon))
        if fix:
            pts = pts[: first_point + 1]
    return pts, result


def remove_intersections(pts, max_n, fix):
    """Fast twin of K.remove_intersections (distance.go:312-342).

    The band of orientation tests is computed VECTORIZED over the whole
    current point list; splices are rare, so the scan re-vectorizes only
    after each splice.  Scan order, the post-splice index jump against the
    NEW list, and exact float orientation arithmetic are preserved.
    """
    result: list[Defect] = []
    pts = list(pts)
    resume_i = 0
    while True:
        n = len(pts)
        if n < 3:
            break
        lat = np.array([p.lat for p in pts])
        lon = np.array([p.lon for p in pts])

        # edge vectors: edge e = (e, e+1), e in 0..n-2
        # test edge i vs edge j for j = i+2+k, k in 0..max_n-3 (Go bound:
        # j in [i+2, min(i+max_n, n-1)) and j+1 <= n-1)
        width = max(max_n - 2, 0)
        if width == 0:
            break
        p_lat, p_lon = lat[:-1], lon[:-1]          # p  = pts[e]
        q_lat, q_lon = lat[1:], lon[1:]            # q  = pts[e+1]

        def orient_sign(alat, alon, blat, blon, clat, clon):
            val = (blon - alon) * (clat - blat) - (blat - alat) * (clon - blon)
            return np.where(val == 0, 0, np.where(val > 0, 1, 2))

        hit_i = -1
        hit_j = -1
        ne = n - 1  # number of edges
        found = False
        # mask per k-offset, vectorized over i
        cand = np.zeros((ne, width), dtype=bool)
        for k in range(width):
            j = np.arange(ne) + 2 + k
            valid = j < ne  # edge j exists
            jm = np.where(valid, j, 0)
            o1 = orient_sign(p_lat, p_lon, q_lat, q_lon, p_lat[jm], p_lon[jm])
            o2 = orient_sign(p_lat, p_lon, q_lat, q_lon, q_lat[jm], q_lon[jm])
            o3 = orient_sign(p_lat[jm], p_lon[jm], q_lat[jm], q_lon[jm], p_lat, p_lon)
            o4 = orient_sign(p_lat[jm], p_lon[jm], q_lat[jm], q_lon[jm], q_lat, q_lon)
            inter = (o1 != o2) & (o3 != o4) & (o1 != 0) & (o2 != 0) & (o3 != 0) & (o4 != 0)
            cand[:, k] = inter & valid
        # Go's additional bound: j ranges to min(i+max_n, n-1)-1 → j ≤ n-2
        # (edge validity above) and j ≤ i+max_n-1 → k ≤ max_n-3 (by width)
        rows = np.nonzero(cand[resume_i:].any(axis=1))[0]
        for r in rows:
            i = resume_i + int(r)
            ks = np.nonzero(cand[i])[0]
            k = int(ks[0])
            hit_i, hit_j = i, i + 2 + k
            found = True
            break
        if not found:
            break
        result.append(Defect(pt_idx=hit_i, lat=pts[hit_i].lat, lon=pts[hit_i].lon))
        last_point = hit_j + 1
        if fix:
            pts = pts[: hit_i + 1] + pts[last_point:]
        # Go quirk (distance.go:337-340): wptTypeNo = lastPoint - 1, then
        # ++ → the NUMERIC index lastPoint, interpreted against the (now
        # spliced) list — this skips points; replicated literally
        resume_i = last_point
    return pts, result

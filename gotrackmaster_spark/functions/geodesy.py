"""Geodesy core: scalar twins (bit-parity with the reference) + Column exprs.

Three layers, all computing the same math:

* ``*_s``   — scalar Python, literal operation-order translation of the Go
              functions (``/root/reference/trackmaster/distance.go:11-54``,
              ``geo.go:10-81``).  Used inside sequential kernels where the
              fixtures demand float64 bit-parity.
* ``*_np``  — vectorized numpy for Arrow-batched pandas UDF hot paths.
* ``*_col`` — pyspark Column expressions so Catalyst/whole-stage-codegen
              handles the throughput path JVM-side (no Python at all).

Constants from ``trackmaster/definitions.go:10-13``.
"""

from __future__ import annotations

import math

import numpy as np

from gotrackmaster_spark.functions.gomath import (
    go_asin,
    go_atan2,
    go_cos,
    go_exp,
    go_sin,
)
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS = 6371 * 1000  # meters (definitions.go:11)
ONE_DEGREE = 1000.0 * 10000.8 / 90.0  # ≈111120 m/deg (definitions.go:12)
MIN_SEGMENT_LENGTH = 80  # definitions.go:57


# ---------------------------------------------------------------- scalar ---

def to_radians_s(x: float) -> float:
    # geo.go:10-12 — divide by 180 first, THEN multiply by pi (order matters
    # for the last ULP; math.radians() multiplies first).
    return x / 180.0 * math.pi


def to_degrees_s(rad: float) -> float:
    return rad * 180 / math.pi


def haversine_s(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    # distance.go:41-50, same operation order.
    d_lat = to_radians_s(lat1 - lat2)
    d_lon = to_radians_s(lon1 - lon2)
    t1 = to_radians_s(lat1)
    t2 = to_radians_s(lat2)
    a = go_sin(d_lat / 2) * go_sin(d_lat / 2) + go_sin(d_lon / 2) * go_sin(
        d_lon / 2
    ) * go_cos(t1) * go_cos(t2)
    c = 2 * go_atan2(math.sqrt(a), math.sqrt(1 - a))
    return EARTH_RADIUS * c


def distance_s(
    lat1: float,
    lon1: float,
    ele1: float,
    lat2: float,
    lon2: float,
    ele2: float,
    three_d: bool,
    haversine: bool = False,
) -> float:
    # distance.go:21-36 — hybrid equirectangular/haversine switch at 0.2°,
    # cos() of the FIRST point's latitude (not the midpoint).
    abs_lat = abs(lat1 - lat2)
    abs_lon = abs(lon1 - lon2)
    if haversine or abs_lat > 0.2 or abs_lon > 0.2:
        return haversine_s(lat1, lon1, lat2, lon2)
    coefficient = go_cos(to_radians_s(lat1))
    x = lat1 - lat2
    y = (lon1 - lon2) * coefficient
    distance_2d = math.sqrt(x * x + y * y) * ONE_DEGREE
    if not three_d or ele1 == ele2:
        return distance_2d
    ele_diff = ele1 - ele2
    return math.sqrt(distance_2d * distance_2d + ele_diff * ele_diff)


def distance_2d_s(lat1, lon1, lat2, lon2):
    return distance_s(lat1, lon1, 0.0, lat2, lon2, 0.0, False, False)


def distance_3d_s(lat1, lon1, ele1, lat2, lon2, ele2):
    return distance_s(lat1, lon1, ele1, lat2, lon2, ele2, True, False)


def geo_to_cartesian_s(lat: float, lon: float, ele: float):
    # geo.go:20-28 — ECEF on a sphere of radius R + ele.
    lat_rad = to_radians_s(lat)
    lon_rad = to_radians_s(lon)
    r = EARTH_RADIUS + ele
    x = r * go_cos(lat_rad) * go_cos(lon_rad)
    y = r * go_cos(lat_rad) * go_sin(lon_rad)
    z = r * go_sin(lat_rad)
    return x, y, z


def cartesian_to_geo_s(x: float, y: float, z: float):
    # geo.go:31-40
    r = math.sqrt(x * x + y * y + z * z)
    lat = to_degrees_s(go_asin(z / r))
    lon = to_degrees_s(go_atan2(y, x))
    return lat, lon, r - EARTH_RADIUS


def midpoint_s(lat1, lon1, ele1, lat2, lon2, ele2):
    # geo.go:43-50 — cartesian mean, back to geo.
    x1, y1, z1 = geo_to_cartesian_s(lat1, lon1, ele1)
    x2, y2, z2 = geo_to_cartesian_s(lat2, lon2, ele2)
    return cartesian_to_geo_s((x1 + x2) / 2, (y1 + y2) / 2, (z1 + z2) / 2)


def gaussian_s(x: float, sigma: float) -> float:
    # geo.go:79-81
    return (1.0 / (math.sqrt(2 * math.pi) * sigma)) * go_exp(
        -math.pow(x, 2.0) / (2 * math.pow(sigma, 2.0))
    )


# ----------------------------------------------------------------- numpy ---

def haversine_np(lat1, lon1, lat2, lon2):
    d_lat = (lat1 - lat2) / 180.0 * np.pi
    d_lon = (lon1 - lon2) / 180.0 * np.pi
    t1 = lat1 / 180.0 * np.pi
    t2 = lat2 / 180.0 * np.pi
    a = np.sin(d_lat / 2) * np.sin(d_lat / 2) + np.sin(d_lon / 2) * np.sin(
        d_lon / 2
    ) * np.cos(t1) * np.cos(t2)
    c = 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a))
    return EARTH_RADIUS * c


def distance_2d_np(lat1, lon1, lat2, lon2):
    """Vectorized hybrid 2D distance (distance.go:21-36 semantics)."""
    hav = haversine_np(lat1, lon1, lat2, lon2)
    coefficient = np.cos(lat1 / 180.0 * np.pi)
    x = lat1 - lat2
    y = (lon1 - lon2) * coefficient
    flat = np.sqrt(x * x + y * y) * ONE_DEGREE
    use_hav = (np.abs(lat1 - lat2) > 0.2) | (np.abs(lon1 - lon2) > 0.2)
    return np.where(use_hav, hav, flat)


def distance_3d_np(lat1, lon1, ele1, lat2, lon2, ele2):
    d2 = distance_2d_np(lat1, lon1, lat2, lon2)
    use_hav = (np.abs(lat1 - lat2) > 0.2) | (np.abs(lon1 - lon2) > 0.2)
    same_ele = ele1 == ele2
    d3 = np.sqrt(d2 * d2 + (ele1 - ele2) * (ele1 - ele2))
    return np.where(use_hav | same_ele, d2, d3)


# ---------------------------------------------------------------- Column ---

def haversine_col(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """JVM-side haversine; same formula/order as distance.go:41-50."""
    d_lat = (lat1 - lat2) / F.lit(180.0) * F.lit(math.pi)
    d_lon = (lon1 - lon2) / F.lit(180.0) * F.lit(math.pi)
    t1 = lat1 / F.lit(180.0) * F.lit(math.pi)
    t2 = lat2 / F.lit(180.0) * F.lit(math.pi)
    a = F.sin(d_lat / 2) * F.sin(d_lat / 2) + F.sin(d_lon / 2) * F.sin(d_lon / 2) * F.cos(t1) * F.cos(t2)
    c = F.lit(2) * F.atan2(F.sqrt(a), F.sqrt(F.lit(1) - a))
    return F.lit(float(EARTH_RADIUS)) * c


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The identical formula as an ANSI-SQL string (for DuckDB oracles)."""
    dlat = f"(({lat1})-({lat2}))/180.0*pi()"
    dlon = f"(({lon1})-({lon2}))/180.0*pi()"
    t1 = f"({lat1})/180.0*pi()"
    t2 = f"({lat2})/180.0*pi()"
    a = (
        f"sin(({dlat})/2)*sin(({dlat})/2) + "
        f"sin(({dlon})/2)*sin(({dlon})/2)*cos({t1})*cos({t2})"
    )
    return f"6371000 * 2 * atan2(sqrt({a}), sqrt(1-({a})))"


def distance_2d_col(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Hybrid 2D distance as a Column expression."""
    hav = haversine_col(lat1, lon1, lat2, lon2)
    coefficient = F.cos(lat1 / F.lit(180.0) * F.lit(math.pi))
    x = lat1 - lat2
    y = (lon1 - lon2) * coefficient
    flat = F.sqrt(x * x + y * y) * F.lit(ONE_DEGREE)
    use_hav = (F.abs(lat1 - lat2) > 0.2) | (F.abs(lon1 - lon2) > 0.2)
    return F.when(use_hav, hav).otherwise(flat)


def distance_2d_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    hav = haversine_sql(lat1, lon1, lat2, lon2)
    flat = (
        f"sqrt( (({lat1})-({lat2}))*(({lat1})-({lat2})) + "
        f"((({lon1})-({lon2}))*cos(({lat1})/180.0*pi()))*((({lon1})-({lon2}))*cos(({lat1})/180.0*pi())) ) * {ONE_DEGREE!r}"
    )
    return (
        f"CASE WHEN abs(({lat1})-({lat2})) > 0.2 OR abs(({lon1})-({lon2})) > 0.2 "
        f"THEN ({hav}) ELSE ({flat}) END"
    )


def bearing_col(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing 1→2 in degrees, normalized to
    [0, 360).  Standard formula: atan2(sin Δλ·cos φ₂,
    cos φ₁·sin φ₂ − sin φ₁·cos φ₂·cos Δλ)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2 - lon1)
    x = F.sin(dl) * F.cos(p2)
    y = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)
    b = F.degrees(F.atan2(x, y))
    return (b + 360.0) % 360.0


def bearing_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB twin of :func:`bearing_col` (same operation order)."""
    p1 = f"radians({lat1})"
    p2 = f"radians({lat2})"
    dl = f"radians(({lon2}) - ({lon1}))"
    x = f"(sin({dl}) * cos({p2}))"
    y = f"(cos({p1}) * sin({p2}) - sin({p1}) * cos({p2}) * cos({dl}))"
    return f"((degrees(atan2({x}, {y})) + 360.0) % 360.0)"

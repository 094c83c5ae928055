"""Vectorized (numpy) twins of functions/gomath.py — bit-for-bit identical
to the scalar Go-FDLIBM ports, branchless via masks.

Every arithmetic op (+,-,*,/) on float64 numpy arrays is the same IEEE-754
operation the scalar code performs, so porting the exact polynomial kernels
and reduction steps preserves the final ULP; only control flow changes
(np.where over octant masks).  Equality with the scalar versions is
asserted over the full fixture set and random inputs in
tests/test_gomath_np.py — this is what lets the sequential Layer-K kernels
precompute their pairwise geodesy in vectorized batches without breaking
the Go golden-fixture parity.
"""

from __future__ import annotations

import numpy as np

from gotrackmaster_spark.functions.gomath import (
    _ATAN_P,
    _ATAN_Q,
    _COS_P,
    _MOREBITS,
    _PI,
    _PI4A,
    _PI4B,
    _PI4C,
    _REDUCE_THRESHOLD,
    _SIN_P,
    _TAN3PIO8,
)

EARTH_RADIUS = 6371 * 1000


def _sin_kernel_np(z, zz):
    p = _SIN_P
    return z + z * zz * (
        ((((p[0] * zz + p[1]) * zz + p[2]) * zz + p[3]) * zz + p[4]) * zz + p[5]
    )


def _cos_kernel_np(zz):
    p = _COS_P
    return 1.0 - 0.5 * zz + zz * zz * (
        ((((p[0] * zz + p[1]) * zz + p[2]) * zz + p[3]) * zz + p[4]) * zz + p[5]
    )


def _reduce(x):
    """Shared Pi/4 octant reduction (x ≥ 0) → (j, z, zz)."""
    assert (x < _REDUCE_THRESHOLD).all(), "trigReduce path not needed"
    j = np.trunc(x * (4 / _PI)).astype(np.int64)
    y = j.astype(np.float64)
    odd = (j & 1) == 1
    j = np.where(odd, j + 1, j)
    y = np.where(odd, y + 1.0, y)
    j = j & 7
    z = ((x - y * _PI4A) - y * _PI4B) - y * _PI4C
    return j, z, z * z


def go_sin_np(x):
    x = np.asarray(x, dtype=np.float64)
    sign = x < 0
    ax = np.abs(x)
    j, z, zz = _reduce(ax)
    sign = sign ^ (j > 3)
    j = np.where(j > 3, j - 4, j)
    use_cos = (j == 1) | (j == 2)
    y = np.where(use_cos, _cos_kernel_np(zz), _sin_kernel_np(z, zz))
    y = np.where(sign, -y, y)
    return np.where(x == 0, x, y)  # preserves ±0


def go_cos_np(x):
    x = np.abs(np.asarray(x, dtype=np.float64))
    j, z, zz = _reduce(x)
    sign = j > 3
    j = np.where(sign, j - 4, j)
    sign = sign ^ (j > 1)
    use_sin = (j == 1) | (j == 2)
    y = np.where(use_sin, _sin_kernel_np(z, zz), _cos_kernel_np(zz))
    return np.where(sign, -y, y)


def _xatan_np(x):
    P, Q = _ATAN_P, _ATAN_Q
    z = x * x
    z = (
        z
        * ((((P[0] * z + P[1]) * z + P[2]) * z + P[3]) * z + P[4])
        / (((((z + Q[0]) * z + Q[1]) * z + Q[2]) * z + Q[3]) * z + Q[4])
    )
    return x * z + x


def _satan_np(x):
    with np.errstate(divide="ignore", invalid="ignore"):
        lo = _xatan_np(x)
        hi = _PI / 2 - _xatan_np(1.0 / x) + _MOREBITS
        mid = _PI / 4 + _xatan_np((x - 1.0) / (x + 1.0)) + 0.5 * _MOREBITS
    return np.where(x <= 0.66, lo, np.where(x > _TAN3PIO8, hi, mid))


def go_atan_np(x):
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(all="ignore"):  # unused mask branches may overflow
        out = np.where(x > 0, _satan_np(x), -_satan_np(-x))
    return np.where(x == 0, x, out)


def go_atan2_np(y, x):
    y = np.asarray(y, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(all="ignore"):
        q = go_atan_np(y / x)
    q = np.where(x < 0, np.where(q <= 0, q + _PI, q - _PI), q)
    # specials (finite-only engine inputs): y == 0 / x == 0
    q = np.where(
        y == 0,
        np.where(np.signbit(x), np.copysign(_PI, y), np.copysign(0.0, y)),
        q,
    )
    q = np.where((x == 0) & (y != 0), np.copysign(_PI / 2, y), q)
    return q


# ------------------------------------------------------------- geodesy ---

def haversine_go_np(lat1, lon1, lat2, lon2):
    """Vectorized haversine, bit-identical to geodesy.haversine_s
    (distance.go:41-50 op order with Go libm semantics)."""
    d_lat = (lat1 - lat2) / 180.0 * _PI
    d_lon = (lon1 - lon2) / 180.0 * _PI
    t1 = lat1 / 180.0 * _PI
    t2 = lat2 / 180.0 * _PI
    a = go_sin_np(d_lat / 2) * go_sin_np(d_lat / 2) + go_sin_np(d_lon / 2) * go_sin_np(
        d_lon / 2
    ) * go_cos_np(t1) * go_cos_np(t2)
    c = 2 * go_atan2_np(np.sqrt(a), np.sqrt(1 - a))
    return EARTH_RADIUS * c


def distance_2d_go_np(lat1, lon1, lat2, lon2):
    """Vectorized hybrid 2D distance, bit-identical to
    geodesy.distance_2d_s (distance.go:21-36)."""
    ONE_DEGREE = 1000.0 * 10000.8 / 90.0
    hav = haversine_go_np(lat1, lon1, lat2, lon2)
    coefficient = go_cos_np(lat1 / 180.0 * _PI)
    x = lat1 - lat2
    y = (lon1 - lon2) * coefficient
    flat = np.sqrt(x * x + y * y) * ONE_DEGREE
    use_hav = (np.abs(lat1 - lat2) > 0.2) | (np.abs(lon1 - lon2) > 0.2)
    return np.where(use_hav, hav, flat)

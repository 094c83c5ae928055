"""Engine-extra erratic-point kernels named by the north star but absent
from the reference (verified: no Douglas-Peucker / Hampel / z-score code
anywhere under /root/reference — see SURVEY.md §2.6 N4 note).  The
reference-exact simplifier is RemoveStops (kernels.track.remove_stops);
these are ADDITIONS, flagged as such, with property-based tests instead of
fixture parity.

All numpy, designed to run inside applyInPandas batches like the Layer-K
kernels.
"""

from __future__ import annotations

import numpy as np


def _perp_dist(lat, lon, lat1, lon1, lat2, lon2):
    """Perpendicular distance of points to the segment (1→2) in the local
    equirectangular plane scaled by cos(lat1) — consistent with the
    reference's flat-distance regime (distance.go:21-36)."""
    cosw = np.cos(lat1 / 180.0 * np.pi)
    x = (lon - lon1) * cosw
    y = lat - lat1
    ex = (lon2 - lon1) * cosw
    ey = lat2 - lat1
    seg2 = ex * ex + ey * ey
    if seg2 == 0:
        return np.sqrt(x * x + y * y)
    t = np.clip((x * ex + y * ey) / seg2, 0.0, 1.0)
    dx = x - t * ex
    dy = y - t * ey
    return np.sqrt(dx * dx + dy * dy)


def douglas_peucker_mask(lat: np.ndarray, lon: np.ndarray, epsilon_deg: float) -> np.ndarray:
    """Boolean keep-mask of the Douglas-Peucker simplification at tolerance
    ``epsilon_deg`` (degrees in the local plane).  Iterative stack (no
    recursion limits); endpoints always kept."""
    n = len(lat)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        d = _perp_dist(lat[i + 1 : j], lon[i + 1 : j], lat[i], lon[i], lat[j], lon[j])
        k = int(np.argmax(d))
        if d[k] > epsilon_deg:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def hampel_mask(values: np.ndarray, window: int = 5, n_sigmas: float = 3.0) -> np.ndarray:
    """Hampel filter outlier mask: |x - median| > n_sigmas · 1.4826 · MAD
    over a centered window of half-width ``window``.  True = outlier."""
    n = len(values)
    out = np.zeros(n, dtype=bool)
    for i in range(n):
        lo = max(0, i - window)
        hi = min(n, i + window + 1)
        seg = values[lo:hi]
        med = np.median(seg)
        mad = np.median(np.abs(seg - med))
        sigma = 1.4826 * mad
        if sigma > 0 and abs(values[i] - med) > n_sigmas * sigma:
            out[i] = True
    return out


def zscore_mask(values: np.ndarray, n_sigmas: float = 3.0) -> np.ndarray:
    """Global z-score outlier mask.  True = outlier.  Degenerate (σ=0)
    series have no outliers."""
    mu = values.mean() if len(values) else 0.0
    sd = values.std()
    if sd == 0:
        return np.zeros(len(values), dtype=bool)
    return np.abs(values - mu) > n_sigmas * sd

"""Hilbert Column fold vs the numpy kernel, and the locality claim the
curve_locality query publishes (Hilbert beats Z on total neighbor gap)."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def test_with_hilbert_d_matches_numpy_full_lattice(spark):
    from gotrackmaster_spark.functions.s2 import hilbert_d_np, with_hilbert_d

    lv, n = 5, 32
    df = spark.range(n * n).selectExpr(
        f"id DIV {n} AS i", f"id % {n} AS j"
    )
    got = {
        (r.i, r.j): r.h
        for r in with_hilbert_d(df, "i", "j", lv, out="h").collect()
    }
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    want = hilbert_d_np(ii.ravel(), jj.ravel(), lv)
    assert got == {
        (int(a), int(b)): int(w) for a, b, w in zip(ii.ravel(), jj.ravel(), want)
    }
    # bijectivity: every curve position 0..n²−1 hit exactly once
    assert sorted(got.values()) == list(range(n * n))


def test_curve_locality_trade_on_full_lattice(spark):
    """The trade the curve_locality query publishes, pinned on the full
    32×32 lattice: Hilbert wins the gap DISTRIBUTION (≈2× unit gaps,
    fewer long jumps — fewer range fragments per box query); Z-order
    wins total and max gap.  Folklore says 'Hilbert has better
    locality' — this pins in which metric that is actually true."""
    from gotrackmaster_spark.functions.s2 import hilbert_d_np

    n = 32
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    h = hilbert_d_np(ii.ravel(), jj.ravel(), 5).reshape(n, n)

    def spread(x):
        x = x.astype(np.int64)
        out = np.zeros_like(x)
        for b in range(16):
            out |= ((x >> b) & 1) << (2 * b)
        return out

    z = spread(ii) | (spread(jj) << 1)
    hg = np.concatenate(
        [np.abs(np.diff(h, axis=0)).ravel(), np.abs(np.diff(h, axis=1)).ravel()]
    )
    zg = np.concatenate(
        [np.abs(np.diff(z, axis=0)).ravel(), np.abs(np.diff(z, axis=1)).ravel()]
    )
    # Hilbert: every pair of CONSECUTIVE curve positions is grid-adjacent,
    # so exactly n²−1 adjacent pairs have gap 1 — double Z's count.
    assert (hg == 1).sum() == n * n - 1
    assert (zg == 1).sum() == (n * n - 1 + 1) // 2
    assert hg.sum() > zg.sum()                       # Z: smaller TOTAL gap
    assert hg.max() > zg.max()                       # Z: smaller max gap

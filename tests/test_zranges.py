"""zranges_for_rect — exact minimal Z-curve range covers.

Pins: exhaustive exact-cover sweep over random rects, aligned-quad
single-range minimality, adjacent-range merging, full-grid cover,
single-cell rects, and bounds validation."""

import numpy as np
import pytest

from gotrackmaster_spark.functions.cells import (
    cell_from_ij_np,
    zranges_for_rect,
)


def _cover_set(ranges):
    out = set()
    for lo, hi in ranges:
        out.update(range(lo, hi + 1))
    return out


def _cells_in_rect(i0, i1, j0, j1, level):
    ii, jj = np.meshgrid(np.arange(i0, i1 + 1), np.arange(j0, j1 + 1))
    return set(
        int(c)
        for c in cell_from_ij_np(ii.ravel().astype(np.int64),
                                 jj.ravel().astype(np.int64), level)
    )


def test_exact_cover_random_rects():
    level = 5
    for s in range(25):
        i0 = (s * 7) % 20
        j0 = (s * 11) % 18
        i1 = min(31, i0 + 1 + (s * 5) % 11)
        j1 = min(31, j0 + 1 + (s * 3) % 13)
        rs = zranges_for_rect(i0, i1, j0, j1, level)
        assert _cover_set(rs) == _cells_in_rect(i0, i1, j0, j1, level), s
        # ranges sorted, non-overlapping, non-adjacent (merged)
        for a, b in zip(rs, rs[1:]):
            assert a[1] + 1 < b[0]


def test_aligned_quad_is_one_range():
    rs = zranges_for_rect(16, 31, 16, 31, 5)
    assert len(rs) == 1
    assert rs[0][1] - rs[0][0] + 1 == 256


def test_full_grid_single_range():
    rs = zranges_for_rect(0, 31, 0, 31, 5)
    assert len(rs) == 1
    assert rs[0] == (1 << 10, (1 << 11) - 1)


def test_single_cell():
    rs = zranges_for_rect(5, 5, 9, 9, 5)
    c = int(cell_from_ij_np(np.array([5]), np.array([9]), 5)[0])
    assert rs == [(c, c)]


def test_out_of_bounds_rejected():
    with pytest.raises(ValueError):
        zranges_for_rect(0, 32, 0, 31, 5)
    with pytest.raises(ValueError):
        zranges_for_rect(-1, 3, 0, 3, 5)

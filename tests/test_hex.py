"""Hex cell index (functions/hex.py): triple-form equality, lattice
properties, k-ring enumeration."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from gotrackmaster_spark.functions import hex as H


def _random_points(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89.9, 89.9, n)
    lon = rng.uniform(-179.9, 179.9, n)
    return lat, lon


@pytest.mark.parametrize("res", [0, 3, 5, 9])
def test_np_col_sql_bit_equal(spark, res):
    lat, lon = _random_points()
    want = H.hex_np(lat, lon, res)

    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    got_col = np.array(
        [r[0] for r in df.select(H.hex_col(F.col("lat"), F.col("lon"), res)).collect()]
    )
    assert (got_col == want).all()

    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"lat": lat, "lon": lon}))
    got_sql = np.array(
        [r[0] for r in con.execute(
            f"SELECT {H.hex_sql('lat', 'lon', res)} FROM pts"
        ).fetchall()]
    )
    assert (got_sql == want).all()


def test_center_roundtrip_and_nearest():
    """A cell's center re-assigns to the same cell, and each point's
    assigned hex center is the nearest center among the point's 1-ring —
    the defining property of cube rounding."""
    lat, lon = _random_points(2000, seed=11)
    res = 4
    ids = H.hex_np(lat, lon, res)
    clat, clon = H.hex_center_np(ids)
    assert (H.hex_np(clat, clon, res) == ids).all()

    ring = H.hex_kring_np(ids, 1)  # (n, 7) — own cell + 6 neighbors
    qf, rf = H._axial_np(lat, lon, H.SIZES[res])
    qc, rc, _ = H.hex_to_qr_np(ring.ravel())
    qc = qc.reshape(ring.shape).astype(float)
    rc = rc.reshape(ring.shape).astype(float)
    # cube-space L2 distance point -> candidate centers
    xf, zf = qf[:, None], rf[:, None]
    yf = -xf - zf
    yc = -qc - rc
    d2 = (qc - xf) ** 2 + (yc - yf) ** 2 + (rc - zf) ** 2
    own_idx = np.argmax(ring == ids[:, None], axis=1)
    own = d2[np.arange(len(ids)), own_idx]
    # own cell center must be (weakly) nearest in cube space
    assert (own <= d2.min(axis=1) + 1e-9).all()


def test_kring_size_and_distance():
    ids = H.hex_np(np.array([10.0, -45.0]), np.array([20.0, 170.0]), 6)
    for k in (1, 2, 3):
        ring = H.hex_kring_np(ids, k)
        assert ring.shape == (2, 1 + 3 * k * (k + 1))
        for row, base in zip(ring, ids):
            assert len(set(row.tolist())) == len(row)
            d = H.hex_distance_np(row, np.full(len(row), base))
            assert d.max() == k and (d >= 0).all()


def test_res_packing():
    lat, lon = _random_points(100, seed=3)
    for res in (0, 7, 15):
        ids = H.hex_np(lat, lon, res)
        q, r, got_res = H.hex_to_qr_np(ids)
        assert got_res == res
        back = (
            (np.int64(res) << 44) | ((q + (1 << 21)) << 22) | (r + (1 << 21))
        )
        assert (back == ids).all()

"""colorfulness_stats — Hasler–Süsstrunk opponent-channel moments.

Pins: numpy float reference at 1e-12, gray-image zero, vivid > gray
discrimination, and format-coverage across raw/png/qnt4."""

import math

import numpy as np
import pytest

from gotrackmaster_spark.operators.images import colorfulness_stats, encode_image


def _imgs(spark, arrs_fmts):
    rows = []
    for i, (px, fmt) in enumerate(arrs_fmts):
        h, w, _ = px.shape
        rows.append((f"img{i}", encode_image(px, fmt), w, h, fmt))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _metric(r):
    v_rg = r.n_px * r.sum_rg2 - r.sum_rg * r.sum_rg
    v_yb = r.n_px * r.sum_yb2sq - r.sum_yb2 * r.sum_yb2
    a = 4 * v_rg + v_yb
    b = 4 * (r.sum_rg * r.sum_rg) + r.sum_yb2 * r.sum_yb2
    return (math.sqrt(a) + 0.3 * math.sqrt(b)) / (2.0 * r.n_px)


def _reference(px):
    p = px.astype(np.float64)
    rg = p[..., 0] - p[..., 1]
    yb = (p[..., 0] + p[..., 1]) / 2.0 - p[..., 2]
    var = rg.var() + yb.var()
    mean = math.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    return math.sqrt(var) + 0.3 * mean


def _px(seed, h=24, w=32):
    idx = np.arange(h * w * 3, dtype=np.int64)
    return ((seed * 31 + idx * 2654435761) % 256).astype(np.uint8).reshape(h, w, 3)


def test_numpy_reference_all_formats(spark):
    arrs = [(_px(3), "raw"), (_px(4), "png"), (_px(5) - _px(5) % 4, "qnt4")]
    rows = {r.image_id: r for r in colorfulness_stats(_imgs(spark, arrs)).collect()}
    for i, (px, fmt) in enumerate(arrs):
        r = rows[f"img{i}"]
        assert r.fmt == fmt
        assert _metric(r) == pytest.approx(_reference(px), rel=1e-12)


def test_gray_image_zero(spark):
    g = np.full((8, 8, 3), 77, dtype=np.uint8)
    r = colorfulness_stats(_imgs(spark, [(g, "raw")])).collect()[0]
    assert (r.sum_rg, r.sum_rg2, r.sum_yb2, r.sum_yb2sq) == (0, 0, 0, 0)
    assert _metric(r) == 0.0


def test_vivid_beats_gray(spark):
    vivid = np.zeros((8, 8, 3), dtype=np.uint8)
    vivid[::2, :, 0] = 255  # red stripes
    vivid[1::2, :, 2] = 255  # blue stripes
    gray = np.full((8, 8, 3), 128, dtype=np.uint8)
    rows = {
        r.image_id: r
        for r in colorfulness_stats(
            _imgs(spark, [(vivid, "raw"), (gray, "raw")])
        ).collect()
    }
    assert _metric(rows["img0"]) > _metric(rows["img1"]) + 100

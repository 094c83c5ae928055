"""Otsu threshold over the decode chain: histogram conservation and an
independent numpy replay of the canonical full 0..255 scan (the engine
scans occupied bins only — the replay proves that's equivalent)."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def _images(spark, n=24):
    from gotrackmaster_spark.operators.images import encode_image, gen_pixels

    rows = []
    for key in range(n):
        fmt = ["raw", "png", "qnt4"][key % 3]
        px = gen_pixels(key, 16, 8)
        if fmt == "qnt4":
            px = (px >> 2) << 2
        rows.append((f"img{key:08d}", encode_image(px, fmt), 16, 8, fmt))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _luma(key, fmt):
    from gotrackmaster_spark.operators.images import gen_pixels

    px = gen_pixels(key, 16, 8)
    if fmt == "qnt4":
        px = (px >> 2) << 2
    p = px.reshape(-1, 3).astype(np.int64)
    return (299 * p[:, 0] + 587 * p[:, 1] + 114 * p[:, 2]) // 1000


def test_histogram_conserves_pixels_and_bins(spark):
    from gotrackmaster_spark.operators.images import luma_histogram

    out = luma_histogram(_images(spark)).collect()
    per_img = {}
    for r in out:
        per_img.setdefault(r.image_id, {})[r.l] = r.n
    assert len(per_img) == 24
    for key in range(24):
        fmt = ["raw", "png", "qnt4"][key % 3]
        want = np.bincount(_luma(key, fmt), minlength=256)
        got = per_img[f"img{key:08d}"]
        assert sum(got.values()) == 16 * 8
        assert got == {int(l): int(c) for l, c in enumerate(want) if c > 0}


def _otsu_ref(luma):
    """Canonical Otsu: scan EVERY t in 0..255, maximize between-class
    variance, lowest argmax t.  Returns (t, n_fg)."""
    n = len(luma)
    hist = np.bincount(luma, minlength=256)
    best, best_t, best_w0 = -1.0, None, None
    w0 = s0 = 0
    s = int(luma.sum())
    for t in range(256):
        w0 += int(hist[t])
        s0 += t * int(hist[t])
        if w0 == 0 or w0 == n:
            continue
        f = float(s0 * n - s * w0)
        sigma = f * f / float(w0 * (n - w0))
        if sigma > best:
            best, best_t, best_w0 = sigma, t, w0
    return best_t, n - best_w0


def test_matches_canonical_full_scan(spark):
    import __spark_entry__  # noqa: F401 — ensures repo path setup

    from gotrackmaster_spark import driver_queries as Q
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from gotrackmaster_spark.operators.images import luma_histogram

    hist = luma_histogram(_images(spark))
    w = Window.partitionBy("image_id").orderBy("l")
    cum = hist.select(
        "image_id", "l",
        F.sum("n").over(w).alias("w0"),
        F.sum(F.col("n") * F.col("l")).over(w).alias("sum0"),
    )
    tot = hist.groupBy("image_id").agg(
        F.sum("n").alias("nn"), F.sum(F.col("n") * F.col("l")).alias("s")
    )
    j = cum.join(tot, "image_id").filter(F.col("w0") < F.col("nn"))
    f = (F.col("sum0") * F.col("nn") - F.col("s") * F.col("w0")).cast("double")
    sigma = f * f / (F.col("w0") * (F.col("nn") - F.col("w0"))).cast("double")
    w2 = Window.partitionBy("image_id").orderBy(F.desc("sigma"), F.asc("l"))
    best = (
        j.select("image_id", "l", "w0", "nn", sigma.alias("sigma"))
        .withColumn("rn", F.row_number().over(w2))
        .filter("rn = 1")
        .collect()
    )
    got = {r.image_id: (r.l, r.nn - r.w0) for r in best}
    for key in range(24):
        fmt = ["raw", "png", "qnt4"][key % 3]
        assert got[f"img{key:08d}"] == _otsu_ref(_luma(key, fmt))

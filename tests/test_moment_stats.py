"""Moment-algebra composites: ols_trends / caption_pixel_corr laws.

Pins the S-term algebra on planted data: exact-line slope and r²=1,
flat-series guards, and Pearson ±1 on perfectly correlated pairs —
pure-Python replays of the shared integer-moment formulas."""

import math

import pytest


def _s_terms(xy):
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx0 = sum(x * x for x, _ in xy)
    syy0 = sum(y * y for _, y in xy)
    sxy0 = sum(x * y for x, y in xy)
    return n * sxy0 - sx * sy, n * sxx0 - sx * sx, n * syy0 - sy * sy


def test_exact_line_slope_and_r2():
    xy = [(t, 3 * t + 7) for t in range(10, 40)]
    sxy, sxx, syy = _s_terms(xy)
    assert sxy / sxx == 3.0
    assert (sxy * sxy) / (sxx * syy) == 1.0


def test_flat_series_guards():
    xy = [(t, 5) for t in range(10)]
    sxy, sxx, syy = _s_terms(xy)
    assert syy == 0 and sxy == 0 and sxx > 0
    # slope defined (0), r2 guarded NULL in the query (syy == 0)
    assert sxy / sxx == 0.0


def test_single_point_guard():
    sxy, sxx, syy = _s_terms([(5, 9)])
    assert sxx == 0 and syy == 0


def test_pearson_plus_minus_one():
    up = [(x, 2 * x + 1) for x in range(20)]
    dn = [(x, -2 * x + 100) for x in range(20)]
    for xy, want in ((up, 1.0), (dn, -1.0)):
        sxy, sxx, syy = _s_terms(xy)
        assert sxy / math.sqrt(sxx * syy) == pytest.approx(want, abs=1e-12)


def test_spark_matches_python_on_planted_line(spark):
    # run the registered ols_trends moment algebra through Spark on a
    # tiny synthetic series via the same expressions
    from pyspark.sql import functions as F

    rows = [("c", t, 3 * t + 7) for t in range(10, 40)]
    df = spark.createDataFrame(rows, "cell string, t long, cnt long")
    agg = df.groupBy("cell").agg(
        F.count("*").alias("n"),
        F.sum("t").alias("sx"),
        F.sum("cnt").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx0"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("syy0"),
        F.sum(F.col("t") * F.col("cnt")).alias("sxy0"),
    )
    r = agg.select(
        (
            (F.col("n") * F.col("sxy0") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx0") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("slope")
    ).collect()[0]
    assert r.slope == 3.0

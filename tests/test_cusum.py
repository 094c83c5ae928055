"""cusum_changepoints — two-sided CUSUM via prefix-sum − running-min.

Pins: the recursion identity against a Python replay, a planted level
shift (argmax day at the shift), empty-day filling, flat-series zero,
single-day degenerate, and earliest-day tie-break."""

import pytest

from gotrackmaster_spark.operators.timeseries import cusum_changepoints


def _run(spark, rows):
    df = spark.createDataFrame(rows, "grp string, day long, x long")
    out = cusum_changepoints(df, "grp", "day", "x").collect()
    return {
        r.grp: (
            r.n_days, r.span_days, r.total,
            r.max_up, r.day_up, r.max_down, r.day_down,
        )
        for r in out
    }


def _brute(rows):
    from collections import defaultdict

    series = defaultdict(dict)
    for g, d, x in rows:
        series[g][d] = series[g].get(d, 0) + x
    out = {}
    for g, obs in series.items():
        d0, d1 = min(obs), max(obs)
        span = d1 - d0 + 1
        tot = sum(obs.values())
        su = sd = 0
        best_u = (-1, None)
        best_d = (-1, None)
        for day in range(d0, d1 + 1):
            a = obs.get(day, 0) * span - tot
            su = max(0, su + a)
            sd = max(0, sd - a)
            if su > best_u[0]:
                best_u = (su, day)
            if sd > best_d[0]:
                best_d = (sd, day)
        out[g] = (len(obs), span, tot, best_u[0], best_u[1], best_d[0], best_d[1])
    return out


def test_recursion_identity_brute_force(spark):
    rows = []
    for i in range(200):
        g = "g" + str(i % 2)
        day = (i * 7) % 45
        x = (i * i * 13 + i * 5) % 9
        rows.append((g, day, x))
    assert _run(spark, rows) == _brute(rows)


def test_planted_level_shift(spark):
    # rate 2/day for days 0-19, then 8/day for days 20-39: upward CUSUM
    # peaks at the series end; brute force agrees on day + magnitude
    rows = [("a", d, 2) for d in range(20)] + [("a", d, 8) for d in range(20, 40)]
    got = _run(spark, rows)
    want = _brute(rows)
    assert got == want
    assert got["a"][4] == 39  # day_up at the end of the shifted regime
    assert got["a"][3] > 0


def test_empty_days_count_as_zero(spark):
    # activity on day 0 and day 10 only: the gap drives the downward arm
    rows = [("a", 0, 10), ("a", 10, 10)]
    got = _run(spark, rows)
    want = _brute(rows)
    assert got == want
    assert got["a"][0] == 2 and got["a"][1] == 11
    assert got["a"][5] > 0  # max_down sees the dead stretch


def test_flat_series_is_zero(spark):
    rows = [("a", d, 5) for d in range(10)]
    got = _run(spark, rows)
    assert got["a"][3] == 0 and got["a"][5] == 0


def test_single_day(spark):
    got = _run(spark, [("a", 7, 3)])
    assert got["a"] == (1, 1, 3, 0, 7, 0, 7)


def test_earliest_day_wins_ties(spark):
    # symmetric bump: CUSUM up hits its max at the bump day and stays;
    # the reported day must be the EARLIEST achieving the max
    rows = [("a", 0, 1), ("a", 1, 1), ("a", 2, 7), ("a", 3, 1), ("a", 4, 1)]
    got = _run(spark, rows)
    want = _brute(rows)
    assert got["a"][3] == want["a"][3]
    assert got["a"][4] == want["a"][4]

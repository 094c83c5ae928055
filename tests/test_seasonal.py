"""seasonal_anomalies — day-of-week baseline anomaly ranking.

Pins: a Python replay, a planted dead-Monday dropout, empty-day
filling, perfect-seasonal zero scores, and deterministic tie order."""

import pytest

from gotrackmaster_spark.operators.timeseries import seasonal_anomalies

QUANT = 10**6


def _run(spark, rows, period=7, top_k=5):
    df = spark.createDataFrame(rows, "grp string, day long, x long")
    out = seasonal_anomalies(df, "grp", "day", "x", period=period, top_k=top_k)
    return [
        (r.grp, r.day, r.phase, r.c, r.n_phase, r.t_phase, r.score, r.rnk)
        for r in out.collect()
    ]


def _brute(rows, period=7, top_k=5):
    from collections import defaultdict

    series = defaultdict(dict)
    for g, d, x in rows:
        series[g][d] = series[g].get(d, 0) + x
    out = []
    for g, obs in series.items():
        d0, d1 = min(obs), max(obs)
        filled = {d: obs.get(d, 0) for d in range(d0, d1 + 1)}
        base = defaultdict(lambda: [0, 0])
        for d, c in filled.items():
            p = d % period
            base[p][0] += 1
            base[p][1] += c
        scored = []
        for d, c in filled.items():
            n_p, t_p = base[d % period]
            score = (abs(c * n_p - t_p) * QUANT) // n_p
            scored.append((score, d, c, n_p, t_p))
        scored.sort(key=lambda s: (-s[0], s[1]))
        for rnk, (score, d, c, n_p, t_p) in enumerate(scored[:top_k], 1):
            out.append((g, d, d % period, c, n_p, t_p, score, rnk))
    return out


def test_python_replay(spark):
    rows = []
    for i in range(150):
        g = "g" + str(i % 2)
        day = (i * 3) % 40
        x = (i * i * 7 + i) % 6
        rows.append((g, day, x))
    assert sorted(_run(spark, rows)) == sorted(_brute(rows))


def test_dead_monday_dropout(spark):
    # 6 weeks of 10/day, except day 21 (phase 0) silent: top anomaly
    rows = [("a", d, 10) for d in range(42) if d != 21]
    got = _run(spark, rows)
    top = [r for r in got if r[7] == 1][0]
    assert top[1] == 21 and top[3] == 0 and top[6] > 0


def test_perfect_seasonality_scores_zero(spark):
    # phase p always has count p+1 over 4 full weeks: every residual 0
    rows = [("a", d, d % 7 + 1) for d in range(28)]
    got = _run(spark, rows)
    assert all(r[6] == 0 for r in got)
    # ties broken by earliest day
    assert [r[1] for r in got] == [0, 1, 2, 3, 4]


def test_spike_ranks_first(spark):
    rows = [("a", d, 5) for d in range(28)]
    rows[10] = ("a", 10, 50)
    got = _run(spark, rows)
    top = [r for r in got if r[7] == 1][0]
    assert top[1] == 10 and top[3] == 50

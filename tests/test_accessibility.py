"""2SFCA accessibility: brute-force parity, boundary and degenerate semantics."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


def _run(spark, demand, supply, radius, scale=10**9):
    from gotrackmaster_spark.operators.spatial import accessibility_2sfca

    d = spark.createDataFrame(demand, "demand_id long, x long, y long")
    s = spark.createDataFrame(supply, "supply_id long, x long, y long, capacity long")
    return {
        r["demand_id"]: (r["n_supply"], r["access"])
        for r in accessibility_2sfca(d, s, radius, scale).collect()
    }


def _brute(demand, supply, radius, scale=10**9):
    r2 = radius * radius
    d_j = {}
    for sid, sx, sy, cap in supply:
        n = sum(1 for _, x, y in demand if (x - sx) ** 2 + (y - sy) ** 2 <= r2)
        if n:
            d_j[sid] = (cap * scale) // n
    out = {}
    for did, x, y in demand:
        hits = [
            d_j[sid]
            for sid, sx, sy, _ in supply
            if sid in d_j and (x - sx) ** 2 + (y - sy) ** 2 <= r2
        ]
        if hits:
            out[did] = (len(hits), sum(hits))
    return out


def test_2sfca_brute_force(spark):
    import random

    rnd = random.Random(41)
    demand = [(i, rnd.randrange(0, 10000), rnd.randrange(0, 10000)) for i in range(400)]
    supply = [
        (j, rnd.randrange(0, 10000), rnd.randrange(0, 10000), rnd.randrange(1, 21))
        for j in range(25)
    ]
    got = _run(spark, demand, supply, 1500)
    assert got == _brute(demand, supply, 1500)


def test_2sfca_boundary_inclusive_and_competition(spark):
    # one supplier (cap 10) serving two demand points, one EXACTLY at
    # distance R: inclusive boundary -> D_j = 2, each gets cap*scale//2
    demand = [(1, 0, 0), (2, 300, 400)]  # d(2, supply) = 500 exactly
    supply = [(7, 0, 0, 10)]
    got = _run(spark, demand, supply, 500, scale=10**6)
    assert got == {1: (1, 5_000_000), 2: (1, 5_000_000)}
    # shrink radius by one unit: boundary point drops out, full ratio to #1
    got = _run(spark, demand, supply, 499, scale=10**6)
    assert got == {1: (1, 10_000_000)}


def test_2sfca_empty_catchment_and_unserved_demand(spark):
    # supplier 9 has NO demand in range -> no ratio row anywhere;
    # demand 3 has no supplier in range -> absent from the output
    demand = [(1, 0, 0), (3, 50_000, 50_000)]
    supply = [(7, 10, 0, 5), (9, 25_000, 25_000, 100)]
    got = _run(spark, demand, supply, 100, scale=10**6)
    assert got == {1: (1, 5_000_000)}


def test_2sfca_validation(spark):
    from gotrackmaster_spark.operators.spatial import accessibility_2sfca

    d = spark.createDataFrame([(1, 0, 0)], "demand_id long, x long, y long")
    s = spark.createDataFrame(
        [(1, 0, 0, 1)], "supply_id long, x long, y long, capacity long"
    )
    with pytest.raises(ValueError):
        accessibility_2sfca(d, s, 0)

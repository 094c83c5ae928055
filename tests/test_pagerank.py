"""Integer-quantized fixed-round PageRank (operators/graph.py).

Pins: a Python replay of the exact integer recursion, symmetric-cycle
equality, hub dominance, dangling-mass semantics, weighted splits and
round-0 identity."""

import pytest

from gotrackmaster_spark.operators.graph import pagerank

QUANT = 10**6
BASE = (15 * QUANT) // 100


def _brute(edges, n_rounds, quant=QUANT):
    from collections import defaultdict

    w = defaultdict(int)
    for s, d, ww in edges:
        w[(s, d)] += ww
    wout = defaultdict(int)
    for (s, d), ww in w.items():
        wout[s] += ww
    nodes = sorted({s for s, _ in w} | {d for _, d in w})
    rank = {v: quant for v in nodes}
    base = (15 * quant) // 100
    for _ in range(n_rounds):
        inq = defaultdict(int)
        for (s, d), ww in w.items():
            inq[d] += (rank[s] * ww) // wout[s]
        rank = {v: base + (85 * inq.get(v, 0)) // 100 for v in nodes}
    return rank


def _run(spark, edges, n_rounds):
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = pagerank(df, w_col="w", n_rounds=n_rounds).collect()
    return {r.v: r.rank_q for r in out}


def test_python_replay_random_graph(spark):
    edges = []
    for i in range(120):
        s = (i * 7919) % 25
        d = (i * i * 61 + 13) % 25
        if s != d:
            edges.append((s, d, 1 + i % 4))
    for rounds in (0, 1, 3, 5):
        assert _run(spark, edges, rounds) == _brute(edges, rounds), rounds


def test_round0_is_uniform(spark):
    got = _run(spark, [(1, 2, 1), (2, 1, 1)], 0)
    assert got == {1: QUANT, 2: QUANT}


def test_symmetric_cycle_equal_ranks(spark):
    got = _run(spark, [(1, 2, 1), (2, 3, 1), (3, 1, 1)], 5)
    assert len(set(got.values())) == 1


def test_hub_dominates(spark):
    # everyone points at node 0; node 0 points back at 1
    edges = [(i, 0, 1) for i in range(1, 6)] + [(0, 1, 1)]
    got = _run(spark, edges, 5)
    assert got[0] == max(got.values())
    assert got[0] > got[2]


def test_dangling_mass_dropped(spark):
    # 1 -> 2, 2 has no out-edges: round 1 total mass shrinks (documented)
    got = _run(spark, [(1, 2, 1)], 1)
    assert got == _brute([(1, 2, 1)], 1)
    assert got[1] == BASE
    assert got[2] == BASE + (85 * QUANT) // 100


def test_weighted_split(spark):
    # 1 splits 3:1 between 2 and 3
    edges = [(1, 2, 3), (1, 3, 1)]
    got = _run(spark, edges, 1)
    assert got[2] - BASE == (85 * ((QUANT * 3) // 4)) // 100
    assert got[3] - BASE == (85 * ((QUANT * 1) // 4)) // 100


def test_negative_rounds_raise(spark):
    df = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    with pytest.raises(ValueError):
        pagerank(df, w_col="w", n_rounds=-1)

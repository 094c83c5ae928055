"""bfs_hops — multi-source frontier BFS hop distances.

Pins: hand-built graphs (chain, cycle, multi-seed min, directed
asymmetry, unreachable absence), truncation failure modes in both
snapshot modes, and a Python BFS replay on a random graph."""

import pytest

from gotrackmaster_spark.operators.graph import bfs_hops


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(v,) for v in seeds], "v long")
    return {r.v: r.hops for r in bfs_hops(e, s, **kw).collect()}


def _brute(edges, seeds):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {v: 0 for v in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def test_chain(spark):
    edges = [(i, i + 1) for i in range(5)]
    assert _run(spark, edges, [0]) == {i: i for i in range(6)}


def test_multi_seed_takes_min(spark):
    edges = [(i, i + 1) for i in range(6)]
    got = _run(spark, edges, [0, 6])
    # node 6 is a seed at 0 even though it's 6 hops from seed 0
    assert got[6] == 0 and got[5] == 5 and got[3] == 3


def test_cycle_terminates(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    assert _run(spark, edges, [0]) == {0: 0, 1: 1, 2: 2}


def test_directed_unreachable_absent(spark):
    edges = [(0, 1), (2, 3)]
    got = _run(spark, edges, [0])
    assert got == {0: 0, 1: 1}


def test_truncation_raises_and_warns(spark):
    edges = [(i, i + 1) for i in range(10)]
    with pytest.raises(ValueError, match="TRUNCATED"):
        _run(spark, edges, [0], max_rounds=3)
    got = _run(spark, edges, [0], max_rounds=3, on_nonconverged="warn")
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_reliable_checkpoint_mode(spark, tmp_path):
    edges = [(i, i + 1) for i in range(8)]
    got = _run(spark, edges, [0], checkpoint_dir=str(tmp_path / "ckpt"))
    assert got == {i: i for i in range(9)}


def test_brute_force_random(spark):
    edges = []
    for i in range(200):
        s = (i * 7919) % 40
        d = (i * i * 61 + 13) % 40
        if s != d:
            edges.append((s, d))
    seeds = [0, 7, 23]
    assert _run(spark, edges, seeds) == _brute(edges, seeds)

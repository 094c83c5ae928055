"""sssp_weighted — multi-source Bellman-Ford with positive int weights.

Pins: Dijkstra replay on a random graph, weighted-vs-hop divergence
(a longer-hop cheaper path wins), multi-seed min, unreachable absence,
truncation raise/warn, positive-weight validation, and the reliable
checkpoint mode."""

import pytest

from gotrackmaster_spark.operators.graph import sssp_weighted


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(v,) for v in seeds], "v long")
    return {r.v: r.dist for r in sssp_weighted(e, s, **kw).collect()}


def _dijkstra(edges, seeds):
    import heapq
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d, w in edges:
        adj[s].append((d, w))
    dist = {v: 0 for v in seeds}
    pq = [(0, v) for v in seeds]
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 62):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_cheap_long_path_beats_direct(spark):
    edges = [(0, 3, 100), (0, 1, 1), (1, 2, 1), (2, 3, 1)]
    got = _run(spark, edges, [0])
    assert got[3] == 3


def test_multi_seed(spark):
    edges = [(0, 1, 5), (9, 1, 2)]
    got = _run(spark, edges, [0, 9])
    assert got[1] == 2 and got[0] == 0 and got[9] == 0


def test_unreachable_absent(spark):
    got = _run(spark, [(0, 1, 1), (5, 6, 1)], [0])
    assert got == {0: 0, 1: 1}


def test_dijkstra_replay(spark):
    edges = []
    for i in range(250):
        s = (i * 7919) % 30
        d = (i * i * 61 + 17) % 30
        if s != d:
            edges.append((s, d, 1 + (i * 13) % 9))
    seeds = [0, 11]
    assert _run(spark, edges, seeds) == _dijkstra(edges, seeds)


def test_truncation_raise_and_warn(spark):
    edges = [(i, i + 1, 1) for i in range(10)]
    with pytest.raises(ValueError, match="NOT converge"):
        _run(spark, edges, [0], max_rounds=3)
    got = _run(spark, edges, [0], max_rounds=3, on_nonconverged="warn")
    # partial labels are upper bounds on the settled prefix
    assert got[1] == 1 and got[2] == 2


def test_nonpositive_weight_rejected(spark):
    with pytest.raises(Exception, match="must be > 0"):
        _run(spark, [(0, 1, 0)], [0])


def test_reliable_checkpoint_mode(spark, tmp_path):
    edges = [(i, i + 1, 2) for i in range(6)]
    got = _run(spark, edges, [0], checkpoint_dir=str(tmp_path / "ck"))
    assert got == {i: 2 * i for i in range(7)}

"""triangle_counts — degree-ordered oriented triangle enumeration.

Pins: hand-counted shapes (triangle, star, K4, path), a brute-force
reference on a deterministic pseudo-random graph, and input
normalization (duplicate / reversed / self-loop edges)."""

from itertools import combinations

import pytest

from gotrackmaster_spark.operators.graph import triangle_counts


def _run(spark, edges):
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    rows = triangle_counts(df).collect()
    return {r.v: (r.degree, r.n_triangles, r.clustering) for r in rows}


def _brute(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        if (lo, hi) in es:
            continue
        es.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    tri = {v: 0 for v in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    out = {}
    for v in adj:
        d = len(adj[v])
        cc = (2.0 * tri[v]) / (float(d) * float(d - 1)) if d > 1 else None
        out[v] = (d, tri[v], cc)
    return out


def test_single_triangle(spark):
    got = _run(spark, [(1, 2), (2, 3), (1, 3)])
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_star_has_no_triangles(spark):
    got = _run(spark, [(0, 1), (0, 2), (0, 3)])
    assert got[0] == (3, 0, 0.0)
    for leaf in (1, 2, 3):
        assert got[leaf] == (1, 0, None)


def test_k4_complete(spark):
    got = _run(spark, [(a, b) for a, b in combinations(range(4), 2)])
    assert got == {v: (3, 3, 1.0) for v in range(4)}


def test_path_no_triangles(spark):
    got = _run(spark, [(i, i + 1) for i in range(5)])
    assert all(t == 0 for _, t, _ in got.values())


def test_normalization_dups_reversed_selfloops(spark):
    # duplicate, reversed and self-loop edges must collapse to one
    # undirected edge set before counting
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (2, 2)]
    got = _run(spark, edges)
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_brute_force_random_graph(spark):
    # deterministic pseudo-random graph: 40 nodes, ~160 edges
    edges = []
    for i in range(400):
        a = (i * 7919) % 40
        b = (i * i * 61 + i * 104729 + 13) % 40
        if a != b:
            edges.append((a, b))
    want = _brute(edges)
    got = _run(spark, edges)
    assert set(got) == set(want)
    for v in want:
        wd, wt, wc = want[v]
        gd, gt, gc = got[v]
        assert (gd, gt) == (wd, wt), f"node {v}"
        if wc is None:
            assert gc is None
        else:
            assert gc == pytest.approx(wc, abs=0, rel=0)

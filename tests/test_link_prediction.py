"""Common-neighbor link prediction: hand-pinned wedge shapes and a
brute-force set replay."""

from __future__ import annotations

import sys
from itertools import combinations

sys.path.insert(0, "/root/repo")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a_id long, b_id long")


def _brute(pairs, min_common):
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    out = {}
    for a, b in combinations(sorted(nbrs), 2):
        if b in nbrs[a]:
            continue
        cn = len(nbrs[a] & nbrs[b])
        if cn < min_common:
            continue
        da, db = len(nbrs[a]), len(nbrs[b])
        out[(a, b)] = (cn, da, db, (cn * 1_000_000) // (da + db - cn))
    return out


def _run(spark, pairs, min_common=1):
    from gotrackmaster_spark.operators.graph import common_neighbor_scores

    got = {
        (r.a, r.b): (r.cn, r.d_a, r.d_b, r.jacc_q)
        for r in common_neighbor_scores(
            _edges(spark, pairs), min_common=min_common
        ).collect()
    }
    assert got == _brute(pairs, min_common)
    return got


def test_open_triangle_predicts_closure(spark):
    # path 1-2-3: the non-edge (1,3) shares middle node 2.
    got = _run(spark, [(1, 2), (2, 3)])
    assert got == {(1, 3): (1, 1, 1, 1_000_000)}


def test_existing_edges_excluded(spark):
    # triangle: every pair is an edge — nothing to predict.
    assert _run(spark, [(1, 2), (2, 3), (1, 3)]) == {}


def test_min_common_cut_and_duplicates(spark):
    # 1 and 4 share middles 2 AND 3 (cn=2); duplicate + reversed input
    # edges must not inflate counts.
    pairs = [(1, 2), (2, 4), (1, 3), (3, 4), (2, 1), (1, 2)]
    got = _run(spark, pairs, min_common=2)
    # the 4-cycle has TWO diagonals, each sharing both middles
    assert got == {
        (1, 4): (2, 2, 2, 1_000_000),
        (2, 3): (2, 2, 2, 1_000_000),
    }


def test_brute_force_replay_path_plus_hub(spark):
    # path 0..9 (predictions at distance 2) + hub 0 with leaves 20..24
    # (leaf pairs share the hub) — deterministic, sparse, non-empty.
    pairs = [(i, i + 1) for i in range(9)] + [(0, h) for h in range(20, 25)]
    got = _run(spark, pairs)
    assert got  # non-degenerate
    assert got[(0, 2)][0] == 1  # path distance-2 closure
    assert got[(20, 21)][0] == 1  # leaves share the hub

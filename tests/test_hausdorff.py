"""Trajectory Hausdorff distance: hand-pinned shapes, brute-force
replay, and metric laws (identity, symmetry, directed asymmetry)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def _traj(spark, rows):
    return spark.createDataFrame(rows, "tid long, gx long, gy long")


def _brute(rows, min_shared):
    """Independent python replay of the candidate cut + exact max-min."""
    from collections import defaultdict

    cells = defaultdict(set)
    for tid, gx, gy in rows:
        cells[tid].add((gx, gy))
    out = {}
    tids = sorted(cells)
    for i, a in enumerate(tids):
        for b in tids[i + 1:]:
            shared = len(cells[a] & cells[b])
            if shared < min_shared:
                continue

            def h(s, t):
                return max(
                    min((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2 for q in t)
                    for p in s
                )

            hab, hba = h(cells[a], cells[b]), h(cells[b], cells[a])
            out[(a, b)] = (shared, hab, hba, max(hab, hba))
    return out


def _run(spark, rows, min_shared=1):
    from gotrackmaster_spark.operators.spatial import hausdorff_cell_pairs

    got = {
        (r.tid_a, r.tid_b): (r.n_shared, r.h2_ab, r.h2_ba, r.h2)
        for r in hausdorff_cell_pairs(_traj(spark, rows), min_shared).collect()
    }
    assert got == _brute(rows, min_shared)
    return got


def test_identical_sets_distance_zero(spark):
    rows = [(1, 0, 0), (1, 1, 2), (2, 0, 0), (2, 1, 2)]
    got = _run(spark, rows)
    assert got[(1, 2)] == (2, 0, 0, 0)


def test_directed_asymmetry_subset(spark):
    # B ⊂ A: h(B→A) = 0 but h(A→B) > 0 — the directed legs must differ.
    rows = [(1, 0, 0), (1, 5, 0), (2, 0, 0)]
    got = _run(spark, rows)
    assert got[(1, 2)] == (1, 25, 0, 25)


def test_candidate_cut_drops_disjoint_and_undershared(spark):
    # 1↔2 share one cell (below min_shared=2); 1↔3 share none.
    rows = [(1, 0, 0), (1, 1, 0), (2, 0, 0), (2, 9, 9), (3, 7, 7)]
    got = _run(spark, rows, min_shared=2)
    assert got == {}


def test_brute_force_replay_lattice(spark):
    # 6 trajectories over a small lattice with overlapping L-shapes —
    # every law (candidate cut, mins, maxes, symmetry) replayed.
    rows = []
    for t in range(6):
        for i in range(5):
            rows.append((t, (t + i) % 7, (t * i) % 5))
    rows = sorted(set(rows))
    got = _run(spark, rows, min_shared=2)
    assert got  # non-degenerate: at least one surviving pair
    for (a, b), (_, hab, hba, h2) in got.items():
        assert a < b
        assert h2 == max(hab, hba)


def test_no_cartesian_product(spark):
    from gotrackmaster_spark.operators.spatial import hausdorff_cell_pairs

    rows = [(t, t % 3, t % 2) for t in range(10)]
    plan = hausdorff_cell_pairs(_traj(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hot_cell_cap_bounds_candidates(spark):
    """Planted hub: one cell visited by ALL 40 trajectories (df = 40 >
    cap = 8) must be dropped from the candidate index — pairs co-located
    ONLY there never become candidates, so candidate rows stay
    ≤ Σ_kept_cells C(cap, 2); the exact max-min still runs over FULL
    cell sets (hub included) for the pairs that do qualify."""
    from gotrackmaster_spark.operators.spatial import hausdorff_cell_pairs

    cap = 8
    rows = [(t, 0, 0) for t in range(40)]            # the hub (df=40)
    rows += [(t, 5, 5) for t in range(4)]            # normal cell (df=4)
    rows += [(t, 6, 6) for t in range(4)]            # normal cell (df=4)
    df = _traj(spark, rows)

    # min_shared=1 exposes the candidate set directly as output pairs
    capped = {
        (r.tid_a, r.tid_b): (r.n_shared, r.h2)
        for r in hausdorff_cell_pairs(df, 1, max_cell_df=cap).collect()
    }
    kept_cell_dfs = [4, 4]                           # hub dropped
    bound = sum(d * (d - 1) // 2 for d in kept_cell_dfs)
    assert set(capped) == {(a, b) for a in range(4) for b in range(a + 1, 4)}
    assert len(capped) <= bound
    # n_shared counts NON-HOT shared cells only; h2 uses full sets —
    # tids 0..3 have identical full sets {(0,0),(5,5),(6,6)} → h2 = 0
    assert all(v == (2, 0) for v in capped.values())

    # cap off: every pair shares the hub → full quadratic candidate set
    uncapped = hausdorff_cell_pairs(df, 1, max_cell_df=None).collect()
    assert len(uncapped) == 40 * 39 // 2

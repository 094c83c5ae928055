"""Getis-Ord Gi* hotspot operator (`spatial.gi_star_hotspots`).

Semantics pinned against a hand-computed lattice; the driver query's
DuckDB twin is exercised by tests/test_oracle_parity.py like every
registry entry.
"""

import math

import pytest

from tests.conftest import spark  # noqa: F401  (fixture)


def _rows(spark, cells):
    df = spark.createDataFrame(cells, "gx long, gy long, cnt long")
    from gotrackmaster_spark.operators.spatial import gi_star_hotspots

    out = gi_star_hotspots(df).collect()
    return {(r["gx"], r["gy"]): r for r in out}


def _expected_z(wsum, k, counts):
    n = len(counts)
    xbar = sum(counts) / n
    s = math.sqrt(sum(c * c for c in counts) / n - xbar * xbar)
    den = s * math.sqrt((n * k - k * k) / (n - 1.0))
    return (wsum - xbar * k) / den


def test_gi_star_planted_hotspot(spark):
    # 5x5 lattice of 1s with a 100 planted in the middle: the center and
    # its ring must carry the highest z, far cells negative-ish.
    cells = [(x, y, 1) for x in range(5) for y in range(5) if (x, y) != (2, 2)]
    cells.append((2, 2, 100))
    got = _rows(spark, cells)
    assert len(got) == 25
    counts = [c for _, _, c in cells]
    # center: full 3x3 occupied, wsum = 100 + 8
    assert got[(2, 2)]["n_nbrs"] == 9
    assert got[(2, 2)]["z"] == pytest.approx(_expected_z(108, 9, counts), rel=1e-12)
    # corner (0,0): 4 occupied neighbors, all 1s
    assert got[(0, 0)]["n_nbrs"] == 4
    assert got[(0, 0)]["z"] == pytest.approx(_expected_z(4, 4, counts), rel=1e-12)
    # the hotspot dominates: center z is the global max
    assert got[(2, 2)]["z"] == max(r["z"] for r in got.values())
    # a neighbor of the hotspot still beats every cell outside the ring
    ring_min = min(
        got[(x, y)]["z"] for x in (1, 2, 3) for y in (1, 2, 3) if (x, y) != (2, 2)
    )
    far_max = max(
        r["z"] for (x, y), r in got.items() if abs(x - 2) > 1 or abs(y - 2) > 1
    )
    assert ring_min > far_max


def test_gi_star_membership_needs_no_join(spark):
    # two isolated cells: each sees only itself (k=1); absent lattice
    # targets between them must NOT appear in the output
    got = _rows(spark, [(0, 0, 3), (10, 10, 5)])
    assert set(got) == {(0, 0), (10, 10)}
    assert got[(0, 0)]["n_nbrs"] == 1
    counts = [3, 5]
    assert got[(0, 0)]["z"] == pytest.approx(_expected_z(3, 1, counts), rel=1e-12)
    assert got[(10, 10)]["z"] == pytest.approx(_expected_z(5, 1, counts), rel=1e-12)


def test_gi_star_degenerate_denominator_is_null(spark):
    # n == 1: variance ratio divides by n-1 = 0 -> z must be NULL, not inf
    got = _rows(spark, [(0, 0, 7)])
    assert got[(0, 0)]["z"] is None
    # n == 2 adjacent: k_i == n for both cells -> n*k - k^2 == 0 -> NULL
    got = _rows(spark, [(0, 0, 1), (0, 1, 2)])
    assert all(r["z"] is None for r in got.values())


def test_gi_star_plan_shape(spark):
    """No shuffled joins: the only join is the 1-row broadcast moments
    cross join; membership comes from the self-offset flag."""
    from gotrackmaster_spark.operators.spatial import gi_star_hotspots

    df = spark.createDataFrame([(0, 0, 1), (1, 1, 2)], "gx long, gy long, cnt long")
    plan = gi_star_hotspots(df)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the single BroadcastNestedLoopJoin IS the intended 1-row moments
    # broadcast (allowlisted in the registry plan audit; a constant-key
    # equi-join folds back to this shape anyway)
    assert plan.count("BroadcastNestedLoopJoin") == 1


def _moran(spark, cells):
    from gotrackmaster_spark.operators.spatial import morans_i

    df = spark.createDataFrame(cells, "gx long, gy long, cnt long")
    return morans_i(df).collect()[0]


def test_morans_i_checkerboard_is_negative(spark):
    # perfect alternation = strong NEGATIVE autocorrelation; rook-adjacent
    # cells always differ.  queen weights include diagonals (same color),
    # so I is negative but > -1.
    cells = [(x, y, 10 if (x + y) % 2 == 0 else 1) for x in range(6) for y in range(6)]
    r = _moran(spark, cells)
    assert r["n_cells"] == 36
    assert r["i_moran"] < -0.05
    assert r["e_i"] == pytest.approx(-1.0 / 35.0)


def test_morans_i_clustered_is_positive(spark):
    # left half high, right half low: neighbors mostly agree -> I >> E[I]
    cells = [(x, y, 50 if x < 3 else 1) for x in range(6) for y in range(6)]
    r = _moran(spark, cells)
    assert r["i_moran"] > 0.5


def test_morans_i_degenerate_null(spark):
    # constant lattice: zero variance -> NULL (not a division error)
    r = _moran(spark, [(x, 0, 5) for x in range(4)])
    assert r["i_moran"] is None
    # single cell: W == 0 and n == 1 -> both stats NULL
    r = _moran(spark, [(0, 0, 7)])
    assert r["i_moran"] is None and r["e_i"] is None


def test_morans_i_exact_vs_reference(spark):
    # brute-force reference over explicit neighbor pairs on a small lattice
    import random

    rnd = random.Random(42)
    cells = [(x, y, rnd.randint(1, 20)) for x in range(5) for y in range(4)]
    r = _moran(spark, cells)
    vals = {(x, y): c for x, y, c in cells}
    n = len(vals)
    xbar = sum(vals.values()) / n
    num = w = 0.0
    for (x, y), c in vals.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                if (x + dx, y + dy) in vals:
                    num += (c - xbar) * (vals[(x + dx, y + dy)] - xbar)
                    w += 1
    den = sum((c - xbar) ** 2 for c in vals.values())
    assert r["w_pairs"] == int(w)
    assert r["i_moran"] == pytest.approx((n / w) * num / den, rel=1e-9)


def test_lisa_quadrants_and_additivity(spark):
    from gotrackmaster_spark.operators.spatial import local_morans_i, morans_i

    # left half high, right half low: interior cells are HH / LL
    cells = [(x, y, 50 if x < 3 else 1) for x in range(6) for y in range(6)]
    df = spark.createDataFrame(cells, "gx long, gy long, cnt long")
    rows = {(r["gx"], r["gy"]): r for r in local_morans_i(df).collect()}
    assert rows[(0, 0)]["quad"] == "HH"          # high cell, high neighbors
    assert rows[(5, 5)]["quad"] == "LL"          # low cell, low neighbors
    assert rows[(0, 0)]["i_local"] > 0
    # boundary cells (x=2 high next to x=3 low) mix — column x=3 is LH or LL
    assert rows[(3, 2)]["quad"][0] == "L"
    # additivity: sum(I_i) == W * I_global (exact algebraic identity)
    g = morans_i(df).collect()[0]
    s = sum(r["i_local"] for r in rows.values())
    assert s == pytest.approx(g["w_pairs"] * g["i_moran"], rel=1e-9)


def test_lisa_isolated_cell_is_null(spark):
    from gotrackmaster_spark.operators.spatial import local_morans_i

    # an isolated cell has no neighbors (k_ex == 0) -> NULL stat + label,
    # while the clustered pair still gets values
    df = spark.createDataFrame(
        [(0, 0, 5), (0, 1, 7), (100, 100, 1)], "gx long, gy long, cnt long"
    )
    rows = {(r["gx"], r["gy"]): r for r in local_morans_i(df).collect()}
    assert rows[(100, 100)]["i_local"] is None
    assert rows[(100, 100)]["quad"] is None
    assert rows[(0, 0)]["quad"] is not None


def _mk(spark, rows):
    from gotrackmaster_spark.operators.spatial import mann_kendall_trends

    df = spark.createDataFrame(rows, "gx long, gy long, t long, cnt long")
    return {(r["gx"], r["gy"]): r for r in mann_kendall_trends(df).collect()}


def test_mann_kendall_monotonic_series(spark):
    import math

    # strictly increasing 10-bin series: S = 45 (all pairs positive),
    # no ties -> Var = 10*9*25/18 = 125, z = 44/sqrt(125) ~ 3.94
    rows = [(0, 0, t, 10 + t) for t in range(10)]
    # strictly decreasing twin in another cell
    rows += [(5, 5, t, 100 - t) for t in range(10)]
    got = _mk(spark, rows)
    assert got[(0, 0)]["s"] == 45 and got[(5, 5)]["s"] == -45
    assert got[(0, 0)]["z"] == pytest.approx(44 / math.sqrt(125), rel=1e-12)
    assert got[(0, 0)]["trend"] == "increasing"
    assert got[(5, 5)]["trend"] == "decreasing"


def test_mann_kendall_ties_and_degenerates(spark):
    # all-tied series: S = 0 and the tie correction zeroes Var -> NULL z, flat
    rows = [(0, 0, t, 7) for t in range(6)]
    # single-bin cell: no pairs at all
    rows += [(1, 1, 0, 3)]
    # alternating series: S near 0, flat
    rows += [(2, 2, t, 5 + (t % 2)) for t in range(8)]
    got = _mk(spark, rows)
    assert got[(0, 0)]["s"] == 0 and got[(0, 0)]["z"] is None
    assert got[(0, 0)]["trend"] == "flat"
    assert got[(1, 1)]["n_bins"] == 1 and got[(1, 1)]["s"] == 0
    assert got[(1, 1)]["z"] is None and got[(1, 1)]["trend"] == "flat"
    assert got[(2, 2)]["trend"] == "flat"


def test_mann_kendall_brute_force_reference(spark):
    import math
    import random

    rnd = random.Random(7)
    series = [rnd.randint(1, 5) for _ in range(14)]  # small range forces ties
    got = _mk(spark, [(0, 0, t, c) for t, c in enumerate(series)])[(0, 0)]
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(14)
        for j in range(i + 1, 14)
    )
    n = 14
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(series).values())
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    zref = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
    assert got["s"] == s
    assert got["z"] == pytest.approx(zref, rel=1e-12)


def test_ripley_k_brute_force_and_csr(spark):
    import math
    import random

    from gotrackmaster_spark.operators.spatial import ripley_k

    rnd = random.Random(3)
    side = 10.0
    pts = [(i, rnd.uniform(0, side), rnd.uniform(0, side)) for i in range(300)]
    df = spark.createDataFrame(pts, "event_id long, lon double, lat double")
    radii = [0.5, 1.0, 2.0]
    got = {r["r"]: r for r in ripley_k(df, radii, side * side).collect()}
    # brute-force ordered pair counts
    for r in radii:
        ref = sum(
            1
            for i, xi, yi in pts
            for jj, xj, yj in pts
            if i != jj and (xi - xj) ** 2 + (yi - yj) ** 2 <= r * r
        )
        assert got[r]["n_pairs"] == ref
        assert got[r]["k_r"] == pytest.approx(side * side * ref / 300**2, rel=1e-12)
        assert got[r]["l_r"] == pytest.approx(math.sqrt(got[r]["k_r"] / math.pi), rel=1e-12)
    # CSR: L(r) ~ r (within sampling noise, generous band; no edge
    # correction biases L slightly LOW near the window border)
    assert abs(got[1.0]["l_r"] - 1.0) < 0.25
    # clustered point set: everything in two tight blobs -> L(r) >> r
    blob = [
        (i, (i % 2) * 8.0 + rnd.gauss(0, 0.05), (i % 2) * 8.0 + rnd.gauss(0, 0.05))
        for i in range(300)
    ]
    dfb = spark.createDataFrame(blob, "event_id long, lon double, lat double")
    gotb = {r["r"]: r for r in ripley_k(dfb, radii, side * side).collect()}
    assert gotb[0.5]["l_r"] > 2.0


def test_gi_star_cancellation_negative_variance_is_null(spark):
    """Float cancellation can drive s2/n - xbar^2 slightly NEGATIVE on a
    constant lattice of huge counts; sqrt of that is NaN and Spark's NaN
    ordering makes `NaN > 0` TRUE — the guard must compare the variance
    itself (and the DuckDB twin must not sqrt a negative)."""
    from gotrackmaster_spark.operators.spatial import gi_star_hotspots

    c = 718311091  # drives s2/n - xbar^2 to -64.0 in float64
    df = spark.createDataFrame(
        [(0, 0, c), (10, 10, c), (20, 20, c)], "gx long, gy long, cnt long"
    )
    rows = gi_star_hotspots(df).collect()
    assert len(rows) == 3
    assert all(r["z"] is None for r in rows)


def test_mann_kendall_time_reversal_negates_s(spark):
    # reversing the time axis flips every pair's sign: S -> -S, |z| equal
    import random

    rnd = random.Random(11)
    series = [rnd.randint(1, 9) for _ in range(12)]
    fwd = _mk(spark, [(0, 0, t, c) for t, c in enumerate(series)])[(0, 0)]
    rev = _mk(spark, [(0, 0, t, c) for t, c in enumerate(reversed(series))])[(0, 0)]
    assert rev["s"] == -fwd["s"]
    if fwd["z"] is not None:
        assert rev["z"] == pytest.approx(-fwd["z"], rel=1e-12)


def test_ripley_k_monotone_in_r(spark):
    # K(r) is a nondecreasing step function of r by construction
    import random

    from gotrackmaster_spark.operators.spatial import ripley_k

    rnd = random.Random(5)
    pts = [(i, rnd.uniform(0, 8), rnd.uniform(0, 8)) for i in range(200)]
    df = spark.createDataFrame(pts, "event_id long, lon double, lat double")
    rows = sorted(ripley_k(df, [0.25, 0.5, 1.0, 2.0], 64.0).collect(), key=lambda r: r["r"])
    ks = [r["k_r"] for r in rows]
    assert ks == sorted(ks)
    assert all(a["n_pairs"] <= b["n_pairs"] for a, b in zip(rows, rows[1:]))


def _knox(spark, pts, delta, tau):
    from gotrackmaster_spark.operators.spatial import knox_statistic

    df = spark.createDataFrame(
        pts, "event_id long, lon double, lat double, t_us long"
    )
    return knox_statistic(df, delta, tau).collect()[0]


def _knox_brute(pts, delta, tau):
    s = t = st = 0
    for i, xi, yi, ti in pts:
        for j, xj, yj, tj in pts:
            if i == j:
                continue
            cs = (xi - xj) ** 2 + (yi - yj) ** 2 <= delta * delta
            ct = abs(ti - tj) <= tau
            s += cs
            t += ct
            st += cs and ct
    return s, t, st


def test_knox_brute_force(spark):
    # seeded random cloud, random times: every count must equal the
    # O(n^2) reference exactly, and ratio/z must replay the fixed
    # double algebra
    import random

    rnd = random.Random(7)
    n = 250
    pts = [
        (
            i,
            rnd.uniform(0, 10),
            rnd.uniform(0, 10),
            rnd.randrange(0, 1_000_000),
        )
        for i in range(n)
    ]
    delta, tau = 1.0, 50_000
    got = _knox(spark, pts, delta, tau)
    s, t, st = _knox_brute(pts, delta, tau)
    assert (got["n"], got["s_pairs"], got["t_pairs"], got["st_pairs"]) == (
        n,
        s,
        t,
        st,
    )
    nn = float(n * (n - 1))
    assert got["knox_ratio"] == pytest.approx(st * nn / (s * t), rel=1e-12)
    e = s * t / nn
    assert got["z"] == pytest.approx((st - e) / math.sqrt(e), rel=1e-12)


def test_knox_independence_vs_interaction(spark):
    # same SPATIAL layout twice: times independent of space -> ratio ~ 1;
    # times tied to the spatial blob -> ratio >> 1 (the statistic's job)
    import random

    rnd = random.Random(13)
    n, n_blobs = 400, 8
    space = []
    for i in range(n):
        b = i % n_blobs
        space.append(
            (i, b * 5.0 + rnd.gauss(0, 0.1), b * 3.0 + rnd.gauss(0, 0.1))
        )
    tau = 30_000
    indep = [
        (i, x, y, rnd.randrange(0, 10_000_000)) for (i, x, y) in space
    ]
    got_i = _knox(spark, indep, 1.0, tau)
    assert got_i["knox_ratio"] == pytest.approx(1.0, abs=0.15)
    inter = [
        (i, x, y, (i % n_blobs) * 1_000_000 + rnd.randrange(0, tau))
        for (i, x, y) in space
    ]
    got_x = _knox(spark, inter, 1.0, tau)
    assert got_x["knox_ratio"] > 4.0
    assert got_x["z"] > got_i["z"]


def test_knox_time_translation_invariance(spark):
    # shifting every timestamp by a constant (into PRE-EPOCH negatives)
    # cannot change any count: pins the double-pmod floor buckets
    import random

    rnd = random.Random(21)
    pts = [
        (i, rnd.uniform(0, 6), rnd.uniform(0, 6), rnd.randrange(0, 500_000))
        for i in range(150)
    ]
    tau = 40_000
    a = _knox(spark, pts, 1.0, tau)
    shifted = [(i, x, y, t - 1_000_000_007) for (i, x, y, t) in pts]
    b = _knox(spark, shifted, 1.0, tau)
    for c in ("n", "s_pairs", "t_pairs", "st_pairs", "knox_ratio", "z"):
        assert a[c] == b[c]


def test_knox_degenerate_inputs(spark):
    # n = 1: no pairs at all -> NULL ratio/z, zero counts
    one = _knox(spark, [(1, 0.0, 0.0, 0)], 1.0, 1000)
    assert (one["s_pairs"], one["t_pairs"], one["st_pairs"]) == (0, 0, 0)
    assert one["knox_ratio"] is None and one["z"] is None
    # no time-close pairs (tau far below every gap) -> NULL ratio/z
    pts = [(i, float(i), 0.0, i * 1_000_000) for i in range(5)]
    far = _knox(spark, pts, 10.0, 10)
    assert far["t_pairs"] == 0 and far["knox_ratio"] is None and far["z"] is None


def _vario(spark, pts, edges):
    from gotrackmaster_spark.operators.spatial import semivariogram

    df = spark.createDataFrame(
        pts, "event_id long, lon double, lat double, value long"
    )
    return {
        (r["h_lo"], r["h_hi"]): r
        for r in semivariogram(df, edges).collect()
    }


def test_semivariogram_brute_force(spark):
    # seeded random cloud with integer values: per-band pair counts and
    # squared-difference sums must equal the O(n^2) reference exactly,
    # gamma the exact-int division
    import random

    rnd = random.Random(17)
    pts = [
        (i, rnd.uniform(0, 8), rnd.uniform(0, 8), rnd.randrange(0, 100))
        for i in range(250)
    ]
    edges = [0.0, 0.5, 1.0, 2.0]
    got = _vario(spark, pts, edges)
    for lo, hi in zip(edges, edges[1:]):
        n = s = 0
        for i, xi, yi, vi in pts:
            for j, xj, yj, vj in pts:
                if i == j:
                    continue
                d2 = (xi - xj) ** 2 + (yi - yj) ** 2
                if lo * lo < d2 <= hi * hi:
                    n += 1
                    s += (vi - vj) ** 2
        r = got[(lo, hi)]
        assert r["n_pairs"] == n
        if n:
            assert r["gamma"] == s / (2 * n)
        else:
            assert r["gamma"] is None


def test_semivariogram_trend_monotone(spark):
    # a pure linear trend field (v = x) must produce gamma rising with
    # h: mean (v_i - v_j)^2 grows with the band distance
    pts = [
        (i * 50 + j, float(i), float(j), i * 10)
        for i in range(20)
        for j in range(20)
    ]
    got = _vario(spark, pts, [0.0, 1.5, 3.5, 7.5])
    gs = [
        got[(0.0, 1.5)]["gamma"],
        got[(1.5, 3.5)]["gamma"],
        got[(3.5, 7.5)]["gamma"],
    ]
    assert all(g is not None for g in gs)
    assert gs[0] < gs[1] < gs[2]


def test_semivariogram_empty_band_and_bad_edges(spark):
    import pytest as _pt

    from gotrackmaster_spark.operators.spatial import semivariogram

    # two points 1.0 apart: the (0, 0.5] band is empty -> NULL gamma,
    # the (0.5, 1.5] band holds both ordered pairs
    got = _vario(
        spark, [(1, 0.0, 0.0, 3), (2, 1.0, 0.0, 7)], [0.0, 0.5, 1.5]
    )
    assert got[(0.0, 0.5)]["n_pairs"] == 0
    assert got[(0.0, 0.5)]["gamma"] is None
    assert got[(0.5, 1.5)]["n_pairs"] == 2
    assert got[(0.5, 1.5)]["gamma"] == 8.0  # 2*(3-7)^2 / (2*2)
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 0)], "event_id long, lon double, lat double, value long"
    )
    with _pt.raises(ValueError):
        semivariogram(df, [1.0])
    with _pt.raises(ValueError):
        semivariogram(df, [1.0, 1.0])


def test_semivariogram_coincident_pairs_in_no_band(spark):
    # d = 0 pairs (coincident points) fall in NO half-open band
    got = _vario(
        spark,
        [(1, 2.0, 2.0, 1), (2, 2.0, 2.0, 9), (3, 2.5, 2.0, 5)],
        [0.0, 1.0],
    )
    r = got[(0.0, 1.0)]
    # only the 4 ordered pairs involving point 3 are counted
    assert r["n_pairs"] == 4
    assert r["gamma"] == (2 * 16 + 2 * 16) / 8.0


def _ellipse(spark, pts):
    from gotrackmaster_spark.operators.spatial import sd_ellipse

    df = spark.createDataFrame(pts, "g long, x long, y long")
    return {
        r["g"]: r for r in sd_ellipse(df, ["g"], "x", "y").collect()
    }


def test_sd_ellipse_numpy_reference(spark):
    # moments/eigen algebra vs numpy's covariance eigendecomposition on
    # a seeded integer cloud
    import random

    import numpy as np

    rnd = random.Random(29)
    pts = [
        (1, rnd.randrange(-500, 500), rnd.randrange(-200, 200))
        for _ in range(400)
    ]
    got = _ellipse(spark, pts)[1]
    xs = np.array([p[1] for p in pts], dtype=float)
    ys = np.array([p[2] for p in pts], dtype=float)
    assert got["n"] == 400
    assert got["x_mean"] == pytest.approx(xs.mean(), rel=1e-12)
    assert got["y_mean"] == pytest.approx(ys.mean(), rel=1e-12)
    cov = np.cov(np.vstack([xs, ys]), bias=True)
    lam = sorted(np.linalg.eigvalsh(cov))
    assert got["sd_dist"] == pytest.approx(math.sqrt(cov[0, 0] + cov[1, 1]), rel=1e-12)
    assert got["ax_major"] == pytest.approx(math.sqrt(lam[1]), rel=1e-10)
    assert got["ax_minor"] == pytest.approx(math.sqrt(lam[0]), rel=1e-10)
    # theta is the major-axis direction: the eigenvector check
    v = np.array([math.cos(got["theta"]), math.sin(got["theta"])])
    assert v @ cov @ v == pytest.approx(lam[1], rel=1e-10)


def test_sd_ellipse_axis_aligned_and_collinear(spark):
    # x-spread-only group: major axis along x (theta = 0), minor = 0
    line = [(1, i, 7) for i in range(-10, 11)]
    got = _ellipse(spark, line)[1]
    assert got["theta"] == pytest.approx(0.0)
    assert got["ax_minor"] == 0.0
    assert got["ax_major"] == pytest.approx(got["sd_dist"], rel=1e-12)
    assert got["y_mean"] == 7.0
    # the same points rotated 90 degrees: theta = pi/2, axes unchanged
    rot = [(1, 7, i) for i in range(-10, 11)]
    got_r = _ellipse(spark, rot)[1]
    assert got_r["theta"] == pytest.approx(math.pi / 2)
    assert got_r["ax_major"] == pytest.approx(got["ax_major"], rel=1e-12)


def test_sd_ellipse_degenerate_groups(spark):
    got = _ellipse(spark, [(1, 5, 5), (2, 3, 3), (2, 3, 3), (2, 3, 3)])
    one = got[1]
    assert one["n"] == 1
    assert one["x_mean"] == 5.0 and one["y_mean"] == 5.0
    assert (
        one["sd_dist"] is None
        and one["theta"] is None
        and one["ax_major"] is None
        and one["ax_minor"] is None
    )
    # n > 1 but zero spread: all dispersion exactly 0, never NaN
    same = got[2]
    assert same["sd_dist"] == 0.0
    assert same["ax_major"] == 0.0 and same["ax_minor"] == 0.0


def _emerge(spark, spikes, bins=6, side=10, hot_z=1.96):
    """Build a side×side all-1s lattice per bin, override `spikes`
    {(x, y): [cnt per bin]}, run emerging_hotspots."""
    from gotrackmaster_spark.operators.spatial import emerging_hotspots

    rows = []
    for t in range(bins):
        for x in range(side):
            for y in range(side):
                rows.append((x, y, t, spikes.get((x, y), [1] * bins)[t]))
    df = spark.createDataFrame(rows, "gx long, gy long, t long, cnt long")
    return {
        (r["gx"], r["gy"]): r for r in emerging_hotspots(df, hot_z).collect()
    }


def test_emerging_intensifying_and_historical(spark):
    # A grows 10 -> 320 (z crosses 1.96 only in the last bin, MK strictly
    # increasing); D decays 400 -> 150 (hot for 5 bins, cold in the last)
    got = _emerge(
        spark,
        {
            (2, 2): [10, 20, 40, 80, 160, 320],
            (7, 7): [400, 350, 300, 250, 200, 150],
        },
    )
    a, d = got[(2, 2)], got[(7, 7)]
    assert a["category"] == "intensifying"
    assert a["s"] == 15 and a["n_bins"] == 6 and a["hot_bins"] == 1
    assert d["category"] == "historical"
    assert d["s"] == -15 and d["hot_bins"] == 5
    # a quiet background cell far from both spikes is 'none'
    assert got[(0, 0)]["category"] == "none"
    assert got[(0, 0)]["hot_bins"] == 0


def test_emerging_diminishing_and_emerging(spark):
    # D is huge but slowly decaying (still hot in the last bin, MK
    # decreasing); A grows but never crosses 1.96 -> emerging
    got = _emerge(
        spark,
        {
            (2, 2): [10, 20, 40, 80, 160, 320],
            (7, 7): [800, 780, 760, 740, 720, 700],
        },
    )
    d, a = got[(7, 7)], got[(2, 2)]
    assert d["category"] == "diminishing"
    assert d["hot_bins"] == 6 and d["s"] == -15
    assert a["category"] == "emerging"
    assert a["hot_bins"] == 0 and a["s"] == 15


def test_emerging_persistent_constant_spike(spark):
    # Gi* is standardized: a constant spike on a constant background has
    # the SAME z every bin (ties -> Var(S)=0 -> z_mk NULL -> flat) while
    # staying hot -> persistent; every background cell's series is
    # constant too -> flat, never hot -> none
    got = _emerge(spark, {(5, 5): [50] * 6})
    p = got[(5, 5)]
    assert p["category"] == "persistent"
    assert p["hot_bins"] == 6 and p["n_bins"] == 6
    assert p["s"] == 0 and p["z_mk"] is None
    assert got[(0, 0)]["category"] == "none"
    assert got[(0, 0)]["z_mk"] is None


def test_emerging_degenerate_bins_drop_out(spark):
    from gotrackmaster_spark.operators.spatial import emerging_hotspots

    # bin 2 has a SINGLE occupied cell (n == 1 -> z degenerate-NULL) and
    # an isolated far cell occupied ONLY in that bin: the bin contributes
    # nothing to any series and the far cell is absent from the output
    rows = []
    for t in (0, 1, 3):
        rows += [(x, y, t, 1 + x + y * t) for x in range(4) for y in range(4)]
    rows.append((50, 50, 2, 99))
    df = spark.createDataFrame(rows, "gx long, gy long, t long, cnt long")
    got = {(r["gx"], r["gy"]): r for r in emerging_hotspots(df).collect()}
    assert (50, 50) not in got
    assert all(r["n_bins"] == 3 for r in got.values())


def test_emerging_brute_force_reference(spark):
    # seeded random lattice with random per-bin presence: every output
    # column must match the plain-Python replay of the whole composite
    import random
    from collections import Counter

    rnd = random.Random(31)
    bins, side = 5, 6
    data = {}  # (t, x, y) -> cnt
    for t in range(bins):
        for x in range(side):
            for y in range(side):
                if rnd.random() < 0.8:
                    data[(t, x, y)] = rnd.randint(1, 20)
    rows = [(x, y, t, c) for (t, x, y), c in data.items()]
    df = spark.createDataFrame(rows, "gx long, gy long, t long, cnt long")
    from gotrackmaster_spark.operators.spatial import emerging_hotspots

    got = {(r["gx"], r["gy"]): r for r in emerging_hotspots(df).collect()}

    series = {}
    for t in range(bins):
        cells = {(x, y): c for (tt, x, y), c in data.items() if tt == t}
        n = len(cells)
        s1 = sum(cells.values())
        s2 = sum(c * c for c in cells.values())
        xbar = s1 / n
        var = s2 / n - xbar * xbar
        for (x, y), c in cells.items():
            occ = [
                (x + dx, y + dy)
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (x + dx, y + dy) in cells
            ]
            k = len(occ)
            wsum = sum(cells[p] for p in occ)
            if n > 1 and n * k - k * k > 0 and var > 0:
                z = (wsum - xbar * k) / (
                    math.sqrt(var) * math.sqrt((n * k - k * k) / (n - 1.0))
                )
                series.setdefault((x, y), []).append((t, z))
    assert set(got) == set(series)
    for cell, zs in series.items():
        zs.sort()
        vals = [z for _, z in zs]
        T = len(vals)
        s = sum(
            (vals[j] > vals[i]) - (vals[j] < vals[i])
            for i in range(T)
            for j in range(i + 1, T)
        )
        tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(vals).values())
        var_s = (T * (T - 1) * (2 * T + 5) - tie) / 18.0
        if var_s > 0:
            zmk = (s - 1) / math.sqrt(var_s) if s > 0 else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
        else:
            zmk = None
        trend = (
            "flat"
            if zmk is None
            else "increasing" if zmk > 1.96 else "decreasing" if zmk < -1.96 else "flat"
        )
        hot_now = vals[-1] > 1.96
        was_hot = any(v > 1.96 for v in vals)
        if hot_now:
            cat = {"increasing": "intensifying", "decreasing": "diminishing"}.get(
                trend, "persistent"
            )
        elif was_hot:
            cat = "historical"
        elif trend == "increasing":
            cat = "emerging"
        else:
            cat = "none"
        r = got[cell]
        assert r["n_bins"] == T and r["s"] == s
        assert r["hot_bins"] == sum(v > 1.96 for v in vals)
        if zmk is None:
            assert r["z_mk"] is None
        else:
            assert r["z_mk"] == pytest.approx(zmk, rel=1e-12)
        assert r["category"] == cat, (cell, r, zmk, trend)


def _lattice_dict(cells):
    return {(x, y): c for x, y, c in cells}


def _queen_pairs(vals):
    """Ordered occupied queen-neighbor pairs (i, j), i != j."""
    for (x, y) in vals:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) != (0, 0) and (x + dx, y + dy) in vals:
                    yield (x, y), (x + dx, y + dy)


def test_geary_c_brute_force(spark):
    import random

    from gotrackmaster_spark.operators.spatial import geary_c

    rnd = random.Random(43)
    cells = [(x, y, rnd.randint(1, 20)) for x in range(5) for y in range(4)]
    df = spark.createDataFrame(cells, "gx long, gy long, cnt long")
    r = geary_c(df).collect()[0]
    vals = _lattice_dict(cells)
    n = len(vals)
    xbar = sum(vals.values()) / n
    d = sum((vals[i] - vals[j]) ** 2 for i, j in _queen_pairs(vals))
    w = sum(1 for _ in _queen_pairs(vals))
    den = sum((c - xbar) ** 2 for c in vals.values())
    assert r["w_pairs"] == w and r["d_sum"] == d
    assert r["c_geary"] == pytest.approx((n - 1) * d / (2 * w) / den, rel=1e-12)
    assert r["e_c"] == 1.0


def test_geary_c_checkerboard_vs_clustered(spark):
    from gotrackmaster_spark.operators.spatial import geary_c

    # alternation -> big pairwise differences -> C > 1 (dispersed)
    cb = [(x, y, 10 if (x + y) % 2 == 0 else 1) for x in range(6) for y in range(6)]
    r = geary_c(spark.createDataFrame(cb, "gx long, gy long, cnt long")).collect()[0]
    assert r["c_geary"] > 1.0
    # two homogeneous halves -> small differences -> C < 1 (clustered)
    cl = [(x, y, 50 if x < 3 else 1) for x in range(6) for y in range(6)]
    r = geary_c(spark.createDataFrame(cl, "gx long, gy long, cnt long")).collect()[0]
    assert r["c_geary"] < 0.5
    # constant lattice / single cell -> NULL
    r = geary_c(
        spark.createDataFrame([(0, 0, 5), (0, 1, 5)], "gx long, gy long, cnt long")
    ).collect()[0]
    assert r["c_geary"] is None


def test_general_g_brute_force_and_direction(spark):
    import random

    from gotrackmaster_spark.operators.spatial import general_g

    rnd = random.Random(47)
    cells = [(x, y, rnd.randint(1, 20)) for x in range(5) for y in range(4)]
    df = spark.createDataFrame(cells, "gx long, gy long, cnt long")
    r = general_g(df).collect()[0]
    vals = _lattice_dict(cells)
    n = len(vals)
    num = sum(vals[i] * vals[j] for i, j in _queen_pairs(vals))
    den = sum(
        vals[i] * vals[j]
        for i in vals
        for j in vals
        if i != j
    )
    w = sum(1 for _ in _queen_pairs(vals))
    assert (r["g_num"], r["g_den"], r["w_pairs"]) == (num, den, w)
    assert r["g_obs"] == num / den
    assert r["e_g"] == w / (n * (n - 1))
    # high values clustered together -> G > E[G]
    hi = [(x, y, 100 if x < 2 else 1) for x in range(6) for y in range(6)]
    rh = general_g(
        spark.createDataFrame(hi, "gx long, gy long, cnt long")
    ).collect()[0]
    assert rh["g_obs"] > rh["e_g"]
    # high values spread to opposite corners -> G < E[G]
    far = [(x, y, 1) for x in range(6) for y in range(6)]
    far = [
        (x, y, 100 if (x, y) in ((0, 0), (5, 5), (0, 5), (5, 0)) else 1)
        for x, y, _ in far
    ]
    rf = general_g(
        spark.createDataFrame(far, "gx long, gy long, cnt long")
    ).collect()[0]
    assert rf["g_obs"] < rf["e_g"]


def test_join_counts_brute_force(spark):
    import random

    from gotrackmaster_spark.operators.spatial import join_counts

    rnd = random.Random(53)
    cells = [(x, y, rnd.randint(1, 10)) for x in range(6) for y in range(5)]
    thr = 6
    df = spark.createDataFrame(cells, "gx long, gy long, cnt long")
    r = join_counts(df, thr).collect()[0]
    vals = {k: int(v >= thr) for k, v in _lattice_dict(cells).items()}
    pairs = [(vals[i], vals[j]) for i, j in _queen_pairs(vals)]
    w = len(pairs) // 2
    bb = sum(1 for a, b in pairs if a and b) // 2
    ww = sum(1 for a, b in pairs if not a and not b) // 2
    bw = sum(1 for a, b in pairs if a != b) // 2
    n = len(vals)
    nb = sum(vals.values())
    nw = n - nb
    assert (r["n_cells"], r["n_black"], r["w_pairs"]) == (n, nb, w)
    assert (r["bb"], r["bw"], r["ww"]) == (bb, bw, ww)
    assert bb + bw + ww == w
    assert r["e_bb"] == pytest.approx(w * nb * (nb - 1) / (n * (n - 1)), rel=1e-12)
    assert r["e_bw"] == pytest.approx(2 * w * nb * nw / (n * (n - 1)), rel=1e-12)
    assert r["e_ww"] == pytest.approx(w * nw * (nw - 1) / (n * (n - 1)), rel=1e-12)


def test_join_counts_checkerboard_bw_excess(spark):
    from gotrackmaster_spark.operators.spatial import join_counts

    # checkerboard: every ROOK pair is mixed -> BW far above expectation
    cells = [(x, y, 9 if (x + y) % 2 == 0 else 1) for x in range(6) for y in range(6)]
    r = join_counts(
        spark.createDataFrame(cells, "gx long, gy long, cnt long"), 5
    ).collect()[0]
    assert r["bw"] > r["e_bw"]
    # all-black lattice: bw == ww == 0, expectations defined, e_ww == 0
    allb = [(x, y, 9) for x in range(3) for y in range(3)]
    rb = join_counts(
        spark.createDataFrame(allb, "gx long, gy long, cnt long"), 5
    ).collect()[0]
    assert rb["bw"] == 0 and rb["ww"] == 0 and rb["bb"] == rb["w_pairs"]
    assert rb["e_ww"] == 0.0


def test_bivariate_moran_reduces_to_univariate(spark):
    import random

    from gotrackmaster_spark.operators.spatial import bivariate_morans_i, morans_i

    rnd = random.Random(59)
    cells = [(x, y, rnd.randint(1, 20)) for x in range(5) for y in range(5)]
    uni = morans_i(
        spark.createDataFrame(cells, "gx long, gy long, cnt long")
    ).collect()[0]
    bi = bivariate_morans_i(
        spark.createDataFrame(
            [(x, y, c, c) for x, y, c in cells], "gx long, gy long, x long, y long"
        )
    ).collect()[0]
    assert bi["w_pairs"] == uni["w_pairs"]
    assert bi["i_xy"] == pytest.approx(uni["i_moran"], rel=1e-12)
    # y = -x + const flips the sign exactly
    neg = bivariate_morans_i(
        spark.createDataFrame(
            [(x, y, c, 21 - c) for x, y, c in cells],
            "gx long, gy long, x long, y long",
        )
    ).collect()[0]
    assert neg["i_xy"] == pytest.approx(-bi["i_xy"], rel=1e-12)


def test_bivariate_moran_brute_force(spark):
    import math as _m
    import random

    from gotrackmaster_spark.operators.spatial import bivariate_morans_i

    rnd = random.Random(61)
    cells = [
        (x, y, rnd.randint(1, 20), rnd.randint(1, 50))
        for x in range(5)
        for y in range(4)
    ]
    r = bivariate_morans_i(
        spark.createDataFrame(cells, "gx long, gy long, x long, y long")
    ).collect()[0]
    xs = {(x, y): a for x, y, a, _ in cells}
    ys = {(x, y): b for x, y, _, b in cells}
    n = len(xs)
    xbar = sum(xs.values()) / n
    ybar = sum(ys.values()) / n
    cross = sum((xs[i] - xbar) * (ys[j] - ybar) for i, j in _queen_pairs(xs))
    w = sum(1 for _ in _queen_pairs(xs))
    den = _m.sqrt(
        sum((v - xbar) ** 2 for v in xs.values())
        * sum((v - ybar) ** 2 for v in ys.values())
    )
    assert r["w_pairs"] == w
    assert r["i_xy"] == pytest.approx((n / w) * cross / den, rel=1e-12)
    # degenerate: constant y layer -> NULL
    rc = bivariate_morans_i(
        spark.createDataFrame(
            [(x, y, a, 7) for x, y, a, _ in cells],
            "gx long, gy long, x long, y long",
        )
    ).collect()[0]
    assert rc["i_xy"] is None


def _kde(spark, pts, cell, r):
    from gotrackmaster_spark.operators.spatial import kde_raster

    df = spark.createDataFrame(pts, "x long, y long")
    return {
        (row["cx"], row["cy"]): row
        for row in kde_raster(df, cell, r).collect()
    }


def _kde_brute(pts, cell, r):
    q = (r * cell) ** 2
    out = {}
    for x, y in pts:
        px, py = x // cell, y // cell
        for cx in range(px - r, px + r + 1):
            for cy in range(py - r, py + r + 1):
                d2 = (x - (cx * cell + cell // 2)) ** 2 + (
                    y - (cy * cell + cell // 2)
                ) ** 2
                if q - d2 > 0:
                    n, k = out.get((cx, cy), (0, 0))
                    out[(cx, cy)] = (n + 1, k + (q - d2))
    return out


def test_kde_raster_brute_force(spark):
    import random

    rnd = random.Random(67)
    # negative coords included: pins the floor (not truncate) cell math
    pts = [(rnd.randrange(-5000, 5000), rnd.randrange(-5000, 5000)) for _ in range(300)]
    got = _kde(spark, pts, 100, 2)
    ref = _kde_brute(pts, 100, 2)
    assert set(got) == set(ref)
    for c, (n, k) in ref.items():
        assert (got[c]["n_pts"], got[c]["kde"]) == (n, k)


def test_kde_raster_support_boundary_and_center(spark):
    # a point exactly R away from a center contributes ZERO there
    # (strict inequality), and a point AT a center gets the full Q
    cell, r = 10, 1
    q = (r * cell) ** 2
    # center of cell (0, 0) is (5, 5); (15, 5) is exactly R=10 from it
    got = _kde(spark, [(15, 5)], cell, r)
    assert (0, 0) not in got
    assert got[(1, 0)]["kde"] == q  # its own center exactly
    # fan-out bound: a single point touches at most (2r+1)^2 cells
    assert len(got) <= (2 * r + 1) ** 2


def test_kde_raster_validation(spark):
    import pytest as _pt

    from gotrackmaster_spark.operators.spatial import kde_raster

    df = spark.createDataFrame([(0, 0)], "x long, y long")
    with _pt.raises(ValueError):
        kde_raster(df, 11, 1)   # odd cell -> non-integral centers
    with _pt.raises(ValueError):
        kde_raster(df, 10, 0)


def _ce(spark, pts, r_max, area, quant=1000):
    from gotrackmaster_spark.operators.spatial import clark_evans

    df = spark.createDataFrame(pts, "event_id long, x long, y long")
    return clark_evans(df, r_max, area, quant).collect()[0]


def _ce_brute(pts, r_max, area, quant=1000):
    import math as m

    n = len(pts)
    dqs = []
    n_far = 0
    for i, (_, x, y) in enumerate(pts):
        d2s = [
            (x - bx) ** 2 + (y - by) ** 2
            for j, (_, bx, by) in enumerate(pts)
            if i != j
        ]
        d2 = min(d2s) if d2s else None
        if d2 is None or d2 > r_max * r_max:
            n_far += 1
        else:
            dqs.append(m.floor(m.sqrt(d2) * float(quant)))
    if not dqs:
        return n, 0, n_far, None, None, None
    mean_nn = (sum(dqs) / float(len(dqs))) / float(quant)
    lam = n / area
    expected = 0.5 / m.sqrt(lam)
    r_index = mean_nn / expected
    z = (mean_nn - expected) / (0.26136 / m.sqrt(n * lam))
    return n, len(dqs), n_far, sum(dqs), mean_nn, r_index, z


def test_clark_evans_brute_force(spark):
    import random

    rnd = random.Random(91)
    pts = [(i, rnd.randrange(0, 20000), rnd.randrange(0, 20000)) for i in range(250)]
    got = _ce(spark, pts, 3000, 20000.0 * 20000.0)
    n, n_near, n_far, sum_dq, mean_nn, r_index, z = _ce_brute(
        pts, 3000, 20000.0 * 20000.0
    )
    assert (got["n_pts"], got["n_near"], got["n_far"], got["sum_dq"]) == (
        n, n_near, n_far, sum_dq,
    )
    assert abs(got["mean_nn"] - mean_nn) < 1e-9
    assert abs(got["r_index"] - r_index) < 1e-9
    assert abs(got["z_score"] - z) < 1e-9


def test_clark_evans_discriminates_patterns(spark):
    import random

    rnd = random.Random(13)
    area = 40000.0 * 40000.0
    # CSR: uniform random -> R near 1
    csr = [(i, rnd.randrange(0, 40000), rnd.randrange(0, 40000)) for i in range(500)]
    # clustered: 10 tight blobs -> R well below 1
    clustered = [
        (i, (i % 10) * 4000 + rnd.randrange(0, 80), (i % 10) * 4000 + rnd.randrange(0, 80))
        for i in range(500)
    ]
    # dispersed: regular lattice -> R above 1 (max 2.149 for a perfect grid)
    grid = [(i, (i % 22) * 1800 + 200, (i // 22) * 1800 + 200) for i in range(484)]
    r_csr = _ce(spark, csr, 6000, area)["r_index"]
    r_clu = _ce(spark, clustered, 6000, area)["r_index"]
    r_grid = _ce(spark, grid, 6000, area)["r_index"]
    assert r_clu < 0.5 < r_csr < 1.5 < r_grid
    # z agrees in sign with R - 1
    assert _ce(spark, clustered, 6000, area)["z_score"] < 0
    assert _ce(spark, grid, 6000, area)["z_score"] > 0


def test_clark_evans_far_points_and_degenerate(spark):
    # two coincident points + one isolated: NN distance 0 counts (d_q = 0),
    # the isolated point lands in n_far
    pts = [(1, 0, 0), (2, 0, 0), (3, 900_000, 900_000)]
    got = _ce(spark, pts, 100, 1e12)
    assert (got["n_pts"], got["n_near"], got["n_far"], got["sum_dq"]) == (3, 2, 1, 0)
    assert got["mean_nn"] == 0.0 and got["r_index"] == 0.0
    # single point: nothing within range -> all-NULL statistics
    got = _ce(spark, [(1, 0, 0)], 100, 1e6)
    assert (got["n_pts"], got["n_near"], got["n_far"]) == (1, 0, 1)
    assert got["mean_nn"] is None and got["r_index"] is None and got["z_score"] is None

    from gotrackmaster_spark.operators.spatial import clark_evans
    import pytest as _pt

    df = spark.createDataFrame([(1, 0, 0)], "event_id long, x long, y long")
    with _pt.raises(ValueError):
        clark_evans(df, 0, 1.0)


def _gfn(spark, pts, step, n_bands):
    from gotrackmaster_spark.operators.spatial import nn_gfunction

    df = spark.createDataFrame(pts, "event_id long, x long, y long")
    rows = nn_gfunction(df, step, n_bands).collect()
    return {r["r"]: (r["n_le"], r["g_r"]) for r in rows}


def test_nn_gfunction_brute_force(spark):
    import random

    rnd = random.Random(47)
    pts = [(i, rnd.randrange(0, 30000), rnd.randrange(0, 30000)) for i in range(300)]
    step, n_bands = 500, 6
    got = _gfn(spark, pts, step, n_bands)
    assert sorted(got) == [step * k for k in range(1, n_bands + 1)]
    n = len(pts)
    for k in range(1, n_bands + 1):
        r = step * k
        n_le = sum(
            1
            for i, (_, x, y) in enumerate(pts)
            if min(
                (x - bx) ** 2 + (y - by) ** 2
                for j, (_, bx, by) in enumerate(pts)
                if i != j
            )
            <= r * r
        )
        assert got[r][0] == n_le
        assert abs(got[r][1] - n_le / n) < 1e-12


def test_nn_gfunction_monotone_and_empty(spark):
    # CDF is monotone nondecreasing in r and bounded by 1
    pts = [(i, (i % 20) * 700, (i // 20) * 700) for i in range(400)]
    got = _gfn(spark, pts, 250, 4)
    vals = [got[250 * k][1] for k in range(1, 5)]
    assert vals == sorted(vals) and vals[-1] <= 1.0
    # lattice pitch 700: nothing within 500, everything within 750
    assert got[500][0] == 0 and got[750][0] == 400
    # empty input -> zero counts, NULL g
    got = _gfn(spark, [], 100, 3)
    assert all(v == (0, None) for v in got.values())

    from gotrackmaster_spark.operators.spatial import nn_gfunction
    import pytest as _pt

    df = spark.createDataFrame([(1, 0, 0)], "event_id long, x long, y long")
    with _pt.raises(ValueError):
        nn_gfunction(df, 0, 3)
    with _pt.raises(ValueError):
        nn_gfunction(df, 100, 0)


def _qt(spark, pts, cell, w, h):
    from gotrackmaster_spark.operators.spatial import quadrat_test

    df = spark.createDataFrame(pts, "event_id long, x long, y long")
    return quadrat_test(df, cell, w, h).collect()[0]


def test_quadrat_test_brute_force(spark):
    import math as m
    import random

    rnd = random.Random(29)
    # some points deliberately outside the 8000x6000 window
    pts = [(i, rnd.randrange(0, 9000), rnd.randrange(0, 7000)) for i in range(400)]
    cell, w, h = 1000, 8000, 6000
    got = _qt(spark, pts, cell, w, h)
    inw = [(x, y) for _, x, y in pts if x < w and y < h]
    counts = {}
    for x, y in inw:
        counts[(x // cell, y // cell)] = counts.get((x // cell, y // cell), 0) + 1
    n_q = (w // cell) * (h // cell)
    n_in = len(inw)
    sum_c2 = sum(c * c for c in counts.values())
    mean = n_in / float(n_q)
    ss = sum_c2 - mean * n_in
    vmr = (ss / float(n_q - 1)) / mean
    assert (got["n_pts"], got["n_in"], got["n_out"]) == (400, n_in, 400 - n_in)
    assert (got["n_quadrats"], got["n_occupied"], got["sum_c2"]) == (
        n_q, len(counts), sum_c2,
    )
    assert abs(got["mean_c"] - mean) < 1e-12
    assert abs(got["vmr"] - vmr) < 1e-9
    assert abs(got["chi2"] - ss / mean) < 1e-9
    assert abs(
        got["z_score"] - (vmr - 1.0) / m.sqrt(2.0 / (n_q - 1))
    ) < 1e-9


def test_quadrat_test_discriminates_patterns(spark):
    import random

    rnd = random.Random(3)
    w = h = 10000
    # one point per quadrat exactly -> VMR = 0 (maximally dispersed)
    regular = [
        (i, (i % 10) * 1000 + 500, (i // 10) * 1000 + 500) for i in range(100)
    ]
    # all points in one quadrat -> VMR >> 1
    clustered = [(i, rnd.randrange(0, 900), rnd.randrange(0, 900)) for i in range(100)]
    # CSR -> VMR near 1
    csr = [(i, rnd.randrange(0, w), rnd.randrange(0, h)) for i in range(100)]
    v_reg = _qt(spark, regular, 1000, w, h)["vmr"]
    v_clu = _qt(spark, clustered, 1000, w, h)["vmr"]
    v_csr = _qt(spark, csr, 1000, w, h)["vmr"]
    assert v_reg == 0.0
    assert v_clu > 50.0
    assert 0.5 < v_csr < 2.0
    assert _qt(spark, regular, 1000, w, h)["z_score"] < 0
    assert _qt(spark, clustered, 1000, w, h)["z_score"] > 0


def test_quadrat_test_degenerate_and_validation(spark):
    # empty window occupancy: all points outside -> NULL statistics
    got = _qt(spark, [(1, 5000, 5000)], 1000, 2000, 2000)
    assert (got["n_pts"], got["n_in"], got["n_out"]) == (1, 0, 1)
    assert (got["n_occupied"], got["sum_c2"]) == (0, 0)
    assert got["vmr"] is None and got["chi2"] is None and got["z_score"] is None

    from gotrackmaster_spark.operators.spatial import quadrat_test
    import pytest as _pt

    df = spark.createDataFrame([(1, 0, 0)], "event_id long, x long, y long")
    with _pt.raises(ValueError):
        quadrat_test(df, 0, 1000, 1000)     # bad cell
    with _pt.raises(ValueError):
        quadrat_test(df, 300, 1000, 900)    # window not a whole cell count
    with _pt.raises(ValueError):
        quadrat_test(df, 1000, 1000, 1000)  # single quadrat: no variance


def _xk(spark, pts, radii, area):
    from gotrackmaster_spark.operators.spatial import cross_ripley_k

    df = spark.createDataFrame(
        pts, "event_id long, lon double, lat double, is_a boolean"
    )
    rows = cross_ripley_k(df, radii, area).collect()
    return {r["r"]: (r["n_pairs"], r["k_ab"], r["l_ab"]) for r in rows}


def test_cross_k_brute_force(spark):
    import math as m
    import random

    rnd = random.Random(71)
    pts = [
        (i, rnd.uniform(0, 50), rnd.uniform(0, 50), i % 3 == 0)
        for i in range(240)
    ]
    radii, area = [2.0, 4.0, 8.0], 2500.0
    got = _xk(spark, pts, radii, area)
    a = [(x, y) for _, x, y, f in pts if f]
    b = [(x, y) for _, x, y, f in pts if not f]
    for r in radii:
        n_pairs = sum(
            1
            for ax, ay in a
            for bx, by in b
            if (ax - bx) ** 2 + (ay - by) ** 2 <= r * r
        )
        k = area * n_pairs / (len(a) * len(b))
        assert got[r][0] == n_pairs
        assert abs(got[r][1] - k) < 1e-9
        assert abs(got[r][2] - m.sqrt(k / m.pi)) < 1e-9


def test_cross_k_discriminates_attraction_repulsion(spark):
    # attraction: every A point sits 0.1 away from a B point
    att = []
    for i in range(100):
        bx, by = (i % 10) * 10.0 + 3.0, (i // 10) * 10.0 + 3.0
        att.append((2 * i, bx, by, False))
        att.append((2 * i + 1, bx + 0.1, by, True))
    # repulsion: A on one side of the window, B on the other
    rep = [(i, (i % 10) * 1.0, (i // 10) * 1.0, True) for i in range(100)] + [
        (100 + i, 80.0 + (i % 10) * 1.0, 80.0 + (i // 10) * 1.0, False)
        for i in range(100)
    ]
    area = 100.0 * 100.0
    k_att = _xk(spark, att, [1.0], area)[1.0]
    k_rep = _xk(spark, rep, [1.0], area)[1.0]
    import math as m

    csr_k = m.pi * 1.0  # K under independence at r=1
    assert k_att[1] > 10 * csr_k     # strong cross-attraction
    assert k_rep == (0, 0.0, 0.0)    # total separation


def test_cross_k_empty_side_and_symmetry_of_counts(spark):
    # all points are A -> no B side: NULL k/l, zero pairs
    pts = [(i, float(i), 0.0, True) for i in range(5)]
    got = _xk(spark, pts, [1.0, 2.0], 25.0)
    assert got[1.0] == (0, None, None) and got[2.0] == (0, None, None)
    # A->B pair count equals B->A pair count with flags inverted
    import random

    rnd = random.Random(9)
    pts = [
        (i, rnd.uniform(0, 20), rnd.uniform(0, 20), i % 2 == 0)
        for i in range(80)
    ]
    inv = [(i, x, y, not f) for i, x, y, f in pts]
    assert (
        _xk(spark, pts, [3.0], 400.0)[3.0][0]
        == _xk(spark, inv, [3.0], 400.0)[3.0][0]
    )


def _ts(spark, rows):
    from gotrackmaster_spark.operators.spatial import theil_sen_slopes

    df = spark.createDataFrame(rows, "gx long, gy long, t long, cnt long")
    return {
        (r["gx"], r["gy"]): (r["n_pairs"], r["slope"])
        for r in theil_sen_slopes(df).collect()
    }


def _ts_brute(series):
    slopes = sorted(
        (c2 - c1) / (t2 - t1)
        for i, (t1, c1) in enumerate(series)
        for t2, c2 in series[i + 1:]
    )
    n = len(slopes)
    return n, (slopes[(n + 1) // 2 - 1] + slopes[n // 2]) / 2.0


def test_theil_sen_brute_force(spark):
    import random

    rnd = random.Random(37)
    rows, expected = [], {}
    for cell in range(8):
        t_bins = sorted(rnd.sample(range(60), rnd.randrange(2, 14)))
        series = [(t, rnd.randrange(0, 50)) for t in t_bins]
        rows += [(cell, 0, t, c) for t, c in series]
        expected[(cell, 0)] = _ts_brute(series)
    got = _ts(spark, rows)
    assert set(got) == set(expected)
    for cell, (n, med) in expected.items():
        assert got[cell][0] == n
        assert abs(got[cell][1] - med) < 1e-12


def test_theil_sen_robust_to_outliers_and_exact_lines(spark):
    # exact line cnt = 3t + 2 -> slope exactly 3.0
    line = [(0, 0, t, 3 * t + 2) for t in range(10)]
    got = _ts(spark, line)
    assert got[(0, 0)] == (45, 3.0)
    # one wild outlier bin must not move the median slope much
    spiked = line[:-1] + [(0, 0, 9, 1000)]
    n, med = _ts(spark, spiked)[(0, 0)]
    assert n == 45 and abs(med - 3.0) < 1.0
    # a single-bin cell yields no pair -> no output row
    assert (1, 1) not in _ts(spark, line + [(1, 1, 5, 7)])
    # two-bin cell: the lone pairwise slope IS the median
    got = _ts(spark, [(2, 2, 0, 10), (2, 2, 4, 2)])
    assert got[(2, 2)] == (1, -2.0)


def test_octant_sector_agrees_with_atan2(spark):
    """The comparison-only octant must match floor(atan2/45°) for every
    displacement off the ambiguous boundaries, and place boundaries in
    the octant they open (half-open contract)."""
    import math as m

    from pyspark.sql import functions as F
    from gotrackmaster_spark.operators.spatial import octant_sector

    disp = [
        (dx, dy)
        for dx in range(-4, 5)
        for dy in range(-4, 5)
        if (dx, dy) != (0, 0)
    ]
    df = spark.createDataFrame(disp, "dx long, dy long")
    got = {
        (r["dx"], r["dy"]): r["sec"]
        for r in df.select(
            "dx", "dy", octant_sector(F.col("dx"), F.col("dy")).alias("sec")
        ).collect()
    }
    for dx, dy in disp:
        ang = m.degrees(m.atan2(dy, dx)) % 360.0
        assert got[(dx, dy)] == int(ang // 45.0) % 8, (dx, dy, ang)
    # zero displacement -> NULL
    from pyspark.sql import functions as F  # noqa: F811
    z = spark.createDataFrame([(0, 0)], "dx long, dy long")
    assert z.select(octant_sector(F.col("dx"), F.col("dy")).alias("s")).collect()[0]["s"] is None


def test_movement_rose_counts_and_shares(spark):
    from gotrackmaster_spark.operators.spatial import movement_rose

    # one user walking E, E, N, zero, SW-diagonal: legs are consecutive
    # deltas of this path
    path = [(0, 0), (5, 0), (9, 1), (9, 7), (9, 7), (5, 3)]
    rows = [("u1", i, i, x, y) for i, (x, y) in enumerate(path)]
    df = spark.createDataFrame(rows, "user_id string, ts long, event_id long, x long, y long")
    got = {r["label"]: (r["n_legs"], r["sum_d2"], r["share"]) for r in movement_rose(df).collect()}
    # legs: (5,0)->E, (4,1)->E, (0,6)->N, (0,0)->none, (-4,-4)->SW
    assert got["E"] == (2, 25 + 17, 0.4)
    assert got["N"] == (1, 36, 0.2)
    assert got["SW"] == (1, 32, 0.2)
    assert got["none"] == (1, 0, 0.2)
    assert set(got) == {"E", "N", "SW", "none"}
    # shares sum to 1
    assert abs(sum(v[2] for v in got.values()) - 1.0) < 1e-12
    # legs never cross users: two single-point users yield no legs
    df2 = spark.createDataFrame(
        [("a", 0, 0, 0, 0), ("b", 1, 1, 100, 100)],
        "user_id string, ts long, event_id long, x long, y long",
    )
    assert movement_rose(df2).count() == 0


def _grav(spark, flows, quant=10**6):
    from gotrackmaster_spark.operators.spatial import gravity_residuals

    df = spark.createDataFrame(
        flows, "o_gx long, o_gy long, d_gx long, d_gy long, flow long"
    )
    return {
        (r["o_gx"], r["o_gy"], r["d_gx"], r["d_gy"]): r
        for r in gravity_residuals(df, quant).collect()
    }


def test_gravity_residuals_brute_force(spark):
    import math as m
    import random

    rnd = random.Random(53)
    cells = [(x, y) for x in range(4) for y in range(4)]
    flows = []
    for o in cells:
        for d in rnd.sample(cells, 5):
            flows.append((o[0], o[1], d[0], d[1], rnd.randrange(1, 30)))
    # dedup O-D keys (sample can repeat)
    seen = {}
    for f in flows:
        seen[f[:4]] = f
    flows = list(seen.values())
    got = _grav(spark, flows)
    q = 10**6
    o_tot, d_tot = {}, {}
    for ox, oy, dx_, dy_, fl in flows:
        o_tot[(ox, oy)] = o_tot.get((ox, oy), 0) + fl
        d_tot[(dx_, dy_)] = d_tot.get((dx_, dy_), 0) + fl
    t_tot = sum(f[4] for f in flows)
    nums = {
        f[:4]: o_tot[f[:2]] * d_tot[f[2:4]]
        * (q // (1 + (f[0] - f[2]) ** 2 + (f[1] - f[3]) ** 2))
        for f in flows
    }
    den = sum(nums.values())
    assert len(got) == len(flows)
    for f in flows:
        k = f[:4]
        exp = float(t_tot) * nums[k] / den
        g = got[k]
        assert (g["flow"], g["o_tot"], g["d_tot"]) == (f[4], o_tot[f[:2]], d_tot[f[2:4]])
        assert g["w_q"] == q // (1 + (f[0] - f[2]) ** 2 + (f[1] - f[3]) ** 2)
        assert abs(g["expected"] - exp) < 1e-9
        assert abs(g["residual"] - (f[4] - exp)) < 1e-9
        assert abs(g["z_score"] - (f[4] - exp) / m.sqrt(exp)) < 1e-9
    # model conservation: expected sums to T_tot
    assert abs(sum(r["expected"] for r in got.values()) - t_tot) < 1e-6


def test_gravity_residuals_flags_outlier_corridor(spark):
    # symmetric 2-cell world, one corridor carries 10x its mirror
    flows = [
        (0, 0, 1, 0, 100),  # hot corridor
        (1, 0, 0, 0, 10),
        (0, 0, 0, 0, 50),
        (1, 0, 1, 0, 50),
    ]
    got = _grav(spark, flows)
    assert got[(0, 0, 1, 0)]["residual"] > 0 > got[(1, 0, 0, 0)]["residual"]
    assert got[(0, 0, 1, 0)]["z_score"] > 2.0
    # validation + single-flow degenerate: expected == flow exactly
    one = _grav(spark, [(0, 0, 2, 0, 7)])
    assert one[(0, 0, 2, 0)]["expected"] == 7.0 and one[(0, 0, 2, 0)]["residual"] == 0.0
    from gotrackmaster_spark.operators.spatial import gravity_residuals
    import pytest as _pt

    df = spark.createDataFrame([(0, 0, 0, 0, 1)], "o_gx long, o_gy long, d_gx long, d_gy long, flow long")
    with _pt.raises(ValueError):
        gravity_residuals(df, 0)


def test_d8_codes_match():
    """driver_queries._D8 must mirror spatial._D8_DIRS exactly (the SQL
    oracle is generated from the former, the plan from the latter)."""
    from gotrackmaster_spark.driver_queries import _D8
    from gotrackmaster_spark.operators.spatial import _D8_DIRS

    assert _D8 == _D8_DIRS


def _d8(spark, cells):
    from gotrackmaster_spark.operators.spatial import d8_flow_direction

    df = spark.createDataFrame(cells, "x long, y long, ele long")
    return {(r["x"], r["y"]): r for r in d8_flow_direction(df).collect()}


def _d8_brute(cells):
    from gotrackmaster_spark.operators.spatial import _D8_DIRS

    ele = {(x, y): e for x, y, e in cells}
    out = {}
    for (x, y), c in ele.items():
        best_s, best_d = 0, 0
        for code, nx, ny in _D8_DIRS:
            n = ele.get((x + nx, y + ny))
            if n is None or c - n <= 0:
                continue
            s = (2 if nx * ny == 0 else 1) * (c - n) ** 2
            if s > best_s:  # first-wins on ties: strict >
                best_s, best_d = s, code
        out[(x, y)] = (best_d, best_s)
    return out


def test_d8_flow_brute_force(spark):
    import random

    rnd = random.Random(61)
    # dense block with a hole + ragged boundary: exercises missing nbrs
    cells = [
        (x, y, rnd.randrange(0, 1000))
        for x in range(8)
        for y in range(8)
        if (x, y) != (3, 3) and not (x > 5 and y > 5)
    ]
    got = _d8(spark, cells)
    exp = _d8_brute(cells)
    assert set(got) == set(exp)
    for k, (d, s) in exp.items():
        assert (got[k]["flow_dir"], got[k]["best_score"]) == (d, s), k


def test_d8_flow_semantics(spark):
    # a pit is a sink; a peak flows to its steepest drop; straight beats
    # diagonal at equal drop (2x scaling); ties break clockwise from E
    plus = [(1, 1, 100), (2, 1, 90), (1, 2, 90), (0, 1, 90), (1, 0, 90),
            (2, 2, 90), (0, 0, 90), (0, 2, 90), (2, 0, 90)]
    got = _d8(spark, plus)
    # center: all 4 straight neighbors drop 10 (score 200) beating the
    # diagonals (100); E (code 1) wins the 4-way tie
    assert got[(1, 1)]["flow_dir"] == 1 and got[(1, 1)]["best_score"] == 200
    # corner (2,2): equal drops? ele 90; neighbors (1,1)=100 up, (2,1)/(1,2)=90
    # flat -> no descent -> sink
    assert got[(2, 2)]["flow_dir"] == 0 and got[(2, 2)]["best_score"] == 0
    # diagonal-only descent: isolated pair
    pair = [(0, 0, 50), (1, 1, 10)]
    got = _d8(spark, pair)
    assert got[(0, 0)]["flow_dir"] == 128  # NE... (1,1) is code 128
    assert got[(0, 0)]["best_score"] == 40 * 40
    assert got[(1, 1)]["flow_dir"] == 0
    # lone cell: sink
    assert _d8(spark, [(5, 5, 7)])[(5, 5)]["flow_dir"] == 0


def _basins(spark, cells, **kw):
    from gotrackmaster_spark.operators.spatial import d8_basins, d8_flow_direction

    df = spark.createDataFrame(cells, "x long, y long, ele long")
    flow = d8_flow_direction(df).select("x", "y", "flow_dir")
    return {
        (r["sink_x"], r["sink_y"]): r["n_cells"]
        for r in d8_basins(flow, **kw).collect()
    }


def _basins_brute(cells):
    from gotrackmaster_spark.operators.spatial import _D8_DIRS

    flow = {}
    ele = {(x, y): e for x, y, e in cells}
    step = {code: (nx, ny) for code, nx, ny in _D8_DIRS}
    for (x, y), c in ele.items():
        best_s, best_d = 0, 0
        for code, nx, ny in _D8_DIRS:
            n = ele.get((x + nx, y + ny))
            if n is not None and c - n > 0:
                s = (2 if nx * ny == 0 else 1) * (c - n) ** 2
                if s > best_s:
                    best_s, best_d = s, code
        flow[(x, y)] = best_d
    out = {}
    for cell in flow:
        cur = cell
        while flow[cur] != 0:
            nx, ny = step[flow[cur]]
            cur = (cur[0] + nx, cur[1] + ny)
        out[cur] = out.get(cur, 0) + 1
    return out


def test_d8_basins_brute_force(spark):
    import random

    rnd = random.Random(83)
    cells = [
        (x, y, rnd.randrange(0, 500))
        for x in range(10)
        for y in range(10)
        if (x + y) % 17 != 0  # punch some holes
    ]
    got = _basins(spark, cells)
    exp = _basins_brute(cells)
    assert got == exp
    # conservation: basin sizes sum to the cell count
    assert sum(got.values()) == len(cells)


def test_d8_basins_long_chain_and_modes(spark, tmp_path):
    # a strictly descending staircase: one basin rooted at the far end;
    # path length 40 forces several doubling rounds
    chain = [(i, 0, 1000 - i) for i in range(40)]
    got = _basins(spark, chain)
    assert got == {(39, 0): 40}
    # reliable-checkpoint mode must agree
    got_ck = _basins(spark, chain, checkpoint_dir=str(tmp_path / "ck"))
    assert got_ck == {(39, 0): 40}
    # max_iter too small -> raise (default) or warn with partial labels
    import pytest as _pt

    from gotrackmaster_spark.operators.spatial import d8_basins, d8_flow_direction

    df = spark.createDataFrame(chain, "x long, y long, ele long")
    flow = d8_flow_direction(df).select("x", "y", "flow_dir")
    with _pt.raises(ValueError, match="did NOT converge"):
        d8_basins(flow, max_iter=2)
    with _pt.raises(ValueError, match="on_nonconverged"):
        d8_basins(flow, on_nonconverged="explode")
    assert d8_basins(flow, max_iter=2, on_nonconverged="warn").count() >= 1


def test_sinuosity_known_paths(spark):
    """A straight lattice walk has sinuosity exactly 1; a there-and-back
    walk ends near its start (huge index); single-point users yield
    zero legs and a NULL index."""
    from gotrackmaster_spark.driver_queries import q_sinuosity
    import duckdb

    # replay the registered query end-to-end at sf0.001 against duckdb
    import glob, os

    from gotrackmaster_spark.driver_queries import SQL_SINUOSITY

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for p in glob.glob(sf + "/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} "
            f"AS SELECT * FROM read_parquet('{p}')"
        )
    srows = sorted(tuple(r) for r in q_sinuosity(spark, sf).collect())
    orows = sorted(con.execute(SQL_SINUOSITY).fetchall())
    assert srows == orows and len(srows) > 0
    # every index is >= 1 (path length dominates displacement) up to
    # quantization slack on multi-leg users
    for _, n_legs, path_q, straight_q, sin in srows:
        if n_legs > 0 and straight_q and straight_q > 0:
            assert sin >= 1.0 - 1e-3 * n_legs
        if n_legs == 0:
            assert path_q == 0 and sin is None or straight_q == 0


def test_stkde_brute_force_and_validation(spark):
    import random

    from gotrackmaster_spark.operators.spatial import stkde_raster

    rnd = random.Random(101)
    pts = [
        (rnd.randrange(0, 8000), rnd.randrange(0, 8000), rnd.randrange(0, 30))
        for _ in range(300)
    ]
    cell, r, tb, rt = 1000, 2, 2, 1
    qs, qt = (r * cell) ** 2, (rt * tb) ** 2
    df = spark.createDataFrame(pts, "x long, y long, t long")
    got = {
        (rw["cx"], rw["cy"], rw["ct"]): (rw["n_pts"], rw["stkde"])
        for rw in stkde_raster(df, cell, r, tb, rt).collect()
    }
    exp = {}
    cxs = {x // cell + d for x, _, _ in pts for d in range(-r, r + 1)}
    cys = {y // cell + d for _, y, _ in pts for d in range(-r, r + 1)}
    cts = {t // tb + d for _, _, t in pts for d in range(-rt, rt + 1)}
    for cx in cxs:
        for cy in cys:
            for ct in cts:
                n = s = 0
                for x, y, t in pts:
                    ws = qs - ((x - (cx * cell + cell // 2)) ** 2
                               + (y - (cy * cell + cell // 2)) ** 2)
                    wt = qt - (t - (ct * tb + tb // 2)) ** 2
                    if ws > 0 and wt > 0:
                        n += 1
                        s += ws * wt
                if n:
                    exp[(cx, cy, ct)] = (n, s)
    assert got == exp
    # time separation: points a day outside the support do not leak
    iso = spark.createDataFrame(
        [(500, 500, 0), (500, 500, 10)], "x long, y long, t long"
    )
    rows = stkde_raster(iso, cell, r, tb, rt).collect()
    assert all(
        not (r0["ct"] in (0,) and r0["n_pts"] == 2) for r0 in rows
    )  # the two points never land in one time cell

    import pytest as _pt

    with _pt.raises(ValueError):
        stkde_raster(iso, 999, 2, 2, 1)
    with _pt.raises(ValueError):
        stkde_raster(iso, 1000, 2, 3, 1)
    with _pt.raises(ValueError):
        stkde_raster(iso, 1000, 0, 2, 1)


def _flow_lengths(spark, cells, **kw):
    from gotrackmaster_spark.operators.spatial import (
        d8_flow_direction,
        d8_flow_length,
    )

    df = spark.createDataFrame(cells, "x long, y long, ele long")
    flow = d8_flow_direction(df).select("x", "y", "flow_dir")
    return {
        (r.x, r.y): (r.sink_x, r.sink_y, r.flow_len)
        for r in d8_flow_length(flow, **kw).collect()
    }


def _flow_lengths_brute(cells):
    from gotrackmaster_spark.operators.spatial import _D8_DIRS

    ele = {(x, y): e for x, y, e in cells}
    step = {code: (nx, ny) for code, nx, ny in _D8_DIRS}
    flow = {}
    for (x, y), c in ele.items():
        best_s, best_d = 0, 0
        for code, nx, ny in _D8_DIRS:
            n = ele.get((x + nx, y + ny))
            if n is not None and c - n > 0:
                s = (2 if nx * ny == 0 else 1) * (c - n) ** 2
                if s > best_s:
                    best_s, best_d = s, code
        flow[(x, y)] = best_d
    out = {}
    for cell in flow:
        cur, ln = cell, 0
        while flow[cur] != 0:
            nx, ny = step[flow[cur]]
            ln += 10 if nx * ny == 0 else 14
            cur = (cur[0] + nx, cur[1] + ny)
        out[cell] = (cur[0], cur[1], ln)
    return out


def test_d8_flow_length_brute_force(spark):
    import random

    rnd = random.Random(97)
    cells = [
        (x, y, rnd.randrange(0, 500))
        for x in range(10)
        for y in range(10)
        if (x * y) % 13 != 5
    ]
    assert _flow_lengths(spark, cells) == _flow_lengths_brute(cells)


def test_d8_flow_length_chain_and_modes(spark, tmp_path):
    # straight staircase: cell i sits 10·(39−i) from the sink; several
    # doubling rounds needed at length 40
    chain = [(i, 0, 1000 - i) for i in range(40)]
    got = _flow_lengths(spark, chain)
    assert got == {(i, 0): (39, 0, 10 * (39 - i)) for i in range(40)}
    got_ck = _flow_lengths(spark, chain, checkpoint_dir=str(tmp_path / "ck"))
    assert got_ck == got
    # diagonal staircase weighs 14 per step
    diag = [(i, i, 1000 - i) for i in range(10)]
    gd = _flow_lengths(spark, diag)
    assert gd[(0, 0)] == (9, 9, 14 * 9)
    # truncation guard
    import pytest as _pt

    from gotrackmaster_spark.operators.spatial import (
        d8_flow_direction,
        d8_flow_length,
    )

    df = spark.createDataFrame(chain, "x long, y long, ele long")
    flow = d8_flow_direction(df).select("x", "y", "flow_dir")
    with _pt.raises(ValueError, match="did NOT converge"):
        d8_flow_length(flow, max_iter=2)
    with _pt.raises(ValueError, match="on_nonconverged"):
        d8_flow_length(flow, on_nonconverged="explode")


def test_join_counts_median_thr_scale_free(spark):
    """The sf0.1 parity-sweep lesson: a FIXED absolute count threshold
    degenerates when the data grows (every occupied cell goes black and
    WW vanishes).  join_counts_median_thr binarizes STRICTLY ABOVE the
    lower-median count, so both colors stay populated at any scale —
    pin that on a lattice where every cnt clears the old fixed cut, and
    pin the exact lower-median rank convention (value at rank
    (n+1) DIV 2 of counts ascending)."""
    from gotrackmaster_spark.operators.spatial import (
        join_counts,
        join_counts_median_thr,
    )

    # 3×3 lattice, all counts ≥ 100: a fixed thr=5 makes every cell
    # black (n_black = n, ww = 0); the median cut keeps both colors.
    cells = spark.createDataFrame(
        [(x, y, 100 + 10 * (3 * x + y)) for x in range(3) for y in range(3)],
        "gx long, gy long, cnt long",
    )
    withthr = join_counts_median_thr(cells)
    # counts ascending: 100..180; n=9 → rank (9+1) DIV 2 = 5 → med=140
    assert withthr.select("__thr").distinct().collect()[0][0] == 141
    out = join_counts(withthr, __import__("pyspark").sql.functions.col("__thr")).collect()[0]
    assert out.n_cells == 9
    assert out.n_black == 4 and out.n_cells - out.n_black == 5
    assert out.ww > 0 and out.e_ww > 0
    # even-n lattice pins the LOWER median: counts 1,2,3,4 → rank 2 → med=2
    cells4 = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 2), (1, 0, 3), (1, 1, 4)],
        "gx long, gy long, cnt long",
    )
    assert (
        join_counts_median_thr(cells4).select("__thr").distinct().collect()[0][0]
        == 3
    )

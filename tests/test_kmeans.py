"""kmeans_quantized — deterministic fixed-round integer Lloyd.

Pins: a Python replay of the exact integer recursion, planted-cluster
recovery, tie-to-lowest-cid assignment, empty-cluster carry, round-0
seed assignment, and validation errors."""

import pytest

from gotrackmaster_spark.operators.clustering import kmeans_quantized


def _brute(pts, k, n_rounds):
    pts = sorted(pts)
    cents = [(i, x, y) for i, (_, x, y) in enumerate(pts[:k])]

    def assign(x, y):
        best = None
        for cid, cx, cy in cents:
            d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
            key = (d2, cid)
            if best is None or key < best:
                best = key
        return best[1]

    for _ in range(n_rounds):
        acc = {}
        for _, x, y in pts:
            c = assign(x, y)
            sx, sy, n = acc.get(c, (0, 0, 0))
            acc[c] = (sx + x, sy + y, n + 1)
        cents = [
            (cid, acc[cid][0] // acc[cid][2], acc[cid][1] // acc[cid][2])
            if cid in acc
            else (cid, cx, cy)
            for cid, cx, cy in cents
        ]
    final = {}
    for _, x, y in pts:
        c = assign(x, y)
        final[c] = final.get(c, 0) + 1
    return {cid: (final[cid], cx, cy) for cid, cx, cy in cents if cid in final}


def _run(spark, pts, k, n_rounds):
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = kmeans_quantized(df, k=k, n_rounds=n_rounds).collect()
    return {r.cid: (r.n_points, r.cx, r.cy) for r in out}


def test_python_replay(spark):
    pts = [
        (i, (i * 7919) % 1000, (i * i * 61 + i * 13) % 1000) for i in range(120)
    ]
    for rounds in (0, 1, 3):
        assert _run(spark, pts, 5, rounds) == _brute(pts, 5, rounds), rounds


def test_planted_clusters_recovered(spark):
    # two tight blobs far apart; k=2 seeded one in each (ids 0 and 1)
    pts = [(0, 0, 0), (1, 1000, 1000)]
    pts += [(10 + i, i % 5, (i * 3) % 7) for i in range(40)]
    pts += [(100 + i, 1000 + i % 4, 1000 + (i * 5) % 6) for i in range(60)]
    got = _run(spark, pts, 2, 3)
    assert got[0][0] == 41 and got[1][0] == 61
    assert got == _brute(pts, 2, 3)


def test_tie_goes_to_lowest_cid(spark):
    # point equidistant from both seeds after 0 rounds
    pts = [(0, 0, 0), (1, 10, 0), (2, 5, 0)]
    got = _run(spark, pts, 2, 0)
    # cid 0 gets seeds-distance ties: point (5,0) -> cid 0
    assert got[0][0] == 2 and got[1][0] == 1


def test_empty_cluster_keeps_centroid(spark):
    # seed 1 is an outlier that captures nothing after round 1 moves
    # centroid 0 onto the blob; its centroid must not move
    pts = [(0, 0, 0), (1, 500, 500)] + [(10 + i, i % 3, i % 2) for i in range(50)]
    got = _run(spark, pts, 2, 3)
    want = _brute(pts, 2, 3)
    assert got == want


def test_validation(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, x long, y long")
    with pytest.raises(ValueError):
        kmeans_quantized(df, k=0)
    with pytest.raises(ValueError):
        kmeans_quantized(df, n_rounds=-1)


def test_empty_input_typed_empty_result(spark):
    """Zero points => zero seeds => typed empty output, not an analysis
    error from a NULL-typed zero-element array() (K=0 degenerate sweep)."""
    df = spark.createDataFrame([], "id long, x long, y long")
    out = kmeans_quantized(df, k=3)
    assert out.columns == ["cid", "n_points", "cx", "cy"]
    assert out.count() == 0

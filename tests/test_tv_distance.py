"""stratum_tv_pairs — exact total-variation distance between strata.

Pins: identical-distribution zero, scale invariance, near-disjoint
high TV, zero-shared-pair absence (documented contract), symmetry of
the unordered pair, and a Python replay."""

import pytest

from gotrackmaster_spark.operators.search import stratum_tv_pairs


def _run(spark, rows):
    df = spark.createDataFrame(rows, "stratum string, term string")
    out = stratum_tv_pairs(df).collect()
    return {
        (r.stratum_a, r.stratum_b): (r.n_shared, r.tot_a, r.tot_b, r.tv_num, r.tv)
        for r in out
    }


def _brute_tv(rows, a, b):
    from collections import Counter

    ca = Counter(t for s, t in rows if s == a)
    cb = Counter(t for s, t in rows if s == b)
    na, nb = sum(ca.values()), sum(cb.values())
    terms = set(ca) | set(cb)
    return sum(abs(ca[t] / na - cb[t] / nb) for t in terms) / 2


def test_identical_distributions_zero(spark):
    rows = [("a", t) for t in "xxyyz"] + [("b", t) for t in "xxyyz"]
    got = _run(spark, rows)
    assert got[("a", "b")][4] == 0.0


def test_scale_invariance(spark):
    # b has the same distribution at 3x the volume -> TV 0
    rows = [("a", t) for t in "xy"] + [("b", t) for t in "xyxyxy"]
    got = _run(spark, rows)
    assert got[("a", "b")][4] == 0.0


def test_near_disjoint_high(spark):
    rows = [("a", t) for t in ["u", "u", "u", "s"]] + [
        ("b", t) for t in ["v", "v", "v", "s"]
    ]
    got = _run(spark, rows)
    assert got[("a", "b")][4] == pytest.approx(0.75)
    assert got[("a", "b")][0] == 1  # only 's' shared


def test_fully_disjoint_pair_absent(spark):
    # documented contract: no shared term -> no output row
    rows = [("a", "u"), ("b", "v")]
    assert _run(spark, rows) == {}


def test_python_replay(spark):
    rows = []
    vocab = ["t%d" % i for i in range(12)]
    for i in range(300):
        s = "s" + str(i % 3)
        rows.append((s, vocab[(i * i + 7 * i) % 11]))
    got = _run(spark, rows)
    for (a, b), (_, _, _, _, tv) in got.items():
        assert tv == pytest.approx(_brute_tv(rows, a, b), rel=1e-12)
    assert len(got) == 3

"""Time-series operators: as-of join + sessionization semantics, and the
cell-range layout's predicate-pushdown contract."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_as_of_join_semantics(spark):
    """Hand-built frame: <=-semantics (simultaneous right row visible),
    back-fill across gaps, NULL before the first right row, key isolation."""
    from gotrackmaster_spark.operators.timeseries import as_of_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:00")),  # before any right row
            (2, 10, _ts("2024-01-01T01:00:00")),  # == right ts → visible
            (3, 10, _ts("2024-01-01T05:00:00")),  # back-fill from 01:00
            (4, 10, _ts("2024-01-01T07:00:00")),  # after second right row
            (5, 20, _ts("2024-01-01T09:00:00")),  # other key: only its rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T01:00:00"), 1.5),
            (10, _ts("2024-01-01T06:00:00"), 2.5),
            (20, _ts("2024-01-01T02:00:00"), 9.0),
        ],
        "user_id long, ts timestamp, state_value double",
    )
    out = {
        r.event_id: r.state_value
        for r in as_of_join(
            left, right, key="user_id", ts_col="ts", value_cols=["state_value"]
        ).collect()
    }
    assert out == {1: None, 2: 1.5, 3: 1.5, 4: 2.5, 5: 9.0}


def test_sessionize_semantics(spark):
    from gotrackmaster_spark.operators.timeseries import sessionize

    ev = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:00")),
            (2, 10, _ts("2024-01-01T00:30:00")),  # 30 min gap → same session
            (3, 10, _ts("2024-01-01T02:00:01")),  # > 1.5 h gap → new session
            (4, 10, _ts("2024-01-01T03:30:01")),  # exactly the gap → same
            (5, 20, _ts("2024-01-01T00:00:00")),  # other key restarts at 0
        ],
        "event_id long, user_id long, ts timestamp",
    )
    gap_us = int(1.5 * 3600 * 1e6)
    out = {
        r.event_id: r.session_no
        for r in sessionize(
            ev, key="user_id", ts_col="ts", gap_us=gap_us, order_tiebreak="event_id"
        ).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_as_of_join_single_exchange(spark):
    """The union+window formulation must cost exactly one exchange on the
    key — no join operator, no extra shuffle."""
    from gotrackmaster_spark.operators.timeseries import as_of_join

    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    )
    right = spark.range(10).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_micros(F.col("id") * 7_000_000).alias("ts"),
        (F.col("id") * 1.0).alias("state_value"),
    )
    out = as_of_join(left, right, "user_id", "ts", ["state_value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_cell_range_layout_pushes_predicates(spark, tmp_path):
    """A cell-range predicate on a cell-range-partitioned parquet table
    must reach the scan (PushedFilters) so sorted row groups prune; the
    filtered read must also be exact."""
    from gotrackmaster_spark.driver_queries import geo_events
    from gotrackmaster_spark.functions.cells import cell_col
    from gotrackmaster_spark.operators.skew import repartition_by_cell_range

    pts = geo_events(spark, "/root/testdata/sf0.001").select(
        "event_id", "lat", "lon"
    ).withColumn("cell", cell_col(F.col("lat"), F.col("lon"), 12))
    path = str(tmp_path / "cells")
    repartition_by_cell_range(pts, "cell", 8).write.parquet(path)

    back = spark.read.parquet(path)
    lo, hi = (
        back.agg(F.min("cell"), F.max("cell")).first()
    )
    mid = (lo + hi) // 2
    q = back.filter((F.col("cell") >= F.lit(lo)) & (F.col("cell") < F.lit(mid)))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(cell" in plan
    expect = pts.filter((F.col("cell") >= F.lit(lo)) & (F.col("cell") < F.lit(mid))).count()
    assert q.count() == expect and expect > 0


def test_interval_join_matches_brute_force(spark):
    """Bucketed interval join must equal the brute-force inequality join
    for every bucket size, including intervals spanning many buckets and
    events exactly at t0 (included) / t1 (excluded); no CartesianProduct
    in the plan."""
    import numpy as np
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.timeseries import interval_join

    rng = np.random.default_rng(11)
    ev_rows = [(int(i), int(rng.integers(0, 10_000_000))) for i in range(400)]
    iv_rows = []
    for j in range(20):
        t0 = int(rng.integers(0, 9_000_000))
        iv_rows.append((j, t0, t0 + int(rng.integers(1, 2_000_000))))
    # edge pins: one event exactly at an interval's t0 and one at a t1
    ev_rows.append((400, iv_rows[0][1]))
    ev_rows.append((401, iv_rows[1][2]))
    ev = spark.createDataFrame(ev_rows, "event_id long, ts_us long")
    iv = spark.createDataFrame(iv_rows, "iv_id long, t0_us long, t1_us long")

    expect = sorted(
        (e, i)
        for e, t in ev_rows
        for i, t0, t1 in iv_rows
        if t0 <= t < t1
    )
    for bucket_s in (1, 3):  # 1 s and 3 s buckets (ts in µs)
        out = interval_join(ev, iv, bucket_s)
        got = sorted((r.event_id, r.iv_id) for r in out.collect())
        assert got == expect, bucket_s
    plan = interval_join(ev, iv, 1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_interval_join_inverted_interval(spark):
    """Inverted intervals (t1 <= t0) match nothing AND must not fan out:
    the sequence stop is clamped, so one bad interval costs one bucket
    row instead of |t0-t1|/bucket descending rows."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.timeseries import interval_join

    ev = spark.createDataFrame([(0, 5_000_000), (1, 500)], "event_id long, ts_us long")
    iv = spark.createDataFrame(
        [(0, 10_000_000_000, 0), (1, 4_000_000, 6_000_000)],
        "iv_id long, t0_us long, t1_us long",
    )
    out = interval_join(ev, iv, 1, max_fanout=100)  # fanout guard tight:
    # the inverted 10^4-bucket-wide interval must count as ONE bucket
    got = sorted((r.event_id, r.iv_id) for r in out.collect())
    assert got == [(0, 1)]


def test_interval_join_fanout_guard_and_auto_bucket(spark):
    """One year-long interval at 1 s buckets explodes to 31.5M rows from a
    single input row — the guard must refuse; bucket_s=None (auto median)
    and an explicit big bucket must both succeed and agree with brute
    force."""
    import pytest

    from gotrackmaster_spark.operators.timeseries import interval_join

    year_us = 365 * 86_400 * 1_000_000
    ev_rows = [(i, i * year_us // 40) for i in range(40)]
    iv_rows = [(0, 0, year_us), (1, year_us // 2, year_us // 2 + 7 * 86_400 * 1_000_000)]
    ev = spark.createDataFrame(ev_rows, "event_id long, ts_us long")
    iv = spark.createDataFrame(iv_rows, "iv_id long, t0_us long, t1_us long")
    expect = sorted(
        (e, i) for e, t in ev_rows for i, t0, t1 in iv_rows if t0 <= t < t1
    )

    with pytest.raises(ValueError, match="fan-out guard"):
        interval_join(ev, iv, 1)  # default max_fanout=100k

    for kwargs in ({"bucket_s": None}, {"bucket_s": 86_400 * 30}, {"bucket_s": 1, "max_fanout": None}):
        out = interval_join(ev, iv, **kwargs)
        got = sorted((r.event_id, r.iv_id) for r in out.collect())
        assert got == expect, kwargs


def test_interval_join_fanout_guard_integer_exact(spark):
    """The guard must use the SAME integer DIV arithmetic as the explode:
    t0=999_999, t1=100_000_000_001 at 1 s buckets explodes to exactly
    100_001 bucket rows (floor((t1-1)/b) - floor(t0/b) + 1), but a float
    length ratio sees only ~99_999.0 and lets it slip past
    max_fanout=100_000."""
    import pytest

    from gotrackmaster_spark.operators.timeseries import interval_join

    ev = spark.createDataFrame([(0, 1_000_000)], "event_id long, ts_us long")
    iv = spark.createDataFrame(
        [(0, 999_999, 100_000_000_001)], "iv_id long, t0_us long, t1_us long"
    )
    with pytest.raises(ValueError, match="100001 buckets"):
        interval_join(ev, iv, 1, max_fanout=100_000)


def test_interval_join_lazy_without_guards(spark):
    """With an explicit bucket, max_fanout=None and no broadcast, plan
    construction must run NO Spark action (streaming-safe)."""
    from gotrackmaster_spark.operators.timeseries import interval_join

    calls = []
    ev = spark.createDataFrame([(0, 5_000_000)], "event_id long, ts_us long")
    iv = spark.createDataFrame(
        [(0, 4_000_000, 6_000_000)], "iv_id long, t0_us long, t1_us long"
    )
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    out = interval_join(
        ev, iv, 1, max_fanout=None, broadcast_intervals=False
    )
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "plan construction triggered a Spark job"
    assert [(r.event_id, r.iv_id) for r in out.collect()] == [(0, 0)]
    calls.append(out)


def test_resample_grid_linear_interp_and_halfopen(spark):
    from gotrackmaster_spark.operators.timeseries import resample_time_grid

    # fixes at t=5 and t=25 (period 10): ticks 10 and 20 interpolate;
    # tick at t1 itself (30) excluded (half-open legs)
    import datetime as dt

    def ts(us):
        return dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(tzinfo=None)

    rows = [
        ("u", 1, ts(5_000_000), 0.0, 100.0),
        ("u", 2, ts(25_000_000), 10.0, 120.0),
        ("u", 3, ts(30_000_000), 20.0, 140.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp, lat double, lon double"
    )
    out = {
        r.k: (r.g_lat, r.g_lon)
        for r in resample_time_grid(df, 10_000_000, tiebreak_col="event_id").collect()
    }
    # leg 5->25: k=1 (t=10, frac .25), k=2 (t=20, frac .75); leg 25->30: k=3 (t=30)? NO —
    # ticks in [25, 30): ceil(25/10)=3 -> k1 = ceil(30/10)-1 = 2 < 3 -> empty
    assert set(out) == {1, 2}
    assert out[1] == (2.5, 105.0)
    assert out[2] == (7.5, 115.0)


def test_resample_grid_drops_inverted_and_duplicate_ts(spark):
    from gotrackmaster_spark.operators.timeseries import resample_time_grid

    import datetime as dt

    def ts(us):
        return dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(tzinfo=None)

    # duplicate timestamp pair and an out-of-order fix: with the
    # event_id tiebreak the order is e1@50, e2@50, e3@5 sorted to
    # (5, 50, 50) -> legs (5,50) valid, (50,50) dropped; nothing explodes
    # backwards (the sequence-inversion hazard)
    rows = [
        ("u", 1, ts(50_000_000), 1.0, 1.0),
        ("u", 2, ts(50_000_000), 2.0, 2.0),
        ("u", 3, ts(5_000_000), 0.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp, lat double, lon double"
    )
    out = resample_time_grid(df, 10_000_000, tiebreak_col="event_id").collect()
    ks = sorted(r.k for r in out)
    assert ks == [1, 2, 3, 4]  # ticks 10..40 inside [5, 50); the (50,50) leg is dropped
    assert all(0.0 <= r.g_lat <= 1.0 for r in out)


def test_resample_grid_fanout_guard(spark):
    import pytest

    from gotrackmaster_spark.operators.timeseries import resample_time_grid

    import datetime as dt

    def ts(us):
        return dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(tzinfo=None)

    rows = [
        ("u", 1, ts(0), 0.0, 0.0),
        ("u", 2, ts(1_000_000_000), 1.0, 1.0),  # 1000 s gap, 1 s grid
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp, lat double, lon double"
    )
    # the guard is folded into the explode plan (raise_error), so it
    # fires at EXECUTION time as a Spark runtime error — zero extra
    # passes over the points-scale window
    out = resample_time_grid(df, 1_000_000, max_fanout=100, tiebreak_col="event_id")
    with pytest.raises(Exception, match="fan-out guard"):
        out.count()
    # under the threshold the same plan executes clean
    ok = resample_time_grid(df, 1_000_000, max_fanout=2000, tiebreak_col="event_id")
    assert ok.count() == 1000

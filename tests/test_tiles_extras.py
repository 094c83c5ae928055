"""Geohash golden values, tile-pyramid rollup exactness, the big-big PIP
join variant, and session-window batch parity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_geohash_known_values(spark):
    """Pin against published geohash examples (geohash.org / Wikipedia)."""
    from gotrackmaster_spark.functions.tiles import geohash_col, geohash_sql

    cases = [
        (57.64911, 10.40744, 6, "u4pruy"),
        (42.605, -5.603, 5, "ezs42"),
        (39.92324, 116.3906, 9, "wx4g0ec19"),
        (-33.86, 151.21, 6, "r3gx2g"),
    ]
    df = spark.createDataFrame(
        [(i, la, lo, p, want) for i, (la, lo, p, want) in enumerate(cases)],
        "i int, lat double, lon double, p int, want string",
    )
    for i, (la, lo, p, want) in enumerate(cases):
        got = (
            df.where(F.col("i") == i)
            .select(geohash_col(F.col("lat"), F.col("lon"), p).alias("gh"))
            .first()
            .gh
        )
        assert got == want, (la, lo, p, got, want)

    import duckdb

    con = duckdb.connect()
    for la, lo, p, want in cases:
        got = con.execute(f"SELECT {geohash_sql(str(la), str(lo), p)}").fetchone()[0]
        assert got == want, (la, lo, p, got, want)


def test_tile_pyramid_levels_consistent(spark):
    """Every pyramid level must re-aggregate to the same total, and each
    parent must equal the sum of its (up to 4) children."""
    from gotrackmaster_spark.driver_queries import q_tile_pyramid

    pyr = q_tile_pyramid(spark, "/root/testdata/sf0.001").cache()
    totals = {
        r.z: r.total
        for r in pyr.groupBy("z").agg(F.sum("n").alias("total")).collect()
    }
    assert len(set(totals.values())) == 1, totals
    children = (
        pyr.where(F.col("z") == 8)
        .groupBy(
            F.shiftright(F.col("tx"), 1).alias("tx"),
            F.shiftright(F.col("ty"), 1).alias("ty"),
        )
        .agg(F.sum("n").alias("n_child"))
    )
    parents = pyr.where(F.col("z") == 7).select("tx", "ty", "n")
    mism = parents.join(children, ["tx", "ty"], "full").where(
        (F.col("n") != F.col("n_child"))
        | F.col("n").isNull()
        | F.col("n_child").isNull()
    )
    assert mism.count() == 0
    pyr.unpersist()


def test_pip_join_shuffle_variant_equivalent(spark):
    """broadcast_covering=False (big-big path) must produce identical
    pairs with a shuffle join instead of a broadcast."""
    from gotrackmaster_spark.driver_queries import geo_events, rect_polygons
    from gotrackmaster_spark.operators.spatial import point_in_polygon_join

    pts = geo_events(spark, "/root/testdata/sf0.001").select(
        "event_id", "lat", "lon"
    )
    polys = rect_polygons(spark, "/root/testdata/sf0.001")
    a = point_in_polygon_join(pts, polys, level=7)
    b = point_in_polygon_join(pts, polys, level=7, broadcast_covering=False)
    pa = {(r.event_id, r.poly_id) for r in a.collect()}
    pb = {(r.event_id, r.poly_id) for r in b.collect()}
    assert pa == pb and len(pa) > 0

    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_session_window_matches_batch_sessionize(spark):
    """Native session_window aggregates == batch lag-split sessions on the
    real events table (per-session event counts and membership)."""
    from gotrackmaster_spark.operators.timeseries import sessionize
    from gotrackmaster_spark.streaming.sessions import session_aggregates

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id", "ts", "value"
    )
    gap_us = 6 * 3600 * 1_000_000
    batch = (
        sessionize(ev, "user_id", "ts", gap_us, order_tiebreak="event_id")
        .groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
        )
    )
    stream_style = session_aggregates(ev, gap="6 hours")
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in stream_style.collect()
    }
    want = {
        (r.user_id, r.session_start, r.n_events) for r in batch.collect()
    }
    assert got == want and len(got) > 0

"""Structured Streaming tile maintenance: streamed result must equal the
batch computation of the same input (exactly-once semantics over a file
source with availableNow)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_tile_counts_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from gotrackmaster_spark.streaming.tiles import (
        geotag_stream,
        incremental_tile_counts,
    )

    batch_src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # file-source stream over a copy of the events table (two files to
    # exercise multiple micro-batches)
    src_dir = str(tmp_path / "in")
    batch_src.filter(F.col("event_id") % 2 == 0).write.parquet(src_dir)
    batch_src.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(batch_src.schema).option(
        "maxFilesPerTrigger", "2"
    ).parquet(src_dir)
    agg = incremental_tile_counts(stream, "6 hours", "1 hour")

    q = (
        agg.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.tile): (r.n_points, r.n_cells)
        for r in spark.sql("SELECT * FROM tile_counts").collect()
    }

    want_df = (
        geotag_stream(spark.read.parquet(src_dir))
        .groupBy(F.window("ts", "6 hours").alias("w"), "tile")
        .agg(
            F.count("*").alias("n_points"),
            F.approx_count_distinct("cell5").alias("n_cells"),
        )
        .select(F.col("w.start").alias("ws"), "tile", "n_points", "n_cells")
    )
    want = {(r.ws, r.tile): (r.n_points, r.n_cells) for r in want_df.collect()}
    assert got == want
    assert len(got) > 100


def test_streaming_track_bounds_matches_batch(spark, tmp_path):
    """applyInPandasWithState per-track state: the LAST update-mode row per
    track (the one carrying the full point count) must equal the batch
    bounds aggregation; multiple micro-batches exercise state carry-over."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.streaming.track_state import streaming_track_bounds

    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pts = (
        base.withColumn("lat", (F.col("event_id") * F.lit(2654435761)) % 1600000 / 10000.0 - 80.0)
        .withColumn("lon", (F.col("event_id") * F.lit(40503) + 7) % 3600000 / 10000.0 - 180.0)
        .withColumn("ts_ns", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .select("user_id", "lat", "lon", "ts_ns")
    )
    src_dir = str(tmp_path / "in")
    pts.filter(F.col("ts_ns") % 3 == 0).write.parquet(src_dir)
    pts.filter(F.col("ts_ns") % 3 != 0).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(pts.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src_dir)
    out = streaming_track_bounds(stream)
    q = (
        out.writeStream.format("memory").queryName("track_state")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM track_state").collect()
    assert rows
    # keep the most complete update per track (monotone n_points)
    last = {}
    for r in rows:
        if r.user_id not in last or r.n_points > last[r.user_id].n_points:
            last[r.user_id] = r

    want = {
        r.user_id: r
        for r in pts.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.min("lat").alias("mla"), F.max("lat").alias("xla"),
            F.min("lon").alias("mlo"), F.max("lon").alias("xlo"),
            F.min("ts_ns").alias("mts"), F.max("ts_ns").alias("xts"),
        ).collect()
    }
    assert set(last) == set(want)
    for uid, w in want.items():
        g = last[uid]
        assert (g.n_points, g.min_lat, g.max_lat, g.min_lon, g.max_lon,
                g.min_ts_ns, g.max_ts_ns) == (w.n, w.mla, w.xla, w.mlo,
                                              w.xlo, w.mts, w.xts), uid


def test_streaming_sessions_matches_batch(spark, tmp_path):
    """session_window over a file-source stream (complete mode,
    availableNow, multiple micro-batches) must equal the same aggregation
    run in batch on the full input."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.streaming.sessions import session_aggregates

    base = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_id", "ts", "value"
    )
    src_dir = str(tmp_path / "in")
    base.filter(F.col("event_id") % 2 == 0).write.parquet(src_dir)
    base.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src_dir)
    )
    agg = session_aggregates(stream, gap="6 hours", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_aggregates(
            spark.read.parquet(src_dir).select(*base.columns), gap="6 hours"
        ).collect()
    }
    assert got == want
    assert len(got) > 100


def test_streaming_ingest_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a file stream: duplicates planted
    WITHIN the watermark horizon (including across micro-batches) are
    dropped; the surviving set equals the batch distinct-by-key result."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.streaming.dedup import content_key, dedup_stream

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 600))
        .select("doc_id", "text", "ts")
    )
    src_dir = str(tmp_path / "in")
    # batch 1: all docs; batch 2: a re-crawl of every 3rd doc under a NEW
    # doc_id (same text, same event-time window) -> content duplicates
    docs.write.parquet(src_dir)
    recrawl = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    recrawl.write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src_dir)
        .withColumn("ckey", content_key("text"))
    )
    out = dedup_stream(stream, ["ckey"], ts_col="ts", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("deduped_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM deduped_docs")
    n_in = spark.read.parquet(src_dir).count()
    n_got = got.count()
    n_distinct = (
        spark.read.parquet(src_dir).select(F.xxhash64("text").alias("k")).distinct().count()
    )
    assert n_got == n_distinct < n_in
    # one surviving row per content key
    assert got.groupBy("ckey").count().filter("count > 1").count() == 0


def test_streaming_geofence_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from gotrackmaster_spark import driver_queries as Q
    from gotrackmaster_spark.streaming.tiles import geofence_alerts, geotag_stream

    batch_src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src_dir = str(tmp_path / "gf_in")
    batch_src.filter(F.col("event_id") % 2 == 0).write.parquet(src_dir)
    batch_src.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src_dir)

    polys = Q.rect_polygons(spark, SF_DIR)
    stream = spark.readStream.schema(batch_src.schema).option(
        "maxFilesPerTrigger", "2"
    ).parquet(src_dir)
    agg = geofence_alerts(stream, polys, level=7, window_duration="6 hours")

    q = (
        agg.writeStream.format("memory")
        .queryName("geofence")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.poly_id): (r.n_hits, r.n_cells)
        for r in spark.sql("SELECT * FROM geofence").collect()
    }

    from gotrackmaster_spark.operators.spatial import point_in_polygon_join

    tagged = geotag_stream(spark.read.parquet(src_dir)).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    hits = point_in_polygon_join(
        tagged.select("event_id", "ts", "lat", "lon", "cell5"), polys, level=7
    )
    want_df = (
        hits.groupBy(F.window("ts", "6 hours").alias("w"), "poly_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.approx_count_distinct("cell5").alias("n_cells"),
        )
        .select(F.col("w.start").alias("ws"), "poly_id", "n_hits", "n_cells")
    )
    want = {(r.ws, r.poly_id): (r.n_hits, r.n_cells) for r in want_df.collect()}
    assert got == want
    assert len(got) >= 10  # hits are sparse at sf0.001 (25 rects)

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

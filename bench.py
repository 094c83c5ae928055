#!/usr/bin/env python
"""Benchmark harness: headline spatial-join + tile-assignment queries.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "rows": ..., "rows_per_sec": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect).  ``python bench.py --scaling`` additionally runs the
flagship job at local[8] and local[32] in separate JVMs and reports the
N→4N scaling efficiency (north_rule evidence; see BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _flagship(spark, sf_dir):
    """The BASELINE.md headline: geotag → degree tiles + cells → PIP join →
    per-(polygon, tile) aggregate over the full events table."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark import driver_queries as Q
    from gotrackmaster_spark.functions.cells import cell_col
    from gotrackmaster_spark.functions.tiles import tile_name_col
    from gotrackmaster_spark.operators.spatial import point_in_polygon_join

    pts = Q.geo_events(spark, sf_dir).select("event_id", "user_id", "lat", "lon")
    polys = Q.rect_polygons(spark, sf_dir)
    hits = point_in_polygon_join(pts, polys, level=7)
    return (
        hits.withColumn("tile", tile_name_col(F.col("lat"), F.col("lon"), 1.0))
        .withColumn("cell5", F.shiftright(cell_col(F.col("lat"), F.col("lon"), 12), 14))
        .groupBy("poly_id", "tile")
        .agg(F.count("*").alias("n_points"), F.countDistinct("cell5").alias("n_cells"))
    )


def bench_queries():
    from gotrackmaster_spark import driver_queries as Q

    return {
        "flagship_spatial": _flagship,
        "leg_haversine_sum": Q.q_leg_haversine_sum,
        "tile_counts": Q.q_tile_counts,
        "cell_parent_counts": Q.q_cell_parent_counts,
        "speed_defect_counts": Q.q_speed_defect_counts,
        "knn": Q.q_knn,
        "duplicate_pairs": Q.q_duplicate_pairs,
        "dem_bands": Q.q_dem_bands,
        "mercator_tiles": Q.q_mercator_tiles,
    }


def _run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from gotrackmaster_spark.session import get_session

    spark = get_session("gotrackmaster-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    rows = spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    # JVM/Arrow warm-up on a trivial pass
    _run_once(spark, lambda s, d: s.read.parquet(f"{d}/events.parquet"), SF_DIR)

    timings: dict[str, float] = {}
    for name, fn in bench_queries().items():
        timings[name] = round(_run_once(spark, fn, SF_DIR), 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "spatial_join_tile_assignment_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "rows": rows,
        "rows_per_sec": round(rows / timings["flagship_spatial"], 1),
        "cpus": int(CPUS),
    }
    print(json.dumps(out))
    spark.stop()


def scaling() -> None:
    """Run the flagship at two parallelism levels in fresh JVMs (the
    sandbox proxy for N vs 4N executors) and report efficiency."""
    import subprocess

    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, BENCH_ONLY_FLAGSHIP="1")
        p = subprocess.run(
            [sys.executable, __file__, "--flagship-only"],
            capture_output=True, text=True, env=env,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8 = results["8"]["value"]
    t32 = results["32"]["value"]
    eff = (results["32"]["rows_per_sec"]) / (4 * results["8"]["rows_per_sec"])
    print(json.dumps({
        "metric": "scaling_efficiency_local8_vs_local32",
        "t_local8_sec": t8, "t_local32_sec": t32,
        "rows_per_sec_local8": results["8"]["rows_per_sec"],
        "rows_per_sec_local32": results["32"]["rows_per_sec"],
        "efficiency": round(eff, 3),
    }))


def flagship_only() -> None:
    from gotrackmaster_spark.session import get_session

    spark = get_session("gotrackmaster-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    _run_once(spark, _flagship, SF_DIR)  # warm-up
    best = min(_run_once(spark, _flagship, SF_DIR) for _ in range(3))
    print(json.dumps({
        "metric": "flagship_spatial", "value": round(best, 3), "unit": "sec",
        "rows": rows, "rows_per_sec": round(rows / best, 1), "cpus": int(CPUS),
    }))
    spark.stop()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--flagship-only" in sys.argv:
        flagship_only()
    else:
        main()

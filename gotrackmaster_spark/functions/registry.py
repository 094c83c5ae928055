"""§2.11 — SQL-callable function surface.

The reference exposes plain Go functions; the engine's equivalent public
surface is (a) the DataFrame operators under ``operators/`` and (b) this
registry, which makes the scalar geodesy/tiling functions callable from
``spark.sql`` strings so SQL users (and the driver's oracle mindset) can
write e.g.::

    SELECT gts_haversine(lat1, lon1, lat2, lon2) FROM pairs
    SELECT gts_tile1(lat, lon), gts_cell(lat, lon, 12) FROM points

All are registered as **SQL expression macros over built-ins** (not Python
UDFs): they inline the same Column expressions the operators use, so the
hot path stays inside whole-stage codegen — `EXPLAIN` shows no
BatchEvalPython.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_sql_functions(spark: SparkSession) -> None:
    """Register the scalar surface as SQL temp functions (pure SQL macros —
    JVM-side, codegen-friendly)."""
    from gotrackmaster_spark.functions.cells import cell_sql_spark
    from gotrackmaster_spark.functions.geodesy import (
        distance_2d_sql,
        haversine_sql,
    )
    from gotrackmaster_spark.functions.tiles import tile_name_sql

    # the *_sql builders emit portable ANSI SQL (printf → format_string is
    # the one DuckDB-ism to swap)
    hav = haversine_sql("lat1", "lon1", "lat2", "lon2")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION gts_haversine(lat1 DOUBLE, lon1 DOUBLE, "
        f"lat2 DOUBLE, lon2 DOUBLE) RETURNS DOUBLE RETURN {hav}"
    )
    d2 = distance_2d_sql("lat1", "lon1", "lat2", "lon2")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION gts_distance2d(lat1 DOUBLE, lon1 DOUBLE, "
        f"lat2 DOUBLE, lon2 DOUBLE) RETURNS DOUBLE RETURN {d2}"
    )
    tile1 = tile_name_sql("lat", "lon", 1.0).replace("printf", "format_string")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION gts_tile1(lat DOUBLE, lon DOUBLE) "
        f"RETURNS STRING RETURN {tile1}"
    )
    tile05 = tile_name_sql("lat", "lon", 0.5).replace("printf", "format_string")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION gts_tile05(lat DOUBLE, lon DOUBLE) "
        f"RETURNS STRING RETURN {tile05}"
    )
    cell12 = cell_sql_spark("lat", "lon", 12)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION gts_cell12(lat DOUBLE, lon DOUBLE) "
        f"RETURNS BIGINT RETURN {cell12}"
    )

"""Driver-facing queries + DuckDB oracles (the correctness gate).

Every operator from SURVEY.md §2 that is SQL-expressible appears here twice
with IDENTICAL semantics: a Spark DataFrame builder (the engine path — cell
joins, broadcast coverings, pandas-UDF refinement) and an ANSI-SQL string
the driver runs through DuckDB on the same parquet tables.

Determinism rules used throughout (so value-hashes match bit-for-bit or to
a rounding guard):

* Geo columns are SYNTHESIZED from integer keys with exact int64 modular
  arithmetic followed by one exact float division — both engines produce
  identical float64 bits.
* Float aggregates are rounded (the two engines may sum in different
  orders; libm sin/cos can differ in the last ULP) — rounding granularity
  chosen so the residual error is ~10 orders of magnitude below the step.
* Rankings order by (rounded metric, id) in BOTH engines, so last-ULP
  metric differences cannot reorder rows.

The geotag layout mirrors the graft contract (BASELINE.json input_hint):
``events`` plays the geotagged fact table; each event is a "track point"
with ``user_id`` as the track key, exactly how the images table carries
(lat, lon, ele, ts, track_id, pt_idx).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gotrackmaster_spark.caching import make_bounded_cache
from gotrackmaster_spark.functions.cells import cell_col, cell_sql
from gotrackmaster_spark.functions.geodesy import (
    bearing_col,
    bearing_sql,
    distance_2d_col,
    distance_2d_sql,
    haversine_col,
    haversine_sql,
)
from gotrackmaster_spark.functions.tiles import (
    lat_tile_col,
    lat_tile_sql,
    lon_tile_col,
    lon_tile_sql,
    mercator_tile_cols,
    mercator_tile_sql,
    tile_name_col,
    tile_name_sql,
)

# --------------------------------------------------------------------------
# Synthesized geotags over `events` (exact integer → float arithmetic).
# --------------------------------------------------------------------------

GO_ZERO_US = -62135596800 * 1_000_000  # Go zero time.Time in epoch µs

_LAT = "((event_id * 2654435761) % 1600000) / 10000.0 - 80.0"
_LON = "((event_id * 40503 + 7) % 3600000) / 10000.0 - 180.0"
_ELE = "CAST(((event_id * 97) % 3000) - 50 AS DOUBLE)"

GEO_CTE = f"""
geo AS (
  SELECT event_id, user_id, ts, event_type, value,
         {_LAT} AS lat,
         {_LON} AS lon,
         {_ELE} AS ele
  FROM events
)
"""


def geo_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The geotagged points table (Spark mirror of GEO_CTE)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.withColumn("lat", (F.col("event_id") * F.lit(2654435761)) % 1600000 / 10000.0 - 80.0)
        .withColumn("lon", (F.col("event_id") * F.lit(40503) + 7) % 3600000 / 10000.0 - 180.0)
        .withColumn("ele", ((F.col("event_id") * 97) % 3000 - 50).cast("double"))
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# W3 — per-track leg Haversine sum (window lag + agg)
# --------------------------------------------------------------------------

def q_leg_haversine_sum(spark, sf_dir):
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = pts.select(
        "user_id",
        haversine_col(
            F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
        ).alias("leg_m"),
    )
    return legs.groupBy("user_id").agg(
        F.round(F.sum("leg_m"), 1).alias("total_m"),
        F.count("leg_m").alias("n_legs"),
    )


SQL_LEG_HAVERSINE_SUM = f"""
WITH {GEO_CTE},
legs AS (
  SELECT user_id,
         {haversine_sql('lag(lat) OVER w', 'lag(lon) OVER w', 'lat', 'lon')} AS leg_m
  FROM geo
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, round(sum(leg_m), 1) AS total_m, count(leg_m) AS n_legs
FROM legs GROUP BY user_id
"""


# --------------------------------------------------------------------------
# T1 — degree-grid tile assignment counts (1° and 0.5°)
# --------------------------------------------------------------------------

def q_tile_counts(spark, sf_dir):
    pts = geo_events(spark, sf_dir)
    return (
        pts.select(
            tile_name_col(F.col("lat"), F.col("lon"), 1.0).alias("tile1"),
            tile_name_col(F.col("lat"), F.col("lon"), 0.5).alias("tile05"),
        )
        .groupBy("tile1", "tile05")
        .agg(F.count("*").alias("n"))
    )


SQL_TILE_COUNTS = f"""
WITH {GEO_CTE}
SELECT {tile_name_sql('lat', 'lon', 1.0)} AS tile1,
       {tile_name_sql('lat', 'lon', 0.5)} AS tile05,
       count(*) AS n
FROM geo GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# A1 + T2 — per-track bbox and corner tiles (ordered dedup as 4 columns)
# --------------------------------------------------------------------------

def q_bounds_tiles(spark, sf_dir):
    pts = geo_events(spark, sf_dir)
    b = pts.groupBy("user_id").agg(
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
        F.min("lon").alias("min_lon"),
        F.max("lon").alias("max_lon"),
    )
    lat1 = lat_tile_col(F.col("min_lat"), 1.0)
    lon1 = lon_tile_col(F.col("min_lon"), 1.0)
    lat2 = lat_tile_col(F.col("max_lat"), 1.0)
    lon2 = lon_tile_col(F.col("max_lon"), 1.0)
    return b.select(
        "user_id", "min_lat", "max_lat", "min_lon", "max_lon",
        F.concat(lat1, lon1).alias("tile_a"),
        F.when(lon1 != lon2, F.concat(lat1, lon2)).alias("tile_b"),
        F.when(lat1 != lat2, F.concat(lat2, lon1)).alias("tile_c"),
        F.when((lat1 != lat2) & (lon1 != lon2), F.concat(lat2, lon2)).alias("tile_d"),
    )


def _sql_bounds_tiles() -> str:
    lat1 = lat_tile_sql("min_lat", 1.0)
    lon1 = lon_tile_sql("min_lon", 1.0)
    lat2 = lat_tile_sql("max_lat", 1.0)
    lon2 = lon_tile_sql("max_lon", 1.0)
    return f"""
WITH {GEO_CTE},
b AS (
  SELECT user_id, min(lat) AS min_lat, max(lat) AS max_lat,
         min(lon) AS min_lon, max(lon) AS max_lon
  FROM geo GROUP BY user_id
)
SELECT user_id, min_lat, max_lat, min_lon, max_lon,
  {lat1} || {lon1} AS tile_a,
  CASE WHEN {lon1} <> {lon2} THEN {lat1} || {lon2} END AS tile_b,
  CASE WHEN {lat1} <> {lat2} THEN {lat2} || {lon1} END AS tile_c,
  CASE WHEN {lat1} <> {lat2} AND {lon1} <> {lon2} THEN {lat2} || {lon2} END AS tile_d
FROM b
"""


SQL_BOUNDS_TILES = _sql_bounds_tiles()


# --------------------------------------------------------------------------
# E1 — hierarchical cell index: level-12 cells rolled up to level-5 parents
# --------------------------------------------------------------------------

def q_cell_parent_counts(spark, sf_dir):
    pts = geo_events(spark, sf_dir)
    return (
        pts.select(cell_col(F.col("lat"), F.col("lon"), 12).alias("cell12"))
        .select(F.shiftright(F.col("cell12"), 2 * (12 - 5)).alias("cell5"))
        .groupBy("cell5")
        .agg(F.count("*").alias("n"))
    )


SQL_CELL_PARENT_COUNTS = f"""
WITH {GEO_CTE}
SELECT ({cell_sql('lat', 'lon', 12)} >> {2 * (12 - 5)}) AS cell5, count(*) AS n
FROM geo GROUP BY 1
"""


# --------------------------------------------------------------------------
# W2/W4 — hybrid 2D distance + speed defect counts per track
# --------------------------------------------------------------------------

_SPEED_MAX = 1000.0  # m/s threshold over synthetic (teleporting) points


def q_speed_defect_counts(spark, sf_dir):
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = distance_2d_col(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    )
    dt = (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))) / 1e6
    pairs = pts.select(
        "user_id",
        F.when(dt == 0, 0.0).otherwise(d / dt).alias("speed"),
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.when(F.col("speed") > _SPEED_MAX, 1)).alias("n_defects"),
        F.count(F.col("speed")).alias("n_pairs"),
    )


SQL_SPEED_DEFECT_COUNTS = f"""
WITH {GEO_CTE},
pairs AS (
  SELECT user_id,
    CASE WHEN (epoch_us(ts) - epoch_us(lag(ts) OVER w)) = 0 THEN 0.0
         ELSE ({distance_2d_sql('lag(lat) OVER w', 'lag(lon) OVER w', 'lat', 'lon')})
              / ((epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1e6)
    END AS speed
  FROM geo
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       count(CASE WHEN speed > {_SPEED_MAX!r} THEN 1 END) AS n_defects,
       count(speed) AS n_pairs
FROM pairs GROUP BY user_id
"""


# --------------------------------------------------------------------------
# A2 (SQL-expressible slice) — DistanceQuality's pairwise-distance sum and
# step-penalty base (distance.go:453-475: total 2D distance, step = d/n,
# 100 − 12·[step>30] − 6·[step>8]).  The defect-count deductions that
# complete A2 are sequential kernels (pinned to fixtures in
# tests/test_kernel_sweep.py); this oracle pins everything else.
# --------------------------------------------------------------------------

def q_distance_quality_base(spark, sf_dir):
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = distance_2d_col(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    )
    per = pts.select("user_id", d.alias("leg"))
    agg = per.groupBy("user_id").agg(
        F.sum("leg").alias("dist"), F.count("*").alias("n_points")
    )
    step = F.round(F.col("dist") / F.col("n_points"), 6)
    return agg.select(
        "user_id",
        F.round("dist", 1).alias("dist_r"),
        "n_points",
        (
            F.lit(100.0)
            - F.when(step > 30.0, 12.0).otherwise(0.0)
            - F.when(step > 8.0, 6.0).otherwise(0.0)
        ).alias("base_quality"),
    )


SQL_DISTANCE_QUALITY_BASE = f"""
WITH {GEO_CTE},
per AS (
  SELECT user_id,
         {distance_2d_sql('lag(lat) OVER w', 'lag(lon) OVER w', 'lat', 'lon')} AS leg
  FROM geo
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
agg AS (
  SELECT user_id, sum(leg) AS dist, count(*) AS n_points FROM per GROUP BY user_id
)
SELECT user_id, round(dist, 1) AS dist_r, n_points,
       CAST(100.0 - (CASE WHEN round(dist / n_points, 6) > 30.0 THEN 12.0 ELSE 0.0 END)
                  - (CASE WHEN round(dist / n_points, 6) > 8.0 THEN 6.0 ELSE 0.0 END)
       AS DOUBLE) AS base_quality
FROM agg
"""


# --------------------------------------------------------------------------
# A3 — TimeQuality per track (trackmaster/time.go:108-132, exact integer
# arithmetic, num>total→0, integer division).  Invalid/zero/backwards times
# are synthesized deterministically from event_id.
# --------------------------------------------------------------------------

_NOW_US = 1767225600 * 1_000_000  # fixed `now` parameter: 2026-01-01 UTC
_Y2K_US = 946684800 * 1_000_000

# epoch µs with deterministic corruption: zero sentinel / pre-2000 / jitter
_TS2_US = f"""CASE
  WHEN event_id % 17 = 0 THEN {GO_ZERO_US}
  WHEN event_id % 31 = 0 THEN epoch_us(ts) - 1009459200000000
  ELSE epoch_us(ts) + ((event_id * 7919) % 1000 - 500) * 1000000 END"""


def _ts2_us_col():
    return (
        F.when(F.col("event_id") % 17 == 0, F.lit(GO_ZERO_US))
        .when(F.col("event_id") % 31 == 0, F.unix_micros(F.col("ts").cast("timestamp")) - 1009459200000000)
        .otherwise(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + ((F.col("event_id") * 7919) % 1000 - 500) * 1000000
        )
    )


def q_time_quality(spark, sf_dir):
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir).withColumn("ts2_us", _ts2_us_col())
    w = Window.partitionBy("user_id").orderBy("event_id")
    flags = pts.select(
        "user_id",
        F.when(
            ~(
                (F.col("ts2_us") != GO_ZERO_US)
                & (F.col("ts2_us") > _Y2K_US)
                & (F.col("ts2_us") < _NOW_US)
            ),
            1,
        ).otherwise(0).alias("invalid"),
        F.when(
            (F.lag("ts2_us").over(w).isNotNull())
            & (F.lag("ts2_us").over(w) != GO_ZERO_US)
            & (F.col("ts2_us") < F.lag("ts2_us").over(w)),
            4,
        ).otherwise(0).alias("backwards"),
    )
    agg = flags.groupBy("user_id").agg(
        (F.sum("invalid") + F.sum("backwards")).alias("num"),
        F.count("*").alias("total"),
    )
    return agg.select(
        "user_id",
        F.when(F.col("num") > F.col("total"), 0)
        .otherwise(100 - F.expr("(num * 100) div total"))
        .cast("int")
        .alias("time_quality"),
    )


SQL_TIME_QUALITY = f"""
WITH {GEO_CTE},
t2 AS (
  SELECT user_id, event_id, ({_TS2_US}) AS ts2_us FROM geo
),
flags AS (
  SELECT user_id,
    CASE WHEN NOT (ts2_us <> {GO_ZERO_US} AND ts2_us > {_Y2K_US} AND ts2_us < {_NOW_US})
         THEN 1 ELSE 0 END AS invalid,
    CASE WHEN lag(ts2_us) OVER w IS NOT NULL AND lag(ts2_us) OVER w <> {GO_ZERO_US}
              AND ts2_us < lag(ts2_us) OVER w
         THEN 4 ELSE 0 END AS backwards
  FROM t2
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
),
agg AS (
  SELECT user_id, sum(invalid) + sum(backwards) AS num, count(*) AS total
  FROM flags GROUP BY user_id
)
SELECT user_id,
  CAST(CASE WHEN num > total THEN 0 ELSE 100 - (num * 100) // total END AS INT)
    AS time_quality
FROM agg
"""


# --------------------------------------------------------------------------
# P4 — creator-normalization ladder (misc.go:277-362; first match wins)
# --------------------------------------------------------------------------

_RAW_CREATORS = [
    "Garmin Connect", "StravaGPX", "eTrex 30", "Polar Vantage", "Movescount App",
    "OruxMaps v7.4.22", "Mapas de España 6.0", "GPSBabel - 1.7", "connect.garmin.com",
    "Wikiloc - totally unknown", "ExifTool 12.1", "some random device", "",
    "Runkeeper v12", "Zwift ride", "togpx exporter",
]

# (substring, canonical) in the EXACT ladder order; None canonical = identity
_LADDER = [
    ("Garmin", "Garmin"), ("Strava", "Strava"), ("eTrex", "Garmin"),
    ("Runkeeper", "Runkeeper"), ("Endomondo", "Endomondo"), ("Runtastic", "Runtastic"),
    ("Polar", "Polar"), ("TomTom", "TomTom"), ("Suunto", "Suunto"),
    ("Movescount", "Suunto"), ("Fitbit", "Fitbit"), ("Wahoo", "Wahoo"),
    ("Bryton", "Bryton"), ("Cateye", "Cateye"), ("Coros", "Coros"),
    ("Hammerhead", "Hammerhead"), ("Lezyne", "Lezyne"), ("Mio", "Mio"),
    ("Sigma", "Sigma"), ("Stages", "Stages"), ("Tacx", "Tacx"),
    ("Timex", "Timex"), ("Xplova", "Xplova"), ("Zwift", "Zwift"),
    ("Wikiloc", "Wikiloc"), ("GPSBabel", "GPSBabel"), ("OruxMaps", None),
    ("Locus", "Locus"), ("Viking", "Viking"), ("OsmAnd", "OsmAnd"),
    ("AllTrails", "AllTrails"), ("ExifTool", "ExifTool"), ("togpx", "ToGPX"),
    ("OziExplorer", "OziExplorer"), ("Graphhopper", "Graphhopper"),
    ("Google", "Google"), ("nawagers", "Nawagers"), ("Mapas de España", "OruxMaps"),
]


def creator_ladder_col(raw):
    """GetCreator as a single when-chain (misc.go:277-362)."""
    expr = None
    for sub, canon in _LADDER:
        out = raw if canon is None else F.lit(canon)
        cond = raw.contains(sub)
        expr = F.when(cond, out) if expr is None else expr.when(cond, out)
    guarded = F.when(raw == "", F.lit("Unknown")).otherwise(
        F.coalesce(expr, F.lit("Unknown"))
    )
    return guarded


def creator_ladder_sql(raw: str) -> str:
    whens = "\n".join(
        f"WHEN position('{sub}' IN {raw}) > 0 THEN "
        + (raw if canon is None else f"'{canon}'")
        for sub, canon in _LADDER
    )
    return (
        f"CASE WHEN {raw} = '' THEN 'Unknown' ELSE "
        f"coalesce(CASE {whens} END, 'Unknown') END"
    )


def _raw_creator_col():
    arr = F.array(*[F.lit(s) for s in _RAW_CREATORS])
    return F.element_at(arr, (F.col("event_id") % len(_RAW_CREATORS) + 1).cast("int"))


def _raw_creator_sql() -> str:
    elems = ", ".join(f"'{s}'" for s in _RAW_CREATORS)
    return f"[{elems}][CAST(event_id % {len(_RAW_CREATORS)} + 1 AS INT)]"


def q_creator_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(creator_ladder_col(_raw_creator_col()).alias("creator"))
        .groupBy("creator")
        .agg(F.count("*").alias("n"))
    )


SQL_CREATOR_COUNTS = f"""
SELECT {creator_ladder_sql(_raw_creator_sql())} AS creator, count(*) AS n
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# E2 — point-in-polygon join vs rectangle polygon layer from `nation`
# (Spark runs the full covering/broadcast/ray-cast machinery; the oracle
# reduces to interval predicates because the rings are axis-aligned).
# --------------------------------------------------------------------------

def _rect_bounds_cols():
    n = F.col("n_nationkey").cast("long")
    lat0 = ((n * 617) % 150 - 75).cast("double") + 0.00005
    dlat = (3 + (n % 5)).cast("double")
    lon0 = ((n * 1009) % 340 - 170).cast("double") + 0.00005
    dlon = (4 + (n % 7)).cast("double")
    return lat0, lat0 + dlat, lon0, lon0 + dlon


_RECT_SQL = """
  SELECT CAST(n_nationkey AS VARCHAR) AS poly_id,
         CAST((CAST(n_nationkey AS BIGINT) * 617) % 150 - 75 AS DOUBLE) + 0.00005 AS lat0,
         CAST((CAST(n_nationkey AS BIGINT) * 617) % 150 - 75 AS DOUBLE) + 0.00005
           + CAST(3 + (n_nationkey % 5) AS DOUBLE) AS lat1,
         CAST((CAST(n_nationkey AS BIGINT) * 1009) % 340 - 170 AS DOUBLE) + 0.00005 AS lon0,
         CAST((CAST(n_nationkey AS BIGINT) * 1009) % 340 - 170 AS DOUBLE) + 0.00005
           + CAST(4 + (n_nationkey % 7) AS DOUBLE) AS lon1
  FROM nation
"""


def rect_polygons(spark, sf_dir) -> DataFrame:
    nat = _t(spark, sf_dir, "nation")
    lat0, lat1, lon0, lon1 = _rect_bounds_cols()
    ring = F.array(
        F.struct(lat0.alias("lat"), lon0.alias("lon")),
        F.struct(lat0.alias("lat"), lon1.alias("lon")),
        F.struct(lat1.alias("lat"), lon1.alias("lon")),
        F.struct(lat1.alias("lat"), lon0.alias("lon")),
    )
    return nat.select(
        F.col("n_nationkey").cast("string").alias("poly_id"), ring.alias("ring")
    )


def q_pip_counts(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import point_in_polygon_join

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon")
    polys = rect_polygons(spark, sf_dir)
    hits = point_in_polygon_join(pts, polys, level=7)
    return hits.groupBy("poly_id").agg(F.count("*").alias("n_points"))


SQL_PIP_COUNTS = f"""
WITH {GEO_CTE},
rects AS ({_RECT_SQL})
SELECT r.poly_id, count(*) AS n_points
FROM geo g JOIN rects r
  ON g.lat > r.lat0 AND g.lat < r.lat1 AND g.lon > r.lon0 AND g.lon < r.lon1
GROUP BY r.poly_id
"""


def q_pip_counts_hex(spark, sf_dir):
    """E2 on the hexagonal lattice — H3-style polyfill covering + hex cell
    assignment; the inclusion result is grid-independent, so the oracle is
    the SAME brute-force rect join as `pip_counts` (any covering or
    assignment bug on the hex path hash-fails against it)."""
    from gotrackmaster_spark.operators.spatial import point_in_polygon_join

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon")
    polys = rect_polygons(spark, sf_dir)
    hits = point_in_polygon_join(pts, polys, level=4, grid="hex")
    return hits.groupBy("poly_id").agg(F.count("*").alias("n_points"))


SQL_PIP_COUNTS_HEX = SQL_PIP_COUNTS


def q_pip_antijoin(spark, sf_dir):
    """E2 complement — coverage gaps: points inside NO polygon, counted per
    1° tile.  Scale shape: per-cell covering roll-up broadcast, points
    never expanded or shuffled before the final tile agg (see
    `point_in_polygon_anti`).  Oracle is brute-force NOT EXISTS over the
    same rects."""
    from gotrackmaster_spark.operators.spatial import point_in_polygon_anti

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon")
    polys = rect_polygons(spark, sf_dir)
    # level 9, not 7: the verdict is exact at ANY level, but finer cells
    # classify far more of the covering as `full`/absent, so most points
    # take the pure-codegen path instead of the Arrow ray-cast refine
    # (measured 2.16 s -> 1.34 s at sf0.1; level 11 regresses — covering
    # generation is O(4^level) per polygon bbox)
    out = point_in_polygon_anti(pts, polys, level=9)
    return (
        out.select(tile_name_col(F.col("lat"), F.col("lon"), 1.0).alias("tile"))
        .groupBy("tile")
        .agg(F.count("*").alias("n_uncovered"))
    )


SQL_PIP_ANTIJOIN = f"""
WITH {GEO_CTE},
rects AS ({_RECT_SQL})
SELECT {tile_name_sql('lat', 'lon', 1.0)} AS tile, count(*) AS n_uncovered
FROM geo g
WHERE NOT EXISTS (
  SELECT 1 FROM rects r
  WHERE g.lat > r.lat0 AND g.lat < r.lat1 AND g.lon > r.lon0 AND g.lon < r.lon1
)
GROUP BY 1
"""


def q_od_matrix(spark, sf_dir):
    """Origin–destination flow matrix: each user's first and last event
    (by ts, event_id) mapped to level-5 cells, flows counted per
    (o_cell, d_cell).  One shuffle on user_id (struct min/max partial-
    aggregates map-side), one on the tiny (o,d) pair key."""
    od = geo_events(spark, sf_dir).groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "lat", "lon")).alias("o"),
        F.max(F.struct("ts", "event_id", "lat", "lon")).alias("d"),
    )
    return (
        od.select(
            F.shiftright(cell_col(F.col("o.lat"), F.col("o.lon"), 12), 2 * (12 - 5)).alias("o_cell"),
            F.shiftright(cell_col(F.col("d.lat"), F.col("d.lon"), 12), 2 * (12 - 5)).alias("d_cell"),
        )
        .groupBy("o_cell", "d_cell")
        .agg(F.count("*").alias("n_users"))
    )


SQL_OD_MATRIX = f"""
WITH {GEO_CTE},
ranked AS (
  SELECT user_id, lat, lon,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_o,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM geo
),
o AS (SELECT user_id, ({cell_sql('lat', 'lon', 12)} >> {2 * (12 - 5)}) AS o_cell
      FROM ranked WHERE rn_o = 1),
d AS (SELECT user_id, ({cell_sql('lat', 'lon', 12)} >> {2 * (12 - 5)}) AS d_cell
      FROM ranked WHERE rn_d = 1)
SELECT o.o_cell, d.d_cell, count(*) AS n_users
FROM o JOIN d ON o.user_id = d.user_id
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E2d — polygon↔polygon overlap join (denser customer-keyed rect layer so
# the overlap set is non-degenerate at test scale; same float recipe as
# _RECT_SQL so Spark's ring-derived bboxes are bit-identical to the CTE)
# --------------------------------------------------------------------------

_CUST_RECT_SQL = """
  SELECT CAST(c_custkey AS VARCHAR) AS poly_id,
         CAST((CAST(c_custkey AS BIGINT) * 911) % 150 - 75 AS DOUBLE) + 0.00005 AS lat0,
         CAST((CAST(c_custkey AS BIGINT) * 911) % 150 - 75 AS DOUBLE) + 0.00005
           + CAST(3 + (c_custkey % 5) AS DOUBLE) AS lat1,
         CAST((CAST(c_custkey AS BIGINT) * 1931) % 340 - 170 AS DOUBLE) + 0.00005 AS lon0,
         CAST((CAST(c_custkey AS BIGINT) * 1931) % 340 - 170 AS DOUBLE) + 0.00005
           + CAST(4 + (c_custkey % 7) AS DOUBLE) AS lon1
  FROM customer
"""


def cust_rect_polygons(spark, sf_dir) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    n = F.col("c_custkey").cast("long")
    lat0 = ((n * 911) % 150 - 75).cast("double") + 0.00005
    lat1 = lat0 + (3 + (n % 5)).cast("double")
    lon0 = ((n * 1931) % 340 - 170).cast("double") + 0.00005
    lon1 = lon0 + (4 + (n % 7)).cast("double")
    ring = F.array(
        F.struct(lat0.alias("lat"), lon0.alias("lon")),
        F.struct(lat0.alias("lat"), lon1.alias("lon")),
        F.struct(lat1.alias("lat"), lon1.alias("lon")),
        F.struct(lat1.alias("lat"), lon0.alias("lon")),
    )
    return cust.select(
        F.col("c_custkey").cast("string").alias("poly_id"), ring.alias("ring")
    )


def q_poly_overlaps(spark, sf_dir):
    """E2d — polygon↔polygon overlap join: every pair of polygons whose
    interiors intersect.  Candidates come from the shared covering cell
    (two intersecting bboxes always share a bbox-grid cell, so the cell
    equi-join misses nothing); the exact interior test compares the
    ring-derived bboxes (exact for the rectilinear layer).  Scale shape:
    covering explode → single cell equi-join (AQE-skewable) → pair
    distinct — never all-pairs."""
    from gotrackmaster_spark.operators.spatial import polygon_covering

    polys = cust_rect_polygons(spark, sf_dir)
    cov = polygon_covering(polys, level=4).select(
        "poly_id",
        "cell",
        F.array_min(F.transform("ring", lambda p: p["lat"])).alias("lat_lo"),
        F.array_max(F.transform("ring", lambda p: p["lat"])).alias("lat_hi"),
        F.array_min(F.transform("ring", lambda p: p["lon"])).alias("lon_lo"),
        F.array_max(F.transform("ring", lambda p: p["lon"])).alias("lon_hi"),
    )
    a, b = cov.alias("a"), cov.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.poly_id") < F.col("b.poly_id"))
            & (F.col("a.lat_lo") < F.col("b.lat_hi"))
            & (F.col("a.lat_hi") > F.col("b.lat_lo"))
            & (F.col("a.lon_lo") < F.col("b.lon_hi"))
            & (F.col("a.lon_hi") > F.col("b.lon_lo")),
        )
        .select(
            F.col("a.poly_id").alias("poly_a"),
            F.col("b.poly_id").alias("poly_b"),
        )
        .distinct()
    )


SQL_POLY_OVERLAPS = f"""
WITH rects AS ({_CUST_RECT_SQL})
SELECT a.poly_id AS poly_a, b.poly_id AS poly_b
FROM rects a JOIN rects b
  ON a.poly_id < b.poly_id
 AND a.lat0 < b.lat1 AND a.lat1 > b.lat0
 AND a.lon0 < b.lon1 AND a.lon1 > b.lon0
"""


def q_dwell_cells(spark, sf_dir):
    """Stay-point detection (dwell cells): maximal runs of CONSECUTIVE
    events (per user, time order) in the same level-3 cell, kept when the
    run has ≥ 2 points, aggregated per cell.  One exchange for the
    user_id window, then the run/cell aggregates (both partial-agg
    map-side)."""
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir).select(
        "user_id", "ts", "event_id",
        cell_col(F.col("lat"), F.col("lon"), 3).alias("cell"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("cell").over(w)
    runs = pts.withColumn(
        "chg", F.when(prev.isNull() | (prev != F.col("cell")), 1).otherwise(0)
    ).withColumn("run", F.sum("chg").over(w))
    dwells = (
        runs.groupBy("user_id", "run", "cell")
        .agg(F.count("*").alias("n_pts"))
        .filter(F.col("n_pts") >= 2)
    )
    return dwells.groupBy("cell").agg(
        F.count("*").alias("n_dwells"),
        F.countDistinct("user_id").alias("n_users"),
        F.max("n_pts").alias("max_run"),
    )


SQL_DWELL_CELLS = f"""
WITH {GEO_CTE},
cells AS (
  SELECT user_id, ts, event_id, {cell_sql('lat', 'lon', 3)} AS cell FROM geo
),
flagged AS (
  SELECT user_id, ts, event_id, cell,
         CASE WHEN lag(cell) OVER w IS NULL OR lag(cell) OVER w <> cell
              THEN 1 ELSE 0 END AS chg
  FROM cells
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, cell,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run
  FROM flagged
),
dwells AS (
  SELECT user_id, run, cell, count(*) AS n_pts
  FROM runs GROUP BY user_id, run, cell
  HAVING count(*) >= 2
)
SELECT cell, count(*) AS n_dwells, count(DISTINCT user_id) AS n_users,
       max(n_pts) AS max_run
FROM dwells GROUP BY cell
"""


_TRAJ_J_NUM, _TRAJ_J_DEN = 3, 100  # Jaccard >= 0.03 (~p99 of the synthetic layer)
# hot-cell cap, the jaccard_pairs stop-shingle convention: a cell visited by
# k users yields C(k,2) candidate pairs on ONE shuffle key, so a downtown
# hub at 10⁹ users is a quadratic hot key; cells above the cap are dropped
# BEFORE the self-join and set sizes are computed AFTER the cap, so the
# result is exact Jaccard over the capped cell space.  sf0.01 max df = 6 —
# driver output unchanged by the cap.
_TRAJ_MAX_CELL_DF = 64


def q_trajectory_jaccard(spark, sf_dir):
    """Trajectory similarity join: user pairs whose visited-cell SETS
    (distinct level-6 cells) are Jaccard-similar.  Same set-similarity
    topology as `jaccard_pairs`: cell inverted-index self-join, with
    hot cells (df > _TRAJ_MAX_CELL_DF) dropped up front →
    shared-cell counts → PLAIN size joins (no O(users) broadcast, per
    the r2 scale fix) → integer cross-multiplied threshold (no float
    compare).  Real trajectories are cell-sparse, so the per-cell
    inverted index bounds candidates; the synthetic layer is dense,
    which only makes the toy-scale join bigger, not the plan wrong."""
    pts = (
        geo_events(spark, sf_dir)
        .select("user_id", cell_col(F.col("lat"), F.col("lon"), 6).alias("cell"))
        .distinct()
    )
    hot = (
        pts.groupBy("cell")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > _TRAJ_MAX_CELL_DF)
        .select("cell")
    )
    pts = pts.join(F.broadcast(hot), "cell", "left_anti")
    sizes = pts.groupBy("user_id").agg(F.count("*").alias("sz"))
    a, b = pts.alias("a"), pts.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        inter.join(sizes.select(F.col("user_id").alias("ua"), F.col("sz").alias("sza")), "ua")
        .join(sizes.select(F.col("user_id").alias("ub"), F.col("sz").alias("szb")), "ub")
        .filter(
            F.lit(_TRAJ_J_DEN) * F.col("n_shared")
            >= F.lit(_TRAJ_J_NUM) * (F.col("sza") + F.col("szb") - F.col("n_shared"))
        )
        .select("ua", "ub", "n_shared", "sza", "szb")
    )


SQL_TRAJECTORY_JACCARD = f"""
WITH {GEO_CTE},
vis0 AS (
  SELECT DISTINCT user_id, {cell_sql('lat', 'lon', 6)} AS cell FROM geo
),
hot AS (
  SELECT cell FROM vis0 GROUP BY cell HAVING count(*) > {_TRAJ_MAX_CELL_DF}
),
vis AS (
  SELECT v.* FROM vis0 v
  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.cell = v.cell)
),
sizes AS (SELECT user_id, count(*) AS sz FROM vis GROUP BY user_id),
inter AS (
  SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS n_shared
  FROM vis a JOIN vis b ON a.cell = b.cell AND a.user_id < b.user_id
  GROUP BY 1, 2
)
SELECT i.ua, i.ub, i.n_shared, sa.sz AS sza, sb.sz AS szb
FROM inter i
JOIN sizes sa ON sa.user_id = i.ua
JOIN sizes sb ON sb.user_id = i.ub
WHERE {_TRAJ_J_DEN} * i.n_shared >= {_TRAJ_J_NUM} * (sa.sz + sb.sz - i.n_shared)
"""


# --------------------------------------------------------------------------
# E3 — kNN via k-ring candidates + exact fallback, vs brute-force oracle.
# Ranking is (round(dist_m, 3), data_id) in both engines.
# --------------------------------------------------------------------------

_KNN_K = 5


def q_knn(spark, sf_dir):
    import pyarrow.parquet as pq

    from gotrackmaster_spark.operators.spatial import knn_join

    pts = geo_events(spark, sf_dir)
    data = pts.select(F.col("event_id").alias("data_id"), "lat", "lon")
    qs = pts.filter(F.col("event_id") % 100 == 3).select(
        F.col("event_id").alias("query_id"), "lat", "lon"
    )
    # density sizing from the parquet footer — no extra Spark pass
    n_data = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    out = knn_join(qs, data, k=_KNN_K, level=7, ring=2, exclude_self=True,
                   n_data=n_data)
    return out.select(
        "query_id", "data_id", F.col("rank").alias("rnk"),
        F.round("dist_m", 3).alias("dist_r"),
    )


_KNN_HEX_K = 4


def q_knn_hex(spark, sf_dir):
    """E3b — kNN via H3-style hex k-ring expansion with SORT-MERGE
    refinement (the north star's literal operator).  Exact: seam/polar
    queries fall back to the bounded brute-force phase."""
    import pyarrow.parquet as pq

    from gotrackmaster_spark.operators.spatial import hex_knn_join

    pts = geo_events(spark, sf_dir)
    data = pts.select(F.col("event_id").alias("data_id"), "lat", "lon")
    qs = pts.filter(F.col("event_id") % 100 == 7).select(
        F.col("event_id").alias("query_id"), "lat", "lon"
    )
    n_data = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    out = hex_knn_join(qs, data, k=_KNN_HEX_K, res=3, ring=1,
                       exclude_self=True, n_data=n_data, sort_merge=True)
    return out.select(
        "query_id", "data_id", F.col("rank").alias("rnk"),
        F.round("dist_m", 3).alias("dist_r"),
    )


SQL_KNN_HEX = f"""
WITH {GEO_CTE},
q AS (SELECT event_id AS query_id, lat AS q_lat, lon AS q_lon FROM geo
      WHERE event_id % 100 = 7),
d AS (SELECT event_id AS data_id, lat AS d_lat, lon AS d_lon FROM geo),
pairs AS (
  SELECT query_id, data_id,
         round({haversine_sql('q_lat', 'q_lon', 'd_lat', 'd_lon')}, 3) AS dist_r
  FROM q CROSS JOIN d WHERE data_id <> query_id
),
ranked AS (
  SELECT query_id, data_id, dist_r,
         row_number() OVER (PARTITION BY query_id ORDER BY dist_r, data_id) AS rn
  FROM pairs
)
SELECT query_id, data_id, CAST(rn AS INT) AS rnk, dist_r
FROM ranked WHERE rn <= {_KNN_HEX_K}
"""


SQL_KNN = f"""
WITH {GEO_CTE},
q AS (SELECT event_id AS query_id, lat AS q_lat, lon AS q_lon FROM geo
      WHERE event_id % 100 = 3),
d AS (SELECT event_id AS data_id, lat AS d_lat, lon AS d_lon FROM geo),
pairs AS (
  SELECT query_id, data_id,
         round({haversine_sql('q_lat', 'q_lon', 'd_lat', 'd_lon')}, 3) AS dist_r
  FROM q CROSS JOIN d WHERE data_id <> query_id
),
ranked AS (
  SELECT query_id, data_id, dist_r,
         row_number() OVER (PARTITION BY query_id ORDER BY dist_r, data_id) AS rn
  FROM pairs
)
SELECT query_id, data_id, CAST(rn AS INT) AS rnk, dist_r
FROM ranked WHERE rn <= {_KNN_K}
"""


# --------------------------------------------------------------------------
# J1 — duplicate detection: band self-join on (start time, start position)
# (cmd/duplicate.go:58-64 predicates at engine scale)
# --------------------------------------------------------------------------

_DUP_SECONDS = 7 * 24 * 3600.0
_DUP_METERS = 1_000_000.0


def q_duplicate_pairs(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import duplicate_join

    pts = geo_events(spark, sf_dir)
    first = pts.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "lat", "lon")).alias("s")
    )
    summaries = first.select(
        F.col("user_id").cast("string").alias("track_id"),
        (F.unix_micros(F.col("s.ts").cast("timestamp")) * 1000).alias("start_ts_ns"),
        F.col("s.lat").alias("start_lat"),
        F.col("s.lon").alias("start_lon"),
    )
    pairs = duplicate_join(
        summaries, _DUP_SECONDS, _DUP_METERS, level=4, ring=3
    )
    return pairs.select(
        "a_id", "b_id", F.round("start_dist_m", 2).alias("dist_r")
    )


SQL_DUPLICATE_PAIRS = f"""
WITH {GEO_CTE},
ranked AS (
  SELECT user_id, ts, lat, lon,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM geo
),
summ AS (
  SELECT CAST(user_id AS VARCHAR) AS track_id, epoch_us(ts) * 1000 AS start_ts_ns,
         lat AS start_lat, lon AS start_lon
  FROM ranked WHERE rn = 1
)
SELECT a.track_id AS a_id, b.track_id AS b_id,
       round({haversine_sql('a.start_lat', 'a.start_lon', 'b.start_lat', 'b.start_lon')}, 2) AS dist_r
FROM summ a JOIN summ b ON a.track_id < b.track_id
WHERE abs(a.start_ts_ns - b.start_ts_ns) <= {int(_DUP_SECONDS * 1e9)}
  AND {haversine_sql('a.start_lat', 'a.start_lon', 'b.start_lat', 'b.start_lon')} < {_DUP_METERS!r}
"""


# --------------------------------------------------------------------------
# J1 (full rule set) — start/end time + position bands, comparator status
# labels, delete eligibility (cmd/duplicate.go:49-78, :84-206)
# --------------------------------------------------------------------------

# 1-hour bands: start times at sf0.01 spread over ~2 days, so this keeps
# the time family selective (~10 % of pairs) instead of degenerate
_DUPE_DIFF_S = 3600                 # --startdiff / --enddiff
_DUPE_DIST_M = 1_000_000            # --startDistance / --endDistance


def _dup_summaries(spark, sf_dir):
    pts = geo_events(spark, sf_dir)
    agg = pts.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "lat", "lon")).alias("s"),
        F.max(F.struct("ts", "event_id", "lat", "lon")).alias("e"),
    )
    return agg.select(
        F.col("user_id").cast("string").alias("track_id"),
        (F.unix_micros(F.col("s.ts").cast("timestamp")) * 1000).alias("start_ts_ns"),
        (F.unix_micros(F.col("e.ts").cast("timestamp")) * 1000).alias("end_ts_ns"),
        F.col("s.lat").alias("start_lat"),
        F.col("s.lon").alias("start_lon"),
        F.col("e.lat").alias("end_lat"),
        F.col("e.lon").alias("end_lon"),
        F.concat(F.lit("c"), (F.col("user_id") % 7).cast("string")).alias("creator"),
        ((F.col("user_id") % 4).cast("double") * 25.0).alias("quality"),
    )


def q_duplicate_pairs_end(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import duplicate_pairs_full

    pairs = duplicate_pairs_full(
        _dup_summaries(spark, sf_dir),
        start_diff=_DUPE_DIFF_S,
        end_diff=_DUPE_DIFF_S,
        start_distance=_DUPE_DIST_M,
        end_distance=_DUPE_DIST_M,
        time_comparator=True,
        distance_comparator=True,
        level=4,
        ring=3,
    )
    return pairs.select(
        "a_id", "b_id", "status", "time_match", "pos_match",
        F.round("start_dist_m", 2).alias("dist_r"),
        F.round("end_dist_m", 2).alias("end_dist_r"),
        "delete_ok",
    )


_SQL_SD = f"{haversine_sql('a.start_lat', 'a.start_lon', 'b.start_lat', 'b.start_lon')}"
_SQL_ED = f"{haversine_sql('a.end_lat', 'a.end_lon', 'b.end_lat', 'b.end_lon')}"

SQL_DUPLICATE_PAIRS_END = f"""
WITH {GEO_CTE},
ranked AS (
  SELECT user_id, ts, lat, lon,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl
  FROM geo
),
summ AS (
  SELECT CAST(user_id AS VARCHAR) AS track_id,
         max(CASE WHEN rn = 1 THEN epoch_us(ts) * 1000 END) AS start_ts_ns,
         max(CASE WHEN rl = 1 THEN epoch_us(ts) * 1000 END) AS end_ts_ns,
         max(CASE WHEN rn = 1 THEN lat END) AS start_lat,
         max(CASE WHEN rn = 1 THEN lon END) AS start_lon,
         max(CASE WHEN rl = 1 THEN lat END) AS end_lat,
         max(CASE WHEN rl = 1 THEN lon END) AS end_lon,
         'c' || CAST(user_id % 7 AS VARCHAR) AS creator,
         CAST(user_id % 4 AS DOUBLE) * 25.0 AS quality
  FROM ranked GROUP BY user_id
),
verdicts AS (
  SELECT a.track_id AS a_id, b.track_id AS b_id,
         abs(a.start_ts_ns - b.start_ts_ns) < {_DUPE_DIFF_S} * CAST(1000000000 AS BIGINT) AS st,
         abs(a.end_ts_ns - b.end_ts_ns) < {_DUPE_DIFF_S} * CAST(1000000000 AS BIGINT) AS et,
         {_SQL_SD} < {float(_DUPE_DIST_M)!r} AS sp,
         {_SQL_ED} < {float(_DUPE_DIST_M)!r} AS ep,
         round({_SQL_SD}, 2) AS dist_r,
         round({_SQL_ED}, 2) AS end_dist_r,
         (a.creator = b.creator AND a.quality = b.quality) AS delete_ok
  FROM summ a JOIN summ b ON a.track_id < b.track_id
)
SELECT a_id, b_id,
       CASE WHEN st THEN (CASE WHEN et THEN 'start and end time' ELSE 'start time' END)
            ELSE (CASE WHEN ep THEN 'start and end position' ELSE 'start position' END)
       END AS status,
       st AS time_match, sp AS pos_match, dist_r, end_dist_r, delete_ok
FROM verdicts WHERE st OR sp
"""


# --------------------------------------------------------------------------
# E4/J2 — raster↔vector: bilinear DEM sampling via broadcast tile join
# --------------------------------------------------------------------------

def _dem_corner_sql(la: str, lo: str) -> str:
    return (
        f"CAST(((({la}) + 90) * 361 + (({lo}) + 180)) * 2654435761 % 40000 AS DOUBLE) / 10.0"
    )


def _dem_corner_col(la, lo):
    return (((la + 90) * 361 + (lo + 180)) * F.lit(2654435761) % 40000).cast("double") / 10.0


def synthetic_dem(spark) -> DataFrame:
    """360×180 one-degree DEM tiles with deterministic corner samples."""
    base = spark.range(180 * 360).select(
        (F.col("id") / 360).cast("long").alias("lat_deg_l"),
        (F.col("id") % 360).alias("lon_deg_l"),
    )
    la = base["lat_deg_l"] - 90
    lo = base["lon_deg_l"] - 180
    return base.select(
        la.cast("int").alias("lat_deg"),
        lo.cast("int").alias("lon_deg"),
        _dem_corner_col(la, lo).alias("e00"),
        _dem_corner_col(la, lo + 1).alias("e01"),
        _dem_corner_col(la + 1, lo).alias("e10"),
        _dem_corner_col(la + 1, lo + 1).alias("e11"),
    )


def q_dem_bands(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import bilinear_dem_join

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon")
    j = bilinear_dem_join(pts, synthetic_dem(spark))
    return (
        j.withColumn("band", F.floor(F.col("lat") / 10).cast("int"))
        .groupBy("band")
        .agg(F.round(F.avg("dem_ele"), 4).alias("avg_ele"), F.count("*").alias("n"))
    )


SQL_DEM_BANDS = f"""
WITH {GEO_CTE},
pt AS (
  SELECT lat, lon,
         CAST(floor(lat) AS BIGINT) AS la, CAST(floor(lon) AS BIGINT) AS lo
  FROM geo
),
interp AS (
  SELECT lat, lon,
    ({_dem_corner_sql('la', 'lo')}) * (1 - (lat - la)) * (1 - (lon - lo))
    + ({_dem_corner_sql('la', 'lo + 1')}) * (1 - (lat - la)) * (lon - lo)
    + ({_dem_corner_sql('la + 1', 'lo')}) * (lat - la) * (1 - (lon - lo))
    + ({_dem_corner_sql('la + 1', 'lo + 1')}) * (lat - la) * (lon - lo) AS dem_ele
  FROM pt
)
SELECT CAST(floor(lat / 10) AS INT) AS band,
       round(avg(dem_ele), 4) AS avg_ele, count(*) AS n
FROM interp GROUP BY 1
"""


# E4 terrain derivatives: slope / aspect / hillshade per DEM tile from the
# 4 corner samples (row-local — no neighbor join needed at this grid
# granularity), rolled up per 10° latitude band.  Standard hillshade with
# sun azimuth 315°, altitude 45°; constants embedded as identical Python-
# computed literals in BOTH engines.
_HS_COS_ZEN = math.cos(math.radians(45.0))
_HS_SIN_ZEN = math.sin(math.radians(45.0))
_HS_AZ = math.radians(315.0)
_M_PER_DEG_TERRAIN = 111320.0
_STEEP_DEG = 1.0


def q_terrain_stats(spark, sf_dir):
    """E4 extension — terrain derivatives over the synthetic DEM: per-tile
    slope (finite differences of the corner samples, meters), aspect,
    and 315°/45° hillshade, aggregated per 10° latitude band.  Pure
    whole-stage codegen: range → trig → one aggregate exchange."""
    dem = synthetic_dem(spark)
    latc = F.col("lat_deg").cast("double") + 0.5
    dzdx = (
        ((F.col("e01") + F.col("e11")) - (F.col("e00") + F.col("e10"))) / 2.0
        / (F.lit(_M_PER_DEG_TERRAIN) * F.cos(F.radians(latc)))
    )
    dzdy = (
        ((F.col("e10") + F.col("e11")) - (F.col("e00") + F.col("e01"))) / 2.0
        / F.lit(_M_PER_DEG_TERRAIN)
    )
    slope = F.atan(F.sqrt(dzdx * dzdx + dzdy * dzdy))
    aspect = F.atan2(dzdy, -dzdx)
    hs = F.lit(255.0) * (
        F.lit(_HS_COS_ZEN) * F.cos(slope)
        + F.lit(_HS_SIN_ZEN) * F.sin(slope) * F.cos(F.lit(_HS_AZ) - aspect)
    )
    t = dem.select(
        F.floor(F.col("lat_deg") / 10).cast("int").alias("band"),
        F.degrees(slope).alias("slope_deg"),
        hs.alias("hs"),
    )
    return t.groupBy("band").agg(
        F.round(F.avg("slope_deg"), 4).alias("avg_slope"),
        F.round(F.avg("hs"), 4).alias("avg_hillshade"),
        F.count(F.when(F.col("slope_deg") > _STEEP_DEG, 1)).alias("n_steep"),
        F.count("*").alias("n_tiles"),
    )


SQL_TERRAIN_STATS = f"""
WITH g AS (
  SELECT (i // 360) - 90 AS la, (i % 360) - 180 AS lo
  FROM generate_series(0, {180 * 360 - 1}) t(i)
),
grad AS (
  SELECT la, lo,
    ((({_dem_corner_sql('la', 'lo + 1')}) + ({_dem_corner_sql('la + 1', 'lo + 1')}))
     - (({_dem_corner_sql('la', 'lo')}) + ({_dem_corner_sql('la + 1', 'lo')}))) / 2.0
      / ({_M_PER_DEG_TERRAIN!r} * cos(radians(CAST(la AS DOUBLE) + 0.5))) AS dzdx,
    ((({_dem_corner_sql('la + 1', 'lo')}) + ({_dem_corner_sql('la + 1', 'lo + 1')}))
     - (({_dem_corner_sql('la', 'lo')}) + ({_dem_corner_sql('la', 'lo + 1')}))) / 2.0
      / {_M_PER_DEG_TERRAIN!r} AS dzdy
  FROM g
),
tiles AS (
  SELECT CAST(floor(la / 10.0) AS INT) AS band,
         degrees(atan(sqrt(dzdx * dzdx + dzdy * dzdy))) AS slope_deg,
         255.0 * ({_HS_COS_ZEN!r} * cos(atan(sqrt(dzdx * dzdx + dzdy * dzdy)))
                  + {_HS_SIN_ZEN!r} * sin(atan(sqrt(dzdx * dzdx + dzdy * dzdy)))
                    * cos({_HS_AZ!r} - atan2(dzdy, -dzdx))) AS hs
  FROM grad
)
SELECT band,
       round(avg(slope_deg), 4) AS avg_slope,
       round(avg(hs), 4) AS avg_hillshade,
       CAST(count(CASE WHEN slope_deg > {_STEEP_DEG!r} THEN 1 END) AS BIGINT) AS n_steep,
       count(*) AS n_tiles
FROM tiles GROUP BY band
"""


_QK_ZOOM = 8


def q_quadkey_counts(spark, sf_dir):
    """T5 — Bing quadkey assignment: mercator tile → base-4 interleaved
    string key (parent = prefix), counted per quadkey with the parent
    carried as the prefix column.  Fixed-length concat, pure codegen."""
    from gotrackmaster_spark.functions.tiles import quadkey_col

    pts = geo_events(spark, sf_dir)
    tx, ty = mercator_tile_cols(F.col("lat"), F.col("lon"), _QK_ZOOM)
    return (
        pts.select(quadkey_col(tx, ty, _QK_ZOOM).alias("qk"))
        .groupBy("qk")
        .agg(F.count("*").alias("n"))
        .select("qk", F.substring("qk", 1, _QK_ZOOM - 1).alias("parent_qk"), "n")
    )


def _sql_quadkey_counts() -> str:
    from gotrackmaster_spark.functions.tiles import quadkey_sql

    tx, ty = mercator_tile_sql("lat", "lon", _QK_ZOOM)
    return f"""
WITH {GEO_CTE},
t AS (SELECT {tx} AS tx, {ty} AS ty FROM geo),
q AS (SELECT {quadkey_sql('tx', 'ty', _QK_ZOOM)} AS qk FROM t)
SELECT qk, substring(qk, 1, {_QK_ZOOM - 1}) AS parent_qk, count(*) AS n
FROM q GROUP BY qk
"""


SQL_QUADKEY_COUNTS = _sql_quadkey_counts()


_FOCAL_N = 64  # 64×64 lattice (level-6 equivalent)


def q_focal_density(spark, sf_dir):
    """E4 focal (convolution) op — 3×3 neighborhood point-density sum on
    the 64×64 degree lattice: per-cell counts, explode the 9 (di, dj)
    offsets (longitude wraps, latitude clamps drop), re-aggregate on the
    target cell.  The explode runs on the per-CELL aggregate (≤ n² rows),
    never on the points — the classic scalable focal shape."""
    pts = geo_events(spark, sf_dir)
    n = _FOCAL_N
    counts = (
        pts.select(
            F.floor((F.col("lon") + 180.0) / 360.0 * n).cast("int").alias("i"),
            F.floor((F.col("lat") + 90.0) / 180.0 * n).cast("int").alias("j"),
        )
        .groupBy("i", "j")
        .agg(F.count("*").alias("c"))
    )
    offs = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in (-1, 0, 1) for dj in (-1, 0, 1)
    ])
    sprayed = (
        counts.select("i", "j", "c", F.explode(offs).alias("o"))
        .select(
            (((F.col("i") + F.col("o.di")) + n) % n).alias("ti"),
            (F.col("j") + F.col("o.dj")).alias("tj"),
            "c",
        )
        .filter((F.col("tj") >= 0) & (F.col("tj") < n))
    )
    return sprayed.groupBy("ti", "tj").agg(F.sum("c").alias("focal_sum"))


SQL_FOCAL_DENSITY = f"""
WITH {GEO_CTE},
counts AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * {_FOCAL_N}) AS INT) AS i,
         CAST(floor((lat + 90.0) / 180.0 * {_FOCAL_N}) AS INT) AS j,
         count(*) AS c
  FROM geo GROUP BY 1, 2
),
offs AS (
  SELECT di, dj FROM (VALUES (-1), (0), (1)) a(di), (VALUES (-1), (0), (1)) b(dj)
),
sprayed AS (
  SELECT ((i + di) + {_FOCAL_N}) % {_FOCAL_N} AS ti, j + dj AS tj, c
  FROM counts, offs
  WHERE j + dj >= 0 AND j + dj < {_FOCAL_N}
)
SELECT ti, tj, CAST(sum(c) AS BIGINT) AS focal_sum
FROM sprayed GROUP BY 1, 2
"""


_DENSIFY_FRACS = (0.25, 0.5, 0.75)


def q_route_densify(spark, sf_dir):
    """Great-circle route densification: every consecutive leg per user
    gets spherical-linear (slerp) intermediate points at fixed
    fractions, which are then tile-assigned — the operation that turns a
    sparse track into the tile list a route actually crosses.  Pure
    codegen trig, explode over a 3-element literal array (fan-out ×3 on
    LEGS, never a shuffle), then one per-user aggregate.  The d→0 slerp
    singularity falls back to the linear-weight limit (same CASE in both
    engines)."""
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = pts.select(
        "user_id",
        F.radians(F.lag("lat").over(w)).alias("p1"),
        F.radians(F.lag("lon").over(w)).alias("q1"),
        F.radians(F.col("lat")).alias("p2"),
        F.radians(F.col("lon")).alias("q2"),
    ).filter(F.col("p1").isNotNull())
    legs = legs.withColumn(
        "d",
        2.0 * F.asin(F.sqrt(
            F.pow(F.sin((F.col("p2") - F.col("p1")) / 2.0), 2)
            + F.cos(F.col("p1")) * F.cos(F.col("p2"))
            * F.pow(F.sin((F.col("q2") - F.col("q1")) / 2.0), 2)
        )),
    )
    mids = legs.select(
        "user_id", "p1", "q1", "p2", "q2", "d",
        F.explode(F.array(*[F.lit(f) for f in _DENSIFY_FRACS])).alias("f"),
    )
    sin_d = F.sin(F.col("d"))
    a = F.when(F.col("d") > 1e-12, F.sin((1.0 - F.col("f")) * F.col("d")) / sin_d).otherwise(1.0 - F.col("f"))
    b = F.when(F.col("d") > 1e-12, F.sin(F.col("f") * F.col("d")) / sin_d).otherwise(F.col("f"))
    mids = mids.withColumn("a", a).withColumn("b", b)
    x = F.col("a") * F.cos("p1") * F.cos("q1") + F.col("b") * F.cos("p2") * F.cos("q2")
    y = F.col("a") * F.cos("p1") * F.sin("q1") + F.col("b") * F.cos("p2") * F.sin("q2")
    z = F.col("a") * F.sin("p1") + F.col("b") * F.sin("p2")
    mids = mids.withColumn("x", x).withColumn("y", y).withColumn("z", z)
    mlat = F.degrees(F.atan2(F.col("z"), F.sqrt(F.col("x") * F.col("x") + F.col("y") * F.col("y"))))
    mlon = F.degrees(F.atan2(F.col("y"), F.col("x")))
    return (
        mids.select("user_id", tile_name_col(mlat, mlon, 1.0).alias("tile"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_mid"),
            F.countDistinct("tile").alias("n_tiles"),
        )
    )


SQL_ROUTE_DENSIFY = f"""
WITH {GEO_CTE},
legs0 AS (
  SELECT user_id,
         radians(lag(lat) OVER w) AS p1, radians(lag(lon) OVER w) AS q1,
         radians(lat) AS p2, radians(lon) AS q2
  FROM geo
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
legs AS (
  SELECT *, 2.0 * asin(sqrt(
           pow(sin((p2 - p1) / 2.0), 2)
           + cos(p1) * cos(p2) * pow(sin((q2 - q1) / 2.0), 2))) AS d
  FROM legs0 WHERE p1 IS NOT NULL
),
mids0 AS (
  SELECT user_id, p1, q1, p2, q2, d, f
  FROM legs, (VALUES (0.25), (0.5), (0.75)) fr(f)
),
mids1 AS (
  SELECT user_id, p1, q1, p2, q2, d, f,
         CASE WHEN d > 1e-12 THEN sin((1.0 - f) * d) / sin(d) ELSE 1.0 - f END AS a,
         CASE WHEN d > 1e-12 THEN sin(f * d) / sin(d) ELSE f END AS b
  FROM mids0
),
mids2 AS (
  SELECT user_id,
         a * cos(p1) * cos(q1) + b * cos(p2) * cos(q2) AS x,
         a * cos(p1) * sin(q1) + b * cos(p2) * sin(q2) AS y,
         a * sin(p1) + b * sin(p2) AS z
  FROM mids1
),
mids AS (
  SELECT user_id,
         degrees(atan2(z, sqrt(x * x + y * y))) AS mlat,
         degrees(atan2(y, x)) AS mlon
  FROM mids2
)
SELECT user_id, count(*) AS n_mid,
       count(DISTINCT {tile_name_sql('mlat', 'mlon', 1.0)}) AS n_tiles
FROM mids GROUP BY user_id
"""


_GEO_SEARCH_TERMS = ("vector", "stream", "merge")


def q_geo_text_search(spark, sf_dir):
    """Multimodal geo search: which tiles hold images whose CAPTION
    matches any of a query-term set — the image+caption pairing as a
    search primitive.  Captions scan once with per-term substring flags
    (codegen), geotag by the image key, one tile aggregate.  At 10¹²
    rows the term filter pushes into the caption scan; no join, no
    Python."""
    docs = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    hit = [F.when(F.contains(low, F.lit(t)), 1).otherwise(0).alias(f"h{i}")
           for i, t in enumerate(_GEO_SEARCH_TERMS)]
    lat, lon = _img_geotag_cols(F.col("doc_id"))
    tagged = docs.select(
        "doc_id", *hit, tile_name_col(lat, lon, 1.0).alias("tile")
    ).filter(sum(F.col(f"h{i}") for i in range(len(_GEO_SEARCH_TERMS))) > 0)
    aggs = [F.sum(f"h{i}").alias(f"n_{t}") for i, t in enumerate(_GEO_SEARCH_TERMS)]
    return tagged.groupBy("tile").agg(F.count("*").alias("n_docs"), *aggs)


def _sql_geo_text_search() -> str:
    hits = ", ".join(
        f"CASE WHEN contains(lower(text), '{t}') THEN 1 ELSE 0 END AS h{i}"
        for i, t in enumerate(_GEO_SEARCH_TERMS)
    )
    sums = ", ".join(
        f"CAST(sum(h{i}) AS BIGINT) AS n_{t}" for i, t in enumerate(_GEO_SEARCH_TERMS)
    )
    cond = " + ".join(f"h{i}" for i in range(len(_GEO_SEARCH_TERMS)))
    return f"""
WITH tagged AS (
  SELECT doc_id, {hits},
         {tile_name_sql("((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0",
                        "((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0", 1.0)} AS tile
  FROM documents
)
SELECT tile, count(*) AS n_docs, {sums}
FROM tagged WHERE {cond} > 0 GROUP BY tile
"""


SQL_GEO_TEXT_SEARCH = _sql_geo_text_search()


# --------------------------------------------------------------------------
# A4 (SQL-expressible, distributed) — ElevationSRTMAccuracy
# (elevation.go:159-215): per-point DEM compare with the elevation-banded
# max1/max2 ladder, ±inf/NaN zero-elevation quirks, num>total→0 and the
# integer floor-division score — over the broadcast synthetic-DEM join.
# --------------------------------------------------------------------------

def q_srtm_accuracy(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import bilinear_dem_join

    pts = geo_events(spark, sf_dir).select("user_id", "lat", "lon", "ele")
    j = bilinear_dem_join(pts, synthetic_dem(spark))
    elev = F.col("dem_ele")
    max1 = (
        F.when(elev > 3000.0, 2.0).when(elev > 2000.0, 3.0)
        .when(elev > 1000.0, 4.0).when(elev > 500.0, 6.0)
        .when(elev > 250.0, 8.0).otherwise(9.0)
    )
    max2 = (
        F.when(elev > 3000.0, 15.0).when(elev > 2000.0, 20.0)
        .when(elev > 1000.0, 30.0).when(elev > 500.0, 35.0)
        .when(elev > 250.0, 40.0).otherwise(45.0)
    )
    diff100 = F.abs(elev - F.col("ele")) * 100
    e = diff100 / elev
    # elevation == 0: Go's ZeroDivisionError path — diff 0 ⇒ NaN (no
    # penalty), diff > 0 ⇒ +inf (both penalties)
    n1 = F.when(elev == 0.0, F.when(diff100 == 0.0, 0).otherwise(1)).when(
        e > max1, 1
    ).otherwise(0)
    n4 = F.when(elev == 0.0, F.when(diff100 == 0.0, 0).otherwise(1)).when(
        e > max2, 1
    ).otherwise(0)
    per = j.groupBy("user_id").agg(
        F.sum(n1 + n4 * 4).alias("num"), F.count("*").alias("total")
    )
    score = (
        F.when(F.col("num") > F.col("total"), 0)
        .when(F.col("total") == 0, 0)
        .otherwise(F.lit(100) - F.expr("(num * 100) div total"))
    )
    return per.select(
        "user_id", score.cast("int").alias("srtm_accuracy"), "total"
    )


_SRTM_INTERP = f"""
    ({_dem_corner_sql('la', 'lo')}) * (1 - (lat - la)) * (1 - (lon - lo))
    + ({_dem_corner_sql('la', 'lo + 1')}) * (1 - (lat - la)) * (lon - lo)
    + ({_dem_corner_sql('la + 1', 'lo')}) * (lat - la) * (1 - (lon - lo))
    + ({_dem_corner_sql('la + 1', 'lo + 1')}) * (lat - la) * (lon - lo)
"""

SQL_SRTM_ACCURACY = f"""
WITH {GEO_CTE},
pt AS (
  SELECT user_id, lat, lon, ele,
         CAST(floor(lat) AS BIGINT) AS la, CAST(floor(lon) AS BIGINT) AS lo
  FROM geo
),
interp AS (
  SELECT user_id, ele, {_SRTM_INTERP} AS dem_ele FROM pt
),
flags AS (
  SELECT user_id,
    CASE WHEN dem_ele = 0.0
         THEN (CASE WHEN abs(dem_ele - ele) * 100 = 0.0 THEN 0 ELSE 1 END)
         WHEN abs(dem_ele - ele) * 100 / dem_ele >
              (CASE WHEN dem_ele > 3000.0 THEN 2.0 WHEN dem_ele > 2000.0 THEN 3.0
                    WHEN dem_ele > 1000.0 THEN 4.0 WHEN dem_ele > 500.0 THEN 6.0
                    WHEN dem_ele > 250.0 THEN 8.0 ELSE 9.0 END)
         THEN 1 ELSE 0 END AS n1,
    CASE WHEN dem_ele = 0.0
         THEN (CASE WHEN abs(dem_ele - ele) * 100 = 0.0 THEN 0 ELSE 1 END)
         WHEN abs(dem_ele - ele) * 100 / dem_ele >
              (CASE WHEN dem_ele > 3000.0 THEN 15.0 WHEN dem_ele > 2000.0 THEN 20.0
                    WHEN dem_ele > 1000.0 THEN 30.0 WHEN dem_ele > 500.0 THEN 35.0
                    WHEN dem_ele > 250.0 THEN 40.0 ELSE 45.0 END)
         THEN 1 ELSE 0 END AS n4
  FROM interp
),
per AS (
  SELECT user_id, CAST(sum(n1 + n4 * 4) AS BIGINT) AS num,
         count(*) AS total
  FROM flags GROUP BY user_id
)
SELECT user_id,
       CAST(CASE WHEN num > total THEN 0 WHEN total = 0 THEN 0
                 ELSE 100 - ((num * 100) // total) END AS INT) AS srtm_accuracy,
       total
FROM per
"""


# --------------------------------------------------------------------------
# E4 — web-mercator z/x/y tile counts (zoom 6)
# --------------------------------------------------------------------------

def q_mercator_tiles(spark, sf_dir):
    pts = geo_events(spark, sf_dir)
    x, y = mercator_tile_cols(F.col("lat"), F.col("lon"), 6)
    return (
        pts.select(x.alias("tx"), y.alias("ty"))
        .groupBy("tx", "ty")
        .agg(F.count("*").alias("n"))
    )


_MX, _MY = mercator_tile_sql("lat", "lon", 6)
SQL_MERCATOR_TILES = f"""
WITH {GEO_CTE}
SELECT {_MX} AS tx, {_MY} AS ty, count(*) AS n
FROM geo GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Text analysis — token counting + per-language stats over `documents`
# --------------------------------------------------------------------------

def q_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    return (
        docs.select("lang", toks.alias("n_tokens"), F.col("n_chars"))
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("sum_tokens"),
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


SQL_TOKEN_STATS = """
SELECT lang,
       CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS sum_tokens,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# Document fingerprint — position-weighted codepoint hash (exact int64)
# --------------------------------------------------------------------------

def _fp_col(text: str, a: int, p: int):
    return F.expr(
        f"aggregate(transform(sequence(1, length({text})), i -> "
        f"CAST(ascii(substring({text}, i, 1)) AS BIGINT) * ((i * {a}) % 100000007)), "
        f"CAST(0 AS BIGINT), (acc, v) -> (acc + v) % {p})"
    )


def _fp_sql(text: str, a: int, p: int) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, length({text})), i -> "
        f"CAST(unicode(substr({text}, i, 1)) AS BIGINT) * ((i * {a}) % 100000007))) % {p}"
        f" AS BIGINT)"
    )


def q_doc_fingerprints(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", _fp_col("text", 2654435761, 1000000007).alias("fp")
    )


SQL_DOC_FINGERPRINTS = f"""
SELECT doc_id, {_fp_sql('text', 2654435761, 1000000007)} AS fp
FROM documents
"""

# --------------------------------------------------------------------------
# Dedup + text-analysis + similarity-search suite (operators.dedup,
# functions.text) — training-data pipeline operators with exact oracles
# --------------------------------------------------------------------------

from gotrackmaster_spark.functions.text import (  # noqa: E402
    bpe_token_count_col,
    bpe_token_count_sql,
    lang_pred_col,
    lang_pred_sql,
    quality_score_col,
    quality_score_sql,
)
from gotrackmaster_spark.operators import dedup as D  # noqa: E402
from gotrackmaster_spark.operators.importer import custom_format_sql  # noqa: E402


def q_exact_dup_groups(spark, sf_dir):
    """Exact-dedup summary: corpus has no exact dups, so emit the stats row
    (n_docs, n_distinct, n_dup_groups) — a degenerate-safe oracle check
    that still exercises the md5-groupBy plan."""
    docs = _t(spark, sf_dir, "documents")
    hashed = docs.select(F.md5(F.col("text")).alias("text_md5"))
    groups = hashed.groupBy("text_md5").agg(F.count("*").alias("n"))
    return groups.agg(
        F.sum("n").alias("n_docs"),
        F.count("*").alias("n_distinct"),
        F.count(F.when(F.col("n") > 1, 1)).alias("n_dup_groups"),
    )


SQL_EXACT_DUP_GROUPS = """
WITH groups AS (
  SELECT md5(text) AS text_md5, count(*) AS n FROM documents GROUP BY 1
)
SELECT CAST(sum(n) AS BIGINT) AS n_docs, count(*) AS n_distinct,
       count(CASE WHEN n > 1 THEN 1 END) AS n_dup_groups
FROM groups
"""


_JACCARD_NUM, _JACCARD_DEN = 1, 10


def q_jaccard_pairs(spark, sf_dir):
    return D.jaccard_pairs(
        _t(spark, sf_dir, "documents"), _JACCARD_NUM, _JACCARD_DEN
    )


SQL_JACCARD_PAIRS = D.sql_jaccard_pairs(_JACCARD_NUM, _JACCARD_DEN)


def q_minhash_band_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return D.lsh_candidate_pairs(D.minhash_signatures(docs))


SQL_MINHASH_BAND_PAIRS = D.sql_minhash_band_pairs()


def q_simhash_near_dups(spark, sf_dir):
    return D.simhash_near_dups(_t(spark, sf_dir, "documents"), max_hamming=8)


SQL_SIMHASH_NEAR_DUPS = D.sql_simhash_near_dups(max_hamming=8)


def q_dup_components(spark, sf_dir):
    """Near-dup canonicalization: simhash pair edges → connected
    components (min-label propagation) → per-cluster size keyed by the
    canonical (min-id) root.  The oracle replays the same clustering as
    a recursive-CTE transitive closure over the identical edge set."""
    from gotrackmaster_spark.operators.graph import connected_components

    pairs = q_simhash_near_dups(spark, sf_dir)
    comp = connected_components(pairs, "a_id", "b_id")
    return comp.groupBy(F.col("l").alias("root")).agg(
        F.count("*").alias("n_docs"),
        F.sum("v").alias("id_sum"),
    )


SQL_DUP_COMPONENTS = f"""
WITH RECURSIVE ed AS (
  SELECT a_id AS a, b_id AS b FROM ({SQL_SIMHASH_NEAR_DUPS}) s
  UNION
  SELECT b_id, a_id FROM ({SQL_SIMHASH_NEAR_DUPS}) s
),
nodes AS (SELECT DISTINCT a AS v FROM ed),
reach AS (
  SELECT v, v AS u FROM nodes
  UNION
  SELECT r.v, e.b AS u FROM reach r JOIN ed e ON e.a = r.u
),
comp AS (SELECT v, min(u) AS root FROM reach GROUP BY v)
SELECT root,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(v) AS BIGINT) AS id_sum
FROM comp GROUP BY root
"""


def q_embedding_topk(spark, sf_dir):
    return D.embedding_topk(_t(spark, sf_dir, "embeddings"), k=10, query_mod=50)


SQL_EMBEDDING_TOPK = D.sql_embedding_topk(k=10, query_mod=50)


def q_lang_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_pred_col("text").alias("pred_lang"),
        quality_score_col("text").alias("quality"),
        # long: DuckDB's twin is BIGINT — keep widths identical so any
        # typed-hash driver comparison stays width-proof
        bpe_token_count_col("text").cast("long").alias("bpe_tokens"),
    )


SQL_LANG_QUALITY = f"""
SELECT doc_id,
       {lang_pred_sql('text')} AS pred_lang,
       {quality_score_sql('text')} AS quality,
       {bpe_token_count_sql('text')} AS bpe_tokens
FROM documents
"""

# --------------------------------------------------------------------------
# P1/P2 — first/last valid-position scan per track (distance.go:426-451)
# --------------------------------------------------------------------------

def q_position_start_end(spark, sf_dir):
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir).filter((F.col("lat") != 0) & (F.col("lon") != 0))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    first = (
        pts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        .select("user_id", F.col("lat").alias("start_lat"), F.col("lon").alias("start_lon"))
    )
    last = (
        pts.withColumn("rn", F.row_number().over(wd)).filter(F.col("rn") == 1)
        .select("user_id", F.col("lat").alias("end_lat"), F.col("lon").alias("end_lon"))
    )
    return first.join(last, "user_id")


SQL_POSITION_START_END = f"""
WITH {GEO_CTE},
valid AS (SELECT * FROM geo WHERE lat <> 0 AND lon <> 0),
first AS (
  SELECT user_id, lat AS start_lat, lon AS start_lon FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
    FROM valid) WHERE rn = 1
),
last AS (
  SELECT user_id, lat AS end_lat, lon AS end_lon FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
    FROM valid) WHERE rn = 1
)
SELECT f.user_id, f.start_lat, f.start_lon, l.end_lat, l.end_lon
FROM first f JOIN last l ON f.user_id = l.user_id
"""


# --------------------------------------------------------------------------
# A2-A6 — full track profiles over synthetic walk tracks (kernel pipeline;
# NOT SQL-expressible: sequential data-dependent kernels → rows-only check)
# --------------------------------------------------------------------------

def synthetic_tracks(spark, sf_dir):
    """Random-walk tracks derived from events: per-user cumulative ±100 m
    steps at ~1 min cadence — GPS-plausible speeds so the classification
    ladder produces non-degenerate labels."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    dlat = ((F.col("event_id") * 2654435761) % 201 - 100).cast("double") / 100000.0
    dlon = ((F.col("event_id") * 40503 + 11) % 201 - 100).cast("double") / 100000.0
    base_lat = ((F.col("user_id") * 617) % 120).cast("double") - 60.0
    base_lon = ((F.col("user_id") * 1009) % 300).cast("double") - 150.0
    return (
        ev.select("event_id", "user_id")
        .withColumn("pt_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("lat", base_lat + F.sum(dlat).over(w))
        .withColumn("lon", base_lon + F.sum(dlon).over(w))
        .withColumn("ele", ((F.col("event_id") * 13) % 400).cast("double") + 100.0)
        .withColumn("ts_ns", (F.lit(1700000000) + F.col("user_id") + F.col("pt_idx") * 60) * F.lit(1_000_000_000))
        .withColumn("ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")))
        .withColumn("track_id", F.col("user_id").cast("string"))
        .withColumn("trk_no", F.lit(0))
        .withColumn("seg_no", F.lit(0))
        .select("track_id", "trk_no", "seg_no", "pt_idx", "lat", "lon", "ele", "ts", "ts_ns")
    )


def q_track_profiles(spark, sf_dir):
    from gotrackmaster_spark.operators.quality import track_profiles

    pts = synthetic_tracks(spark, sf_dir)
    return track_profiles(pts).select(
        "track_id", "time_quality", "distance_quality", "srtm_accuracy",
        "quality", "classification", "n_points",
    )

# --------------------------------------------------------------------------
# E7 — image payload: synthesize → encode (raw/png/qnt4) → decode → stats.
# The oracle recomputes decode-derived pixel sums from the closed-form
# pixel generator, cross-checking the whole encode→decode path in SQL.
# --------------------------------------------------------------------------

def q_image_stats(spark, sf_dir):
    from gotrackmaster_spark.operators.images import decode_stats, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=32, h=24)
    return decode_stats(imgs).select(
        "image_id", "fmt", "w", "h", "pixel_sum", "caption_len"
    )


def _img_key_col():
    """img_key parsed from image_id with NO length cap — format_string
    ('img%08d') widens beyond 8 digits at doc_id >= 1e8, so a
    substring(4, 8) would silently truncate at web scale."""
    return F.expr("substring(image_id, 4)").cast("long")


def _img_geotag_cols(img_key):
    """The single source of the image geotag closed form (mirrored by
    every image-query oracle); img_key is a long Column."""
    lat = (img_key * F.lit(2654435761)) % 1600000 / 10000.0 - 80.0
    lon = (img_key * F.lit(40503) + 7) % 3600000 / 10000.0 - 180.0
    return lat, lon


_IMG_W, _IMG_H = 32, 24
_N_PIX = _IMG_W * _IMG_H * 3

_PIX = "((doc_id * 31 + i * 2654435761) % 256)"

SQL_IMAGE_STATS = f"""
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       {_IMG_W} AS w, {_IMG_H} AS h,
       CAST(CASE WHEN doc_id % 3 = 2
            THEN list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                          i -> {_PIX} - ({_PIX}) % 4))
            ELSE list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                          i -> {_PIX}))
       END AS BIGINT) AS pixel_sum,
       CAST(length(text) AS INT) AS caption_len
FROM documents
"""

# --------------------------------------------------------------------------
# North-star E2E fusion — geotagged IMAGE table → decode → degree-tile +
# cell assignment → per-tile aggregate (the "every image is geotagged and
# assigned to tiles" pipeline over the input_hint-shaped table, verified
# end-to-end: the oracle recomputes decode-derived pixel sums from the
# closed-form generator AND the tile/cell assignment from the geotags).
# --------------------------------------------------------------------------

def q_image_tiles(spark, sf_dir):
    from gotrackmaster_spark.operators.images import decode_stats, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    st = decode_stats(imgs).withColumn("img_key", _img_key_col())
    lat, lon = _img_geotag_cols(F.col("img_key"))
    tagged = st.withColumn("tile", tile_name_col(lat, lon, 1.0)).withColumn(
        "cell5", F.shiftright(cell_col(lat, lon, 12), 14)
    )
    return tagged.groupBy("tile").agg(
        F.count("*").alias("n_images"),
        F.sum("pixel_sum").alias("tot_pix"),
        F.countDistinct("cell5").alias("n_cells"),
        F.sum("caption_len").alias("sum_caption"),
    )


SQL_IMAGE_TILES = f"""
WITH per_image AS (
  SELECT doc_id,
         ((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0 AS lat,
         ((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0 AS lon,
         CASE WHEN doc_id % 3 = 2
              THEN list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX} - ({_PIX}) % 4))
              ELSE list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX}))
         END AS pixel_sum,
         length(text) AS caption_len
  FROM documents
),
tagged AS (
  SELECT {tile_name_sql('lat', 'lon', 1.0)} AS tile,
         ({cell_sql('lat', 'lon', 12)} >> 14) AS cell5,
         pixel_sum, caption_len
  FROM per_image
)
SELECT tile, count(*) AS n_images,
       CAST(sum(pixel_sum) AS BIGINT) AS tot_pix,
       count(DISTINCT cell5) AS n_cells,
       CAST(sum(caption_len) AS BIGINT) AS sum_caption
FROM tagged GROUP BY tile
"""


# decoded-stats cache slot with bounded lifetime (policy: caching.py)
_bound_zonal_cache = make_bounded_cache()


def q_zonal_image_stats(spark, sf_dir):
    """E2×E7 — zonal statistics over the IMAGE PAYLOAD: geotagged images
    PIP-joined against the polygon layer, per-polygon pixel/caption
    roll-up.  The pixel sums come from the REAL decode path
    (`decode_stats` over the payload bytes), the join is the broadcast
    packed-covering PIP — binary columns flow through the same spatial
    machinery as points."""
    from gotrackmaster_spark.operators.images import decode_stats, synthesize_images
    from gotrackmaster_spark.operators.spatial import point_in_polygon_join

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    st = decode_stats(imgs).withColumn("img_key", _img_key_col())
    g_lat, g_lon = _img_geotag_cols(F.col("img_key"))
    pts = st.select(
        "image_id", "pixel_sum", "caption_len",
        g_lat.alias("lat"), g_lon.alias("lon"),
    )
    # the PIP union (full-cell branch + boundary-refine branch) references
    # the points subtree twice — cache the DECODED-stats rows (24 B/row,
    # payload bytes already dropped) so the decode chain runs once, with
    # the same bounded-lifetime policy as dedup/images (evict on next call)
    pts = _bound_zonal_cache(pts)
    hits = point_in_polygon_join(pts, rect_polygons(spark, sf_dir), level=7)
    return hits.groupBy("poly_id").agg(
        F.count("*").alias("n_images"),
        F.sum("pixel_sum").alias("tot_pix"),
        F.sum("caption_len").alias("sum_caption"),
    )


SQL_ZONAL_IMAGE_STATS = f"""
WITH per_image AS (
  SELECT doc_id,
         ((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0 AS lat,
         ((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0 AS lon,
         CASE WHEN doc_id % 3 = 2
              THEN list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX} - ({_PIX}) % 4))
              ELSE list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX}))
         END AS pixel_sum,
         length(text) AS caption_len
  FROM documents
),
rects AS ({_RECT_SQL})
SELECT r.poly_id, count(*) AS n_images,
       CAST(sum(g.pixel_sum) AS BIGINT) AS tot_pix,
       CAST(sum(g.caption_len) AS BIGINT) AS sum_caption
FROM per_image g JOIN rects r
  ON g.lat > r.lat0 AND g.lat < r.lat1 AND g.lon > r.lon0 AND g.lon < r.lon1
GROUP BY r.poly_id
"""


# --------------------------------------------------------------------------
# E1b — S2-style cube-face Hilbert cells (functions/s2.py): per level-5
# parent cell, point count + distinct level-8 children + face.  Exercises
# the full chain (face selection, quadratic st, Hilbert walk, trailing-
# marker parent) in both engines; hash equality proves the CTE chain and
# the Column unroll compute the identical curve.
# --------------------------------------------------------------------------

_S2_LEVEL = 8
_S2_UP = 3  # aggregate at level 5


def q_s2_cell_counts(spark, sf_dir):
    from gotrackmaster_spark.functions.s2 import s2_parent, with_s2_cell

    pts = geo_events(spark, sf_dir)
    cells = with_s2_cell(pts, F.col("lat"), F.col("lon"), _S2_LEVEL)
    return (
        cells.withColumn("s2_p", s2_parent(F.col("s2_cell"), _S2_UP))
        .groupBy("s2_p")
        .agg(
            F.count("*").alias("n_pts"),
            F.countDistinct("s2_cell").alias("n_child"),
            F.first(
                F.shiftright("s2_cell", 2 * _S2_LEVEL).bitwiseAND(F.lit(7)).cast("int")
            ).alias("face"),
        )
    )


def _sql_s2_cell_counts() -> str:
    from gotrackmaster_spark.functions.s2 import s2_sql_ctes

    ctes = s2_sql_ctes("lat", "lon", _S2_LEVEL, "geo", "event_id")
    return f"""
WITH {GEO_CTE},
{ctes}
SELECT (s2_cell >> {2 * _S2_UP}) AS s2_p,
       count(*) AS n_pts,
       count(DISTINCT s2_cell) AS n_child,
       CAST(min((s2_cell >> {2 * _S2_LEVEL}) & 7) AS INT) AS face
FROM s2done GROUP BY 1
"""


SQL_S2_CELL_COUNTS = _sql_s2_cell_counts()


# --------------------------------------------------------------------------
# E7 image near-dup — phash banded join over base images + planted variants.
# The variants go through the REAL payload path (decode → bump every 97th
# byte by +8 → re-encode → re-phash); the oracle replays the integer-exact
# 64-bit average-hash (bit k = 64·S_k > ΣS over block luma sums) from the
# closed-form pixel generator for both populations, then brute-forces all
# pairs — so a wrong hash, a wrong band split, or a lost candidate all
# hash-mismatch.
# --------------------------------------------------------------------------

_PH_EVERY = 5  # every 5th image gets a planted near-dup variant
_PH_MAXHAM = 10


def q_phash_near_dups(spark, sf_dir):
    from gotrackmaster_spark.operators.images import (
        phash_near_dups,
        synthesize_image_variants,
        synthesize_images,
    )

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    cols = ["img_key", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    both = imgs.select(*cols).unionByName(
        synthesize_image_variants(imgs, every=_PH_EVERY)
    )
    return phash_near_dups(both, max_hamming=_PH_MAXHAM)


def _phash_bs_sql(pix: str) -> str:
    """DuckDB expression for the 64 block luma sums of the integer-exact
    average-hash, given a pixel expression ``pix`` in terms of lambda var
    ``f`` (flat byte index) and the outer column ``doc_id``.  Mirrors
    images.phash64_batch: luma = (299R+587G+114B)//1000 over an 8×8 block
    grid (blocks are h/8×w/8 strips)."""
    h8, w8 = _IMG_H // 8, _IMG_W // 8  # 3 x 4 pixels per block
    y = f"((k // 8) * {h8} + (t // {w8}))"
    x = f"((k % 8) * {w8} + (t % {w8}))"
    f0 = f"(3 * (({y}) * {_IMG_W} + ({x})))"
    luma = (
        f"((299 * ({pix.replace('{f}', f0)}) "
        f"+ 587 * ({pix.replace('{f}', f'({f0} + 1)')}) "
        f"+ 114 * ({pix.replace('{f}', f'({f0} + 2)')})) // 1000)"
    )
    return (
        f"list_transform(generate_series(0, 63), k -> "
        f"list_sum(list_transform(generate_series(0, {h8 * w8 - 1}), t -> {luma})))"
    )


# phash from the 64 block sums: bit k set iff 64·S_k > ΣS; bit 63 carries
# the int64 sign (numpy's 1<<63 weight wraps signed — replayed exactly)
_PHASH_FROM_BS = (
    "CAST(CASE WHEN 64 * bs[64] > tot THEN -9223372036854775807 - 1 ELSE 0 END "
    "+ list_sum(list_transform(generate_series(1, 63), k -> "
    "CASE WHEN 64 * bs[k] > tot THEN (CAST(1 AS BIGINT) << (k - 1)) ELSE 0 END)) "
    "AS BIGINT)"
)


# decoded pixel at flat index {f}: generator, then qnt4 quantization
_PIX_F = "((doc_id * 31 + ({f}) * 2654435761) % 256)"
_PIX_DEC = (
    f"(CASE WHEN doc_id % 3 = 2 THEN {_PIX_F} - ({_PIX_F}) % 4 ELSE {_PIX_F} END)"
)
# base phash is over the ORIGINAL (pre-encode) pixels, variant phash over
# the decoded-then-bumped pixels — exactly what the Spark path computes
_PIX_VAR = f"(CASE WHEN ({{f}}) % 97 = 0 THEN ({_PIX_DEC} + 8) % 256 ELSE {_PIX_DEC} END)"

SQL_PHASH_NEAR_DUPS = f"""
WITH base_bs AS (
  SELECT doc_id, {_phash_bs_sql(_PIX_F)} AS bs FROM documents
),
var_bs AS (
  SELECT doc_id, {_phash_bs_sql(_PIX_VAR)} AS bs
  FROM documents WHERE doc_id % {_PH_EVERY} = 0
),
base AS (
  SELECT format('img{{:08d}}', doc_id) AS image_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, bs, list_sum(bs) AS tot FROM base_bs)
),
vars AS (
  SELECT format('var{{:08d}}', doc_id) AS image_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, bs, list_sum(bs) AS tot FROM var_bs)
),
all_imgs AS (SELECT * FROM base UNION ALL SELECT * FROM vars)
SELECT a.image_id AS a_id, b.image_id AS b_id,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM all_imgs a JOIN all_imgs b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {_PH_MAXHAM}
"""


# cluster radius is TIGHTER than pair-detection radius (standard dedup
# practice): at the detection radius the random-pair tail chains clusters
# into >50-diameter paths; ≤4 keeps the planted variants (median planted
# hamming = 1) and converges in diameter rounds
_CLUSTER_MAXHAM = 4


def q_image_dup_components(spark, sf_dir):
    """Image near-dup canonicalization: phash chunk-join pairs →
    connected components → per-cluster roll-up keyed by the canonical
    image.  The keep-best rank is (resolution desc, image_id asc); the
    synthetic corpus is single-resolution so it collapses to min id,
    which lands every planted variant ("varNNNNNNNN") on its base
    ("imgNNNNNNNN" sorts first).  Oracle replays the identical edge set
    (full phash pipeline) through a recursive-CTE transitive closure."""
    from gotrackmaster_spark.operators.graph import connected_components

    pairs = (
        q_phash_near_dups(spark, sf_dir)
        .filter(F.col("hamming") <= _CLUSTER_MAXHAM)
        .select("a_id", "b_id")
    )
    comp = connected_components(pairs, "a_id", "b_id")
    return comp.groupBy(F.col("l").alias("canonical")).agg(
        F.count("*").alias("n_images"),
        F.max("v").alias("max_id"),
    )


# concatenated (not an f-string): SQL_PHASH_NEAR_DUPS carries literal
# format() braces that a second f-string pass would mangle
SQL_IMAGE_DUP_COMPONENTS = (
    """
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT a_id, b_id FROM ("""
    + SQL_PHASH_NEAR_DUPS
    + """) p WHERE p.hamming <= """ + str(_CLUSTER_MAXHAM) + """
),
ed AS (
  SELECT a_id AS a, b_id AS b FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT a AS v FROM ed),
reach AS (
  SELECT v, v AS u FROM nodes
  UNION
  SELECT r.v, e.b AS u FROM reach r JOIN ed e ON e.a = r.u
),
comp AS (SELECT v, min(u) AS root FROM reach GROUP BY v)
SELECT root AS canonical,
       CAST(count(*) AS BIGINT) AS n_images,
       max(v) AS max_id
FROM comp GROUP BY root
"""
)


# --------------------------------------------------------------------------
# P6 + T2/T3 + S7 — import plan: path templating over the corner-tile
# fan-out with first-wins duplicate suppression (cmd/import.go)
# --------------------------------------------------------------------------

_DIR_FMT = "{year}/{month}/{degree1}"
_ARC_FMT = "{original}_{creator}_q{quality}_{degree0.5}"

_KINDS = ["Cycling Sport", "Running Mountain", "Walking Transport", "Motor Sport"]


def q_import_paths(spark, sf_dir):
    from gotrackmaster_spark.operators.importer import import_plan

    pts = geo_events(spark, sf_dir)
    s = pts.groupBy("user_id").agg(
        F.min(F.col("ts").cast("timestamp")).alias("start_ts"),
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
        F.min("lon").alias("min_lon"),
        F.max("lon").alias("max_lon"),
    )
    kinds = F.array(*[F.lit(k) for k in _KINDS])
    raw = F.element_at(
        F.array(*[F.lit(c) for c in _RAW_CREATORS]),
        (F.col("user_id") % len(_RAW_CREATORS) + 1).cast("int"),
    )
    summaries = s.select(
        F.col("user_id").cast("string").alias("track_id"),
        F.col("user_id").cast("int").alias("file_rank"),
        "start_ts", "min_lat", "max_lat", "min_lon", "max_lon",
        creator_ladder_col(raw).alias("creator"),
        ((F.col("user_id") * 37) % 101).alias("quality"),
        F.concat(F.lit("trk"), F.col("user_id")).alias("original"),
        F.element_at(kinds, (F.col("user_id") % 4 + 1).cast("int")).alias("kind"),
    )
    plan = import_plan(summaries, _DIR_FMT, _ARC_FMT)
    return plan.select("track_id", "directory", "archive")


def _sql_corner_tiles(degree: float, alias: str) -> str:
    """Unpivot of the T2 ordered-dedup corner tiles as rows (set-equal to
    the Column version's array)."""
    lat1 = lat_tile_sql("min_lat", degree)
    lon1 = lon_tile_sql("min_lon", degree)
    lat2 = lat_tile_sql("max_lat", degree)
    lon2 = lon_tile_sql("max_lon", degree)
    return f"""
  SELECT user_id, {lat1} || {lon1} AS {alias} FROM b
  UNION
  SELECT user_id, CASE WHEN {lon1} <> {lon2} THEN {lat1} || {lon2} END FROM b
  UNION
  SELECT user_id, CASE WHEN {lat1} <> {lat2} THEN {lat2} || {lon1} END FROM b
  UNION
  SELECT user_id, CASE WHEN {lat1} <> {lat2} AND {lon1} <> {lon2} THEN {lat2} || {lon2} END FROM b
"""


SQL_IMPORT_PATHS = f"""
WITH {GEO_CTE},
b AS (
  SELECT user_id, min(ts) AS start_ts,
         min(lat) AS min_lat, max(lat) AS max_lat,
         min(lon) AS min_lon, max(lon) AS max_lon
  FROM geo GROUP BY user_id
),
d1 AS (SELECT * FROM ({_sql_corner_tiles(1.0, 'deg1')}) WHERE deg1 IS NOT NULL),
d5 AS (SELECT * FROM ({_sql_corner_tiles(0.5, 'deg5')}) WHERE deg5 IS NOT NULL),
summ AS (
  SELECT b.user_id, CAST(b.user_id AS VARCHAR) AS track_id, b.start_ts,
         {creator_ladder_sql(_raw_creator_sql().replace('event_id', 'b.user_id'))} AS creator,
         (b.user_id * 37) % 101 AS quality,
         'trk' || CAST(b.user_id AS VARCHAR) AS original,
         ['{_KINDS[0]}', '{_KINDS[1]}', '{_KINDS[2]}', '{_KINDS[3]}'][CAST(b.user_id % 4 AS INT) + 1] AS kind
  FROM b
),
fan AS (
  SELECT s.*, d1.deg1, d5.deg5
  FROM summ s JOIN d1 ON s.user_id = d1.user_id JOIN d5 ON s.user_id = d5.user_id
),
plan AS (
  SELECT track_id, user_id AS file_rank,
    {custom_format_sql(_DIR_FMT, {
        'year': 'year(start_ts)',
        'month': "printf('%02d', month(start_ts))",
        'degree1': 'deg1',
    })} AS directory,
    {custom_format_sql(_ARC_FMT, {
        'original': 'original',
        'creator': 'creator',
        'quality': 'quality',
        'degree0.5': 'deg5',
    })} AS archive
  FROM fan
),
dedup AS (
  SELECT track_id, directory, archive,
         row_number() OVER (PARTITION BY directory, archive ORDER BY file_rank, track_id) AS rn
  FROM plan
)
SELECT track_id, directory, archive FROM dedup WHERE rn = 1
"""

# --------------------------------------------------------------------------
# W12/W13 + P3 + P7 — scalar operator pack (round/middle/abs elevation,
# time-validity predicate, geo-name cleanup) over the geotagged points
# --------------------------------------------------------------------------

def q_scalar_ops(spark, sf_dir):
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    ele2 = F.col("ele") / 7.0
    next_ele = F.lead(ele2).over(w)
    name_raw = F.concat(
        F.lit(" Trk/"), F.col("event_id").cast("string"), F.lit(":a\\b.c ")
    )
    return pts.select(
        "event_id",
        # W12 RoundElevation (elevation.go:67-75; Go math.Round = half away
        # from zero = Spark HALF_UP)
        F.round(ele2, 2).alias("ele_round"),
        # W13 MiddleElevation (elevation.go:121-123): pt + (w - pt)/2
        (next_ele + (ele2 - next_ele) / 2).alias("ele_middle"),
        # W13 ElevationAbs (elevation.go:117-119)
        F.abs(ele2 - next_ele).alias("ele_abs"),
        # P3 timeValid with `now` parameter (time.go:161-163)
        (
            (F.unix_micros(F.col("ts").cast("timestamp")) > _Y2K_US)
            & (F.unix_micros(F.col("ts").cast("timestamp")) < _NOW_US)
        ).alias("time_valid"),
        # P7 geoNameCleanup (misc.go:272-275): trim then replace / : \ . → _
        F.regexp_replace(F.trim(name_raw), r"[/:\\.]", "_").alias("clean_name"),
    )


SQL_SCALAR_OPS = f"""
WITH {GEO_CTE},
t AS (
  SELECT event_id, user_id, ele / 7.0 AS ele2,
         lead(ele / 7.0) OVER (PARTITION BY user_id ORDER BY event_id) AS next_ele,
         ts,
         ' Trk/' || CAST(event_id AS VARCHAR) || ':a\\b.c ' AS name_raw
  FROM geo
)
SELECT event_id,
       round(ele2, 2) AS ele_round,
       next_ele + (ele2 - next_ele) / 2 AS ele_middle,
       abs(ele2 - next_ele) AS ele_abs,
       (epoch_us(ts) > {_Y2K_US} AND epoch_us(ts) < {_NOW_US}) AS time_valid,
       regexp_replace(trim(name_raw), '[/:\\\\.]', '_', 'g') AS clean_name
FROM t
"""

# --------------------------------------------------------------------------
# S6/J3 + W14 — timezone localization: PIP join against a tz polygon layer
# (lon-band rectangles standing in for tzf's embedded polygons), shift to
# local wall-clock and STRIP the zone (UpdateGPSDateTime, time.go:165-187:
# `t.In(loc)` then re-parse without zone — replicated as epoch arithmetic)
# --------------------------------------------------------------------------

def tz_band_polygons(spark):
    """24 lon-band tz 'polygons': band k covers [k*15-187.5, k*15-172.5)°
    → UTC offset hours = k - 12 (nautical timezones); full rings so the
    generic E2 machinery runs, not a special case."""
    base = spark.range(24).select(F.col("id").cast("int").alias("band"))
    lon0 = F.col("band") * 15.0 - 187.5
    lon1 = lon0 + 15.0
    ring = F.array(
        F.struct(F.lit(-90.0).alias("lat"), lon0.alias("lon")),
        F.struct(F.lit(-90.0).alias("lat"), lon1.alias("lon")),
        F.struct(F.lit(90.0).alias("lat"), lon1.alias("lon")),
        F.struct(F.lit(90.0).alias("lat"), lon0.alias("lon")),
    )
    return base.select(
        F.col("band").cast("string").alias("poly_id"),
        ring.alias("ring"),
        (F.col("band") - 12).alias("utc_offset_h"),
    )


def q_tz_localized(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import point_in_polygon_join

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon", "ts")
    tz = tz_band_polygons(spark)
    joined = point_in_polygon_join(
        pts, tz.select("poly_id", "ring"), level=5
    ).join(F.broadcast(tz.select("poly_id", "utc_offset_h")), "poly_id")
    # local wall-clock with zone stripped == epoch + offset, rendered naive
    local_us = F.unix_micros(F.col("ts").cast("timestamp")) + F.col(
        "utc_offset_h"
    ).cast("long") * F.lit(3_600_000_000)
    return joined.select(
        "event_id",
        F.col("utc_offset_h").cast("int").alias("utc_offset_h"),
        F.date_format(
            F.timestamp_micros(local_us), "yyyy-MM-dd HH:mm:ss"
        ).alias("local_wall_clock"),
    )


SQL_TZ_LOCALIZED = f"""
WITH {GEO_CTE},
t AS (
  SELECT event_id, ts,
         CAST(floor((lon + 187.5) / 15.0) AS INT) AS band
  FROM geo
)
SELECT event_id, band - 12 AS utc_offset_h,
       strftime(make_timestamp(epoch_us(ts) + CAST(band - 12 AS BIGINT) * 3600000000),
                '%Y-%m-%d %H:%M:%S') AS local_wall_clock
FROM t
WHERE band <= 23
"""

# --------------------------------------------------------------------------
# A7 — fix counters (FixTimesTrack return value; kernel-sequential so
# rows-only check, parity pinned by tests/test_fixture_parity.py's 39-fix
# golden value on the carlos fixture)
# --------------------------------------------------------------------------

def q_fix_counters(spark, sf_dir):
    from gotrackmaster_spark.operators.repair import count_time_fixes

    pts = synthetic_tracks(spark, sf_dir)
    return count_time_fixes(pts)

# --------------------------------------------------------------------------
# embedding-cosine near-dup pairs (dedup suite completion)
# --------------------------------------------------------------------------

def q_embedding_neardup(spark, sf_dir):
    """Banded hyperplane-LSH near-dup pairs (candidate equi-join + exact
    cosine verify); the oracle replays the identical deterministic
    algorithm in DuckDB.  Recall vs brute force is measured in
    tests/test_dedup_text.py."""
    return D.embedding_near_dups(_t(spark, sf_dir, "embeddings"), threshold=0.4)


SQL_EMBEDDING_NEARDUP = D.sql_embedding_near_dups(0.4)


def q_embedding_ivf_topk(spark, sf_dir):
    """FAISS-style IVF ANN: exact-int64 nearest-centroid assignment, nprobe
    probe lists per query, exact cosine rerank — the second scale path for
    similarity search next to the hyperplane LSH variant."""
    return D.embedding_ivf_topk(_t(spark, sf_dir, "embeddings"), k=10, query_mod=50)


SQL_EMBEDDING_IVF_TOPK = D.sql_embedding_ivf_topk(k=10, query_mod=50)


def q_embedding_lsh_topk(spark, sf_dir):
    """Bucketed ANN top-k (single-table hyperplane LSH, exact in-bucket
    rerank) — the scale path for similarity search, oracle-replayed
    deterministically thanks to integer-exact buckets."""
    return D.embedding_lsh_topk(_t(spark, sf_dir, "embeddings"), k=10, query_mod=50)


SQL_EMBEDDING_LSH_TOPK = D.sql_embedding_lsh_topk(k=10, query_mod=50)


# --------------------------------------------------------------------------
# E8 — circle-range join: events within a fixed haversine radius of a POI
# set, via broadcast cell-covering candidates + codegen haversine refine
# (operators/spatial.py::within_radius_join).  The oracle is the O(N·M)
# brute force — any covering/prune bug hash-mismatches here.
# --------------------------------------------------------------------------

_POI_N = 40
_POI_RADIUS_M = 300000.0


def poi_centers(spark) -> DataFrame:
    """Deterministic synthetic POI set (integer arithmetic, SQL-mirrored)."""
    return spark.range(_POI_N).select(
        F.col("id").alias("poi_id"),
        (((F.col("id") * 7919) % 1500) / 10.0 - 75.0).alias("lat"),
        (((F.col("id") * 104729) % 3600) / 10.0 - 180.0).alias("lon"),
    )


def q_radius_join(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import within_radius_join

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon")
    hits = within_radius_join(
        pts, poi_centers(spark), _POI_RADIUS_M, level=7, id_col="poi_id"
    )
    return hits.groupBy("poi_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.min("dist_m"), 2).alias("min_dist_r"),
        F.sum("event_id").alias("sum_event_id"),
    )


_POI_DIST = haversine_sql("p.lat", "p.lon", "g.lat", "g.lon")

SQL_RADIUS_JOIN = f"""
WITH {GEO_CTE},
poi AS (
  SELECT i AS poi_id,
         ((i * 7919) % 1500) / 10.0 - 75.0 AS lat,
         ((i * 104729) % 3600) / 10.0 - 180.0 AS lon
  FROM range({_POI_N}) t(i)
)
SELECT p.poi_id, count(*) AS n_events,
       round(min({_POI_DIST}), 2) AS min_dist_r,
       CAST(sum(g.event_id) AS BIGINT) AS sum_event_id
FROM geo g JOIN poi p ON {_POI_DIST} < {_POI_RADIUS_M!r}
GROUP BY p.poi_id
"""


# --------------------------------------------------------------------------
# E2×E4 — zonal statistics: bilinear DEM elevation aggregated per polygon
# (the PIP join feeding the raster join — raster↔vector composability).
# --------------------------------------------------------------------------

def q_zonal_stats(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import (
        bilinear_dem_join,
        point_in_polygon_join,
    )

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon")
    hits = point_in_polygon_join(pts, rect_polygons(spark, sf_dir), level=7)
    j = bilinear_dem_join(hits, synthetic_dem(spark))
    return j.groupBy("poly_id").agg(
        F.count("*").alias("n_points"),
        F.round(F.avg("dem_ele"), 4).alias("avg_ele"),
        F.round(F.min("dem_ele"), 4).alias("min_ele"),
        F.round(F.max("dem_ele"), 4).alias("max_ele"),
    )


SQL_ZONAL_STATS = f"""
WITH {GEO_CTE},
rects AS ({_RECT_SQL}),
hit AS (
  SELECT r.poly_id, g.lat, g.lon,
         CAST(floor(g.lat) AS BIGINT) AS la, CAST(floor(g.lon) AS BIGINT) AS lo
  FROM geo g JOIN rects r
    ON g.lat > r.lat0 AND g.lat < r.lat1 AND g.lon > r.lon0 AND g.lon < r.lon1
),
interp AS (
  SELECT poly_id,
    ({_dem_corner_sql('la', 'lo')}) * (1 - (lat - la)) * (1 - (lon - lo))
    + ({_dem_corner_sql('la', 'lo + 1')}) * (1 - (lat - la)) * (lon - lo)
    + ({_dem_corner_sql('la + 1', 'lo')}) * (lat - la) * (1 - (lon - lo))
    + ({_dem_corner_sql('la + 1', 'lo + 1')}) * (lat - la) * (lon - lo) AS dem_ele
  FROM hit
)
SELECT poly_id, count(*) AS n_points,
       round(avg(dem_ele), 4) AS avg_ele,
       round(min(dem_ele), 4) AS min_ele,
       round(max(dem_ele), 4) AS max_ele
FROM interp GROUP BY poly_id
"""


# --------------------------------------------------------------------------
# Training-data QC — Gopher/FineWeb-style repetition metrics, corpus
# heavy-hitters, and the filter funnel.  All metrics are integer-exact
# (counts + integer-ratio comparisons) so the oracle hash-matches by
# construction; plans are explode → two-stage partial agg, fully
# distributed (the only shuffles are on (doc_id, token) then doc_id).
# --------------------------------------------------------------------------

def _per_doc_token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_tok, max_tf, n_types) via token-frequency agg."""
    toks = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "source", "tok").agg(F.count("*").alias("c"))
    return tf.groupBy("doc_id", "source").agg(
        F.sum("c").alias("n_tok"),
        F.max("c").alias("max_tf"),
        F.count("*").alias("n_types"),
    )


_SQL_PER_DOC = """
tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, source, tok, count(*) AS c FROM tok GROUP BY 1, 2, 3),
per_doc AS (
  SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS n_tok,
         max(c) AS max_tf, count(*) AS n_types
  FROM tf GROUP BY 1, 2
)
"""


def q_repetition_stats(spark, sf_dir):
    """Per-source repetition profile: top-token mass, type counts,
    duplicate-bigram counts, and the Gopher-style repetitive-doc counter
    (top token >= 10% of the doc)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    per_doc = _per_doc_token_stats(docs)
    ptoks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bgs = (
        ptoks.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bg"))
    )
    per_doc_bg = (
        bgs.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.sum("c") - F.count("*")).alias("dup_bigrams"))
    )
    joined = per_doc.join(per_doc_bg, "doc_id", "left").fillna(
        {"dup_bigrams": 0}
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("max_tf").alias("sum_max_tf"),
        F.sum("n_types").alias("sum_types"),
        F.sum("dup_bigrams").alias("sum_dup_bigrams"),
        F.sum(
            F.when(F.col("max_tf") * 10 >= F.col("n_tok"), 1).otherwise(0)
        ).alias("n_repetitive"),
    )


SQL_REPETITION_STATS = f"""
WITH {_SQL_PER_DOC},
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(l) - 1),
                               i -> l[i] || ' ' || l[i + 1])) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
),
bgf AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
per_doc_bg AS (
  SELECT doc_id, CAST(sum(c) - count(*) AS BIGINT) AS dup_bigrams
  FROM bgf GROUP BY doc_id
)
SELECT p.source, count(*) AS n_docs,
       CAST(sum(p.max_tf) AS BIGINT) AS sum_max_tf,
       CAST(sum(p.n_types) AS BIGINT) AS sum_types,
       CAST(sum(coalesce(b.dup_bigrams, 0)) AS BIGINT) AS sum_dup_bigrams,
       CAST(sum(CASE WHEN p.max_tf * 10 >= p.n_tok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitive
FROM per_doc p LEFT JOIN per_doc_bg b USING (doc_id)
GROUP BY p.source
"""


def q_heavy_hitters(spark, sf_dir):
    """Corpus top-20 tokens (total order: count desc, token asc).  Scale
    path: partial map-side agg collapses each partition to its vocabulary
    before the single shuffle; for open vocabularies at 100 TB swap the
    exact agg for a count-min sketch + candidate re-count — the exact
    form here doubles as that pipeline's verifier."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.col("tok"))
        .limit(20)
    )


SQL_HEAVY_HITTERS = """
SELECT tok, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok ORDER BY n DESC, tok LIMIT 20
"""


def q_filter_funnel(spark, sf_dir):
    """Training-data filter funnel: first-failing-rule attribution per
    (source, reason) — the keep/drop accounting a corpus-curation pipeline
    reports per shard."""
    per_doc = _per_doc_token_stats(_t(spark, sf_dir, "documents"))
    reason = (
        F.when(F.col("n_tok") < 20, F.lit("too_short"))
        .when(F.col("n_tok") > 90, F.lit("too_long"))
        .when(F.col("max_tf") * 10 >= F.col("n_tok"), F.lit("repetitive"))
        .when(F.col("n_types") * 3 < F.col("n_tok"), F.lit("low_diversity"))
        .otherwise(F.lit("keep"))
    )
    return (
        per_doc.withColumn("reason", reason)
        .groupBy("source", "reason")
        .agg(F.count("*").alias("n_docs"))
    )


SQL_FILTER_FUNNEL = f"""
WITH {_SQL_PER_DOC}
SELECT source,
       CASE WHEN n_tok < 20 THEN 'too_short'
            WHEN n_tok > 90 THEN 'too_long'
            WHEN max_tf * 10 >= n_tok THEN 'repetitive'
            WHEN n_types * 3 < n_tok THEN 'low_diversity'
            ELSE 'keep' END AS reason,
       count(*) AS n_docs
FROM per_doc GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Time-series operators — as-of join (verified by DuckDB's native ASOF
# LEFT JOIN) and gap sessionization (operators/timeseries.py).
# --------------------------------------------------------------------------

def q_asof_state(spark, sf_dir):
    """Each event joined to the latest 'checkpoint' (every 20th event's
    value, deduped per (user, ts)) at or before it — ASOF LEFT semantics."""
    from gotrackmaster_spark.operators.timeseries import as_of_join

    ev = _t(spark, sf_dir, "events")
    chk = (
        ev.where(F.col("event_id") % 20 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("state_value"))
    )
    left = ev.select("event_id", "user_id", "ts")
    out = as_of_join(left, chk, key="user_id", ts_col="ts", value_cols=["state_value"])
    return out.select("event_id", "user_id", "state_value")


SQL_ASOF_STATE = """
WITH chk AS (
  SELECT user_id, ts, max(value) AS state_value
  FROM events WHERE event_id % 20 = 0 GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, chk.state_value
FROM events e ASOF LEFT JOIN chk
  ON e.user_id = chk.user_id AND e.ts >= chk.ts
"""


_SESSION_GAP_US = 43_200_000_000  # 12 h


def q_sessionized(spark, sf_dir):
    """Gap-based sessionization (12 h) + per-session aggregates."""
    from gotrackmaster_spark.operators.timeseries import sessionize

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    s = sessionize(ev, key="user_id", ts_col="ts", gap_us=_SESSION_GAP_US,
                   order_tiebreak="event_id")
    return s.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        F.round(F.sum("value"), 4).alias("sum_value_r"),
    )


SQL_SESSIONIZED = f"""
WITH o AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS tus,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
s AS (
  SELECT user_id, event_id, value,
         CAST(sum(CASE WHEN prev IS NULL OR tus - prev > {_SESSION_GAP_US}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY tus, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_no
  FROM o
)
SELECT user_id, session_no, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event,
       round(sum(value), 4) AS sum_value_r
FROM s GROUP BY 1, 2
"""


def q_value_percentiles(spark, sf_dir):
    """Exact rank-selected p50/p90 per event type (row_number selection —
    identical integer index formula in both engines, so the picked values
    are bit-equal; no interpolation).  Scale: one shuffle on event_type;
    for high-cardinality keys the same selection runs after a
    repartitionByRange on (key, value)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.max(F.when(F.expr("rn = (n + 1) div 2"), F.col("value"))).alias("p50"),
        F.max(F.when(F.expr("rn = (9 * n + 9) div 10"), F.col("value"))).alias("p90"),
    )


SQL_VALUE_PERCENTILES = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, max(n) AS n_events,
       max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
       max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90
FROM ranked GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Count-min sketch (functions/sketch.py) — deterministic bounded-memory
# heavy-hitter estimates, probed at the exact top-20 tokens.  est_n >= n
# always (CMS over-counts); both engines build the identical grid.
# --------------------------------------------------------------------------

def q_cms_estimates(spark, sf_dir):
    from gotrackmaster_spark.functions.sketch import cms_build, cms_estimate

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    cms = cms_build(toks)
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.col("tok"))
        .limit(20)
    )
    return cms_estimate(cms, top)


def _sql_cms_estimates() -> str:
    from gotrackmaster_spark.functions.sketch import cms_sql

    tok_src = "SELECT unnest(string_split(text, ' ')) AS tok FROM documents"
    probe_src = (
        f"SELECT tok, count(*) AS exact_n FROM ({tok_src}) "
        "GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 20"
    )
    return f"WITH {cms_sql(tok_src, probe_src)} SELECT * FROM est"


SQL_CMS_ESTIMATES = _sql_cms_estimates()


# --------------------------------------------------------------------------
# KMV distinct-count sketch (functions/sketch.py) — bounded-memory
# per-group cardinality from the k smallest distinct hashes, estimator
# (k−1)·P // h_(k) (INTEGER division → bit-exact across engines), exact
# distinct carried alongside so accuracy is visible in the result.
# --------------------------------------------------------------------------

_BIGRAM_EXPR = (
    "CASE WHEN size(a) < 2 THEN array() "
    "ELSE transform(sequence(1, size(a) - 1), "
    "i -> concat(element_at(a, i), ' ', element_at(a, i + 1))) END"
)


def q_distinct_sketch(spark, sf_dir):
    """Per-language bigram-vocabulary cardinality via the KMV sketch
    (~900 distinct bigrams per lang at sf0.01 — well above k=64, so the
    (k−1)·P//h_(k) estimator path is what the oracle checks), with the
    exact distinct count alongside."""
    from gotrackmaster_spark.functions.sketch import (
        KMV_K,
        kmv_distinct,
        kmv_hash_expr,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.split("text", " ").alias("a")
    ).select("lang", F.explode(F.expr(_BIGRAM_EXPR)).alias("tok"))
    items = toks.withColumn("h", F.expr(kmv_hash_expr("tok")))
    sk = kmv_distinct(items, "lang", "h", k=KMV_K)
    exact = toks.groupBy("lang").agg(F.countDistinct("tok").alias("n_exact"))
    return sk.join(exact, "lang").select("lang", "est_distinct", "n_exact")


def _sql_distinct_sketch() -> str:
    from gotrackmaster_spark.functions.sketch import KMV_K, P, kmv_hash_sql

    return f"""
WITH arrs AS (SELECT lang, string_split(text, ' ') AS a FROM documents),
toks AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, len(a) - 1),
                               i -> a[i] || ' ' || a[i + 1])) AS tok
  FROM arrs
),
hs AS (SELECT DISTINCT lang, {kmv_hash_sql('tok')} AS h FROM toks),
ranked AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM hs
),
topk AS (SELECT * FROM ranked WHERE rn <= {KMV_K}),
agg AS (
  SELECT lang, count(*) AS n_h,
         max(CASE WHEN rn = {KMV_K} THEN h END) AS hk
  FROM topk GROUP BY lang
),
ex AS (SELECT lang, count(DISTINCT tok) AS n_exact FROM toks GROUP BY lang)
SELECT a.lang,
       CAST(CASE WHEN a.hk IS NULL THEN a.n_h
                 ELSE {(KMV_K - 1) * P} // a.hk END AS BIGINT) AS est_distinct,
       CAST(e.n_exact AS BIGINT) AS n_exact
FROM agg a JOIN ex e ON a.lang = e.lang
"""


SQL_DISTINCT_SKETCH = _sql_distinct_sketch()


# --------------------------------------------------------------------------
# Deterministic stratified sample (operators/sampling.py) — hash-order
# bottom-n per group: the sample is a pure function of the data, identical
# across partitionings, cluster sizes and engines (unlike rand()-based
# sampling).  The oracle draws the SAME n docs per language.
# --------------------------------------------------------------------------

_SAMPLE_N = 10


def q_stratified_sample(spark, sf_dir):
    from gotrackmaster_spark.functions.sketch import kmv_hash_expr
    from gotrackmaster_spark.operators.sampling import bottom_n_sample

    docs = _t(spark, sf_dir, "documents")
    items = docs.select(
        "lang",
        "doc_id",
        F.expr(kmv_hash_expr("CAST(doc_id AS STRING)")).alias("h"),
    )
    samp = bottom_n_sample(items, "lang", "h", "doc_id", n=_SAMPLE_N)
    return samp.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.sum("doc_id").alias("id_sum"),
        F.min("doc_id").alias("id_min"),
        F.max("doc_id").alias("id_max"),
    )


def _sql_stratified_sample() -> str:
    from gotrackmaster_spark.functions.sketch import kmv_hash_sql

    return f"""
WITH hs AS (
  SELECT lang, doc_id, {kmv_hash_sql("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
  FROM hs
),
samp AS (SELECT lang, doc_id FROM ranked WHERE rn <= {_SAMPLE_N})
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(min(doc_id) AS BIGINT) AS id_min,
       CAST(max(doc_id) AS BIGINT) AS id_max
FROM samp GROUP BY lang
"""


SQL_STRATIFIED_SAMPLE = _sql_stratified_sample()


# --------------------------------------------------------------------------
# Temporal interval join (operators/timeseries.py::interval_join) — the
# time analogue of the E8 circle-range join: bucketed candidates (pure
# codegen), broadcast interval side, exact half-open refine.  Intervals
# synthesized from `nation` keys over the events' January-2024 span;
# oracle = brute-force inequality join.
# --------------------------------------------------------------------------

_IV_EPOCH = 1704067200          # 2024-01-01T00:00:00Z
_IV_STEP_S = 90000              # 25 h between interval starts
_IV_UNIT_US = 25_200_000_000    # 7 h duration unit
_IV_BUCKET_S = 6 * 3600


def q_interval_events(spark, sf_dir):
    from gotrackmaster_spark.operators.timeseries import interval_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    nat = _t(spark, sf_dir, "nation")
    nk = F.col("n_nationkey").cast("long")
    iv = nat.select(
        nk.alias("iv_id"),
        ((F.lit(_IV_EPOCH) + nk * _IV_STEP_S) * F.lit(1_000_000)).alias("t0_us"),
    ).withColumn(
        "t1_us",
        F.col("t0_us") + (F.col("iv_id") % 5 + 1) * F.lit(_IV_UNIT_US),
    )
    j = interval_join(ev, iv, _IV_BUCKET_S, ts_col="ts_us")
    return j.groupBy("iv_id").agg(
        F.count("*").alias("n_events"),
        F.sum("event_id").alias("ev_sum"),
    )


SQL_INTERVAL_EVENTS = f"""
WITH iv AS (
  SELECT CAST(n_nationkey AS BIGINT) AS iv_id,
         ({_IV_EPOCH} + CAST(n_nationkey AS BIGINT) * {_IV_STEP_S}) * 1000000 AS t0_us
  FROM nation
),
iv2 AS (
  SELECT iv_id, t0_us, t0_us + (iv_id % 5 + 1) * {_IV_UNIT_US} AS t1_us FROM iv
),
ev AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events)
SELECT i.iv_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(e.event_id) AS BIGINT) AS ev_sum
FROM iv2 i JOIN ev e ON i.t0_us <= e.ts_us AND e.ts_us < i.t1_us
GROUP BY i.iv_id
"""


# --------------------------------------------------------------------------
# E4 — tile-pyramid rollup: base mercator-tile counts rolled up z8 → z4
# (functions/tiles.py::tile_pyramid; exact via the nested-floor identity).
# --------------------------------------------------------------------------

_PYR_BASE_Z = 8
_PYR_MIN_Z = 4


def q_tile_pyramid(spark, sf_dir):
    from gotrackmaster_spark.functions.tiles import tile_pyramid

    tx, ty = mercator_tile_cols(F.col("lat"), F.col("lon"), _PYR_BASE_Z)
    base = (
        geo_events(spark, sf_dir)
        .select(tx.alias("tx"), ty.alias("ty"))
        .groupBy("tx", "ty")
        .agg(F.count("*").alias("n"))
    )
    return tile_pyramid(base, _PYR_BASE_Z, _PYR_MIN_Z)


def _sql_tile_pyramid() -> str:
    mx, my = mercator_tile_sql("lat", "lon", _PYR_BASE_Z)
    levels = [f"SELECT {_PYR_BASE_Z} AS z, tx, ty, n FROM base"]
    for z in range(_PYR_BASE_Z - 1, _PYR_MIN_Z - 1, -1):
        s = 1 << (_PYR_BASE_Z - z)
        levels.append(
            f"SELECT {z} AS z, tx // {s} AS tx, ty // {s} AS ty, "
            f"CAST(sum(n) AS BIGINT) AS n FROM base GROUP BY 2, 3"
        )
    body = " UNION ALL ".join(levels)
    return f"""
WITH {GEO_CTE},
base AS (SELECT {mx} AS tx, {my} AS ty, count(*) AS n FROM geo GROUP BY 1, 2)
{body}
"""


SQL_TILE_PYRAMID = _sql_tile_pyramid()


# --------------------------------------------------------------------------
# T4 — geohash encoding (base32 interop format next to degree tiles,
# mercator z/x/y and Z-order cells): per-prefix counts at precision 4.
# --------------------------------------------------------------------------

def q_geohash_counts(spark, sf_dir):
    from gotrackmaster_spark.functions.tiles import geohash_col

    return (
        geo_events(spark, sf_dir)
        .select(geohash_col(F.col("lat"), F.col("lon"), 4).alias("gh"))
        .groupBy("gh")
        .agg(F.count("*").alias("n"))
    )


def _sql_geohash_counts() -> str:
    from gotrackmaster_spark.functions.tiles import geohash_sql

    return f"""
WITH {GEO_CTE}
SELECT {geohash_sql('lat', 'lon', 4)} AS gh, count(*) AS n
FROM geo GROUP BY 1
"""


SQL_GEOHASH_COUNTS = _sql_geohash_counts()


# --------------------------------------------------------------------------
# Semi-structured columns — JSON property extraction (Spark
# get_json_object vs DuckDB json_extract_string; values re-typed to INT so
# the comparison is integer-exact).
# --------------------------------------------------------------------------

def q_props_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", F.floor(F.col("k") / 10).cast("int").alias("k_band"))
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


SQL_PROPS_STATS = """
SELECT event_type,
       CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10) AS INT) AS k_band,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS n_distinct_k
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Data profiling — per-column null/distinct counts over `documents`
# (the pre-ingest audit a curation pipeline runs on every new shard).
# --------------------------------------------------------------------------

def q_table_profile(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pieces = []
    for c in ["doc_id", "text", "lang", "source", "n_chars"]:
        pieces.append(
            docs.agg(
                F.lit(c).alias("col_name"),
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


SQL_TABLE_PROFILE = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, count(*) AS n_rows, "
    f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
    f"count(DISTINCT {c}) AS n_distinct FROM documents"
    for c in ["doc_id", "text", "lang", "source", "n_chars"]
)


# --------------------------------------------------------------------------
# E6b — MERGE INTO end-to-end (plans/checkpoint.py::Catalog.merge): commit
# a partitioned base table derived from events, merge an update+insert
# batch with partition-level copy-on-write, and aggregate the merged
# result.  The oracle replays the MERGE as its relational definition — a
# FULL OUTER JOIN where source rows win — so a lost insert, a surviving
# stale row, or a partition dropped by the CoW bookkeeping all
# hash-mismatch.  (The catalog writes into one deterministic per-process
# temp dir, wiped at each call, so repeated driver/bench runs in one
# session don't accumulate base+merged table copies on disk; the query
# itself is deterministic.)
# --------------------------------------------------------------------------

_MERGE_NPART = 10  # partition key = user_id % 10


def _merge_base(spark, sf_dir):
    return geo_events(spark, sf_dir).select(
        "event_id",
        (F.col("user_id") % _MERGE_NPART).cast("string").alias("part"),
        F.col("value").cast("double").alias("value"),
    )


def _merge_source(spark, sf_dir):
    ev = geo_events(spark, sf_dir)
    updates = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id",
        (F.col("user_id") % _MERGE_NPART).cast("string").alias("part"),
        (F.col("value") * -1.0).cast("double").alias("value"),
    )
    inserts = ev.filter(F.col("event_id") % 11 == 0).select(
        (F.col("event_id") + 10_000_000).alias("event_id"),
        (F.col("user_id") % _MERGE_NPART).cast("string").alias("part"),
        F.lit(1.5).alias("value"),
    )
    return updates.unionByName(inserts)


def q_merge_upsert(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from gotrackmaster_spark.plans.checkpoint import Catalog

    root = os.path.join(tempfile.gettempdir(), f"merge_oracle_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    cat.commit(_merge_base(spark, sf_dir), "t", partition_col="part")
    cat.merge(
        spark,
        "t",
        _merge_source(spark, sf_dir),
        key_cols=["part", "event_id"],
    )
    return (
        cat.load(spark, "t")
        .groupBy("part")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("n_updated"),
            F.sum(F.when(F.col("event_id") >= 10_000_000, 1).otherwise(0)).alias(
                "n_inserted"
            ),
        )
    )


SQL_MERGE_UPSERT = f"""
WITH {GEO_CTE},
base AS (
  SELECT event_id, CAST(user_id % {_MERGE_NPART} AS VARCHAR) AS part,
         CAST(value AS DOUBLE) AS value
  FROM geo
),
src AS (
  SELECT event_id, CAST(user_id % {_MERGE_NPART} AS VARCHAR) AS part,
         CAST(value * -1.0 AS DOUBLE) AS value
  FROM geo WHERE event_id % 7 = 0
  UNION ALL
  SELECT event_id + 10000000 AS event_id,
         CAST(user_id % {_MERGE_NPART} AS VARCHAR) AS part,
         1.5 AS value
  FROM geo WHERE event_id % 11 = 0
),
merged AS (
  SELECT coalesce(s.part, b.part) AS part,
         coalesce(s.event_id, b.event_id) AS event_id,
         CASE WHEN s.event_id IS NOT NULL THEN s.value ELSE b.value END AS value
  FROM base b FULL OUTER JOIN src s
    ON b.part = s.part AND b.event_id = s.event_id
)
SELECT part, count(*) AS n_rows,
       round(sum(value), 4) AS sum_value,
       CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
       CAST(sum(CASE WHEN event_id >= 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted
FROM merged GROUP BY part
"""


# --------------------------------------------------------------------------
# North-star "slope computation" — per-leg grade (Δele over haversine run,
# in %) with ascent/descent totals, max/avg slope, and steep-leg counts per
# track.  Pure window+agg (one shuffle, codegen haversine) — the slope
# stage of the GPX analytics ladder (north_star: "Haversine distance,
# max-speed and slope computation") as a standalone oracle-checked query.
# --------------------------------------------------------------------------

_STEEP_PCT = 0.01  # |grade| threshold in % over the synthetic global walk


def q_slope_stats(spark, sf_dir):
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dele = F.col("ele") - F.lag("ele").over(w)
    leg = haversine_col(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    )
    legs = pts.select("user_id", dele.alias("dele"), leg.alias("leg_m")).withColumn(
        "slope_pct",
        F.when(F.col("leg_m") > 0, F.col("dele") / F.col("leg_m") * 100.0),
    )
    return legs.groupBy("user_id").agg(
        F.sum(F.when(F.col("dele") > 0, F.col("dele")).otherwise(0.0)).alias("ascent_m"),
        F.sum(F.when(F.col("dele") < 0, -F.col("dele")).otherwise(0.0)).alias("descent_m"),
        F.round(F.max("slope_pct"), 9).alias("max_slope_pct"),
        F.round(F.avg("slope_pct"), 8).alias("avg_slope_pct"),
        F.count(F.when(F.abs(F.col("slope_pct")) > _STEEP_PCT, 1)).alias("n_steep"),
    )


SQL_SLOPE_STATS = f"""
WITH {GEO_CTE},
legs AS (
  SELECT user_id,
         ele - lag(ele) OVER w AS dele,
         {haversine_sql('lag(lat) OVER w', 'lag(lon) OVER w', 'lat', 'lon')} AS leg_m
  FROM geo
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sl AS (
  SELECT user_id, dele,
         CASE WHEN leg_m > 0 THEN dele / leg_m * 100.0 END AS slope_pct
  FROM legs
)
SELECT user_id,
       sum(CASE WHEN dele > 0 THEN dele ELSE 0.0 END) AS ascent_m,
       sum(CASE WHEN dele < 0 THEN -dele ELSE 0.0 END) AS descent_m,
       round(max(slope_pct), 9) AS max_slope_pct,
       round(avg(slope_pct), 8) AS avg_slope_pct,
       count(CASE WHEN abs(slope_pct) > {_STEEP_PCT!r} THEN 1 END) AS n_steep
FROM sl GROUP BY user_id
"""


# --------------------------------------------------------------------------
# North-star "Hampel/z-score erratic-point removal" — the engine path runs
# the REAL numpy kernels (operators.repair.hampel_fix / zscore_fix inside
# applyInPandas); the oracle replays both filters exactly in SQL:
#   * Hampel: truncated ±5 window, median + MAD via sorted window lists
#     (integer-valued ele ⇒ medians exact; threshold 1.5·(1.4826·MAD)
#     multiplies in the kernel's order, so the doubles are bit-equal);
#   * z-score: mu exact (integer sum / n), sd = sqrt(mean dev²) mirrored
#     formula-for-formula.
# Any drift in the kernels' edge handling or threshold math hash-fails.
# --------------------------------------------------------------------------

_ERR_SIGMAS = 1.5


def q_erratic_outliers(spark, sf_dir):
    from gotrackmaster_spark.operators.repair import hampel_fix, zscore_fix

    pts = synthetic_tracks(spark, sf_dir)
    base = pts.groupBy("track_id").agg(F.count("*").alias("n_points"))
    h = (
        hampel_fix(pts, window=5, n_sigmas=_ERR_SIGMAS)
        .groupBy("track_id")
        .agg(F.count("*").alias("nh"))
    )
    z = (
        zscore_fix(pts, n_sigmas=_ERR_SIGMAS)
        .groupBy("track_id")
        .agg(F.count("*").alias("nz"))
    )
    return (
        base.join(h, "track_id", "left")
        .join(z, "track_id", "left")
        .select(
            "track_id",
            "n_points",
            F.coalesce("nh", F.lit(0)).cast("long").alias("n_hampel_kept"),
            F.coalesce("nz", F.lit(0)).cast("long").alias("n_zscore_kept"),
        )
    )


SQL_ERRATIC_OUTLIERS = """
WITH tracks AS (
  SELECT CAST(user_id AS VARCHAR) AS track_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS pt_idx,
         CAST(((event_id * 13) % 400) AS DOUBLE) + 100.0 AS ele
  FROM events
),
win AS (
  SELECT track_id, ele,
         list_sort(list(ele) OVER (PARTITION BY track_id ORDER BY pt_idx
                   ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS s
  FROM tracks
),
med AS (
  SELECT track_id, ele, s, len(s) AS m,
         CASE WHEN len(s) % 2 = 1 THEN s[(len(s) + 1) // 2]
              ELSE (s[len(s) // 2] + s[len(s) // 2 + 1]) / 2.0 END AS medv
  FROM win
),
mad AS (
  SELECT track_id, ele, medv, m,
         list_sort(list_transform(s, v -> abs(v - medv))) AS d
  FROM med
),
hflag AS (
  SELECT track_id, ele, medv,
         CASE WHEN m % 2 = 1 THEN d[(m + 1) // 2]
              ELSE (d[m // 2] + d[m // 2 + 1]) / 2.0 END AS madv
  FROM mad
),
hsum AS (
  SELECT track_id, count(*) AS n_points,
         CAST(sum(CASE WHEN (1.4826 * madv) > 0
                        AND abs(ele - medv) > 1.5 * (1.4826 * madv)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_h_out
  FROM hflag GROUP BY track_id
),
zmu AS (
  SELECT track_id, avg(ele) AS mu FROM tracks GROUP BY track_id
),
zstats AS (
  SELECT t.track_id, z.mu AS mu,
         sqrt(avg((t.ele - z.mu) * (t.ele - z.mu))) AS sd
  FROM tracks t JOIN zmu z ON t.track_id = z.track_id
  GROUP BY t.track_id, z.mu
),
zsum AS (
  SELECT t.track_id,
         CAST(sum(CASE WHEN s.sd > 0 AND abs(t.ele - s.mu) > 1.5 * s.sd
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_z_out
  FROM tracks t JOIN zstats s ON t.track_id = s.track_id
  GROUP BY t.track_id
)
SELECT h.track_id, h.n_points,
       h.n_points - h.n_h_out AS n_hampel_kept,
       h.n_points - z.n_z_out AS n_zscore_kept
FROM hsum h JOIN zsum z ON h.track_id = z.track_id
"""


# --------------------------------------------------------------------------
# North-star "Douglas-Peucker track simplification" — the engine path runs
# the REAL recursive numpy kernel (kernels.extra.douglas_peucker_mask via
# operators.repair.douglas_peucker_fix, applyInPandas per track); the
# oracle replays the EXACT recursion as a DuckDB recursive CTE:
#   * the input track uses DYADIC steps (k/8192 — exactly representable
#     doubles), so the windowed cumulative-sum coordinates are bit-equal
#     in both engines regardless of each engine's summation order;
#   * each (i, j) segment row computes the interior perpendicular
#     distances with the kernel's exact op order (equirectangular plane
#     scaled by cos(lat1), clamp-to-segment), takes first-argmax
#     (list_position = numpy argmax tie order) and splits when
#     dmax > ε — any drift in the kernel's split rule, tie-breaking,
#     or distance math hash-fails;
#   * the output pins the exact keep-mask per track: count + Σidx + Σidx²
#     of kept 0-based indices.
# --------------------------------------------------------------------------

_DP_EPS = 0.02


def dp_tracks(spark, sf_dir):
    """Random-walk tracks with DYADIC (k/8192) steps: every partial sum is
    an exact double, making the cumulative-sum lat/lon independent of
    summation order — the property the DP oracle's bit-equality rests on."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    dlat = ((F.col("event_id") * 2654435761) % 201 - 100).cast("double") / 8192.0
    dlon = ((F.col("event_id") * 40503 + 11) % 201 - 100).cast("double") / 8192.0
    base_lat = ((F.col("user_id") * 617) % 120).cast("double") - 60.0
    base_lon = ((F.col("user_id") * 1009) % 300).cast("double") - 150.0
    return (
        ev.select("event_id", "user_id")
        .withColumn("pt_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("lat", base_lat + F.sum(dlat).over(w))
        .withColumn("lon", base_lon + F.sum(dlon).over(w))
        .withColumn("ele", ((F.col("event_id") * 13) % 400).cast("double") + 100.0)
        .withColumn("ts_ns", (F.lit(1700000000) + F.col("user_id") + F.col("pt_idx") * 60) * F.lit(1_000_000_000))
        .withColumn("ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")))
        .withColumn("track_id", F.col("user_id").cast("string"))
        .withColumn("trk_no", F.lit(0))
        .withColumn("seg_no", F.lit(0))
        .select("track_id", "trk_no", "seg_no", "pt_idx", "lat", "lon", "ele", "ts", "ts_ns")
    )


def q_dp_simplify(spark, sf_dir):
    from gotrackmaster_spark.operators.repair import douglas_peucker_keep

    pts = dp_tracks(spark, sf_dir)
    base = pts.groupBy("track_id").agg(F.count("*").alias("n_points"))
    kept = douglas_peucker_keep(pts, _DP_EPS)
    idx = F.col("pt_idx").cast("long")
    agg = kept.groupBy("track_id").agg(
        F.count("*").alias("n_kept"),
        F.sum(idx).alias("kept_idx_sum"),
        F.sum(idx * idx).alias("kept_idx_sq"),
    )
    return base.join(agg, "track_id").select(
        "track_id", "n_points", "n_kept", "kept_idx_sum", "kept_idx_sq"
    )


def _dp_perp_lambda() -> str:
    """The kernel's `_perp_dist` (kernels/extra.py:17-33) as a DuckDB list
    lambda over 1-based indices i (seg start), j (seg end), x (interior):
    identical double ops in identical order."""
    cosw = "cos(la[i] / 180.0 * pi())"
    xx = f"((lo[x] - lo[i]) * {cosw})"
    yy = "(la[x] - la[i])"
    ex = f"((lo[j] - lo[i]) * {cosw})"
    ey = "(la[j] - la[i])"
    seg2 = f"({ex} * {ex} + {ey} * {ey})"
    t = f"least(greatest(({xx} * {ex} + {yy} * {ey}) / {seg2}, 0.0), 1.0)"
    dx = f"({xx} - {t} * {ex})"
    dy = f"({yy} - {t} * {ey})"
    return (
        f"CASE WHEN {seg2} = 0 THEN sqrt({xx} * {xx} + {yy} * {yy}) "
        f"ELSE sqrt({dx} * {dx} + {dy} * {dy}) END"
    )


# NOTE the `kept` CTE dedups via an explicit DISTINCT subquery: inside a
# WITH RECURSIVE block DuckDB treats a bare `a UNION b` CTE over the
# recursive table with UNION-ALL semantics (observed on 1.x), so the
# standard spelling silently multi-counts segment endpoints.
SQL_DP_SIMPLIFY = f"""
WITH RECURSIVE pts AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS pt_idx,
         (CAST((user_id * 617) % 120 AS DOUBLE) - 60.0)
           + sum(CAST((event_id * 2654435761) % 201 - 100 AS DOUBLE) / 8192.0)
             OVER (PARTITION BY user_id ORDER BY event_id) AS lat,
         (CAST((user_id * 1009) % 300 AS DOUBLE) - 150.0)
           + sum(CAST((event_id * 40503 + 11) % 201 - 100 AS DOUBLE) / 8192.0)
             OVER (PARTITION BY user_id ORDER BY event_id) AS lon
  FROM events
),
arr AS (
  SELECT user_id, CAST(count(*) AS INT) AS n,
         list(lat ORDER BY pt_idx) AS la,
         list(lon ORDER BY pt_idx) AS lo
  FROM pts GROUP BY user_id
),
segs AS (
  SELECT user_id, la, lo, 1 AS i, n AS j FROM arr
  UNION ALL
  SELECT user_id, la, lo,
         CASE WHEN u.s = 0 THEN t.i ELSE t.k END AS i,
         CASE WHEN u.s = 0 THEN t.k ELSE t.j END AS j
  FROM (
    SELECT user_id, la, lo, i, j,
           i + CAST(list_position(ds, list_max(ds)) AS INT) AS k,
           list_max(ds) AS dmax
    FROM (
      SELECT user_id, la, lo, i, j,
             list_transform(generate_series(i + 1, j - 1), x -> {_dp_perp_lambda()}) AS ds
      FROM segs WHERE j > i + 1
    )
  ) t
  CROSS JOIN (SELECT unnest([0, 1]) AS s) u
  WHERE t.dmax > {_DP_EPS!r}
),
kept AS (
  SELECT DISTINCT user_id, ki FROM (
    SELECT user_id, i AS ki FROM segs UNION ALL SELECT user_id, j AS ki FROM segs
  )
)
SELECT CAST(a.user_id AS VARCHAR) AS track_id,
       CAST(a.n AS BIGINT) AS n_points,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(k.ki - 1) AS BIGINT) AS kept_idx_sum,
       CAST(sum(CAST(k.ki - 1 AS BIGINT) * CAST(k.ki - 1 AS BIGINT)) AS BIGINT) AS kept_idx_sq
FROM arr a JOIN kept k ON a.user_id = k.user_id
GROUP BY a.user_id, a.n
"""


# --------------------------------------------------------------------------
# H3-style hexagonal cell assignment (functions/hex.py) — the hexagonal
# half of the north rule's "H3/S2 tiles", as batched Column bit/float math
# (codegen, zero Python).  Cube-rounding uses floor(x+0.5) + a fixed
# comparison order so numpy, Spark and DuckDB agree bit-for-bit; the
# oracle recomputes both resolutions from scratch, so any drift in the
# axial transform or the rounding repair hash-fails.
# --------------------------------------------------------------------------

from gotrackmaster_spark.functions.hex import hex_col, hex_sql  # noqa: E402


def q_hex_cell_counts(spark, sf_dir):
    pts = geo_events(spark, sf_dir)
    return (
        pts.select(
            hex_col(F.col("lat"), F.col("lon"), 3).alias("hex3"),
            hex_col(F.col("lat"), F.col("lon"), 5).alias("hex5"),
        )
        .groupBy("hex3", "hex5")
        .agg(F.count("*").alias("n"))
    )


SQL_HEX_CELL_COUNTS = f"""
WITH {GEO_CTE}
SELECT {hex_sql('lat', 'lon', 3)} AS hex3,
       {hex_sql('lat', 'lon', 5)} AS hex5,
       count(*) AS n
FROM geo GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# A6 (SQL-expressible slice) — classification label ladder over the
# middle-80% speed-band aggregate (misc.go:183-245 via
# kernels/quality.py:classification_track).  The 7-stage repair prefix
# (FixTimes / MaxSpeed / RemoveStops / RemoveIntersections) is a sequential
# kernel pinned to fixtures in tests/test_quality.py; this query applies
# the aggregate + ladder to a deterministic synthetic track table so DuckDB
# can twin it AND so all 10 labels of the ladder are actually exercised at
# sf0.01 (the standard geo scatter yields only Motor Sport / Unknown).
#
# Track synthesis (exact int64 modular arithmetic → one float multiply, so
# both engines produce identical float64 bits):
#   tk   : users with user_id %% 6 == 0 stay singleton tracks (mostly
#          < MIN_SEGMENT_LENGTH → Unknown, covering the guard); the rest
#          merge into 25 long tracks (all ≥ 80 points).
#   step : 1 + (tk·23) %% 64 — sweeps speed 0.44…28.5 m/s so every rung of
#          the flat-branch ladder (1.6/4.1/7.5/11/25) is hit.
#   kk   : 0 for tk ≡ 2 (mod 3) (flat branch), else 1..5 — elevation
#          sawtooth (i·kk mod 60)·0.5 drives the ±0.4 vertical bands and
#          the elevation/distance ≥ 0.05 mountain gate.
#
# Kernel quirks replicated literally (do not rationalize):
#   * band sums are NON-exclusive — a leg with vert < -0.4 also satisfies
#     vert <= 0.4, so it contributes to BOTH speed_down and speed_flat
#     (misc.go:195-205: three independent `if`s);
#   * secs == 0 → speed = vert = 0 (speed.go:92-99), but length/elevation
#     still accumulate;
#   * vertical speed sign: NEGATIVE when climbing (speed.go:96-98), i.e.
#     vert = (ele_i − ele_{i+1}) / secs;
#   * middle slice: div = n // 10, pairs (i, i+1) for i in [div, n−div−1]
#     (misc.go:189-191), only for segments with n ≥ MIN_SEGMENT_LENGTH=80
#     (definitions.go:57);
#   * elevation/distance ratio: dist == 0 → +Inf in Go; both engines use
#     an explicit 1e308 sentinel so the < 0.05 comparison agrees.
# Only the label + integer counts are output — the float sums never hit
# the hash, so engine-order summation differences cannot flip a row.
# --------------------------------------------------------------------------


def q_classification_counts(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    base = ev.withColumn(
        "tk",
        F.when(F.col("user_id") % 6 == 0, F.col("user_id") + 1000).otherwise(
            F.col("user_id") % 25
        ),
    )
    w = Window.partitionBy("tk").orderBy("ts", "event_id")
    idx0 = base.select(
        "tk",
        (F.row_number().over(w) - 1).alias("i"),
        F.count("*").over(Window.partitionBy("tk")).alias("n"),
    )
    step = F.lit(1) + (F.col("tk") * 23) % 64
    kk = F.when(F.col("tk") % 3 == 2, F.lit(0)).otherwise((F.col("tk") % 5) + 1)
    idx = idx0.select(
        "tk", "i", "n",
        (F.lit(-60.0) + (F.col("tk") % 120) + (F.col("i") * step) * F.lit(4.0e-6)).alias("lat"),
        (
            F.lit(-150.0)
            + (F.col("tk") * 37) % 300
            + ((F.col("i") * F.lit(2654435761)) % 97) * F.lit(1.0e-8)
        ).alias("lon"),
        (((F.col("i") * kk) % 60).cast("double") * F.lit(0.5)).alias("ele"),
        (F.col("i") * F.lit(1000000)).alias("t_us"),
    )
    w2 = Window.partitionBy("tk").orderBy("i")
    pairs = idx.select(
        "tk", "n", "i",
        distance_2d_col(
            F.col("lat"), F.col("lon"), F.lead("lat").over(w2), F.lead("lon").over(w2)
        ).alias("len"),
        ((F.lead("t_us").over(w2) - F.col("t_us")) / F.lit(1e6)).alias("secs"),
        (F.col("ele") - F.lead("ele").over(w2)).alias("delev"),
    )
    div = F.expr("n DIV 10")
    mid = pairs.where(
        (F.col("n") >= 80) & (F.col("i") >= div) & (F.col("i") < F.col("n") - div)
    ).select(
        "tk",
        F.when(F.col("secs") == 0, 0.0).otherwise(F.col("len") / F.col("secs")).alias("speed"),
        F.when(F.col("secs") == 0, 0.0).otherwise(F.col("delev") / F.col("secs")).alias("vert"),
        F.abs("delev").alias("aelev"),
        "len",
    )
    agg = mid.groupBy("tk").agg(
        F.sum(F.when(F.col("vert") <= 0.4, F.col("speed")).otherwise(0.0)).alias("sflat"),
        F.sum(F.when(F.col("vert") > 0.4, F.col("speed")).otherwise(0.0)).alias("sup"),
        F.sum(F.when(F.col("vert") < -0.4, F.col("speed")).otherwise(0.0)).alias("sdown"),
        F.sum("speed").alias("stot"),
        F.sum("aelev").alias("elev"),
        F.sum("len").alias("dist"),
        F.count("*").alias("total"),
    )
    sflat = F.col("sflat") / F.col("total")
    stot = F.col("stot") / F.col("total")
    ratio = F.when(F.col("dist") == 0, F.lit(1e308)).otherwise(F.col("elev") / F.col("dist"))
    label = F.when(
        ratio < 0.05,
        F.when(sflat > 25, "Motor Sport")
        .when(sflat > 11, "Cycling Racing")
        .when(sflat > 7.5, "Cycling Sport")
        .when(sflat > 4.1, "Cycling Transport")
        .when(sflat > 1.6, "Running Sport")
        .otherwise("Walking Transport"),
    ).otherwise(
        F.when((sflat > 3.8) | (stot > 3.8), "Cycling Mountain")
        .when((sflat > 1.2) | (stot > 1.3), "Running Mountain")
        .otherwise("Walking Mountain")
    )
    lab = agg.select("tk", "total", label.alias("label"))
    per_track = idx0.groupBy("tk").agg(F.count("*").alias("n_pts"))
    return per_track.join(lab, "tk", "left").select(
        F.col("tk").alias("track_id"),
        "n_pts",
        F.coalesce(F.col("total"), F.lit(0)).alias("n_mid"),
        F.coalesce(F.col("label"), F.lit("Unknown")).alias("label"),
    )


SQL_CLASSIFICATION_COUNTS = f"""
WITH base AS (
  SELECT CASE WHEN user_id % 6 = 0 THEN user_id + 1000 ELSE user_id % 25 END AS tk,
         ts, event_id
  FROM events
),
idx0 AS (
  SELECT tk, row_number() OVER w - 1 AS i, count(*) OVER (PARTITION BY tk) AS n
  FROM base
  WINDOW w AS (PARTITION BY tk ORDER BY ts, event_id)
),
idx AS (
  SELECT tk, i, n,
         -60.0 + (tk % 120) + (i * (1 + (tk * 23) % 64)) * 4.0e-6 AS lat,
         -150.0 + ((tk * 37) % 300) + ((i * 2654435761) % 97) * 1.0e-8 AS lon,
         CAST((i * (CASE WHEN tk % 3 = 2 THEN 0 ELSE (tk % 5) + 1 END)) % 60 AS DOUBLE) * 0.5 AS ele,
         i * 1000000 AS t_us
  FROM idx0
),
pairs AS (
  SELECT tk, n, i,
         {distance_2d_sql('lat', 'lon', 'lead(lat) OVER w2', 'lead(lon) OVER w2')} AS len,
         (lead(t_us) OVER w2 - t_us) / 1e6 AS secs,
         ele - lead(ele) OVER w2 AS delev
  FROM idx
  WINDOW w2 AS (PARTITION BY tk ORDER BY i)
),
mid AS (
  SELECT tk,
         CASE WHEN secs = 0 THEN 0.0 ELSE len / secs END AS speed,
         CASE WHEN secs = 0 THEN 0.0 ELSE delev / secs END AS vert,
         abs(delev) AS aelev, len
  FROM pairs
  WHERE n >= 80 AND i >= n // 10 AND i < n - (n // 10)
),
agg AS (
  SELECT tk,
         sum(CASE WHEN vert <= 0.4 THEN speed ELSE 0.0 END) AS sflat,
         sum(CASE WHEN vert > 0.4 THEN speed ELSE 0.0 END) AS sup,
         sum(CASE WHEN vert < -0.4 THEN speed ELSE 0.0 END) AS sdown,
         sum(speed) AS stot,
         sum(aelev) AS elev,
         sum(len) AS dist,
         count(*) AS total
  FROM mid GROUP BY tk
),
lab AS (
  SELECT tk, total,
    CASE WHEN (CASE WHEN dist = 0 THEN 1e308 ELSE elev / dist END) < 0.05 THEN
      CASE
        WHEN sflat / total > 25 THEN 'Motor Sport'
        WHEN sflat / total > 11 THEN 'Cycling Racing'
        WHEN sflat / total > 7.5 THEN 'Cycling Sport'
        WHEN sflat / total > 4.1 THEN 'Cycling Transport'
        WHEN sflat / total > 1.6 THEN 'Running Sport'
        ELSE 'Walking Transport'
      END
    ELSE
      CASE
        WHEN sflat / total > 3.8 OR stot / total > 3.8 THEN 'Cycling Mountain'
        WHEN sflat / total > 1.2 OR stot / total > 1.3 THEN 'Running Mountain'
        ELSE 'Walking Mountain'
      END
    END AS label
  FROM agg
)
SELECT g.tk AS track_id, g.n_pts,
       coalesce(l.total, 0) AS n_mid,
       coalesce(l.label, 'Unknown') AS label
FROM (SELECT tk, count(*) AS n_pts FROM idx0 GROUP BY tk) g
LEFT JOIN lab l ON g.tk = l.tk
"""


# --------------------------------------------------------------------------
# E7+dedup — JOINT multimodal near-dup: image-signature candidates
# (phash chunk join, pigeonhole-exact) verified on the caption text
# (token-set Jaccard).  The north rule's image+caption pairing as one
# dedup operator: the cheap 64-bit visual signature proposes, the text
# channel disposes — pairs that look alike but say different things are
# flagged is_joint = false.  Same candidate topology as phash_near_dups
# (no cross join; O(pairs) caption joins), so the 100 TB shape is
# unchanged; captions join by id AFTER candidate pruning, never pairwise.
# --------------------------------------------------------------------------

_MM_JAC = 0.8


def q_multimodal_near_dups(spark, sf_dir):
    from gotrackmaster_spark.operators.images import (
        phash_near_dups,
        synthesize_image_variants,
        synthesize_images,
    )

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    cols = ["img_key", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    both = imgs.select(*cols).unionByName(
        synthesize_image_variants(imgs, every=_PH_EVERY)
    )
    pairs = phash_near_dups(both, max_hamming=_PH_MAXHAM)
    caps = both.select(
        "image_id", F.array_distinct(F.split("caption", " ")).alias("toks")
    )
    j = pairs.join(
        caps.select(F.col("image_id").alias("a_id"), F.col("toks").alias("a_toks")),
        "a_id",
    ).join(
        caps.select(F.col("image_id").alias("b_id"), F.col("toks").alias("b_toks")),
        "b_id",
    )
    jac = F.size(F.array_intersect("a_toks", "b_toks")) / F.size(
        F.array_union("a_toks", "b_toks")
    )
    return j.select(
        "a_id", "b_id", "hamming",
        F.round(jac, 6).alias("jac_r"),
        (jac >= F.lit(_MM_JAC)).alias("is_joint"),
    )


_MM_JACCARD_SQL = (
    "len(list_intersect(ca.toks, cb.toks)) * 1.0 "
    "/ len(list_distinct(list_concat(ca.toks, cb.toks)))"
)

SQL_MULTIMODAL_NEAR_DUPS = f"""
WITH base_bs AS (
  SELECT doc_id, {_phash_bs_sql(_PIX_F)} AS bs FROM documents
),
var_bs AS (
  SELECT doc_id, {_phash_bs_sql(_PIX_VAR)} AS bs
  FROM documents WHERE doc_id % {_PH_EVERY} = 0
),
base AS (
  SELECT format('img{{:08d}}', doc_id) AS image_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, bs, list_sum(bs) AS tot FROM base_bs)
),
vars AS (
  SELECT format('var{{:08d}}', doc_id) AS image_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, bs, list_sum(bs) AS tot FROM var_bs)
),
all_imgs AS (SELECT * FROM base UNION ALL SELECT * FROM vars),
caps AS (
  SELECT format('img{{:08d}}', doc_id) AS image_id,
         list_distinct(string_split(text, ' ')) AS toks
  FROM documents
  UNION ALL
  SELECT format('var{{:08d}}', doc_id),
         list_distinct(string_split(text, ' '))
  FROM documents WHERE doc_id % {_PH_EVERY} = 0
),
pairs AS (
  SELECT a.image_id AS a_id, b.image_id AS b_id,
         CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
  FROM all_imgs a JOIN all_imgs b ON a.image_id < b.image_id
  WHERE bit_count(xor(a.phash, b.phash)) <= {_PH_MAXHAM}
)
SELECT p.a_id, p.b_id, p.hamming,
       round({_MM_JACCARD_SQL}, 6) AS jac_r,
       ({_MM_JACCARD_SQL}) >= {_MM_JAC!r} AS is_joint
FROM pairs p
JOIN caps ca ON ca.image_id = p.a_id
JOIN caps cb ON cb.image_id = p.b_id
"""


# --------------------------------------------------------------------------
# Text pipeline — character-trigram LM quality score (perplexity-style
# filtering, the CCNet/Gopher "does this read like the corpus?" signal):
# train = trigram counts over the whole corpus (one groupBy), score = each
# doc's mean log10 P(c3 | c1c2) with add-one smoothing over a fixed
# V=256 alphabet.  P's denominator uses prefix-bigram mass derived FROM
# the trigram counts (sum of C3 over the prefix), so both engines build
# the identical integer model; only the final mean is float (round 7 —
# summation-order error ~1e-13, 6 orders below the step).
#
# Scale shape: two groupBys over the exploded trigram stream (partial
# aggregation does the heavy lifting), then equi-joins of the stream
# against the counts tables — no collect, model stays distributed.
# Spark quirk guarded: sequence(1, 0) DESCENDS (it is not empty), so docs
# shorter than 3 chars are filtered before the explode on BOTH sides.
# --------------------------------------------------------------------------

_LM_V = 256.0


def q_lm_scores(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tris = docs.filter(F.length("text") >= 3).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
        ).alias("tri"),
    )
    c3 = tris.groupBy("tri").agg(F.count("*").alias("n3"))
    c2 = c3.groupBy(F.substring("tri", 1, 2).alias("bi")).agg(F.sum("n3").alias("n2"))
    scored = (
        tris.join(c3, "tri")
        .withColumn("bi", F.substring("tri", 1, 2))
        .join(c2, "bi")
        .select(
            "doc_id",
            F.log10((F.col("n3") + 1.0) / (F.col("n2") + F.lit(_LM_V))).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tri"), F.round(F.avg("lp"), 7).alias("lm_score")
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri"),
        F.coalesce(F.col("lm_score"), F.lit(0.0)).alias("lm_score"),
    )


SQL_LM_SCORES = f"""
WITH tris AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS tri
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - 2)) AS i
    FROM documents WHERE length(text) >= 3
  )
),
c3 AS (SELECT tri, count(*) AS n3 FROM tris GROUP BY tri),
c2 AS (SELECT substr(tri, 1, 2) AS bi, sum(n3) AS n2 FROM c3 GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         log10((c3.n3 + 1.0) / (c2.n2 + {_LM_V!r})) AS lp
  FROM tris t
  JOIN c3 USING (tri)
  JOIN c2 ON c2.bi = substr(t.tri, 1, 2)
),
per_doc AS (
  SELECT doc_id, count(*) AS n_tri, round(avg(lp), 7) AS lm_score
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_tri, 0) AS n_tri,
       coalesce(p.lm_score, 0.0) AS lm_score
FROM (SELECT doc_id FROM documents) d
LEFT JOIN per_doc p USING (doc_id)
"""


# --------------------------------------------------------------------------
# Text pipeline — benchmark decontamination (eval-leak check): corpus docs
# sharing any word-5-gram shingle with the eval stratum are flagged.
# Same shingle machinery as jaccard_pairs (functions/text.py); the eval
# shingle set broadcasts (benchmarks are tiny vs the corpus), the corpus
# side streams through one equi-join — no corpus shuffle, no pairwise work.
# --------------------------------------------------------------------------

_DECON_MOD = 40


def q_decontamination(spark, sf_dir):
    from gotrackmaster_spark.operators.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return decontaminate(docs, eval_mod=_DECON_MOD)


from gotrackmaster_spark.operators.dedup import sql_decontaminate as _sql_decon  # noqa: E402

SQL_DECONTAMINATION = _sql_decon(_DECON_MOD)


# --------------------------------------------------------------------------
# Multimodal driver trio — promotes the mapInPandas payload operators
# (operators/multimodal.py: resize, video frame-sample, audio features)
# from plumbing-tests-only to oracle-checked.  All payloads derive from
# the closed-form generators, so DuckDB can replay decode→transform→
# aggregate exactly (same contract as SQL_IMAGE_STATS).
# --------------------------------------------------------------------------

_RS_W, _RS_H = 8, 6  # 32x24 -> 8x6: 4x4 block mean (exact: sum // 16)


def q_image_resize_stats(spark, sf_dir):
    """Decode (raw/png/qnt4) -> 4x4 block-mean resize -> per-image pixel
    sum of the 8x6 thumbnail.  Exercises resize_images end-to-end; the
    oracle recomputes the truncated block means from the pixel formula."""
    import numpy as np
    import pandas as pd

    from gotrackmaster_spark.operators.images import synthesize_images
    from gotrackmaster_spark.operators.multimodal import resize_images

    imgs = synthesize_images(spark, sf_dir, w=32, h=24)
    small = resize_images(
        imgs.select("image_id", "fmt", "w", "h", "bytes"), out_w=_RS_W, out_h=_RS_H
    )

    def sums(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            stack = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["bytes"]]
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "fmt": pdf["fmt"],
                    "w": pdf["w"].astype("int32"),
                    "h": pdf["h"].astype("int32"),
                    "small_sum": stack.sum(axis=1),
                }
            )

    return small.mapInPandas(
        sums, "image_id string, fmt string, w int, h int, small_sum long"
    )


# out-pixel j in flattened (6, 8, 3): oy = j//24, ox = (j//3)%8, c = j%3;
# block element b in 0..15: dy = b//4, dx = b%4; source flat index =
# ((oy*4+dy)*32 + (ox*4+dx))*3 + c.  uint8 cast of a /16 mean truncates,
# and sum//16 == floor(mean) for non-negative ints.
_RS_IDX = "(((((j // 24) * 4 + b // 4) * 32) + ((j // 3) % 8) * 4 + b % 4) * 3 + j % 3)"
_RS_PIX = f"((doc_id * 31 + {_RS_IDX} * 2654435761) % 256)"

SQL_IMAGE_RESIZE_STATS = f"""
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       {_RS_W} AS w, {_RS_H} AS h,
       CAST(list_sum(list_transform(generate_series(0, {_RS_W * _RS_H * 3 - 1}), j ->
            list_sum(list_transform(generate_series(0, 15), b ->
                CASE WHEN doc_id % 3 = 2
                     THEN {_RS_PIX} - ({_RS_PIX}) % 4
                     ELSE {_RS_PIX} END)) // 16)) AS BIGINT) AS small_sum
FROM documents
"""


def q_video_frame_stats(spark, sf_dir):
    """Synthesize closed-form video payloads (byte t = (key*131 +
    t*2654435761) % 256, length 64 + key%64, n_frames 1 + key%25), sample
    every 10th frame via sample_video_frames' deterministic decoder
    (frame k = payload viewed as a repeating stream offset k), and sum
    each 16x12x3 frame."""
    import numpy as np
    import pandas as pd

    from gotrackmaster_spark.operators.multimodal import sample_video_frames

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("key")
    )
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)

    def gen(batches):
        for pdf in batches:
            out = []
            for key in pdf["key"]:
                key = int(key)
                t = np.arange(64 + key % 64, dtype=np.int64)
                buf = ((key * 131 + t * 2654435761) % 256).astype(np.uint8)
                out.append(
                    {
                        "video_id": f"vid{key:08d}",
                        "bytes": buf.tobytes(),
                        "n_frames": 1 + key % 25,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    videos = docs.mapInPandas(gen, "video_id string, bytes binary, n_frames int")
    frames = sample_video_frames(videos, every_n=10)

    def sums(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            stack = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["frame"]]
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "video_id": pdf["video_id"],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "frame_sum": stack.sum(axis=1),
                }
            )

    return frames.mapInPandas(sums, "video_id string, frame_idx int, frame_sum long")


# tiled payload element (k+u) wraps mod payload length L
SQL_VIDEO_FRAME_STATS = """
WITH v AS (
  SELECT doc_id, 64 + doc_id % 64 AS L, 1 + doc_id % 25 AS nf FROM documents
),
f AS (
  SELECT doc_id, L, unnest(generate_series(0, nf - 1, 10)) AS k FROM v
)
SELECT format('vid{:08d}', doc_id) AS video_id,
       CAST(k AS INT) AS frame_idx,
       CAST(list_sum(list_transform(generate_series(0, 575), u ->
            (doc_id * 131 + ((k + u) % L) * 2654435761) % 256)) AS BIGINT) AS frame_sum
FROM f
"""


def q_audio_window_stats(spark, sf_dir):
    """Synthesize closed-form int16 PCM (sample j = (key*7 + j*48271) %
    65536 - 32768, 1 + key%4 windows of 256) and run audio_features:
    per-window RMS + zero-crossing rate.  Both engines' float paths are
    exact-until-sqrt (integer squares sum below 2^53), so the doubles are
    bit-equal."""
    import numpy as np
    import pandas as pd

    from gotrackmaster_spark.operators.multimodal import audio_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("key")
    )
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)

    def gen(batches):
        for pdf in batches:
            out = []
            for key in pdf["key"]:
                key = int(key)
                j = np.arange(256 * (1 + key % 4), dtype=np.int64)
                pcm = (((key * 7 + j * 48271) % 65536) - 32768).astype(np.int16)
                out.append({"audio_id": f"aud{key:08d}", "bytes": pcm.tobytes()})
            if out:
                yield pd.DataFrame(out)

    audio = docs.mapInPandas(gen, "audio_id string, bytes binary")
    return audio_features(audio, frame=256)


SQL_AUDIO_WINDOW_STATS = """
WITH w AS (
  SELECT doc_id, unnest(generate_series(0, doc_id % 4)) AS win FROM documents
),
s AS (
  SELECT doc_id, win,
         list_transform(generate_series(0, 255), j ->
             ((doc_id * 7 + (win * 256 + j) * 48271) % 65536) - 32768) AS xs
  FROM w
)
SELECT format('aud{:08d}', doc_id) AS audio_id,
       CAST(win AS INT) AS win,
       sqrt(list_sum(list_transform(xs, x -> CAST(x AS DOUBLE) * x)) / 256.0) AS rms,
       list_sum(list_transform(generate_series(1, 255), j ->
           CASE WHEN (xs[j] < 0) != (xs[j + 1] < 0) THEN 1 ELSE 0 END)) / 255.0 AS zcr
FROM s
"""


# --------------------------------------------------------------------------
# Training-sequence assembly — stride chunking (pure codegen) and greedy
# next-fit token packing (sharded applyInPandas; recursive-CTE oracle).
# --------------------------------------------------------------------------


def q_doc_chunks(spark, sf_dir):
    from gotrackmaster_spark.operators.packing import chunk_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, chunk_tokens=64, stride_tokens=48)


def q_seq_packing(spark, sf_dir):
    from gotrackmaster_spark.operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(docs, budget=256, n_shards=8)


from gotrackmaster_spark.operators.packing import (  # noqa: E402
    sql_chunk_documents as _sql_chunks,
    sql_pack_sequences as _sql_pack,
)

SQL_DOC_CHUNKS = _sql_chunks(chunk_tokens=64, stride_tokens=48)
SQL_SEQ_PACKING = _sql_pack(budget=256, n_shards=8)


# --------------------------------------------------------------------------
# Incremental materialized view (plans/incremental.py) — commit a base
# table + a per-partition aggregate view, apply an upsert batch then a
# delete batch through Catalog.merge, refreshing the view INCREMENTALLY
# (only changed partitions recomputed) after each.  The oracle computes
# the final view directly from the fully-merged state, so a hash match
# proves the incremental path converges to the full recompute.
# --------------------------------------------------------------------------


def _iv_transform(df):
    return df.groupBy("part").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_incremental_view(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from gotrackmaster_spark.plans.checkpoint import Catalog
    from gotrackmaster_spark.plans.incremental import incremental_refresh

    root = os.path.join(tempfile.gettempdir(), f"incr_view_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    cat.commit(_merge_base(spark, sf_dir), "t", partition_col="part")
    s0 = cat.manifest("t")["snapshot_id"]
    cat.commit(_iv_transform(cat.load(spark, "t")), "v", partition_col="part")

    # batch 1: the merge_upsert update+insert source
    cat.merge(spark, "t", _merge_source(spark, sf_dir), key_cols=["part", "event_id"])
    m1, _ = incremental_refresh(spark, cat, "t", "v", _iv_transform, s0)

    # batch 2: delete every event_id % 13 == 0 row
    dels = geo_events(spark, sf_dir).filter(F.col("event_id") % 13 == 0).select(
        "event_id",
        (F.col("user_id") % _MERGE_NPART).cast("string").alias("part"),
        F.lit(0.0).alias("value"),
    )
    cat.merge(spark, "t", dels, key_cols=["part", "event_id"], when_matched="delete")
    incremental_refresh(
        spark, cat, "t", "v", _iv_transform, m1["metrics"]["src_snapshot_id"]
    )
    return cat.load(spark, "v").select("part", "n_rows", "sum_value")


SQL_INCREMENTAL_VIEW = f"""
WITH {GEO_CTE},
base AS (
  SELECT event_id, CAST(user_id % {_MERGE_NPART} AS VARCHAR) AS part,
         CAST(value AS DOUBLE) AS value
  FROM geo
),
src AS (
  SELECT event_id, CAST(user_id % {_MERGE_NPART} AS VARCHAR) AS part,
         CAST(value * -1.0 AS DOUBLE) AS value
  FROM geo WHERE event_id % 7 = 0
  UNION ALL
  SELECT event_id + 10000000 AS event_id,
         CAST(user_id % {_MERGE_NPART} AS VARCHAR) AS part,
         1.5 AS value
  FROM geo WHERE event_id % 11 = 0
),
merged AS (
  SELECT coalesce(s.part, b.part) AS part,
         coalesce(s.event_id, b.event_id) AS event_id,
         CASE WHEN s.event_id IS NOT NULL THEN s.value ELSE b.value END AS value
  FROM base b FULL OUTER JOIN src s
    ON b.part = s.part AND b.event_id = s.event_id
),
-- delete keys are raw event ids (< 10M), so inserted (+10M) rows never match
final AS (
  SELECT * FROM merged WHERE event_id % 13 != 0 OR event_id >= 10000000
)
SELECT part, count(*) AS n_rows, round(sum(value), 4) AS sum_value
FROM final GROUP BY part
"""


# --------------------------------------------------------------------------
# E7b — lossy-codec PSNR gate as a driver row (input_hint: "decoded-pixel
# allclose, PSNR>=40dB for lossy").  The Spark side measures the REAL
# decode against freshly generated reference pixels (so a codec bug moves
# the number); the oracle replays the qnt4 quantization error (pix % 4)
# in closed form.  log10 may differ in the last ULP between engines, so
# psnr_db is rounded to 1e-6 dB (error ~1e-13 dB).
# --------------------------------------------------------------------------


def q_image_psnr(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from gotrackmaster_spark.operators.images import (
        decode_image,
        gen_pixels,
        synthesize_images,
    )

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H).filter(
        F.col("fmt") == "qnt4"
    )

    def err(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for r in pdf.itertuples(index=False):
                got = decode_image(r.bytes, r.w, r.h, r.fmt).astype(np.int64)
                ref = gen_pixels(int(r.img_key), r.w, r.h).astype(np.int64)
                out.append(
                    {"image_id": r.image_id, "err_sum": int(((got - ref) ** 2).sum())}
                )
            yield pd.DataFrame(out)

    stats = imgs.mapInPandas(err, "image_id string, err_sum long")
    mse = F.col("err_sum") / F.lit(float(_N_PIX))
    psnr = F.round(F.lit(10.0) * F.log10(F.lit(255.0 * 255.0) / mse), 6)
    return stats.select(
        "image_id",
        "err_sum",
        psnr.alias("psnr_db"),
        (psnr >= 40.0).alias("meets_bar"),
    )


SQL_IMAGE_PSNR = f"""
WITH q AS (
  SELECT format('img{{:08d}}', doc_id) AS image_id,
         CAST(list_sum(list_transform(generate_series(0, {_N_PIX - 1}), i ->
              (({_PIX}) % 4) * (({_PIX}) % 4))) AS BIGINT) AS err_sum
  FROM documents WHERE doc_id % 3 = 2
)
SELECT image_id, err_sum,
       round(10.0 * log10(255.0 * 255.0 / (err_sum / {float(_N_PIX)})), 6) AS psnr_db,
       round(10.0 * log10(255.0 * 255.0 / (err_sum / {float(_N_PIX)})), 6) >= 40.0 AS meets_bar
FROM q
"""


# --------------------------------------------------------------------------
# E8 — density-based spatial clustering (grid DBSCAN).  Points are
# synthesized into 40 well-separated uniform blobs on a 6×7 grid
# (0.55° pitch, ±0.2° extent, gap 0.15° > eps) plus ~6 % uniform
# background noise — every coordinate is a single integer closed form
# divided by 1000.0, so Spark and DuckDB compute bit-identical doubles
# and the eps-disc membership test agrees exactly.  The oracle replays
# the full pipeline: 3×3 grid candidate join, core test, recursive-CTE
# transitive closure over the core graph, min-label border assignment.
# --------------------------------------------------------------------------

_DBSCAN_EPS = 0.05
_DBSCAN_MIN_PTS = 6


def blob_points(spark, sf_dir):
    """Dense synthetic region: 40 uniform blobs on a 6×7 grid (0.55°
    pitch, ±0.2° extent) + ~6 % uniform background noise — every
    coordinate one integer closed form / 1000.0, bit-identical in both
    engines.  Shared by `dbscan_clusters` and `density_raster_stats`."""
    ev = _t(spark, sf_dir, "events").select("event_id")
    noise = F.col("event_id") % 17 == 0
    b = F.col("event_id") % 40
    lat_milli = F.when(
        noise, (F.col("event_id") * F.lit(2654435761)) % 3850
    ).otherwise((b % 6) * 550 + 100 + (F.col("event_id") * 48271) % 401 - 200)
    lon_milli = F.when(
        noise, (F.col("event_id") * 40503 + 7) % 3850
    ).otherwise(
        F.expr("(event_id % 40) DIV 6") * 550
        + 100
        + (F.col("event_id") * 16807) % 401
        - 200
    )
    return ev.select(
        "event_id",
        (lat_milli / 1000.0).alias("lat"),
        (lon_milli / 1000.0).alias("lon"),
    )


_SQL_BLOB_PTS = """
  SELECT event_id,
         CAST(CASE WHEN event_id % 17 = 0 THEN (event_id * 2654435761) % 3850
              ELSE ((event_id % 40) % 6) * 550 + 100
                   + (event_id * 48271) % 401 - 200 END AS DOUBLE) / 1000.0 AS lat,
         CAST(CASE WHEN event_id % 17 = 0 THEN (event_id * 40503 + 7) % 3850
              ELSE ((event_id % 40) // 6) * 550 + 100
                   + (event_id * 16807) % 401 - 200 END AS DOUBLE) / 1000.0 AS lon
  FROM events
"""


def q_dbscan_clusters(spark, sf_dir):
    from gotrackmaster_spark.operators.clustering import dbscan

    pts = blob_points(spark, sf_dir)
    res = dbscan(
        pts, _DBSCAN_EPS, _DBSCAN_MIN_PTS, id_col="event_id", x_col="lon", y_col="lat"
    )
    return res.select("event_id", F.col("cluster").cast("long").alias("cluster"), "role")


SQL_DBSCAN_CLUSTERS = f"""
WITH RECURSIVE pts AS ({_SQL_BLOB_PTS}),
cells AS (
  SELECT event_id, lat, lon,
         CAST(floor(lon / {_DBSCAN_EPS}) AS BIGINT) AS cx,
         CAST(floor(lat / {_DBSCAN_EPS}) AS BIGINT) AS cy
  FROM pts
),
nbrs AS (
  SELECT a.event_id AS a_id, b.event_id AS b_id
  FROM cells a
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy
  JOIN cells b ON b.cx = a.cx + ox.dx AND b.cy = a.cy + oy.dy
  WHERE a.event_id <> b.event_id
    AND (a.lon - b.lon) * (a.lon - b.lon)
      + (a.lat - b.lat) * (a.lat - b.lat) <= {_DBSCAN_EPS} * {_DBSCAN_EPS}
),
core AS (
  -- count base = ALL points (isolated points have no nbrs row), so the
  -- |N| >= min_pts rule is exact down to min_pts = 1
  SELECT p.event_id AS pid
  FROM pts p LEFT JOIN (SELECT a_id, count(*) AS k FROM nbrs GROUP BY a_id) n
    ON n.a_id = p.event_id
  WHERE coalesce(n.k, 0) + 1 >= {_DBSCAN_MIN_PTS}
),
ed AS (
  SELECT n.a_id AS a, n.b_id AS b
  FROM nbrs n
  JOIN core ca ON ca.pid = n.a_id
  JOIN core cb ON cb.pid = n.b_id
),
reach AS (
  SELECT pid AS v, pid AS u FROM core
  UNION
  SELECT r.v, e.b FROM reach r JOIN ed e ON e.a = r.u
),
core_lab AS (SELECT v AS pid, min(u) AS cluster FROM reach GROUP BY v),
border AS (
  SELECT n.a_id AS pid, min(c.cluster) AS cluster
  FROM nbrs n JOIN core_lab c ON c.pid = n.b_id
  WHERE n.a_id NOT IN (SELECT pid FROM core)
  GROUP BY n.a_id
)
SELECT p.event_id,
       CAST(COALESCE(cl.cluster, bd.cluster, -1) AS BIGINT) AS cluster,
       CASE WHEN cl.pid IS NOT NULL THEN 'core'
            WHEN bd.pid IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM pts p
LEFT JOIN core_lab cl ON cl.pid = p.event_id
LEFT JOIN border bd ON bd.pid = p.event_id
"""


# --------------------------------------------------------------------------
# E7×E1 crossover — geo-constrained visual near-dups: same level-5 cell
# AND phash hamming <= 10.  The spatial cell replaces phash banding as
# the candidate cutter (one equi-join on the cell id); planted variants
# share their base's geotag, so every planted pair survives the geo
# constraint.  The oracle replays phash from the closed-form pixel
# generator AND the cell assignment from the geotags.
# --------------------------------------------------------------------------

def q_geo_phash_near_dups(spark, sf_dir):
    from gotrackmaster_spark.operators.images import (
        geo_phash_near_dups,
        synthesize_image_variants,
        synthesize_images,
    )

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    cols = ["img_key", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    both = imgs.select(*cols).unionByName(
        synthesize_image_variants(imgs, every=_PH_EVERY)
    )
    lat, lon = _img_geotag_cols(F.col("img_key"))
    sig = both.select(
        "image_id",
        "phash",
        F.shiftright(cell_col(lat, lon, 12), 14).alias("cell"),
    )
    return geo_phash_near_dups(sig, max_hamming=_PH_MAXHAM)


SQL_GEO_PHASH_NEAR_DUPS = f"""
WITH base_bs AS (
  SELECT doc_id, {_phash_bs_sql(_PIX_F)} AS bs FROM documents
),
var_bs AS (
  SELECT doc_id, {_phash_bs_sql(_PIX_VAR)} AS bs
  FROM documents WHERE doc_id % {_PH_EVERY} = 0
),
base AS (
  SELECT doc_id, format('img{{:08d}}', doc_id) AS image_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, bs, list_sum(bs) AS tot FROM base_bs)
),
vars AS (
  SELECT doc_id, format('var{{:08d}}', doc_id) AS image_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, bs, list_sum(bs) AS tot FROM var_bs)
),
all_imgs AS (SELECT * FROM base UNION ALL SELECT * FROM vars),
geo AS (
  SELECT image_id, phash, ({{CELL}} >> 14) AS cell
  FROM (
    SELECT image_id, phash,
           ((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0 AS lat,
           ((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0 AS lon
    FROM all_imgs
  )
)
SELECT a.image_id AS a_id, b.image_id AS b_id,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming,
       a.cell AS cell
FROM geo a JOIN geo b ON a.cell = b.cell AND a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {_PH_MAXHAM}
""".replace("{CELL}", cell_sql("lat", "lon", 12))


# --------------------------------------------------------------------------
# E7c — per-tile best-image mosaic selection: the basemap-mosaic
# primitive (pick the k best geotagged images per map tile, quality
# ordered, deterministic tie-break) via the SALTED two-phase top-k
# (operators/skew.py::salted_topk_per_key) so a hot tile (downtown at
# 10^12 images) never funnels through one reducer.  Quality score is a
# deterministic proxy (phash popcount ‖ keyed jitter) standing in for a
# decoded-sharpness metric; the oracle replays phash + geotags exactly
# and ranks with a plain window (salting is result-invariant).
# --------------------------------------------------------------------------

_MOSAIC_K = 3
_MOSAIC_LEVEL = 3  # 8x8 world grid -> multiple images per tile at sf0.01


def q_mosaic_topk(spark, sf_dir):
    from gotrackmaster_spark.operators.images import synthesize_images
    from gotrackmaster_spark.operators.skew import salted_topk_per_key

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    scored = imgs.select(
        "image_id",
        cell_col(F.col("lat"), F.col("lon"), _MOSAIC_LEVEL).alias("tile"),
        (
            F.bit_count(F.col("phash")).cast("long") * 10000
            + (F.col("img_key") * 48271) % 10000
        ).alias("score"),
        F.length("caption").cast("int").alias("caption_len"),
    )
    top = salted_topk_per_key(
        scored,
        ["tile"],
        [F.col("score").desc(), F.col("image_id").asc()],
        k=_MOSAIC_K,
        n_salt=8,
        salt_by="image_id",
        rank_col="mosaic_rank",
    )
    return top.select(
        "tile",
        F.col("mosaic_rank").cast("int").alias("mosaic_rank"),
        "image_id",
        "score",
        "caption_len",
    )


SQL_MOSAIC_TOPK = f"""
WITH base_bs AS (
  SELECT doc_id, length(text) AS caption_len, {_phash_bs_sql(_PIX_F)} AS bs
  FROM documents
),
base AS (
  SELECT doc_id, caption_len,
         format('img{{:08d}}', doc_id) AS image_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, caption_len, bs, list_sum(bs) AS tot FROM base_bs)
),
scored AS (
  SELECT image_id,
         {cell_sql('lat', 'lon', _MOSAIC_LEVEL)} AS tile,
         CAST(bit_count(phash) AS BIGINT) * 10000 + (doc_id * 48271) % 10000 AS score,
         CAST(caption_len AS INT) AS caption_len
  FROM (
    SELECT image_id, phash, doc_id, caption_len,
           ((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0 AS lat,
           ((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0 AS lon
    FROM base
  )
)
SELECT tile,
       CAST(row_number() OVER (PARTITION BY tile ORDER BY score DESC, image_id) AS INT)
         AS mosaic_rank,
       image_id, score, caption_len
FROM scored
QUALIFY mosaic_rank <= {_MOSAIC_K}
"""


# --------------------------------------------------------------------------
# E10 — map-matching: snap every event to its nearest ROAD SEGMENT
# within 0.5° (planar contract), then per-segment roll-up — the
# trajectory→road-network join via `spatial.map_match_join` (broadcast
# expanded-bbox grid covering, codegen clamped-projection distance,
# struct-min argmin — points shuffle once, on the argmin key).  The
# oracle replays the segment synthesis and distance exactly and picks
# the same (dist, seg_id)-ordered winner with a window.
# --------------------------------------------------------------------------

_MM_N_SEGS = 600
_MM_RADIUS = 0.5
_MM_GRID = 0.5


def road_segments(spark):
    """Deterministic synthetic road network: short segments (≤0.1° per
    axis) spread over the event region, exact-integer formulas."""
    s = F.col("id")
    x0 = (s * 7919) % 3600 / 10.0 - 180.0
    y0 = (s * 104729) % 1500 / 10.0 - 75.0
    dx = ((s * 131) % 21 - 10) / 100.0
    dy = ((s * 137) % 21 - 10) / 100.0
    return spark.range(_MM_N_SEGS).select(
        s.alias("seg_id"),
        x0.alias("x0"),
        y0.alias("y0"),
        (x0 + dx).alias("x1"),
        (y0 + dy).alias("y1"),
    )


def q_map_match(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import map_match_join

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon")
    best = map_match_join(
        pts, road_segments(spark), radius_deg=_MM_RADIUS, grid_deg=_MM_GRID
    )
    return best.groupBy("seg_id").agg(
        F.count("*").alias("n_matched"),
        F.round(F.sum("dist_deg"), 4).alias("sum_dist_r"),
    )


SQL_MAP_MATCH = f"""
WITH {GEO_CTE},
segs AS (
  SELECT s AS seg_id,
         ((s * 7919) % 3600) / 10.0 - 180.0 AS x0,
         ((s * 104729) % 1500) / 10.0 - 75.0 AS y0,
         ((s * 7919) % 3600) / 10.0 - 180.0 + (((s * 131) % 21) - 10) / 100.0 AS x1,
         ((s * 104729) % 1500) / 10.0 - 75.0 + (((s * 137) % 21) - 10) / 100.0 AS y1
  FROM range({_MM_N_SEGS}) t(s)
),
cand0 AS (
  SELECT g.event_id, s.seg_id, g.lon AS px, g.lat AS py,
         s.x0, s.y0, s.x1 - s.x0 AS dx, s.y1 - s.y0 AS dy
  FROM geo g JOIN segs s
    ON g.lon BETWEEN least(s.x0, s.x1) - {_MM_RADIUS + 1e-7} AND greatest(s.x0, s.x1) + {_MM_RADIUS + 1e-7}
   AND g.lat BETWEEN least(s.y0, s.y1) - {_MM_RADIUS + 1e-7} AND greatest(s.y0, s.y1) + {_MM_RADIUS + 1e-7}
),
cand1 AS (
  SELECT event_id, seg_id, px, py, x0, y0, dx, dy,
         CASE WHEN dx * dx + dy * dy = 0 THEN 0.0
              ELSE greatest(0.0, least(1.0,
                   ((px - x0) * dx + (py - y0) * dy) / (dx * dx + dy * dy)))
         END AS t
  FROM cand0
),
cand AS (
  SELECT event_id, seg_id,
         round(sqrt((px - (x0 + t * dx)) * (px - (x0 + t * dx))
                  + (py - (y0 + t * dy)) * (py - (y0 + t * dy))), 7) AS dist_r
  FROM cand1
),
best AS (
  SELECT event_id, seg_id, dist_r,
         row_number() OVER (PARTITION BY event_id ORDER BY dist_r, seg_id) AS rn
  FROM cand WHERE dist_r <= {_MM_RADIUS}
)
SELECT seg_id, count(*) AS n_matched, round(sum(dist_r), 4) AS sum_dist_r
FROM best WHERE rn = 1
GROUP BY seg_id
"""


# --------------------------------------------------------------------------
# E10b — segment-intersection self-join: proper crossings in a dense
# synthetic road network (`spatial.segment_intersection_join`) — grid
# equi-join candidates (shared covering cell; never all-pairs),
# orientation-test predicate and parametric crossing point in codegen.
# The oracle brute-forces all pairs with the identical predicate (the
# predicate implies bbox overlap implies a shared cell, so candidate
# topology cannot change the answer).
# --------------------------------------------------------------------------

_SI_N_SEGS = 500
_SI_GRID = 0.5


def dense_road_segments(spark):
    """Deterministic dense network in a 10°×10° region (segments ≤0.5°
    per axis) — enough crossings for a non-degenerate intersection set.
    The y/dy formulas carry a QUADRATIC term: with linear congruences
    only, (x0, y0) fall on a rank-1 lattice whose line spacing exceeds
    the segment length and the network has zero crossings."""
    s = F.col("id")
    x0 = (s * 7919) % 1000 / 100.0
    y0 = (s * s * 61 + s * 104729) % 1000 / 100.0
    dx = ((s * 131) % 21 - 10) / 20.0
    dy = ((s * s * 7 + s * 137) % 21 - 10) / 20.0
    return spark.range(_SI_N_SEGS).select(
        s.alias("seg_id"),
        x0.alias("x0"),
        y0.alias("y0"),
        (x0 + dx).alias("x1"),
        (y0 + dy).alias("y1"),
    )


def q_seg_intersections(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import segment_intersection_join

    return segment_intersection_join(dense_road_segments(spark), grid_deg=_SI_GRID)


SQL_SEG_INTERSECTIONS = f"""
WITH segs AS (
  SELECT s AS seg_id,
         ((s * 7919) % 1000) / 100.0 AS x0,
         ((s * s * 61 + s * 104729) % 1000) / 100.0 AS y0,
         ((s * 7919) % 1000) / 100.0 + (((s * 131) % 21) - 10) / 20.0 AS x1,
         ((s * s * 61 + s * 104729) % 1000) / 100.0 + (((s * s * 7 + s * 137) % 21) - 10) / 20.0 AS y1
  FROM range({_SI_N_SEGS}) t(s)
),
pairs AS (
  SELECT a.seg_id AS seg_a, b.seg_id AS seg_b,
         a.x0 AS ax, a.y0 AS ay, a.x1 AS bx, a.y1 AS by,
         b.x0 AS cx, b.y0 AS cy, b.x1 AS dx, b.y1 AS dy
  FROM segs a JOIN segs b ON a.seg_id < b.seg_id
),
tested AS (
  SELECT seg_a, seg_b, ax, ay, bx, by, cx, cy, dx, dy,
         (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) AS d1,
         (bx - ax) * (dy - ay) - (by - ay) * (dx - ax) AS d2,
         (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx) AS d3,
         (dx - cx) * (by - cy) - (dy - cy) * (bx - cx) AS d4
  FROM pairs
)
SELECT seg_a, seg_b,
       round(ax + (((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx))
                 / ((bx - ax) * (dy - cy) - (by - ay) * (dx - cx))) * (bx - ax), 6) AS ix_r,
       round(ay + (((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx))
                 / ((bx - ax) * (dy - cy) - (by - ay) * (dx - cx))) * (by - ay), 6) AS iy_r
FROM tested
WHERE d1 * d2 < 0 AND d3 * d4 < 0
"""


# --------------------------------------------------------------------------
# E9 — spatiotemporal co-location: distinct users in the same coarse
# cell within the same 1-day bucket (occupancy dedup → self equi-join
# on the composite key → pair aggregate).  Oracle replays the cell
# assignment and bucket floor exactly.
# --------------------------------------------------------------------------

_COLOC_BUCKET_US = 86_400_000_000


def q_colocation_pairs(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import colocation_pairs

    ev = geo_events(spark, sf_dir).select("user_id", "lat", "lon", "ts")
    return colocation_pairs(ev, level=12, coarse_shift=14, bucket_us=_COLOC_BUCKET_US)


SQL_COLOCATION_PAIRS = f"""
WITH {GEO_CTE},
occ AS (
  SELECT DISTINCT user_id AS u,
         ({cell_sql('lat', 'lon', 12)} >> 14) AS cell,
         epoch_us(ts) - ((epoch_us(ts) % {_COLOC_BUCKET_US} + {_COLOC_BUCKET_US}) % {_COLOC_BUCKET_US}) AS bucket
  FROM geo
)
SELECT a.u AS user_a, b.u AS user_b, count(*) AS n_shared
FROM occ a JOIN occ b ON a.cell = b.cell AND a.bucket = b.bucket
WHERE a.u < b.u
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E8b — inverse-distance-weighted (IDW) spatial interpolation: estimate
# the event `value` field at each POI from events within 300 km,
# weights 1/d² on the exact haversine.  Pure composition over
# `within_radius_join` (broadcast circle covering + codegen refine) —
# one more map-side-combinable weighted aggregate on top.  Exact-hit
# rows (d == 0, possible on the synthetic lattice) are excluded in both
# engines: they would be Dirac weights; callers wanting the exact-hit
# override handle d == 0 separately.  Ratio rounded to 4 dp (two
# independent double sums; summation order differs across engines).
# --------------------------------------------------------------------------

def q_idw_interpolation(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import within_radius_join

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon", "value")
    hits = within_radius_join(
        pts, poi_centers(spark), _POI_RADIUS_M, level=7, id_col="poi_id"
    ).filter(F.col("dist_m") > 0)
    w = F.lit(1.0) / (F.col("dist_m") * F.col("dist_m"))
    return hits.groupBy("poi_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value") * w) / F.sum(w), 4).alias("idw_value_r"),
    )


SQL_IDW_INTERPOLATION = f"""
WITH {GEO_CTE},
poi AS (
  SELECT i AS poi_id,
         ((i * 7919) % 1500) / 10.0 - 75.0 AS lat,
         ((i * 104729) % 3600) / 10.0 - 180.0 AS lon
  FROM range({_POI_N}) t(i)
),
hits AS (
  SELECT p.poi_id, g.value, {_POI_DIST} AS dist_m
  FROM geo g JOIN poi p
    ON {_POI_DIST} < {_POI_RADIUS_M!r} AND {_POI_DIST} > 0
)
SELECT poi_id, count(*) AS n_events,
       round(sum(value / (dist_m * dist_m)) / sum(1.0 / (dist_m * dist_m)), 4)
         AS idw_value_r
FROM hits GROUP BY poi_id
"""


# --------------------------------------------------------------------------
# E1c — hierarchical cell-set COMPACTION (H3 `compact` analogue on the
# Z-quadtree): the occupied level-6 cells of the events table, with
# every complete sibling quad recursively replaced by its parent — the
# canonical minimal multi-level covering.  The oracle replays all six
# merge rounds as chained CTEs (complete-quad test per level) and the
# marker-bit level ladder exactly.
# --------------------------------------------------------------------------

_COMPACT_LEVEL = 6


def _sql_cell_level_ladder(level: int) -> str:
    terms = " ".join(
        f"WHEN cell >= {1 << (2 * lv)} THEN {lv}" for lv in range(level, 0, -1)
    )
    return f"CAST(CASE {terms} ELSE 0 END AS INT)"


def _sql_compact(base_select: str, level: int) -> str:
    parts = [f"s{level} AS ({base_select})"]
    union_terms = []
    for lv in range(level, 0, -1):
        parts.append(
            f"m{lv} AS (SELECT cell // 4 AS p FROM s{lv} GROUP BY 1 HAVING count(*) = 4)"
        )
        parts.append(
            f"f{lv} AS (SELECT cell FROM s{lv} "
            f"WHERE cell // 4 NOT IN (SELECT p FROM m{lv}))"
        )
        parts.append(f"s{lv - 1} AS (SELECT p AS cell FROM m{lv})")
        union_terms.append(f"SELECT cell FROM f{lv}")
    union_terms.append("SELECT cell FROM s0")
    body = " UNION ALL ".join(union_terms)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT cell, {_sql_cell_level_ladder(level)} AS level FROM ({body})"
    )


def q_compact_cells(spark, sf_dir):
    from gotrackmaster_spark.functions.cells import compact_cells

    occ = geo_events(spark, sf_dir).select(
        cell_col(F.col("lat"), F.col("lon"), _COMPACT_LEVEL).alias("cell")
    )
    out = compact_cells(occ)
    return out.select("cell", F.col("level").cast("int").alias("level"))


SQL_COMPACT_CELLS = _sql_compact(
    f"SELECT DISTINCT {cell_sql(_LAT, _LON, _COMPACT_LEVEL)} AS cell FROM events",
    _COMPACT_LEVEL,
)


# --------------------------------------------------------------------------
# E7b — image QUALITY FUNNEL over decoded payloads: per format, how many
# images survive each gate and all gates — the payload-side analogue of
# the text filter funnel.  The variance gate is integer-exact
# (N·Σx² − (Σx)², no floating point); the phash-balance gate checks the
# 64-bit signature is not degenerate; the caption gate is a length
# floor.  The oracle replays pixel sums, squared sums (with the qnt4
# quantization branch) and the phash from the closed-form generator.
# --------------------------------------------------------------------------

# The synthetic generator's pixel multiset is doc-independent (i·odd mod
# 256 cycles uniformly), so N²·var is CONSTANT per format: 28 990 586 880
# for raw/png, 28 983 951 360 for qnt4 (quantization loses variance) — a
# threshold between them makes the variance gate a real lossy-payload
# detector.  The phash and caption gates split on per-image variation.
_IQF_VAR_MIN = 28_990_000_000
_IQF_CAP_MIN = 200
_IQF_PH_LO, _IQF_PH_HI = 32, 40


def q_image_quality_funnel(spark, sf_dir):
    from gotrackmaster_spark.operators.images import decode_stats, synthesize_images

    st = decode_stats(synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H))
    nvar2 = F.lit(_N_PIX) * F.col("pixel_sq") - F.col("pixel_sum") * F.col("pixel_sum")
    pbits = F.bit_count(F.col("phash"))
    g_var = nvar2 >= F.lit(_IQF_VAR_MIN)
    g_cap = F.col("caption_len") >= _IQF_CAP_MIN
    g_ph = (pbits >= _IQF_PH_LO) & (pbits <= _IQF_PH_HI)
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return st.groupBy("fmt").agg(
        F.count("*").alias("n_total"),
        one(g_var).alias("n_var_ok"),
        one(g_cap).alias("n_caption_ok"),
        one(g_ph).alias("n_phash_ok"),
        one(g_var & g_cap & g_ph).alias("n_all_ok"),
    )


SQL_IMAGE_QUALITY_FUNNEL = f"""
WITH base_bs AS (
  -- phash over the DECODED pixels (the engine hashes decode_stats
  -- output, which for qnt4 is quantized) — _PIX_DEC, not _PIX_F
  SELECT doc_id, {_phash_bs_sql(_PIX_DEC)} AS bs FROM documents
),
ph AS (
  SELECT doc_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, bs, list_sum(bs) AS tot FROM base_bs)
),
px AS (
  SELECT doc_id,
         ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
         list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                  i -> {_PIX_DEC.replace('{{f}}', 'i').replace('{f}', 'i')})) AS pixel_sum,
         list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                  i -> ({_PIX_DEC.replace('{{f}}', 'i').replace('{f}', 'i')})
                     * ({_PIX_DEC.replace('{{f}}', 'i').replace('{f}', 'i')}))) AS pixel_sq,
         length(text) AS caption_len
  FROM documents
),
j AS (
  SELECT px.fmt,
         {_N_PIX} * px.pixel_sq - px.pixel_sum * px.pixel_sum AS nvar2,
         px.caption_len, bit_count(ph.phash) AS pbits
  FROM px JOIN ph USING (doc_id)
)
SELECT fmt, count(*) AS n_total,
       CAST(sum(CASE WHEN nvar2 >= {_IQF_VAR_MIN} THEN 1 ELSE 0 END) AS BIGINT) AS n_var_ok,
       CAST(sum(CASE WHEN caption_len >= {_IQF_CAP_MIN} THEN 1 ELSE 0 END) AS BIGINT) AS n_caption_ok,
       CAST(sum(CASE WHEN pbits BETWEEN {_IQF_PH_LO} AND {_IQF_PH_HI} THEN 1 ELSE 0 END) AS BIGINT) AS n_phash_ok,
       CAST(sum(CASE WHEN nvar2 >= {_IQF_VAR_MIN} AND caption_len >= {_IQF_CAP_MIN}
                      AND pbits BETWEEN {_IQF_PH_LO} AND {_IQF_PH_HI}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_all_ok
FROM j GROUP BY fmt
"""


# --------------------------------------------------------------------------
# E4×E7 crossover (geo → image): per-1°-tile density heatmaps RENDERED
# AS REAL PNG PAYLOADS (16×16 RGB, channel value = min(255, count)),
# then fed back through the standard decode machinery — a tile server's
# "aggregate → raster → encode" path, proven lossless end-to-end: the
# oracle computes the expected pixel sums and squared sums from the
# sub-pixel counts in closed form, so any defect in render, PNG encode,
# or decode hash-fails.
# --------------------------------------------------------------------------

def q_density_raster_stats(spark, sf_dir):
    from gotrackmaster_spark.operators.images import (
        decode_stats,
        render_density_rasters,
    )

    rasters = render_density_rasters(blob_points(spark, sf_dir), px=16)
    st = decode_stats(rasters)
    return st.select(
        F.col("image_id").alias("tile"), "pixel_sum", "pixel_sq", "w", "h"
    )


SQL_DENSITY_RASTER_STATS = f"""
WITH pts AS ({_SQL_BLOB_PTS}),
sub AS (
  SELECT CAST(floor(lat) AS BIGINT) AS ty, CAST(floor(lon) AS BIGINT) AS tx,
         CAST(least(floor((lat - floor(lat)) * 16), 15) AS INT) AS sy,
         CAST(least(floor((lon - floor(lon)) * 16), 15) AS INT) AS sx
  FROM pts
),
c AS (SELECT ty, tx, sy, sx, count(*) AS cnt FROM sub GROUP BY 1, 2, 3, 4)
SELECT 't' || ty || '_' || tx AS tile,
       CAST(3 * sum(least(cnt, 255)) AS BIGINT) AS pixel_sum,
       CAST(3 * sum(least(cnt, 255) * least(cnt, 255)) AS BIGINT) AS pixel_sq,
       CAST(16 AS INT) AS w, CAST(16 AS INT) AS h
FROM c GROUP BY ty, tx
"""


# --------------------------------------------------------------------------
# E2e — batch geofence: polygon ENTRY detection per (user, polygon).
# A user "enters" a polygon at event i when event i is inside and the
# user's previous event (global per-user sequence) was not inside the
# same polygon.  Only INSIDE rows ever materialize (the PIP join emits
# hits, absence = outside), so the events×polygons cross never exists;
# the entry test is a lag over (user, poly) on the user-sequence number.
# --------------------------------------------------------------------------

def q_geofence_entries(spark, sf_dir):
    from pyspark.sql import Window

    from gotrackmaster_spark.operators.spatial import point_in_polygon_join

    ev = geo_events(spark, sf_dir).select("event_id", "user_id", "ts", "lat", "lon")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("rn", F.row_number().over(w_user))
    hits = point_in_polygon_join(
        seq.select("event_id", "user_id", "rn", "lat", "lon"),
        rect_polygons(spark, sf_dir),
        level=7,
    )
    w_up = Window.partitionBy("user_id", "poly_id").orderBy("rn")
    prev_rn = F.lag("rn").over(w_up)
    flagged = hits.withColumn(
        "is_entry",
        F.when(prev_rn.isNull() | (F.col("rn") - prev_rn > 1), 1).otherwise(0),
    )
    return flagged.groupBy("user_id", "poly_id").agg(
        F.sum("is_entry").alias("n_entries"),
        F.count("*").alias("n_inside"),
        F.min("rn").cast("long").alias("first_rn"),
    )


SQL_GEOFENCE_ENTRIES = f"""
WITH {GEO_CTE},
seq AS (
  SELECT event_id, user_id, lat, lon,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM geo
),
rects AS ({_RECT_SQL}),
hits AS (
  SELECT s.user_id, r.poly_id, s.rn
  FROM seq s JOIN rects r
    ON s.lat > r.lat0 AND s.lat < r.lat1 AND s.lon > r.lon0 AND s.lon < r.lon1
),
flagged AS (
  SELECT user_id, poly_id, rn,
         CASE WHEN lag(rn) OVER (PARTITION BY user_id, poly_id ORDER BY rn)
                   IS NULL
              OR rn - lag(rn) OVER (PARTITION BY user_id, poly_id ORDER BY rn) > 1
              THEN 1 ELSE 0 END AS is_entry
  FROM hits
)
SELECT user_id, poly_id,
       CAST(sum(is_entry) AS BIGINT) AS n_entries,
       count(*) AS n_inside,
       CAST(min(rn) AS BIGINT) AS first_rn
FROM flagged GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# W1b — movement analytics: per-user LEG BEARINGS and TURN ANGLES.
# Bearing = initial great-circle azimuth per consecutive-point leg
# (lag window); turn = signed, normalized bearing change between
# consecutive legs, in (-180, 180].  Aggregates per user: leg count,
# mean |turn| (zigzag/noise indicator), sharp-turn count (|turn|>120).
# Pure codegen trig over windows — one shuffle on user_id.
# --------------------------------------------------------------------------

def q_turn_stats(spark, sf_dir):
    from pyspark.sql import Window

    pts = geo_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brg = bearing_col(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    )
    legs = pts.select("user_id", "ts", "event_id", brg.alias("brg")).filter(
        F.col("brg").isNotNull()
    )
    turn = (F.col("brg") - F.lag("brg").over(w) + 540.0) % 360.0 - 180.0
    turns = legs.select("user_id", turn.alias("turn")).filter(
        F.col("turn").isNotNull()
    )
    return turns.groupBy("user_id").agg(
        F.count("*").alias("n_turns"),
        F.round(F.avg(F.abs(F.col("turn"))), 4).alias("mean_abs_turn_r"),
        F.sum(F.when(F.abs(F.col("turn")) > 120.0, 1).otherwise(0)).alias("n_sharp"),
    )


_BRG_SQL = bearing_sql("prev_lat", "prev_lon", "lat", "lon")

SQL_TURN_STATS = f"""
WITH {GEO_CTE},
o AS (
  SELECT user_id, ts, event_id, lat, lon,
         lag(lat) OVER w AS prev_lat, lag(lon) OVER w AS prev_lon
  FROM geo
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
legs AS (
  SELECT user_id, ts, event_id, {_BRG_SQL} AS brg
  FROM o WHERE prev_lat IS NOT NULL
),
turns AS (
  SELECT user_id,
         (brg - lag(brg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          + 540.0) % 360.0 - 180.0 AS turn
  FROM legs
)
SELECT user_id, count(*) AS n_turns,
       round(avg(abs(turn)), 4) AS mean_abs_turn_r,
       CAST(sum(CASE WHEN abs(turn) > 120.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sharp
FROM turns WHERE turn IS NOT NULL GROUP BY user_id
"""


# --------------------------------------------------------------------------
# E11 — morphological operators over grid-cell sets: dilation (cell-set
# buffer) and erosion (interior cells) of each event type's coverage
# region on a 5° lattice (`spatial.cell_set_dilate` / `cell_set_erode`).
# Both are bounded ×9 explodes + hash aggregates — linear, no joins
# (erode's occupancy==9 already implies membership).  The oracle replays
# the identical offset algebra with a 9-row offsets CTE.
# --------------------------------------------------------------------------

_MORPH_G = 5.0
_bound_morph_cache = make_bounded_cache()  # previous call's distinct cell set


def q_cell_morphology(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import cell_set_dilate, cell_set_erode

    geo = geo_events(spark, sf_dir)
    # the base/dilate/erode branches all consume the same distinct cell
    # set — cache the tiny (event_type, gx, gy) rows so the points-scale
    # scan + distinct runs ONCE, not three times (bounded-lifetime slot,
    # same policy as zonal/dedup)
    cells = _bound_morph_cache(
        geo.select(
            "event_type",
            F.floor(F.col("lon") / _MORPH_G).cast("long").alias("gx"),
            F.floor(F.col("lat") / _MORPH_G).cast("long").alias("gy"),
        ).distinct()
    )
    base = cells.groupBy("event_type").agg(F.count("*").alias("n_cells"))
    dil = (
        cell_set_dilate(cells, ["event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_dilated"))
    )
    ero = (
        cell_set_erode(cells, ["event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_eroded"))
    )
    return (
        base.join(dil, "event_type")
        .join(ero, "event_type", "left")
        .select(
            "event_type",
            "n_cells",
            "n_dilated",
            F.coalesce(F.col("n_eroded"), F.lit(0)).alias("n_eroded"),
        )
    )


SQL_CELL_MORPHOLOGY = f"""
WITH {GEO_CTE},
cells AS (
  SELECT DISTINCT event_type,
         CAST(floor(lon / {_MORPH_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_MORPH_G}) AS BIGINT) AS gy
  FROM geo
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
dil AS (
  SELECT DISTINCT event_type, gx + dx AS gx, gy + dy AS gy FROM cells, off
),
occ AS (
  SELECT event_type, gx + dx AS gx, gy + dy AS gy, count(*) AS c
  FROM cells, off GROUP BY 1, 2, 3
),
ero AS (
  SELECT c.event_type, c.gx, c.gy
  FROM cells c
  JOIN occ o ON o.event_type = c.event_type AND o.gx = c.gx AND o.gy = c.gy
  WHERE o.c = 9
)
SELECT b.event_type, b.n_cells, d.n_dilated, COALESCE(e.n_eroded, 0) AS n_eroded
FROM (SELECT event_type, count(*) AS n_cells FROM cells GROUP BY 1) b
JOIN (SELECT event_type, count(*) AS n_dilated FROM dil GROUP BY 1) d USING (event_type)
LEFT JOIN (SELECT event_type, count(*) AS n_eroded FROM ero GROUP BY 1) e USING (event_type)
"""


# --------------------------------------------------------------------------
# E12 — per-user track diameter: convex hull + vectorized antipodal scan
# in ONE Arrow batch per user (`spatial.track_diameter`, O(n log n + h²))
# vs the oracle's O(n²) per-user all-pairs brute force — same answer,
# bit-identical arithmetic (subtract/square/add/sqrt in the same order),
# radically different plan at 10⁶-point tracks.
# --------------------------------------------------------------------------

def q_track_diameter(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import track_diameter

    pts = geo_events(spark, sf_dir).select("user_id", "lat", "lon")
    return track_diameter(pts, group_col="user_id").select(
        "user_id", "diam_deg", "n_pts"
    )


SQL_TRACK_DIAMETER = f"""
WITH {GEO_CTE},
pairs AS (
  SELECT a.user_id,
         max((a.lon - b.lon) * (a.lon - b.lon)
           + (a.lat - b.lat) * (a.lat - b.lat)) AS d2
  FROM geo a JOIN geo b ON a.user_id = b.user_id AND a.event_id <= b.event_id
  GROUP BY a.user_id
)
SELECT p.user_id, round(sqrt(p.d2), 7) AS diam_deg, n.n_pts
FROM pairs p
JOIN (SELECT user_id, count(*) AS n_pts FROM geo GROUP BY 1) n USING (user_id)
"""


# --------------------------------------------------------------------------
# E13 — mobility statistics per user: radius of gyration (haversine from
# the rounded centroid), visited-cell entropy, and top-cell share — the
# classic human-mobility metrics, pure codegen.  The points side is
# never shuffled for the centroid (broadcast join of the tiny per-user
# centroid table); both aggregate branches are map-side combinable.
# Entropy uses H = ln(n) − (Σ c·ln c)/n so no per-row division happens
# before the aggregate.
# --------------------------------------------------------------------------

def q_mobility_stats(spark, sf_dir):
    geo = geo_events(spark, sf_dir)
    cent = geo.groupBy("user_id").agg(
        F.round(F.avg("lat"), 6).alias("c_lat"),
        F.round(F.avg("lon"), 6).alias("c_lon"),
    )
    d = haversine_col(F.col("lat"), F.col("lon"), F.col("c_lat"), F.col("c_lon"))
    rog = (
        geo.join(F.broadcast(cent), "user_id")
        .select("user_id", d.alias("d"))
        .groupBy("user_id")
        .agg(F.round(F.sqrt(F.avg(F.col("d") * F.col("d"))), 1).alias("rog_m"))
    )
    cellcnt = (
        geo.select("user_id", cell_col(F.col("lat"), F.col("lon"), 3).alias("cell"))
        .groupBy("user_id", "cell")
        .agg(F.count("*").alias("c"))
    )
    ent = (
        cellcnt.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_pts"),
            F.count("*").alias("n_cells"),
            F.max("c").alias("top_c"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("clogc"),
        )
        .select(
            "user_id",
            "n_pts",
            "n_cells",
            F.round(
                F.log(F.col("n_pts")) - F.col("clogc") / F.col("n_pts"), 4
            ).alias("entropy_r"),
            F.round(F.col("top_c") / F.col("n_pts"), 6).alias("top_share_r"),
        )
    )
    return ent.join(rog, "user_id")


_MOB_HAV = haversine_sql("g.lat", "g.lon", "c.c_lat", "c.c_lon")

SQL_MOBILITY_STATS = f"""
WITH {GEO_CTE},
cent AS (
  SELECT user_id, round(avg(lat), 6) AS c_lat, round(avg(lon), 6) AS c_lon
  FROM geo GROUP BY user_id
),
rog AS (
  SELECT g.user_id, round(sqrt(avg(({_MOB_HAV}) * ({_MOB_HAV}))), 1) AS rog_m
  FROM geo g JOIN cent c USING (user_id)
  GROUP BY g.user_id
),
cellcnt AS (
  SELECT user_id, {cell_sql('lat', 'lon', 3)} AS cell, count(*) AS c
  FROM geo GROUP BY 1, 2
),
ent AS (
  SELECT user_id,
         CAST(sum(c) AS BIGINT) AS n_pts,
         count(*) AS n_cells,
         round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c), 4)
           AS entropy_r,
         round(max(c) / (1.0 * sum(c)), 6) AS top_share_r
  FROM cellcnt GROUP BY user_id
)
SELECT e.user_id, e.n_pts, e.n_cells, e.entropy_r, e.top_share_r, r.rog_m
FROM ent e JOIN rog r USING (user_id)
"""


# --------------------------------------------------------------------------
# E14 — polygon shoelace area + area-weighted centroid over jittered
# quadrilaterals (`functions/geometry.py`): the whole computation is
# Catalyst higher-order functions (zip_with + aggregate) on the ring
# array — NO explode, NO window, NO shuffle; a pure row-local scan.
# The oracle replays the four cross terms in the identical left-fold
# order, so the sums are bit-exact.
# --------------------------------------------------------------------------

def _quad_polygons(spark, sf_dir):
    """Deterministic non-rectangular simple quads: the customer rects
    with per-corner jitter in [0, 0.495] (< half the min side, so the
    quad stays simple and counter-clockwise)."""
    cust = _t(spark, sf_dir, "customer")
    n = F.col("c_custkey").cast("long")
    lat0 = ((n * 911) % 150 - 75).cast("double") + 0.00005
    lat1 = lat0 + (3 + (n % 5)).cast("double")
    lon0 = ((n * 1931) % 340 - 170).cast("double") + 0.00005
    lon1 = lon0 + (4 + (n % 7)).cast("double")

    def j(p):
        return ((n * p) % 100).cast("double") / 200.0

    ring = F.array(
        F.struct((lat0 + j(7)).alias("lat"), (lon0 + j(13)).alias("lon")),
        F.struct((lat0 + j(17)).alias("lat"), (lon1 + j(23)).alias("lon")),
        F.struct((lat1 + j(29)).alias("lat"), (lon1 + j(37)).alias("lon")),
        F.struct((lat1 + j(41)).alias("lat"), (lon0 + j(47)).alias("lon")),
    )
    return cust.select(
        F.col("c_custkey").cast("string").alias("poly_id"), ring.alias("ring")
    )


def q_poly_geometry(spark, sf_dir):
    from gotrackmaster_spark.functions.geometry import (
        ring_centroid,
        ring_shoelace_area,
    )

    quads = _quad_polygons(spark, sf_dir)
    cx, cy = ring_centroid(F.col("ring"))
    return quads.select(
        "poly_id",
        F.round(ring_shoelace_area(F.col("ring")), 6).alias("area_r"),
        F.round(cx, 6).alias("cx_r"),
        F.round(cy, 6).alias("cy_r"),
    )


SQL_POLY_GEOMETRY = """
WITH base AS (
  SELECT CAST(c_custkey AS VARCHAR) AS poly_id,
         CAST(c_custkey AS BIGINT) AS n,
         CAST((CAST(c_custkey AS BIGINT) * 911) % 150 - 75 AS DOUBLE) + 0.00005 AS lat0,
         CAST((CAST(c_custkey AS BIGINT) * 1931) % 340 - 170 AS DOUBLE) + 0.00005 AS lon0
  FROM customer
),
quads AS (
  SELECT poly_id,
         lat0 + CAST((n * 7) % 100 AS DOUBLE) / 200.0 AS y1,
         lon0 + CAST((n * 13) % 100 AS DOUBLE) / 200.0 AS x1,
         lat0 + CAST((n * 17) % 100 AS DOUBLE) / 200.0 AS y2,
         (lon0 + CAST(4 + (n % 7) AS DOUBLE)) + CAST((n * 23) % 100 AS DOUBLE) / 200.0 AS x2,
         (lat0 + CAST(3 + (n % 5) AS DOUBLE)) + CAST((n * 29) % 100 AS DOUBLE) / 200.0 AS y3,
         (lon0 + CAST(4 + (n % 7) AS DOUBLE)) + CAST((n * 37) % 100 AS DOUBLE) / 200.0 AS x3,
         (lat0 + CAST(3 + (n % 5) AS DOUBLE)) + CAST((n * 41) % 100 AS DOUBLE) / 200.0 AS y4,
         lon0 + CAST((n * 47) % 100 AS DOUBLE) / 200.0 AS x4
  FROM base
),
terms AS (
  SELECT poly_id,
         x1 * y2 - x2 * y1 AS t1,
         x2 * y3 - x3 * y2 AS t2,
         x3 * y4 - x4 * y3 AS t3,
         x4 * y1 - x1 * y4 AS t4,
         (x1 + x2) * (x1 * y2 - x2 * y1) AS sx1,
         (x2 + x3) * (x2 * y3 - x3 * y2) AS sx2,
         (x3 + x4) * (x3 * y4 - x4 * y3) AS sx3,
         (x4 + x1) * (x4 * y1 - x1 * y4) AS sx4,
         (y1 + y2) * (x1 * y2 - x2 * y1) AS sy1,
         (y2 + y3) * (x2 * y3 - x3 * y2) AS sy2,
         (y3 + y4) * (x3 * y4 - x4 * y3) AS sy3,
         (y4 + y1) * (x4 * y1 - x1 * y4) AS sy4
  FROM quads
)
SELECT poly_id,
       round(((((t1 + t2) + t3) + t4)) / 2.0, 6) AS area_r,
       round((((sx1 + sx2) + sx3) + sx4) / (3.0 * (((t1 + t2) + t3) + t4)), 6) AS cx_r,
       round((((sy1 + sy2) + sy3) + sy4) / (3.0 * (((t1 + t2) + t3) + t4)), 6) AS cy_r
FROM terms
"""


# --------------------------------------------------------------------------
# E15 — cell visitor retention: per level-3 cell, how many (user, week)
# visits recur in the NEXT week — the cohort-retention shape over the
# spatial lattice.  Events collapse to DISTINCT (user, cell, week)
# occupancy FIRST (map-side combinable), so the self-join runs on the
# bounded occupancy table, co-partitioned on identical keys.
# --------------------------------------------------------------------------

_RET_BUCKET_US = 7 * 86400 * 1_000_000


def q_cell_retention(spark, sf_dir):
    geo = geo_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = _RET_BUCKET_US
    occ = geo.select(
        "user_id",
        cell_col(F.col("lat"), F.col("lon"), 3).alias("cell"),
        ((us - (((us % b) + b) % b)) / b).cast("long").alias("week"),
    ).distinct()
    nxt = occ.select(
        "user_id", "cell", (F.col("week") - 1).alias("week")
    )
    retained = occ.join(nxt, ["user_id", "cell", "week"], "left_semi")
    return (
        occ.groupBy("cell")
        .agg(F.count("*").alias("n_user_weeks"))
        .join(
            retained.groupBy("cell").agg(F.count("*").alias("n_retained")),
            "cell",
            "left",
        )
        .select(
            "cell",
            "n_user_weeks",
            F.coalesce(F.col("n_retained"), F.lit(0)).alias("n_retained"),
        )
    )


SQL_CELL_RETENTION = f"""
WITH {GEO_CTE},
occ AS (
  SELECT DISTINCT user_id,
         {cell_sql('lat', 'lon', 3)} AS cell,
         CAST((epoch_us(ts) - ((epoch_us(ts) % {_RET_BUCKET_US} + {_RET_BUCKET_US}) % {_RET_BUCKET_US})) / {_RET_BUCKET_US} AS BIGINT) AS week
  FROM geo
),
ret AS (
  SELECT o.cell, count(*) AS n_retained
  FROM occ o
  WHERE EXISTS (
    SELECT 1 FROM occ n
    WHERE n.user_id = o.user_id AND n.cell = o.cell AND n.week = o.week + 1
  )
  GROUP BY o.cell
)
SELECT b.cell, b.n_user_weeks, COALESCE(r.n_retained, 0) AS n_retained
FROM (SELECT cell, count(*) AS n_user_weeks FROM occ GROUP BY 1) b
LEFT JOIN ret r USING (cell)
"""


# --------------------------------------------------------------------------
# E16 — space-time ROLLUP: event counts by (coarse cell, month) with
# per-cell and grand totals in ONE pass — Spark's grouping-sets operator
# (`rollup`), whose partial aggregates expand the grouping sets map-side
# so the points never shuffle once per level (vs the UNION-of-groupBys a
# naive formulation runs).  DuckDB replays with GROUP BY ROLLUP.
# --------------------------------------------------------------------------

def q_st_rollup(spark, sf_dir):
    geo = geo_events(spark, sf_dir)
    base = geo.select(
        F.shiftright(cell_col(F.col("lat"), F.col("lon"), 12), 14)
        .cast("string")
        .alias("cell"),
        F.date_format(F.col("ts"), "yyyy-MM").alias("month"),
    )
    return base.rollup("cell", "month").agg(F.count("*").alias("n"))


SQL_ST_ROLLUP = f"""
WITH {GEO_CTE},
base AS (
  SELECT CAST(({cell_sql('lat', 'lon', 12)} >> 14) AS VARCHAR) AS cell,
         strftime(ts, '%Y-%m') AS month
  FROM geo
)
SELECT cell, month, count(*) AS n
FROM base GROUP BY ROLLUP (cell, month)
"""


# --------------------------------------------------------------------------
# E17 — uniform time-grid resampling (`timeseries.resample_time_grid`):
# each user's irregular fix series re-emitted on the weekly grid with
# linearly interpolated positions — the fixed-rate view a sequence
# model consumes.  One window exchange + a codegen sequence/explode;
# inverted/duplicate-timestamp legs are dropped BEFORE the explode
# (Spark's sequence steps backwards on inverted ranges — the
# interval-join hazard), and duplicate-ts pairing is made deterministic
# by the event_id tiebreak so the oracle replays it exactly.
# --------------------------------------------------------------------------

_RESAMPLE_US = 7 * 86400 * 1_000_000


def q_resample_grid(spark, sf_dir):
    from gotrackmaster_spark.operators.timeseries import resample_time_grid

    geo = geo_events(spark, sf_dir).select("user_id", "event_id", "ts", "lat", "lon")
    grid = resample_time_grid(
        geo, _RESAMPLE_US, tiebreak_col="event_id"
    )
    return grid.groupBy("user_id").agg(
        F.count("*").alias("n_grid"),
        F.round(F.sum("g_lat"), 4).alias("sum_glat_r"),
        F.round(F.sum("g_lon"), 4).alias("sum_glon_r"),
    )


SQL_RESAMPLE_GRID = f"""
WITH {GEO_CTE},
o AS (
  SELECT user_id, epoch_us(ts) AS t0, lat, lon,
         lead(epoch_us(ts)) OVER w AS t1,
         lead(lat) OVER w AS lat1, lead(lon) OVER w AS lon1
  FROM geo
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
legs AS (SELECT * FROM o WHERE t1 > t0),
ticks AS (
  SELECT user_id, t0, t1, lat, lon, lat1, lon1, g.k AS k
  FROM legs,
       UNNEST(generate_series((t0 + {_RESAMPLE_US - 1}) // {_RESAMPLE_US},
                              (t1 + {_RESAMPLE_US - 1}) // {_RESAMPLE_US} - 1)) AS g(k)
),
interp AS (
  SELECT user_id,
         lat + ((k * {_RESAMPLE_US} - t0) / (t1 - t0)) * (lat1 - lat) AS g_lat,
         lon + ((k * {_RESAMPLE_US} - t0) / (t1 - t0)) * (lon1 - lon) AS g_lon
  FROM ticks
)
SELECT user_id, count(*) AS n_grid,
       round(sum(g_lat), 4) AS sum_glat_r,
       round(sum(g_lon), 4) AS sum_glon_r
FROM interp GROUP BY user_id
"""


# --------------------------------------------------------------------------
# E14 — Getis-Ord Gi* hotspot detection (`spatial.gi_star_hotspots`):
# the classic local hotspot statistic over the 5° count lattice.  Points
# collapse to per-cell counts FIRST (map-side combinable — the only
# points-scale op), then the erode-shaped ×9 explode + one hash
# aggregate yields neighborhood sums and occupied-neighbor counts with
# NO join (membership = the self-offset flag), and the global moments
# arrive via a 1-row broadcast cross join.  All float algebra derives
# from exact integer sums in a fixed expression order, so the oracle
# replays it bit-for-bit.
# --------------------------------------------------------------------------

_HOT_G = 5.0


def _hot_cells(geo):
    """The 5-degree count lattice the spatial-statistics trio shares —
    one definition so the operators always see the same grid."""
    return geo.groupBy(
        F.floor(F.col("lon") / _HOT_G).cast("long").alias("gx"),
        F.floor(F.col("lat") / _HOT_G).cast("long").alias("gy"),
    ).agg(F.count("*").alias("cnt"))


def q_hotspot_cells(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import gi_star_hotspots

    geo = geo_events(spark, sf_dir)
    cells = _hot_cells(geo)
    out = gi_star_hotspots(cells)
    return out.select(
        "gx", "gy", "cnt", "n_nbrs", F.round(F.col("z"), 4).alias("z_r")
    )


SQL_HOTSPOT_CELLS = f"""
WITH {GEO_CTE},
cells AS (
  SELECT CAST(floor(lon / {_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_HOT_G}) AS BIGINT) AS gy,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nbr AS (
  SELECT gx + dx AS gx, gy + dy AS gy,
         sum(cnt) AS wsum, count(*) AS n_nbrs,
         max(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS occ,
         max(CASE WHEN dx = 0 AND dy = 0 THEN cnt END) AS cnt
  FROM cells, off GROUP BY 1, 2
),
occupied AS (SELECT * FROM nbr WHERE occ = 1),
st AS (
  SELECT count(*) AS n, sum(cnt) AS s1, sum(cnt * cnt) AS s2 FROM occupied
)
SELECT o.gx, o.gy, o.cnt, o.n_nbrs,
       round(
         CASE WHEN n > 1 AND n * n_nbrs - n_nbrs * n_nbrs > 0
                   AND s2 / n - (s1 / n) * (s1 / n) > 0
              THEN (o.wsum - (s1 / n) * o.n_nbrs)
                   / (sqrt(s2 / n - (s1 / n) * (s1 / n))
                      * sqrt((n * n_nbrs - n_nbrs * n_nbrs) / (n - 1.0)))
         END, 4) AS z_r
FROM occupied o, st
"""


# --------------------------------------------------------------------------
# E14b — global Moran's I (`spatial.morans_i`): the lattice-wide spatial
# autocorrelation companion to Gi*.  Same ×9 occupancy topology, NO
# joins; the cross-term expands to A − x̄·B + x̄²·W over exact integer
# aggregates so partition order can never perturb the float result.
# --------------------------------------------------------------------------


def q_moran_i(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import morans_i

    geo = geo_events(spark, sf_dir)
    cells = _hot_cells(geo)
    out = morans_i(cells)
    return out.select(
        "n_cells",
        "w_pairs",
        F.round(F.col("i_moran"), 6).alias("i_moran_r"),
        F.round(F.col("e_i"), 6).alias("e_i_r"),
    )


SQL_MORAN_I = f"""
WITH {GEO_CTE},
cells AS (
  SELECT CAST(floor(lon / {_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_HOT_G}) AS BIGINT) AS gy,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nbr AS (
  SELECT gx + dx AS gx, gy + dy AS gy,
         sum(cnt) AS wsum, count(*) AS k,
         max(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS occ,
         max(CASE WHEN dx = 0 AND dy = 0 THEN cnt END) AS cnt
  FROM cells, off GROUP BY 1, 2
),
occupied AS (SELECT * FROM nbr WHERE occ = 1),
agg AS (
  SELECT count(*) AS n, sum(cnt) AS s1, sum(cnt * cnt) AS s2,
         sum(cnt * (wsum - cnt)) AS a,
         sum(cnt * (k - 1) + (wsum - cnt)) AS b,
         sum(k - 1) AS w
  FROM occupied
)
SELECT n AS n_cells, CAST(w AS BIGINT) AS w_pairs,
       round(
         CASE WHEN n > 1 AND w > 0
                   AND s2 - n * ((s1 / n) * (s1 / n)) > 0
              THEN n / (w * 1.0)
                   * (a - (s1 / n) * b + (s1 / n) * (s1 / n) * w)
                   / (s2 - n * ((s1 / n) * (s1 / n)))
         END, 6) AS i_moran_r,
       round(CASE WHEN n > 1 THEN -1.0 / (n - 1.0) END, 6) AS e_i_r
FROM agg
"""


# --------------------------------------------------------------------------
# E14c — local Moran's I / LISA (`spatial.local_morans_i`): per-cell
# cluster & outlier labels (HH/LL hot/cold clusters, HL/LH outliers)
# completing the spatial-statistics trio.  Same no-join occupancy
# topology; Σ_j(x_j − x̄) expands exactly to nbrsum − k_ex·x̄ over the
# integer aggregates, so the float algebra is row-local against the
# 1-row broadcast moments.
# --------------------------------------------------------------------------


def q_lisa_cells(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import local_morans_i

    geo = geo_events(spark, sf_dir)
    cells = _hot_cells(geo)
    out = local_morans_i(cells)
    return out.select(
        "gx",
        "gy",
        "cnt",
        "n_nbrs",
        F.round(F.col("i_local"), 6).alias("i_local_r"),
        "quad",
    )


SQL_LISA_CELLS = f"""
WITH {GEO_CTE},
cells AS (
  SELECT CAST(floor(lon / {_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_HOT_G}) AS BIGINT) AS gy,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nbr AS (
  SELECT gx + dx AS gx, gy + dy AS gy,
         sum(cnt) AS wsum, count(*) AS k,
         max(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS occ,
         max(CASE WHEN dx = 0 AND dy = 0 THEN cnt END) AS cnt
  FROM cells, off GROUP BY 1, 2
),
occupied AS (SELECT * FROM nbr WHERE occ = 1),
st AS (
  SELECT count(*) AS n, sum(cnt) AS s1, sum(cnt * cnt) AS s2 FROM occupied
)
SELECT o.gx, o.gy, o.cnt, o.k - 1 AS n_nbrs,
       round(
         CASE WHEN n > 1 AND o.k - 1 > 0
                   AND s2 / n - (s1 / n) * (s1 / n) > 0
              THEN (o.cnt - s1 / n)
                   * ((o.wsum - o.cnt) - (o.k - 1) * (s1 / n))
                   / (s2 / n - (s1 / n) * (s1 / n))
         END, 6) AS i_local_r,
       CASE WHEN n > 1 AND o.k - 1 > 0
                 AND s2 / n - (s1 / n) * (s1 / n) > 0
            THEN (CASE WHEN o.cnt - s1 / n >= 0 THEN 'H' ELSE 'L' END)
                 || (CASE WHEN (o.wsum - o.cnt) - (o.k - 1) * (s1 / n) >= 0
                          THEN 'H' ELSE 'L' END)
       END AS quad
FROM occupied o, st
"""


# --------------------------------------------------------------------------
# E14d — Mann-Kendall trend per cell (`spatial.mann_kendall_trends`):
# the "emerging hotspot" trend stage — which 15° cells heat up or cool
# down across the daily count series.  Pair enumeration is a SELF-join
# on the cell key bounded by T²/2 per cell (T = time bins, never
# points²) — both sides shuffle the TINY binned table (cached, computed
# once) onto the cell key; S and the tie-corrected variance are exact
# integers so z is partition-order invariant.
# --------------------------------------------------------------------------

_TREND_G = 15.0
_US_PER_DAY = 86_400_000_000


def q_trend_cells(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import mann_kendall_trends

    geo = geo_events(spark, sf_dir)
    occ = geo.groupBy(
        F.floor(F.col("lon") / _TREND_G).cast("long").alias("gx"),
        F.floor(F.col("lat") / _TREND_G).cast("long").alias("gy"),
        F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}").alias("t"),
    ).agg(F.count("*").alias("cnt"))
    out = mann_kendall_trends(occ)
    return out.select(
        "gx",
        "gy",
        "n_bins",
        "s",
        F.round(F.col("z"), 4).alias("z_r"),
        "trend",
    )


SQL_TREND_CELLS = f"""
WITH {GEO_CTE},
occ AS (
  SELECT CAST(floor(lon / {_TREND_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_TREND_G}) AS BIGINT) AS gy,
         epoch_us(ts) // {_US_PER_DAY} AS t,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2, 3
),
s_tab AS (
  SELECT a.gx, a.gy,
         CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
                       WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM occ a JOIN occ b ON a.gx = b.gx AND a.gy = b.gy AND a.t < b.t
  GROUP BY 1, 2
),
ties AS (
  SELECT gx, gy,
         CAST(sum(tg) AS BIGINT) AS n_bins,
         CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie
  FROM (SELECT gx, gy, cnt, count(*) AS tg FROM occ GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
j AS (
  SELECT t.gx, t.gy, t.n_bins, COALESCE(s.s, 0) AS s,
         (t.n_bins * (t.n_bins - 1) * (2 * t.n_bins + 5) - t.tie) / 18.0 AS var_s,
         s.s AS s_raw
  FROM ties t LEFT JOIN s_tab s ON s.gx = t.gx AND s.gy = t.gy
),
z_tab AS (
  SELECT gx, gy, n_bins, s,
         CASE WHEN var_s > 0 THEN
           CASE WHEN s_raw > 0 THEN (s_raw - 1) / sqrt(var_s)
                WHEN s_raw < 0 THEN (s_raw + 1) / sqrt(var_s)
                ELSE 0.0 END
         END AS z
  FROM j
)
SELECT gx, gy, n_bins, s, round(z, 4) AS z_r,
       CASE WHEN z IS NULL THEN 'flat'
            WHEN z > 1.96 THEN 'increasing'
            WHEN z < -1.96 THEN 'decreasing'
            ELSE 'flat' END AS trend
FROM z_tab
"""


# --------------------------------------------------------------------------
# E14e — Ripley's K / L point-pattern functions (`spatial.ripley_k`):
# clustering-across-scales over the geotagged points.  Candidates from
# the grid-DBSCAN ×9 probe-cell equi-join (lossless for d ≤ max radius,
# each pair matched exactly once), the whole radius ladder answered in
# ONE candidate pass; pair counts are exact integers.  The oracle
# replays the identical probe join and conditional sums.
# --------------------------------------------------------------------------

_RIPLEY_RADII = (1.25, 1.75, 2.5)  # min pair distance of the hash lattice is ~1.177 deg
_RIPLEY_AREA = 360.0 * 160.0  # the geotag window: lon [-180,180) x lat [-80,80)


def q_ripley_k(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import ripley_k

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon")
    out = ripley_k(pts, list(_RIPLEY_RADII), _RIPLEY_AREA)
    return out.select(
        "r",
        "n_pairs",
        F.round(F.col("k_r"), 6).alias("k_r"),
        F.round(F.col("l_r"), 6).alias("l_r"),
    )


_RIPLEY_G = max(_RIPLEY_RADII)
_RIPLEY_COUNTS = ", ".join(
    f"CAST(sum(CASE WHEN d2 <= {r * r!r} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
    for i, r in enumerate(_RIPLEY_RADII)
)
_RIPLEY_LADDER = " UNION ALL ".join(
    f"SELECT CAST({float(r)!r} AS DOUBLE) AS r, c{i} AS n_pairs, "
    f"round({_RIPLEY_AREA!r} * c{i} / (n * n), 6) AS k_r, "
    f"round(sqrt({_RIPLEY_AREA!r} * c{i} / (n * n) / 3.141592653589793), 6) AS l_r "
    f"FROM counts, n_tab"
    for i, r in enumerate(_RIPLEY_RADII)
)

SQL_RIPLEY_K = f"""
WITH {GEO_CTE},
base AS (
  SELECT event_id AS id, lon AS x, lat AS y,
         CAST(floor(lon / {_RIPLEY_G!r}) AS BIGINT) AS cx,
         CAST(floor(lat / {_RIPLEY_G!r}) AS BIGINT) AS cy
  FROM geo
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
cand AS (
  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM base a, off o
  JOIN base b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  WHERE a.id <> b.id
),
counts AS (SELECT {_RIPLEY_COUNTS} FROM cand),
n_tab AS (SELECT count(*) AS n FROM base)
{_RIPLEY_LADDER}
"""


# --------------------------------------------------------------------------
# E14f — Gi* hotspots of IMAGE QUALITY (E7×E14 crossover): the spatial-
# statistics machinery applied to the image payload — per-cell total
# pixel mass from the REAL decode chain, then the Getis-Ord z-score
# over the 20° lattice.  All lattice values are exact integer sums
# (pixel sums are bounded by n_img·N_PIX·255 per cell, far under int64,
# so Σx² stays exact), and the oracle replays the payload closed-form.
# --------------------------------------------------------------------------

_IMG_HOT_G = 20.0


def q_image_hotspots(spark, sf_dir):
    from gotrackmaster_spark.operators.images import decode_stats, synthesize_images
    from gotrackmaster_spark.operators.spatial import gi_star_hotspots

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    st = decode_stats(imgs).withColumn("img_key", _img_key_col())
    g_lat, g_lon = _img_geotag_cols(F.col("img_key"))
    cells = (
        st.select(F.col("pixel_sum"), g_lat.alias("lat"), g_lon.alias("lon"))
        .groupBy(
            F.floor(F.col("lon") / _IMG_HOT_G).cast("long").alias("gx"),
            F.floor(F.col("lat") / _IMG_HOT_G).cast("long").alias("gy"),
        )
        .agg(F.sum("pixel_sum").alias("cnt"))
    )
    out = gi_star_hotspots(cells)
    return out.select(
        "gx",
        "gy",
        F.col("cnt").alias("tot_pix"),
        "n_nbrs",
        F.round(F.col("z"), 4).alias("z_r"),
    )


SQL_IMAGE_HOTSPOTS = f"""
WITH per_image AS (
  SELECT ((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0 AS lat,
         ((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0 AS lon,
         CASE WHEN doc_id % 3 = 2
              THEN list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX} - ({_PIX}) % 4))
              ELSE list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX}))
         END AS pixel_sum
  FROM documents
),
cells AS (
  SELECT CAST(floor(lon / {_IMG_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_IMG_HOT_G}) AS BIGINT) AS gy,
         CAST(sum(pixel_sum) AS BIGINT) AS cnt
  FROM per_image GROUP BY 1, 2
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nbr AS (
  SELECT gx + dx AS gx, gy + dy AS gy,
         sum(cnt) AS wsum, count(*) AS n_nbrs,
         max(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS occ,
         max(CASE WHEN dx = 0 AND dy = 0 THEN cnt END) AS cnt
  FROM cells, off GROUP BY 1, 2
),
occupied AS (SELECT * FROM nbr WHERE occ = 1),
st AS (
  SELECT count(*) AS n, sum(cnt) AS s1, sum(cnt * cnt) AS s2 FROM occupied
)
SELECT o.gx, o.gy, o.cnt AS tot_pix, o.n_nbrs,
       round(
         CASE WHEN n > 1 AND n * n_nbrs - n_nbrs * n_nbrs > 0
                   AND s2 / n - (s1 / n) * (s1 / n) > 0
              THEN (o.wsum - (s1 / n) * o.n_nbrs)
                   / (sqrt(s2 / n - (s1 / n) * (s1 / n))
                      * sqrt((n * n_nbrs - n_nbrs * n_nbrs) / (n - 1.0)))
         END, 4) AS z_r
FROM occupied o, st
"""

# --------------------------------------------------------------------------
# E14g — Knox space-time interaction test (`spatial.knox_statistic`):
# do events close in space also happen close in time?  Two bounded
# candidate cuts (the grid-DBSCAN ×9 spatial equi-join; a τ-bucket ×3
# temporal equi-join), all four pair counts exact integers, ratio and
# z assembled from them in a fixed double expression order.  The events
# lattice itself is degenerate for this test (every space-close pair
# shares the single id stride 6577, hence ONE Δt value), so the query
# runs a purpose-built deterministic layout — 120 hashed cluster
# centers, each with a unique 6 h time slot and per-event ±0.1° / ±2 h
# offsets — genuine space-time interaction (ratio ≈ 114 at sf0.01);
# negative t offsets in slot 0 exercise the pre-epoch floor buckets.
# --------------------------------------------------------------------------

_KNOX_DELTA = 0.3
_KNOX_TAU_US = 10_800_000_000  # 3 h


def _knox_layout(spark, sf_dir):
    """The deterministic clustered space-time layout (DuckDB twin:
    the `knox` CTE in SQL_KNOX_STAT)."""
    ev = _t(spark, sf_dir, "events").select("event_id")
    k = F.col("event_id") % 120
    return ev.select(
        "event_id",
        (
            (k * F.lit(2654435761)) % 1400000 / 10000.0 - 70.0
            + ((F.col("event_id") * 7919) % 2000 / 10000.0 - 0.1)
        ).alias("lat"),
        (
            (k * 40503 + 7) % 3400000 / 10000.0 - 170.0
            + ((F.col("event_id") * 104729) % 2000 / 10000.0 - 0.1)
        ).alias("lon"),
        (
            ((k * 97) % 120) * F.lit(21_600_000_000)
            + (F.col("event_id") * F.lit(15485863)) % 14_400_000_000
            - 7_200_000_000
        ).alias("t_us"),
    )


def q_knox_stat(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import knox_statistic

    out = knox_statistic(_knox_layout(spark, sf_dir), _KNOX_DELTA, _KNOX_TAU_US)
    return out.select(
        "n",
        "s_pairs",
        "t_pairs",
        "st_pairs",
        F.round(F.col("knox_ratio"), 6).alias("knox_ratio_r"),
        F.round(F.col("z"), 6).alias("z_r"),
    )


SQL_KNOX_STAT = f"""
WITH knox AS (
  SELECT event_id,
         ((event_id % 120) * 2654435761) % 1400000 / 10000.0 - 70.0
           + (((event_id * 7919) % 2000) / 10000.0 - 0.1) AS lat,
         ((event_id % 120) * 40503 + 7) % 3400000 / 10000.0 - 170.0
           + (((event_id * 104729) % 2000) / 10000.0 - 0.1) AS lon,
         (((event_id % 120) * 97) % 120) * 21600000000
           + (event_id * 15485863) % 14400000000 - 7200000000 AS t
  FROM events
),
base AS (
  SELECT event_id AS id, lon AS x, lat AS y, t,
         CAST(floor(lon / {_KNOX_DELTA!r}) AS BIGINT) AS cx,
         CAST(floor(lat / {_KNOX_DELTA!r}) AS BIGINT) AS cy
  FROM knox
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
sc AS (
  SELECT COALESCE(CAST(sum(CASE WHEN d2 <= {_KNOX_DELTA * _KNOX_DELTA!r} THEN 1 ELSE 0 END) AS BIGINT), 0) AS s_pairs,
         COALESCE(CAST(sum(CASE WHEN d2 <= {_KNOX_DELTA * _KNOX_DELTA!r}
                        AND dt <= {_KNOX_TAU_US} THEN 1 ELSE 0 END) AS BIGINT), 0) AS st_pairs
  FROM (
    SELECT (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2, abs(a.t - b.t) AS dt
    FROM base a, off o
    JOIN base b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
    WHERE a.id <> b.id
  )
),
tb AS (
  SELECT id, t,
         t - ((t % {_KNOX_TAU_US} + {_KNOX_TAU_US}) % {_KNOX_TAU_US}) AS t0
  FROM base
),
tc AS (
  SELECT CAST(count(*) AS BIGINT) AS t_pairs
  FROM tb a, range(3) o(i)
  JOIN tb b ON b.t0 = a.t0 + (o.i - 1) * {_KNOX_TAU_US}
  WHERE a.id <> b.id AND abs(a.t - b.t) <= {_KNOX_TAU_US}
),
n_tab AS (SELECT count(*) AS n FROM base),
alg AS (
  SELECT n, s_pairs, t_pairs, st_pairs,
         CAST(s_pairs AS DOUBLE) AS sd, CAST(t_pairs AS DOUBLE) AS td,
         CAST(st_pairs AS DOUBLE) AS std, CAST(n * (n - 1) AS DOUBLE) AS nnd
  FROM sc, tc, n_tab
)
SELECT n, s_pairs, t_pairs, st_pairs,
       round(CASE WHEN n > 1 AND s_pairs > 0 AND t_pairs > 0
                  THEN std * nnd / (sd * td) END, 6) AS knox_ratio_r,
       round(CASE WHEN n > 1 AND s_pairs > 0 AND t_pairs > 0
                  THEN (std - sd * td / nnd) / sqrt(sd * td / nnd) END, 6) AS z_r
FROM alg
"""

# --------------------------------------------------------------------------
# E14h — empirical semivariogram (`spatial.semivariogram`): the
# geostatistics companion to IDW — γ(h) per distance band, answered
# from ONE grid-candidate pass (conditional sums per band, the Ripley
# ladder shape).  The value field is fixed-point quantized BEFORE the
# operator (round((lat+lon)·100) + round(value)): a spatially smooth
# trend plus per-event noise, so γ rises with h over a visible nugget —
# and every sum stays an exact integer, making γ a single exact-int
# division, bit-identical across engines with no rounding at all.
# --------------------------------------------------------------------------

_VARIO_EDGES = (0.0, 1.25, 1.5, 2.0, 2.5)


def q_semivariogram(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import semivariogram

    pts = geo_events(spark, sf_dir).select(
        "event_id",
        "lat",
        "lon",
        (
            F.round((F.col("lat") + F.col("lon")) * 100, 0)
            + F.round(F.col("value"), 0)
        ).cast("long").alias("v_q"),
    )
    out = semivariogram(pts, list(_VARIO_EDGES), v_col="v_q")
    return out.select("h_lo", "h_hi", "n_pairs", "gamma")


_VARIO_G = max(_VARIO_EDGES)
_VARIO_BANDS = list(zip(_VARIO_EDGES, _VARIO_EDGES[1:]))
_VARIO_COUNTS = ", ".join(
    f"COALESCE(CAST(sum(CASE WHEN d2 > {lo * lo!r} AND d2 <= {hi * hi!r} "
    f"THEN 1 ELSE 0 END) AS BIGINT), 0) AS n{i}, "
    f"COALESCE(CAST(sum(CASE WHEN d2 > {lo * lo!r} AND d2 <= {hi * hi!r} "
    f"THEN dv2 ELSE 0 END) AS BIGINT), 0) AS s{i}"
    for i, (lo, hi) in enumerate(_VARIO_BANDS)
)
_VARIO_LADDER = " UNION ALL ".join(
    f"SELECT CAST({float(lo)!r} AS DOUBLE) AS h_lo, "
    f"CAST({float(hi)!r} AS DOUBLE) AS h_hi, n{i} AS n_pairs, "
    f"CASE WHEN n{i} > 0 THEN CAST(s{i} AS DOUBLE) / CAST(n{i} * 2 AS DOUBLE) END AS gamma "
    f"FROM counts"
    for i, (lo, hi) in enumerate(_VARIO_BANDS)
)

SQL_SEMIVARIOGRAM = f"""
WITH {GEO_CTE},
base AS (
  SELECT event_id AS id, lon AS x, lat AS y,
         CAST(round((lat + lon) * 100) + round(value) AS BIGINT) AS v,
         CAST(floor(lon / {_VARIO_G!r}) AS BIGINT) AS cx,
         CAST(floor(lat / {_VARIO_G!r}) AS BIGINT) AS cy
  FROM geo
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
cand AS (
  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
         (a.v - b.v) * (a.v - b.v) AS dv2
  FROM base a, off o
  JOIN base b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  WHERE a.id <> b.id
),
counts AS (SELECT {_VARIO_COUNTS} FROM cand)
{_VARIO_LADDER}
"""

# --------------------------------------------------------------------------
# E14i — standard deviational ellipse per user (`spatial.sd_ellipse`):
# the classic directional-dispersion statistic over each user's visited
# points — mean center, standard distance, ellipse axes + orientation.
# ONE map-side-combinable aggregate (no window, no join); coordinates
# fixed-point quantized to 10⁻² degrees so all six moments are exact
# integers and the float algebra replays in a fixed expression order.
# theta rounds at 4 dp (atan2 is the one libm-parity-sensitive term,
# per the turn_stats convention); sqrt outputs are correctly rounded
# IEEE and take 6 dp.
# --------------------------------------------------------------------------


def q_sd_ellipses(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import sd_ellipse

    pts = geo_events(spark, sf_dir).select(
        "user_id",
        F.round((F.col("lon") + 180.0) * 100, 0).cast("long").alias("x"),
        F.round((F.col("lat") + 80.0) * 100, 0).cast("long").alias("y"),
    )
    out = sd_ellipse(pts, ["user_id"])
    return out.select(
        "user_id",
        "n",
        F.round(F.col("x_mean"), 6).alias("x_mean_r"),
        F.round(F.col("y_mean"), 6).alias("y_mean_r"),
        F.round(F.col("sd_dist"), 6).alias("sd_dist_r"),
        F.round(F.col("theta"), 4).alias("theta_r"),
        F.round(F.col("ax_major"), 6).alias("ax_major_r"),
        F.round(F.col("ax_minor"), 6).alias("ax_minor_r"),
    )


SQL_SD_ELLIPSES = f"""
WITH {GEO_CTE},
q AS (
  SELECT user_id,
         CAST(round((lon + 180.0) * 100) AS BIGINT) AS x,
         CAST(round((lat + 80.0) * 100) AS BIGINT) AS y
  FROM geo
),
m AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM q GROUP BY user_id
),
alg AS (
  SELECT user_id, n,
         sx / CAST(n AS DOUBLE) AS xbar, sy / CAST(n AS DOUBLE) AS ybar,
         sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)) AS cxx,
         syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS cyy,
         sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS cxy
  FROM m
),
alg2 AS (
  SELECT user_id, n, xbar, ybar, cxx, cyy, cxy,
         sqrt((cxx - cyy) * (cxx - cyy) + 4 * (cxy * cxy)) AS b
  FROM alg
)
SELECT user_id, n,
       round(xbar, 6) AS x_mean_r, round(ybar, 6) AS y_mean_r,
       round(CASE WHEN n > 1 AND cxx + cyy > 0 THEN sqrt(cxx + cyy)
                  WHEN n > 1 THEN 0.0 END, 6) AS sd_dist_r,
       round(CASE WHEN n > 1 THEN atan2(2 * cxy, cxx - cyy) / 2 END, 4) AS theta_r,
       round(CASE WHEN n > 1 AND (cxx + cyy + b) / 2 > 0 THEN sqrt((cxx + cyy + b) / 2)
                  WHEN n > 1 THEN 0.0 END, 6) AS ax_major_r,
       round(CASE WHEN n > 1 AND (cxx + cyy - b) / 2 > 0 THEN sqrt((cxx + cyy - b) / 2)
                  WHEN n > 1 THEN 0.0 END, 6) AS ax_minor_r
FROM alg2
"""


# --------------------------------------------------------------------------
# E14j — emerging hotspot analysis (`spatial.emerging_hotspots`): the
# capstone composite of the spatial-statistics suite (the ESRI
# space-time-cube workflow) — a per-(cell, day) Gi* z-score over the
# 15° lattice, a Mann-Kendall trend test over each cell's z series,
# then a category from the final-bin state × the trend.  Per-bin
# lattices are independent layers of ONE ×9 occupancy explode; the
# bin moments attach via a real-key broadcast hash join (T rows); the
# MK stage self-joins the (cells × bins)-sized z table — bounded by
# T²/2 per cell, never points².  All floats derive from exact integer
# moments in a fixed expression order, so the DuckDB twin replays the
# whole composite bit-for-bit.
# --------------------------------------------------------------------------


def q_emerging_hotspots(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import emerging_hotspots

    geo = geo_events(spark, sf_dir)
    occ = geo.groupBy(
        F.floor(F.col("lon") / _TREND_G).cast("long").alias("gx"),
        F.floor(F.col("lat") / _TREND_G).cast("long").alias("gy"),
        F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}").alias("t"),
    ).agg(F.count("*").alias("cnt"))
    out = emerging_hotspots(occ)
    return out.select(
        "gx",
        "gy",
        "n_bins",
        "hot_bins",
        "s",
        F.round(F.col("z_mk"), 4).alias("z_mk_r"),
        "category",
    )


SQL_EMERGING_HOTSPOTS = f"""
WITH {GEO_CTE},
occ AS (
  SELECT CAST(floor(lon / {_TREND_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_TREND_G}) AS BIGINT) AS gy,
         epoch_us(ts) // {_US_PER_DAY} AS t,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2, 3
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nbr AS (
  SELECT t, gx + dx AS gx, gy + dy AS gy,
         sum(cnt) AS wsum, count(*) AS k,
         max(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS occ,
         max(CASE WHEN dx = 0 AND dy = 0 THEN cnt END) AS cnt
  FROM occ, off GROUP BY 1, 2, 3
),
occupied AS (SELECT * FROM nbr WHERE occ = 1),
st AS (
  SELECT t, count(*) AS n, sum(cnt) AS s1, sum(cnt * cnt) AS s2
  FROM occupied GROUP BY t
),
series AS (
  SELECT o.gx, o.gy, o.t,
         (o.wsum - (s1 / n) * o.k)
         / (sqrt(s2 / n - (s1 / n) * (s1 / n))
            * sqrt((n * o.k - o.k * o.k) / (n - 1.0))) AS z
  FROM occupied o JOIN st ON st.t = o.t
  WHERE n > 1 AND n * o.k - o.k * o.k > 0
        AND s2 / n - (s1 / n) * (s1 / n) > 0
),
s_tab AS (
  SELECT a.gx, a.gy,
         CAST(sum(CASE WHEN b.z > a.z THEN 1
                       WHEN b.z < a.z THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM series a JOIN series b ON a.gx = b.gx AND a.gy = b.gy AND a.t < b.t
  GROUP BY 1, 2
),
ties AS (
  SELECT gx, gy,
         CAST(sum(tg) AS BIGINT) AS n_bins,
         CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie
  FROM (SELECT gx, gy, z, count(*) AS tg FROM series GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
mk AS (
  SELECT t.gx, t.gy, t.n_bins, COALESCE(s.s, 0) AS s,
         (t.n_bins * (t.n_bins - 1) * (2 * t.n_bins + 5) - t.tie) / 18.0 AS var_s,
         s.s AS s_raw
  FROM ties t LEFT JOIN s_tab s ON s.gx = t.gx AND s.gy = t.gy
),
z_tab AS (
  SELECT gx, gy, n_bins, s,
         CASE WHEN var_s > 0 THEN
           CASE WHEN s_raw > 0 THEN (s_raw - 1) / sqrt(var_s)
                WHEN s_raw < 0 THEN (s_raw + 1) / sqrt(var_s)
                ELSE 0.0 END
         END AS z_mk
  FROM mk
),
state AS (
  SELECT gx, gy, max_by(z, t) AS z_last,
         CAST(sum(CASE WHEN z > 1.96 THEN 1 ELSE 0 END) AS BIGINT) AS hot_bins
  FROM series GROUP BY 1, 2
),
labeled AS (
  SELECT z.gx, z.gy, z.n_bins, w.hot_bins, z.s,
         round(z.z_mk, 4) AS z_mk_r,
         w.z_last > 1.96 AS hot_now,
         CASE WHEN z.z_mk IS NULL THEN 'flat'
              WHEN z.z_mk > 1.96 THEN 'increasing'
              WHEN z.z_mk < -1.96 THEN 'decreasing'
              ELSE 'flat' END AS trend
  FROM z_tab z JOIN state w ON w.gx = z.gx AND w.gy = z.gy
)
SELECT gx, gy, n_bins, hot_bins, s, z_mk_r,
       CASE WHEN hot_now AND trend = 'increasing' THEN 'intensifying'
            WHEN hot_now AND trend = 'decreasing' THEN 'diminishing'
            WHEN hot_now THEN 'persistent'
            WHEN hot_bins > 0 THEN 'historical'
            WHEN trend = 'increasing' THEN 'emerging'
            ELSE 'none' END AS category
FROM labeled
"""


# --------------------------------------------------------------------------
# E14k — global spatial-statistics completions over the 5° event
# lattice: Geary's C (`spatial.geary_c`, pairwise-difference companion
# to Moran's I) and Getis-Ord General G (`spatial.general_g`, the
# global hotspot statistic).  Both ride the shared ×9 occupancy
# topology with NO joins; Geary's pairwise sum expands per cell to
# k_ex·x² − 2x·nbrsum + nbrsum2 (exact ints), General G's numerator
# AND denominator ((Σx)² − Σx²) are exact ints, so G is one exact-int
# division.
# --------------------------------------------------------------------------


def q_geary_c(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import geary_c

    out = geary_c(_hot_cells(geo_events(spark, sf_dir)))
    return out.select(
        "n_cells",
        "w_pairs",
        "d_sum",
        F.round(F.col("c_geary"), 6).alias("c_geary_r"),
        "e_c",
    )


_STAT_CELLS_CTE = f"""
cells AS (
  SELECT CAST(floor(lon / {_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_HOT_G}) AS BIGINT) AS gy,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nbr AS (
  SELECT gx + dx AS gx, gy + dy AS gy,
         sum(cnt) AS wsum, sum(cnt * cnt) AS wsum2, count(*) AS k,
         max(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS occ,
         max(CASE WHEN dx = 0 AND dy = 0 THEN cnt END) AS cnt
  FROM cells, off GROUP BY 1, 2
),
occupied AS (SELECT * FROM nbr WHERE occ = 1)
"""


SQL_GEARY_C = f"""
WITH {GEO_CTE},
{_STAT_CELLS_CTE},
agg AS (
  SELECT count(*) AS n, sum(cnt) AS s1, sum(cnt * cnt) AS s2,
         CAST(sum((k - 1) * (cnt * cnt) - 2 * cnt * (wsum - cnt)
                  + (wsum2 - cnt * cnt)) AS BIGINT) AS d,
         CAST(sum(k - 1) AS BIGINT) AS w
  FROM occupied
)
SELECT n AS n_cells, w AS w_pairs, d AS d_sum,
       round(
         CASE WHEN n > 1 AND w > 0
                   AND s2 - n * ((s1 / n) * (s1 / n)) > 0
              THEN ((n - 1) * d) / (2.0 * w)
                   / (s2 - n * ((s1 / n) * (s1 / n)))
         END, 6) AS c_geary_r,
       CASE WHEN n > 1 AND w > 0 THEN CAST(1.0 AS DOUBLE) END AS e_c
FROM agg
"""


def q_general_g(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import general_g

    out = general_g(_hot_cells(geo_events(spark, sf_dir)))
    # g_obs / e_g are single exact-int divisions — bit-identical, no rounding
    return out.select("n_cells", "w_pairs", "g_num", "g_den", "g_obs", "e_g")


SQL_GENERAL_G = f"""
WITH {GEO_CTE},
{_STAT_CELLS_CTE},
agg AS (
  SELECT count(*) AS n,
         CAST(sum(cnt) AS BIGINT) AS s1, CAST(sum(cnt * cnt) AS BIGINT) AS s2,
         CAST(sum(cnt * (wsum - cnt)) AS BIGINT) AS g_num,
         CAST(sum(k - 1) AS BIGINT) AS w
  FROM occupied
),
alg AS (
  SELECT n, w, g_num, CAST(s1 * s1 - s2 AS BIGINT) AS g_den FROM agg
)
SELECT n AS n_cells, w AS w_pairs, g_num, g_den,
       CASE WHEN n > 1 AND w > 0 AND g_den > 0 THEN g_num / g_den END AS g_obs,
       CASE WHEN n > 1 AND w > 0 AND g_den > 0
            THEN w / (n * (n - 1)) END AS e_g
FROM alg
"""


# --------------------------------------------------------------------------
# E14l — join-count statistics (`spatial.join_counts`): the categorical
# autocorrelation statistic over the binary lattice black = cnt ≥ 5
# (median event count per 5° cell is 4 at sf0.01 — both colors
# populated).  One occupancy pass over the 0/1 indicator; observed
# BB/BW/WW exact integers, expectations exact-int ratios under
# nonfree (hypergeometric) sampling.
# --------------------------------------------------------------------------

_JC_THR = 5


def q_join_counts(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import join_counts

    return join_counts(_hot_cells(geo_events(spark, sf_dir)), _JC_THR)


SQL_JOIN_COUNTS = f"""
WITH {GEO_CTE},
rawcells AS (
  SELECT CAST(floor(lon / {_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_HOT_G}) AS BIGINT) AS gy,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2
),
cells AS (
  SELECT gx, gy, CASE WHEN cnt >= {_JC_THR} THEN 1 ELSE 0 END AS cnt
  FROM rawcells
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nbr AS (
  SELECT gx + dx AS gx, gy + dy AS gy,
         sum(cnt) AS wsum, count(*) AS k,
         max(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS occ,
         max(CASE WHEN dx = 0 AND dy = 0 THEN cnt END) AS cnt
  FROM cells, off GROUP BY 1, 2
),
occupied AS (SELECT * FROM nbr WHERE occ = 1),
agg AS (
  SELECT count(*) AS n, CAST(sum(cnt) AS BIGINT) AS nb,
         CAST(sum(k - 1) AS BIGINT) AS w2,
         CAST(sum(cnt * (wsum - cnt)) AS BIGINT) AS bb_o,
         CAST(sum(cnt * ((k - 1) - (wsum - cnt))
                  + (1 - cnt) * (wsum - cnt)) AS BIGINT) AS bw_o,
         CAST(sum((1 - cnt) * ((k - 1) - (wsum - cnt))) AS BIGINT) AS ww_o
  FROM occupied
)
SELECT n AS n_cells, nb AS n_black, w2 // 2 AS w_pairs,
       bb_o // 2 AS bb, bw_o // 2 AS bw, ww_o // 2 AS ww,
       CASE WHEN n > 1 AND w2 // 2 > 0
            THEN ((w2 // 2) * nb * (nb - 1)) / (n * (n - 1)) END AS e_bb,
       CASE WHEN n > 1 AND w2 // 2 > 0
            THEN (2 * (w2 // 2) * nb * (n - nb)) / (n * (n - 1)) END AS e_bw,
       CASE WHEN n > 1 AND w2 // 2 > 0
            THEN ((w2 // 2) * (n - nb) * ((n - nb) - 1)) / (n * (n - 1)) END AS e_ww
FROM agg
"""


# --------------------------------------------------------------------------
# E14m — bivariate Moran's I (E7×E14 crossover,
# `spatial.bivariate_morans_i`): does EVENT DENSITY in a 20° cell
# co-vary with IMAGE PIXEL MASS in the neighboring cells?  x = event
# counts, y = per-cell pixel sums from the real decode chain (exact
# integers, closed-form oracle); inner join of the two layers, then
# one ×9 explode carrying y with x/y tagged on the self offset —
# cross term and both variances expand over exact int aggregates.
# --------------------------------------------------------------------------


def q_bivariate_moran(spark, sf_dir):
    from gotrackmaster_spark.operators.images import decode_stats, synthesize_images
    from gotrackmaster_spark.operators.spatial import bivariate_morans_i

    geo = geo_events(spark, sf_dir)
    xc = geo.groupBy(
        F.floor(F.col("lon") / _IMG_HOT_G).cast("long").alias("gx"),
        F.floor(F.col("lat") / _IMG_HOT_G).cast("long").alias("gy"),
    ).agg(F.count("*").alias("x"))
    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    st = decode_stats(imgs).withColumn("img_key", _img_key_col())
    g_lat, g_lon = _img_geotag_cols(F.col("img_key"))
    yc = (
        st.select(F.col("pixel_sum"), g_lat.alias("lat"), g_lon.alias("lon"))
        .groupBy(
            F.floor(F.col("lon") / _IMG_HOT_G).cast("long").alias("gx"),
            F.floor(F.col("lat") / _IMG_HOT_G).cast("long").alias("gy"),
        )
        .agg(F.sum("pixel_sum").alias("y"))
    )
    out = bivariate_morans_i(xc.join(yc, ["gx", "gy"]))
    return out.select(
        "n_cells",
        "w_pairs",
        F.round(F.col("i_xy"), 6).alias("i_xy_r"),
        F.round(F.col("e_i"), 6).alias("e_i_r"),
    )


SQL_BIVARIATE_MORAN = f"""
WITH {GEO_CTE},
xc AS (
  SELECT CAST(floor(lon / {_IMG_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_IMG_HOT_G}) AS BIGINT) AS gy,
         count(*) AS x
  FROM geo GROUP BY 1, 2
),
per_image AS (
  SELECT ((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0 AS lat,
         ((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0 AS lon,
         CASE WHEN doc_id % 3 = 2
              THEN list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX} - ({_PIX}) % 4))
              ELSE list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX}))
         END AS pixel_sum
  FROM documents
),
yc AS (
  SELECT CAST(floor(lon / {_IMG_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_IMG_HOT_G}) AS BIGINT) AS gy,
         CAST(sum(pixel_sum) AS BIGINT) AS y
  FROM per_image GROUP BY 1, 2
),
cells AS (
  SELECT xc.gx, xc.gy, xc.x, yc.y
  FROM xc JOIN yc ON yc.gx = xc.gx AND yc.gy = xc.gy
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nbr AS (
  SELECT gx + dx AS gx, gy + dy AS gy,
         sum(y) AS ysum, count(*) AS k,
         max(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS occ,
         max(CASE WHEN dx = 0 AND dy = 0 THEN x END) AS x,
         max(CASE WHEN dx = 0 AND dy = 0 THEN y END) AS y
  FROM cells, off GROUP BY 1, 2
),
occupied AS (SELECT * FROM nbr WHERE occ = 1),
agg AS (
  SELECT count(*) AS n, sum(x) AS sx1, sum(x * x) AS sx2,
         sum(y) AS sy1, sum(y * y) AS sy2,
         sum(x * (ysum - y)) AS a, sum(ysum - y) AS p,
         sum((k - 1) * x) AS q, CAST(sum(k - 1) AS BIGINT) AS w
  FROM occupied
)
SELECT n AS n_cells, w AS w_pairs,
       round(
         CASE WHEN n > 1 AND w > 0
                   AND sx2 - n * ((sx1 / n) * (sx1 / n)) > 0
                   AND sy2 - n * ((sy1 / n) * (sy1 / n)) > 0
              THEN n / (w * 1.0)
                   * (a - (sx1 / n) * p - (sy1 / n) * q
                      + (sx1 / n) * (sy1 / n) * w)
                   / sqrt((sx2 - n * ((sx1 / n) * (sx1 / n)))
                          * (sy2 - n * ((sy1 / n) * (sy1 / n))))
         END, 6) AS i_xy_r,
       round(CASE WHEN n > 1 THEN -1.0 / (n - 1.0) END, 6) AS e_i_r
FROM agg
"""


# --------------------------------------------------------------------------
# E7e — per-image histogram + gradient features
# (`images.pixel_feature_stats`): the texture/contrast leg of the image
# feature extractor over the REAL decode chain (raw/png/qnt4), built so
# every output is an exact integer (histogram mode/median/nonzero,
# Σ|Δ| / max / edge counts over channel-aligned ±3 / ±3w strides) or an
# exact-int ratio (Gini impurity (n²−Σc²)/n² — the entropy stand-in: a
# Shannon Σ c·log₂c is a float SUM whose accumulation order no SQL
# engine pins).  ONE decode pass; ~60 B/row output regardless of image
# size.  The oracle replays bins, window cumulative, lead-strides and
# the Gini division from the closed-form pixel generator.
# --------------------------------------------------------------------------


def q_image_pixel_features(spark, sf_dir):
    from gotrackmaster_spark.operators.images import (
        pixel_feature_stats,
        synthesize_images,
    )

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    st = pixel_feature_stats(imgs)
    n2 = F.col("n_pix") * F.col("n_pix")
    return st.select(
        "image_id",
        "fmt",
        "nonzero_bins",
        "mode_bin",
        "mode_count",
        "median_bin",
        "gx_sum",
        "gx_max",
        "gx_edges",
        "gy_sum",
        "gy_max",
        "gy_edges",
        ((n2 - F.col("hist_sq")) / n2).alias("gini"),
    )


SQL_IMAGE_PIXEL_FEATURES = f"""
WITH px AS (
  SELECT doc_id, i,
         CASE WHEN doc_id % 3 = 2 THEN {_PIX} - ({_PIX}) % 4
              ELSE {_PIX} END AS p
  FROM documents, range({_N_PIX}) t(i)
),
hist AS (SELECT doc_id, p // 16 AS b, count(*) AS c FROM px GROUP BY 1, 2),
hist2 AS (
  SELECT doc_id, b, c,
         max(c) OVER (PARTITION BY doc_id) AS mc,
         sum(c) OVER (PARTITION BY doc_id ORDER BY b) AS cum,
         sum(c) OVER (PARTITION BY doc_id) AS np
  FROM hist
),
hfeat AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS nonzero_bins,
         CAST(min(CASE WHEN c = mc THEN b END) AS BIGINT) AS mode_bin,
         CAST(max(mc) AS BIGINT) AS mode_count,
         CAST(min(CASE WHEN cum >= (np + 1) // 2 THEN b END) AS BIGINT) AS median_bin,
         CAST(sum(c * c) AS BIGINT) AS hist_sq,
         CAST(max(np) AS BIGINT) AS n_pix
  FROM hist2 GROUP BY doc_id
),
g AS (
  SELECT doc_id,
         abs(lead(p, 3) OVER w - p) AS dx,
         abs(lead(p, {3 * _IMG_W}) OVER w - p) AS dy
  FROM px
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
gfeat AS (
  SELECT doc_id,
         CAST(sum(dx) AS BIGINT) AS gx_sum, CAST(max(dx) AS BIGINT) AS gx_max,
         CAST(sum(CASE WHEN dx > 32 THEN 1 ELSE 0 END) AS BIGINT) AS gx_edges,
         CAST(sum(dy) AS BIGINT) AS gy_sum, CAST(max(dy) AS BIGINT) AS gy_max,
         CAST(sum(CASE WHEN dy > 32 THEN 1 ELSE 0 END) AS BIGINT) AS gy_edges
  FROM g GROUP BY doc_id
)
SELECT format('img{{:08d}}', h.doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(h.doc_id % 3 AS INT) + 1] AS fmt,
       h.nonzero_bins, h.mode_bin, h.mode_count, h.median_bin,
       g.gx_sum, g.gx_max, g.gx_edges, g.gy_sum, g.gy_max, g.gy_edges,
       (h.n_pix * h.n_pix - h.hist_sq) / (h.n_pix * h.n_pix) AS gini
FROM hfeat h JOIN gfeat g ON g.doc_id = h.doc_id
"""


# --------------------------------------------------------------------------
# E14n — kernel-density raster (`spatial.kde_raster`): the smoothed
# density surface over the geotagged points with a QUANTIZED
# Epanechnikov kernel — kde(c) = Σ (Q − d²) over in-support points,
# Q = (r·cell)².  Milli-degree fixed-point coords make d² and every
# weight exact int64; ONE ×25 explode + ONE map-side-combinable hash
# aggregate (the occupancy shape), no joins.  1° raster, 2° bandwidth.
# --------------------------------------------------------------------------

_KDE_CELL, _KDE_R = 1000, 2
_KDE_Q = (_KDE_R * _KDE_CELL) ** 2


def q_kde_raster(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import kde_raster

    geo = geo_events(spark, sf_dir)
    pts = geo.select(
        F.round((F.col("lon") + 180.0) * 1000, 0).cast("long").alias("x"),
        F.round((F.col("lat") + 80.0) * 1000, 0).cast("long").alias("y"),
    )
    return kde_raster(pts, _KDE_CELL, _KDE_R)


SQL_KDE_RASTER = f"""
WITH {GEO_CTE},
pts AS (
  SELECT CAST(round((lon + 180.0) * 1000) AS BIGINT) AS x,
         CAST(round((lat + 80.0) * 1000) AS BIGINT) AS y
  FROM geo
),
off AS (SELECT dx - {_KDE_R} AS dx, dy - {_KDE_R} AS dy
        FROM range({2 * _KDE_R + 1}) t1(dx), range({2 * _KDE_R + 1}) t2(dy)),
cand AS (
  SELECT CAST(floor(x / {_KDE_CELL}.0) AS BIGINT) + dx AS cx,
         CAST(floor(y / {_KDE_CELL}.0) AS BIGINT) + dy AS cy,
         x, y
  FROM pts, off
),
wtab AS (
  SELECT cx, cy,
         {_KDE_Q} - ((x - (cx * {_KDE_CELL} + {_KDE_CELL // 2}))
                     * (x - (cx * {_KDE_CELL} + {_KDE_CELL // 2}))
                     + (y - (cy * {_KDE_CELL} + {_KDE_CELL // 2}))
                     * (y - (cy * {_KDE_CELL} + {_KDE_CELL // 2}))) AS w
  FROM cand
)
SELECT cx, cy, CAST(count(*) AS BIGINT) AS n_pts, CAST(sum(w) AS BIGINT) AS kde
FROM wtab WHERE w > 0 GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E7c — pairwise structural similarity (`images.pairwise_ssim`): global
# SSIM between every planted variant and its base image over the REAL
# decode chain.  One equi-join on img_key builds the pairs, ONE
# mapInPandas pass decodes both payloads into five exact int64 moments,
# and the SSIM float algebra (only +,−,×,÷ on doubles, fixed order)
# runs in Catalyst — bit-identical in DuckDB from the closed-form
# generator (_PIX_DEC base vs _PIX_VAR bumped variant), NO rounding.
# --------------------------------------------------------------------------


def q_image_ssim(spark, sf_dir):
    from gotrackmaster_spark.operators.images import (
        pairwise_ssim,
        synthesize_image_variants,
        synthesize_images,
    )

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    variants = synthesize_image_variants(imgs, every=_PH_EVERY)
    base = imgs.filter(F.col("img_key") % _PH_EVERY == 0).select(
        "img_key",
        "image_id",
        F.col("bytes").alias("bytes_a"),
        "w",
        "h",
        F.col("fmt").alias("fmt_a"),
    )
    var = variants.select(
        "img_key", F.col("bytes").alias("bytes_b"), F.col("fmt").alias("fmt_b")
    )
    pairs = base.join(var, "img_key").select(
        F.col("image_id").alias("pair_id"),
        "bytes_a",
        "bytes_b",
        "w",
        "h",
        "fmt_a",
        "fmt_b",
    )
    out = pairwise_ssim(pairs)
    return out.select(
        F.col("pair_id").alias("image_id"),
        "sxy",
        "ssim",
        (F.col("ssim") >= 0.99).alias("near"),
    )


_SSIM_DEC = _PIX_DEC.replace("{f}", "i")
_SSIM_VAR = _PIX_VAR.replace("{f}", "i")
_SSIM_N = f"CAST({float(_N_PIX)} AS DOUBLE)"
_SSIM_MX = f"(sx / {_SSIM_N})"
_SSIM_MY = f"(sy / {_SSIM_N})"
_SSIM_EXPR = (
    f"((CAST(2.0 AS DOUBLE) * {_SSIM_MX} * {_SSIM_MY} + CAST(6.5025 AS DOUBLE))"
    f" * (CAST(2.0 AS DOUBLE) * (sxy / {_SSIM_N} - {_SSIM_MX} * {_SSIM_MY})"
    f"    + CAST(58.5225 AS DOUBLE)))"
    f" / (({_SSIM_MX} * {_SSIM_MX} + {_SSIM_MY} * {_SSIM_MY} + CAST(6.5025 AS DOUBLE))"
    f"    * ((sxx / {_SSIM_N} - {_SSIM_MX} * {_SSIM_MX})"
    f"       + (syy / {_SSIM_N} - {_SSIM_MY} * {_SSIM_MY}) + CAST(58.5225 AS DOUBLE)))"
)

SQL_IMAGE_SSIM = f"""
WITH m AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
              i -> {_SSIM_DEC})) AS BIGINT) AS sx,
         CAST(list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
              i -> {_SSIM_VAR})) AS BIGINT) AS sy,
         CAST(list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
              i -> {_SSIM_DEC} * {_SSIM_DEC})) AS BIGINT) AS sxx,
         CAST(list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
              i -> {_SSIM_VAR} * {_SSIM_VAR})) AS BIGINT) AS syy,
         CAST(list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
              i -> {_SSIM_DEC} * {_SSIM_VAR})) AS BIGINT) AS sxy
  FROM documents WHERE doc_id % {_PH_EVERY} = 0
)
SELECT format('img{{:08d}}', doc_id) AS image_id, sxy,
       {_SSIM_EXPR} AS ssim,
       {_SSIM_EXPR} >= CAST(0.99 AS DOUBLE) AS near
FROM m
"""


# --------------------------------------------------------------------------
# E15 — 2SFCA accessibility (`spatial.accessibility_2sfca`): supply
# sites from the supplier table (deterministic lattice + integer
# capacity), demand = the geotagged events on the same tenth-milli-
# degree integer lattice; radius 100k units (10°).  The catchment test
# is the exact int predicate d² ≤ R², the supply ratio is fixed-point
# quantized (cap·10⁹ DIV D_j), so the accessibility sum is exact int64
# — DuckDB replays it from a brute-force distance join.
# --------------------------------------------------------------------------

_SFCA_RADIUS = 100_000
_SFCA_SCALE = 10**9


def q_accessibility_2sfca(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import accessibility_2sfca

    ev = _t(spark, sf_dir, "events")
    demand = ev.select(
        F.col("event_id").alias("demand_id"),
        ((F.col("event_id") * F.lit(2654435761)) % 1600000).alias("x"),
        ((F.col("event_id") * 40503 + 7) % 3600000).alias("y"),
    )
    sup = _t(spark, sf_dir, "supplier")
    supply = sup.select(
        F.col("s_suppkey").alias("supply_id"),
        ((F.col("s_suppkey") * 7919) % 1600000).alias("x"),
        ((F.col("s_suppkey") * 104729 + 13) % 3600000).alias("y"),
        (F.col("s_suppkey") % 20 + 1).alias("capacity"),
    )
    return accessibility_2sfca(demand, supply, _SFCA_RADIUS, _SFCA_SCALE)


SQL_ACCESSIBILITY_2SFCA = f"""
WITH d AS (
  SELECT event_id AS demand_id,
         (event_id * 2654435761) % 1600000 AS x,
         (event_id * 40503 + 7) % 3600000 AS y
  FROM events
),
s AS (
  SELECT s_suppkey AS supply_id,
         (s_suppkey * 7919) % 1600000 AS sx,
         (s_suppkey * 104729 + 13) % 3600000 AS sy,
         s_suppkey % 20 + 1 AS capacity
  FROM supplier
),
pairs AS (
  SELECT d.demand_id, s.supply_id, s.capacity
  FROM d JOIN s
    ON (d.x - s.sx) * (d.x - s.sx) + (d.y - s.sy) * (d.y - s.sy)
       <= CAST({_SFCA_RADIUS} AS BIGINT) * {_SFCA_RADIUS}
),
ratio AS (
  SELECT supply_id,
         (capacity * CAST({_SFCA_SCALE} AS BIGINT)) // count(*) AS r_j
  FROM pairs GROUP BY supply_id, capacity
)
SELECT p.demand_id,
       CAST(count(*) AS BIGINT) AS n_supply,
       CAST(sum(r.r_j) AS BIGINT) AS access
FROM pairs p JOIN ratio r USING (supply_id)
GROUP BY p.demand_id
"""


# --------------------------------------------------------------------------
# E16 — Clark-Evans nearest-neighbor index (`spatial.clark_evans`): the
# first-order point-pattern statistic over the geotagged events on the
# tenth-milli-degree integer lattice.  Per-point NN via the r_max grid
# candidate cut (exact int d², bounded-search contract: NN > r_max →
# counted in n_far); per-point distances quantized floor(√d²·10³) so
# the mean is one exact-int sum + fixed-order scalar algebra — the
# DuckDB twin replays the identical probe join bit-for-bit.
# --------------------------------------------------------------------------

_CE_RMAX = 50_000
_CE_AREA = 1_600_000.0 * 3_600_000.0
_CE_QUANT = 1000


def q_clark_evans(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import clark_evans

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        ((F.col("event_id") * F.lit(2654435761)) % 1600000).alias("x"),
        ((F.col("event_id") * 40503 + 7) % 3600000).alias("y"),
    )
    return clark_evans(pts, _CE_RMAX, _CE_AREA, _CE_QUANT)


SQL_CLARK_EVANS = f"""
WITH pts AS (
  SELECT event_id AS id,
         (event_id * 2654435761) % 1600000 AS x,
         (event_id * 40503 + 7) % 3600000 AS y
  FROM events
),
cells AS (SELECT id, x, y, x // {_CE_RMAX} AS cx, y // {_CE_RMAX} AS cy FROM pts),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nn AS (
  SELECT a.id,
         min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d2
  FROM cells a CROSS JOIN off o
  JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  WHERE a.id <> b.id
  GROUP BY a.id
  HAVING min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
         <= CAST({_CE_RMAX} AS BIGINT) * {_CE_RMAX}
),
near AS (
  SELECT count(*) AS n_near,
         CAST(sum(CAST(floor(sqrt(CAST(d2 AS DOUBLE)) * CAST({float(_CE_QUANT)} AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS sum_dq
  FROM nn
),
tot AS (SELECT count(*) AS n_pts FROM pts)
SELECT n_pts, n_near, n_pts - n_near AS n_far, sum_dq,
       CASE WHEN n_near > 0 THEN
         (sum_dq / CAST(n_near AS DOUBLE)) / CAST({float(_CE_QUANT)} AS DOUBLE)
       END AS mean_nn,
       CASE WHEN n_near > 0 THEN
         ((sum_dq / CAST(n_near AS DOUBLE)) / CAST({float(_CE_QUANT)} AS DOUBLE))
         / (CAST(0.5 AS DOUBLE) / sqrt(CAST(n_pts AS DOUBLE) / CAST({_CE_AREA!r} AS DOUBLE)))
       END AS r_index,
       CASE WHEN n_near > 0 THEN
         (((sum_dq / CAST(n_near AS DOUBLE)) / CAST({float(_CE_QUANT)} AS DOUBLE))
          - (CAST(0.5 AS DOUBLE) / sqrt(CAST(n_pts AS DOUBLE) / CAST({_CE_AREA!r} AS DOUBLE))))
         / (CAST(0.26136 AS DOUBLE)
            / sqrt(CAST(n_pts AS DOUBLE)
                   * (CAST(n_pts AS DOUBLE) / CAST({_CE_AREA!r} AS DOUBLE))))
       END AS z_score
FROM tot CROSS JOIN near
"""


# --------------------------------------------------------------------------
# E17 — nearest-neighbor G-function (`spatial.nn_gfunction`): the NN
# distance CDF on the clark_evans lattice — one _grid_nn_d2 pass at
# r_max = 5·10⁴, whole ladder answered by conditional int sums (the
# ripley_k idiom); g_r = n_le / n is one int division both engines
# perform identically.
# --------------------------------------------------------------------------

_GFN_STEP = 10_000
_GFN_BANDS = 5


def q_nn_gfunction(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import nn_gfunction

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        ((F.col("event_id") * F.lit(2654435761)) % 1600000).alias("x"),
        ((F.col("event_id") * 40503 + 7) % 3600000).alias("y"),
    )
    return nn_gfunction(pts, _GFN_STEP, _GFN_BANDS)


SQL_NN_GFUNCTION = f"""
WITH pts AS (
  SELECT event_id AS id,
         (event_id * 2654435761) % 1600000 AS x,
         (event_id * 40503 + 7) % 3600000 AS y
  FROM events
),
cells AS (
  SELECT id, x, y,
         x // {_GFN_STEP * _GFN_BANDS} AS cx,
         y // {_GFN_STEP * _GFN_BANDS} AS cy
  FROM pts
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
nn AS (
  SELECT a.id,
         min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d2
  FROM cells a CROSS JOIN off o
  JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  WHERE a.id <> b.id
  GROUP BY a.id
  HAVING min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
         <= CAST({_GFN_STEP * _GFN_BANDS} AS BIGINT) * {_GFN_STEP * _GFN_BANDS}
),
tot AS (SELECT count(*) AS n_pts FROM pts),
bands AS (SELECT CAST((k + 1) * {_GFN_STEP} AS BIGINT) AS r FROM range({_GFN_BANDS}) t(k)),
cnt AS (
  SELECT b.r AS r,
         CAST(coalesce(sum(CASE WHEN nn.d2 <= b.r * b.r THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_le
  FROM bands b LEFT JOIN nn ON true
  GROUP BY b.r
)
SELECT c.r, c.n_le,
       CASE WHEN t.n_pts > 0 THEN c.n_le / t.n_pts END AS g_r
FROM cnt c CROSS JOIN tot t
"""


# --------------------------------------------------------------------------
# E18 — quadrat-count CSR test (`spatial.quadrat_test`): variance-mean
# ratio over the 100 km-pitch partition of a 1.5M × 3.6M window (540
# quadrats, empties included via the window count, ~6 % of the hashed
# lattice deliberately out-of-window to exercise n_out).  One occupancy
# groupBy + one tiny aggregate; Σc² exact int64, VMR/χ²/z fixed-order
# scalar algebra replayed by the DuckDB twin bit-for-bit.
# --------------------------------------------------------------------------

_QT_CELL = 100_000
_QT_W = 1_500_000
_QT_H = 3_600_000
_QT_NQ = (_QT_W // _QT_CELL) * (_QT_H // _QT_CELL)


def q_quadrat_test(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import quadrat_test

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        ((F.col("event_id") * F.lit(1103515245) + 12345) % 1600000).alias("x"),
        ((F.col("event_id") * 69069 + 1) % 3600000).alias("y"),
    )
    return quadrat_test(pts, _QT_CELL, _QT_W, _QT_H)


SQL_QUADRAT_TEST = f"""
WITH pts AS (
  SELECT (event_id * 1103515245 + 12345) % 1600000 AS x,
         (event_id * 69069 + 1) % 3600000 AS y
  FROM events
),
base AS (
  SELECT (x >= 0 AND x < {_QT_W} AND y >= 0 AND y < {_QT_H}) AS inw,
         x // {_QT_CELL} AS qx, y // {_QT_CELL} AS qy
  FROM pts
),
tot AS (
  SELECT count(*) AS n_pts,
         CAST(coalesce(sum(CAST(inw AS BIGINT)), 0) AS BIGINT) AS n_in
  FROM base
),
occ0 AS (SELECT qx, qy, count(*) AS c FROM base WHERE inw GROUP BY qx, qy),
occ AS (
  SELECT count(*) AS n_occupied,
         CAST(coalesce(sum(c * c), 0) AS BIGINT) AS sum_c2
  FROM occ0
)
SELECT n_pts, n_in, n_pts - n_in AS n_out,
       CAST({_QT_NQ} AS BIGINT) AS n_quadrats, n_occupied, sum_c2,
       n_in / CAST({float(_QT_NQ)} AS DOUBLE) AS mean_c,
       CASE WHEN n_in > 0 THEN
         ((sum_c2 - (n_in / CAST({float(_QT_NQ)} AS DOUBLE)) * n_in)
          / CAST({float(_QT_NQ - 1)} AS DOUBLE))
         / (n_in / CAST({float(_QT_NQ)} AS DOUBLE))
       END AS vmr,
       CASE WHEN n_in > 0 THEN
         (sum_c2 - (n_in / CAST({float(_QT_NQ)} AS DOUBLE)) * n_in)
         / (n_in / CAST({float(_QT_NQ)} AS DOUBLE))
       END AS chi2,
       CASE WHEN n_in > 0 THEN
         (((sum_c2 - (n_in / CAST({float(_QT_NQ)} AS DOUBLE)) * n_in)
           / CAST({float(_QT_NQ - 1)} AS DOUBLE))
          / (n_in / CAST({float(_QT_NQ)} AS DOUBLE)) - CAST(1.0 AS DOUBLE))
         / sqrt(CAST(2.0 AS DOUBLE) / CAST({float(_QT_NQ - 1)} AS DOUBLE))
       END AS z_score
FROM tot CROSS JOIN occ
"""


# --------------------------------------------------------------------------
# E7f — per-image GLCM texture features (`images.glcm_stats`): the
# second-order texture leg over the REAL decode chain — co-occurrence
# of 16-level pairs at the channel-aligned +3 stride, with contrast /
# diagonal / energy / inverse-difference-moment all reduced to exact
# integers (the IDM weight pre-quantized to quant DIV (1+d²)) so the
# DuckDB twin replays the co-occurrence matrix from the closed-form
# pixel generator bit-for-bit.  Float conveniences are single int
# divisions (long/long → double in both engines).
# --------------------------------------------------------------------------

_GLCM_QUANT = 10**9


def q_image_glcm(spark, sf_dir):
    from gotrackmaster_spark.operators.images import glcm_stats, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    st = glcm_stats(imgs, n_levels=16, quant=_GLCM_QUANT)
    guard = F.col("n_pairs") > 0
    return st.select(
        "image_id",
        "fmt",
        "n_pairs",
        "contrast",
        "diag_pairs",
        "energy_sq",
        "hom_q",
        F.when(guard, F.col("contrast") / F.col("n_pairs")).alias("contrast_mean"),
        F.when(
            guard, F.col("hom_q") / (F.col("n_pairs") * F.lit(_GLCM_QUANT))
        ).alias("homogeneity"),
    )


SQL_IMAGE_GLCM = f"""
WITH px AS (
  SELECT doc_id, i,
         CASE WHEN doc_id % 3 = 2 THEN {_PIX} - ({_PIX}) % 4
              ELSE {_PIX} END AS p
  FROM documents, range({_N_PIX}) t(i)
),
pr AS (
  SELECT doc_id, p // 16 AS pl,
         (lead(p, 3) OVER w) // 16 AS ql
  FROM px
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
cm AS (
  SELECT doc_id, pl, ql, count(*) AS c
  FROM pr WHERE ql IS NOT NULL GROUP BY 1, 2, 3
),
feat AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_pairs,
         CAST(sum(c * ((pl - ql) * (pl - ql))) AS BIGINT) AS contrast,
         CAST(coalesce(sum(CASE WHEN pl = ql THEN c END), 0) AS BIGINT) AS diag_pairs,
         CAST(sum(c * c) AS BIGINT) AS energy_sq,
         CAST(sum(c * ({_GLCM_QUANT} // (1 + (pl - ql) * (pl - ql)))) AS BIGINT) AS hom_q
  FROM cm GROUP BY doc_id
)
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       n_pairs, contrast, diag_pairs, energy_sq, hom_q,
       CASE WHEN n_pairs > 0 THEN contrast / n_pairs END AS contrast_mean,
       CASE WHEN n_pairs > 0 THEN hom_q / (n_pairs * {_GLCM_QUANT}) END AS homogeneity
FROM feat
"""


# --------------------------------------------------------------------------
# E19 — bivariate (cross-type) Ripley's K (`spatial.cross_ripley_k`):
# does event class A cluster around class B?  Same ONE-candidate-pass
# grid topology as ripley_k (×9 probe explode, conditional sums per
# radius), probe side = A rows, build side = B rows; exact-int pair
# counts, fixed-order K/L algebra rounded to 6 — DuckDB twin replays
# the identical candidate join.
# --------------------------------------------------------------------------

_XK_RADII = (1.25, 1.75, 2.5)  # same ladder as ripley_k (lattice pitch ~1.18)
_XK_AREA = 360.0 * 160.0
_XK_G = max(_XK_RADII)


def q_cross_k(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import cross_ripley_k

    pts = geo_events(spark, sf_dir).select(
        "event_id", "lat", "lon", (F.col("event_id") % 3 == 0).alias("is_a")
    )
    out = cross_ripley_k(pts, list(_XK_RADII), _XK_AREA)
    return out.select(
        "r",
        "n_pairs",
        F.round(F.col("k_ab"), 6).alias("k_ab"),
        F.round(F.col("l_ab"), 6).alias("l_ab"),
    )


_XK_COUNTS = ", ".join(
    f"CAST(coalesce(sum(CASE WHEN d2 <= {r * r!r} THEN 1 ELSE 0 END), 0)"
    f" AS BIGINT) AS c{i}"
    for i, r in enumerate(_XK_RADII)
)
_XK_LADDER = " UNION ALL ".join(
    f"SELECT CAST({float(r)!r} AS DOUBLE) AS r, c{i} AS n_pairs, "
    f"round(CASE WHEN na > 0 AND nb > 0 THEN {_XK_AREA!r} * c{i} / (na * nb) END, 6) AS k_ab, "
    f"round(CASE WHEN na > 0 AND nb > 0 THEN "
    f"sqrt({_XK_AREA!r} * c{i} / (na * nb) / 3.141592653589793) END, 6) AS l_ab "
    f"FROM counts, n_tab"
    for i, r in enumerate(_XK_RADII)
)

SQL_CROSS_K = f"""
WITH {GEO_CTE},
base AS (
  SELECT event_id % 3 = 0 AS is_a, lon AS x, lat AS y,
         CAST(floor(lon / {_XK_G!r}) AS BIGINT) AS cx,
         CAST(floor(lat / {_XK_G!r}) AS BIGINT) AS cy
  FROM geo
),
off AS (SELECT dx - 1 AS dx, dy - 1 AS dy FROM range(3) t1(dx), range(3) t2(dy)),
cand AS (
  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM base a, off o
  JOIN base b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  WHERE a.is_a AND NOT b.is_a
),
counts AS (SELECT {_XK_COUNTS} FROM cand),
n_tab AS (
  SELECT CAST(coalesce(sum(CASE WHEN is_a THEN 1 ELSE 0 END), 0) AS BIGINT) AS na,
         CAST(coalesce(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END), 0) AS BIGINT) AS nb
  FROM base
)
{_XK_LADDER}
"""


# --------------------------------------------------------------------------
# E20 — Theil-Sen slopes (`spatial.theil_sen_slopes`): the robust
# trend-magnitude companion to trend_cells, on the SAME per-cell daily
# occupancy series.  Pairwise slopes are single long/long divisions,
# the median is rank-select — bit-deterministic; the DuckDB twin
# replays the identical pair join + order statistics.
# --------------------------------------------------------------------------


def q_theil_sen(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import theil_sen_slopes

    geo = geo_events(spark, sf_dir)
    occ = geo.groupBy(
        F.floor(F.col("lon") / _TREND_G).cast("long").alias("gx"),
        F.floor(F.col("lat") / _TREND_G).cast("long").alias("gy"),
        F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}").alias("t"),
    ).agg(F.count("*").alias("cnt"))
    return theil_sen_slopes(occ)


SQL_THEIL_SEN = f"""
WITH {GEO_CTE},
occ AS (
  SELECT CAST(floor(lon / {_TREND_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_TREND_G}) AS BIGINT) AS gy,
         epoch_us(ts) // {_US_PER_DAY} AS t,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2, 3
),
pairs AS (
  SELECT a.gx, a.gy, (b.cnt - a.cnt) / (b.t - a.t) AS s
  FROM occ a JOIN occ b ON a.gx = b.gx AND a.gy = b.gy AND a.t < b.t
),
ranked AS (
  SELECT gx, gy, s,
         row_number() OVER (PARTITION BY gx, gy ORDER BY s) AS rn,
         count(*) OVER (PARTITION BY gx, gy) AS n
  FROM pairs
)
SELECT gx, gy, CAST(max(n) AS BIGINT) AS n_pairs,
       (min(CASE WHEN rn = (n + 1) // 2 THEN s END)
        + min(CASE WHEN rn = n // 2 + 1 THEN s END)) / CAST(2.0 AS DOUBLE) AS slope
FROM ranked GROUP BY gx, gy
"""


# --------------------------------------------------------------------------
# E7g — per-image luma spatial moments (`images.image_moments`): the
# shape/centroid leg over the REAL decode chain — six exact-int64 raw
# moments m_pq (p+q ≤ 2) of the integer luma plane, plus fixed-order
# float conveniences (centroid, central moments, anisotropy — pure
# +,−,×,÷, no transcendentals, so both engines agree bit-for-bit).
# The DuckDB twin replays luma and the moment sums from the
# closed-form pixel generator at per-channel flat indices 3j, 3j+1,
# 3j+2.
# --------------------------------------------------------------------------


def _mom_pix_at(e: str) -> str:
    p = f"((doc_id * 31 + ({e}) * 2654435761) % 256)"
    return f"(CASE WHEN doc_id % 3 = 2 THEN {p} - {p} % 4 ELSE {p} END)"


def q_image_moments(spark, sf_dir):
    from gotrackmaster_spark.operators.images import image_moments, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    st = image_moments(imgs)
    xc = F.col("m10") / F.col("m00")
    yc = F.col("m01") / F.col("m00")
    mu20 = F.col("m20") - xc * F.col("m10")
    mu02 = F.col("m02") - yc * F.col("m01")
    mu11 = F.col("m11") - xc * F.col("m01")
    den = (mu20 + mu02) * (mu20 + mu02)
    num = (mu20 - mu02) * (mu20 - mu02) + F.lit(4.0) * (mu11 * mu11)
    g0 = F.col("m00") > 0
    return st.select(
        "image_id",
        "fmt",
        "m00",
        "m10",
        "m01",
        "m20",
        "m02",
        "m11",
        F.when(g0, xc).alias("xc"),
        F.when(g0, yc).alias("yc"),
        F.when(g0, mu20).alias("mu20"),
        F.when(g0, mu02).alias("mu02"),
        F.when(g0, mu11).alias("mu11"),
        F.when(g0 & (den > 0), num / den).alias("anisotropy"),
    )


_MOM_XC = "(m10 / m00)"
_MOM_YC = "(m01 / m00)"
_MOM_MU20 = f"(m20 - {_MOM_XC} * m10)"
_MOM_MU02 = f"(m02 - {_MOM_YC} * m01)"
_MOM_MU11 = f"(m11 - {_MOM_XC} * m01)"
_MOM_DEN = f"(({_MOM_MU20} + {_MOM_MU02}) * ({_MOM_MU20} + {_MOM_MU02}))"
_MOM_NUM = (
    f"(({_MOM_MU20} - {_MOM_MU02}) * ({_MOM_MU20} - {_MOM_MU02})"
    f" + CAST(4.0 AS DOUBLE) * ({_MOM_MU11} * {_MOM_MU11}))"
)

SQL_IMAGE_MOMENTS = f"""
WITH lum AS (
  SELECT doc_id, j % {_IMG_W} AS x, j // {_IMG_W} AS y,
         (299 * {_mom_pix_at('j * 3')}
          + 587 * {_mom_pix_at('j * 3 + 1')}
          + 114 * {_mom_pix_at('j * 3 + 2')}) // 1000 AS l
  FROM documents, range({_IMG_W * _IMG_H}) t(j)
),
feat AS (
  SELECT doc_id,
         CAST(sum(l) AS BIGINT) AS m00,
         CAST(sum(x * l) AS BIGINT) AS m10,
         CAST(sum(y * l) AS BIGINT) AS m01,
         CAST(sum(x * x * l) AS BIGINT) AS m20,
         CAST(sum(y * y * l) AS BIGINT) AS m02,
         CAST(sum(x * y * l) AS BIGINT) AS m11
  FROM lum GROUP BY doc_id
)
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       m00, m10, m01, m20, m02, m11,
       CASE WHEN m00 > 0 THEN {_MOM_XC} END AS xc,
       CASE WHEN m00 > 0 THEN {_MOM_YC} END AS yc,
       CASE WHEN m00 > 0 THEN {_MOM_MU20} END AS mu20,
       CASE WHEN m00 > 0 THEN {_MOM_MU02} END AS mu02,
       CASE WHEN m00 > 0 THEN {_MOM_MU11} END AS mu11,
       CASE WHEN m00 > 0 AND {_MOM_DEN} > 0
            THEN {_MOM_NUM} / {_MOM_DEN} END AS anisotropy
FROM feat
"""


# --------------------------------------------------------------------------
# E21 — movement-direction rose (`spatial.movement_rose`): per-user
# consecutive-leg headings classified into 8 octants with PURE integer
# comparisons (no atan2 — not bit-pinned across engines) over the
# fixed-point event lattice; exact-int counts / Σd², one lag window +
# one ≤9-group aggregate.  DuckDB twin replays the identical CASE arm
# order.
# --------------------------------------------------------------------------


def q_movement_rose(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import movement_rose

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * F.lit(2654435761)) % 1600000).alias("x"),
        ((F.col("event_id") * 40503 + 7) % 3600000).alias("y"),
    )
    return movement_rose(pts)


SQL_MOVEMENT_ROSE = """
WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 2654435761) % 1600000 AS x,
         (event_id * 40503 + 7) % 3600000 AS y
  FROM events
),
legs AS (
  SELECT x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sec AS (
  SELECT CASE
           WHEN dx = 0 AND dy = 0 THEN CAST(NULL AS INT)
           WHEN dx > 0 AND dy >= 0 AND dy < dx THEN 0
           WHEN dy > 0 AND dx > 0 AND dx <= dy THEN 1
           WHEN dy > 0 AND dx <= 0 AND -dx < dy THEN 2
           WHEN dx < 0 AND dy > 0 AND dy <= -dx THEN 3
           WHEN dx < 0 AND dy <= 0 AND -dy < -dx THEN 4
           WHEN dy < 0 AND dx < 0 AND -dx <= -dy THEN 5
           WHEN dy < 0 AND dx >= 0 AND dx < -dy THEN 6
           ELSE 7
         END AS sector,
         dx * dx + dy * dy AS d2
  FROM legs WHERE dx IS NOT NULL AND dy IS NOT NULL
),
per AS (
  SELECT sector, CAST(count(*) AS BIGINT) AS n_legs,
         CAST(sum(d2) AS BIGINT) AS sum_d2
  FROM sec GROUP BY sector
)
SELECT sector,
       CASE WHEN sector IS NULL THEN 'none'
            ELSE ['E', 'NE', 'N', 'NW', 'W', 'SW', 'S', 'SE'][sector + 1]
       END AS label,
       n_legs, sum_d2,
       n_legs / sum(n_legs) OVER () AS share
FROM per
"""


# --------------------------------------------------------------------------
# E22 — gravity-model O-D residuals (`spatial.gravity_residuals`):
# which corridors out/under-perform the size×distance expectation?
# Flows = per-user first→last 15° cell transitions (the od_matrix
# extraction on the trend grid); margins broadcast back, one scalar
# normaliser over OBSERVED pairs only (never n_cells²); exact-int
# weights/margins, fixed-order float residuals — DuckDB-exact.
# --------------------------------------------------------------------------

_GRAV_QUANT = 10**6


def q_gravity_od(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import gravity_residuals

    geo = geo_events(spark, sf_dir)
    od = geo.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "lat", "lon")).alias("o"),
        F.max(F.struct("ts", "event_id", "lat", "lon")).alias("d"),
    )
    flows = (
        od.select(
            F.floor(F.col("o.lon") / _TREND_G).cast("long").alias("o_gx"),
            F.floor(F.col("o.lat") / _TREND_G).cast("long").alias("o_gy"),
            F.floor(F.col("d.lon") / _TREND_G).cast("long").alias("d_gx"),
            F.floor(F.col("d.lat") / _TREND_G).cast("long").alias("d_gy"),
        )
        .groupBy("o_gx", "o_gy", "d_gx", "d_gy")
        .agg(F.count("*").alias("flow"))
    )
    return gravity_residuals(flows, _GRAV_QUANT)


_GRAV_NUM = "((j.o_tot * j.d_tot) * j.w_q)"
_GRAV_EXP = f"(CAST(t_tot AS DOUBLE) * {_GRAV_NUM}) / den"

SQL_GRAVITY_OD = f"""
WITH {GEO_CTE},
ranked AS (
  SELECT user_id, lat, lon,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_o,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM geo
),
o AS (SELECT user_id, CAST(floor(lon / {_TREND_G}) AS BIGINT) AS o_gx,
             CAST(floor(lat / {_TREND_G}) AS BIGINT) AS o_gy
      FROM ranked WHERE rn_o = 1),
d AS (SELECT user_id, CAST(floor(lon / {_TREND_G}) AS BIGINT) AS d_gx,
             CAST(floor(lat / {_TREND_G}) AS BIGINT) AS d_gy
      FROM ranked WHERE rn_d = 1),
flows AS (
  SELECT o_gx, o_gy, d_gx, d_gy, CAST(count(*) AS BIGINT) AS flow
  FROM o JOIN d USING (user_id) GROUP BY 1, 2, 3, 4
),
om AS (SELECT o_gx, o_gy, CAST(sum(flow) AS BIGINT) AS o_tot FROM flows GROUP BY 1, 2),
dm AS (SELECT d_gx, d_gy, CAST(sum(flow) AS BIGINT) AS d_tot FROM flows GROUP BY 1, 2),
j AS (
  SELECT f.o_gx, f.o_gy, f.d_gx, f.d_gy, f.flow, om.o_tot, dm.d_tot,
         {_GRAV_QUANT} // (1 + (f.o_gx - f.d_gx) * (f.o_gx - f.d_gx)
                             + (f.o_gy - f.d_gy) * (f.o_gy - f.d_gy)) AS w_q
  FROM flows f
  JOIN om ON om.o_gx = f.o_gx AND om.o_gy = f.o_gy
  JOIN dm ON dm.d_gx = f.d_gx AND dm.d_gy = f.d_gy
),
tot AS (
  SELECT CAST(sum(flow) AS BIGINT) AS t_tot,
         CAST(sum((o_tot * d_tot) * w_q) AS BIGINT) AS den
  FROM j
)
SELECT j.o_gx, j.o_gy, j.d_gx, j.d_gy, j.flow, j.o_tot, j.d_tot, j.w_q,
       CASE WHEN den > 0 THEN {_GRAV_EXP} END AS expected,
       CASE WHEN den > 0 THEN j.flow - {_GRAV_EXP} END AS residual,
       CASE WHEN den > 0 AND {_GRAV_NUM} > 0
            THEN (j.flow - {_GRAV_EXP}) / sqrt({_GRAV_EXP}) END AS z_score
FROM j CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# E23 — D8 flow direction (`spatial.d8_flow_direction`): steepest-
# descent direction per occupied 1° DEM cell (ESRI codes, 0 = sink)
# with the drop/√2 comparison replaced by its exact squared-integer
# form (straight 2·drop² vs diagonal drop²) and fixed clockwise tie
# order.  Raster = the integer corner-hash DEM sampled at the cells
# the events actually occupy (sparse — boundary/missing-neighbor
# semantics exercised).  The occupancy ×9 explode + ONE hash
# aggregate; DuckDB twin replays the identical CASE fold.
# --------------------------------------------------------------------------

# (code, nx, ny) clockwise from east — MUST match spatial._D8_DIRS
# (pinned by tests/test_hotspots.py::test_d8_codes_match)
_D8 = [
    (1, 1, 0), (2, 1, -1), (4, 0, -1), (8, -1, -1),
    (16, -1, 0), (32, -1, 1), (64, 0, 1), (128, 1, 1),
]


def q_d8_flow(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import d8_flow_direction

    geo = geo_events(spark, sf_dir)
    cells = geo.select(
        F.floor("lon").cast("long").alias("x"),
        F.floor("lat").cast("long").alias("y"),
    ).distinct()
    ele = ((F.col("y") + 90) * 361 + (F.col("x") + 180)) * F.lit(2654435761) % 40000
    return d8_flow_direction(cells.select("x", "y", ele.alias("ele")))


_D8_OFF_VALUES = ", ".join(
    ["(0, 0, 0)"] + [f"({-nx}, {-ny}, {code})" for code, nx, ny in _D8]
)
_D8_EMAX = ",\n         ".join(
    f"max(CASE WHEN d = {code} THEN ele END) AS e{code}" for code, _, _ in _D8
)
_D8_SCORES = ",\n       ".join(
    f"coalesce(CASE WHEN c - e{code} > 0 THEN "
    f"{2 if nx * ny == 0 else 1} * ((c - e{code}) * (c - e{code})) END, 0) AS s{code}"
    for code, nx, ny in _D8
)
_D8_GREATEST = "greatest(" + ", ".join(f"s{code}" for code, _, _ in _D8) + ")"
_D8_PICK = " ".join(
    f"WHEN s{code} = m THEN {code}" for code, _, _ in _D8
)

# CTE body shared by SQL_D8_FLOW and SQL_D8_BASINS (the latter needs a
# WITH RECURSIVE prefix, so the WITH keyword is not baked in here)
_D8_CTES = f"""{GEO_CTE},
cells AS (
  SELECT DISTINCT CAST(floor(lon) AS BIGINT) AS x,
                  CAST(floor(lat) AS BIGINT) AS y
  FROM geo
),
r AS (
  SELECT x, y, ((y + 90) * 361 + (x + 180)) * 2654435761 % 40000 AS ele
  FROM cells
),
off AS (SELECT * FROM (VALUES {_D8_OFF_VALUES}) t(dx, dy, d)),
fan AS (SELECT r.x + o.dx AS x, r.y + o.dy AS y, o.d, r.ele FROM r, off o),
agg AS (
  SELECT x, y,
         max(CASE WHEN d = 0 THEN ele END) AS c,
         {_D8_EMAX}
  FROM fan GROUP BY x, y
),
sc AS (
  SELECT x, y, c AS ele,
       {_D8_SCORES}
  FROM agg WHERE c IS NOT NULL
),
scm AS (SELECT *, {_D8_GREATEST} AS m FROM sc)"""

SQL_D8_FLOW = f"""
WITH {_D8_CTES}
SELECT x, y, ele,
       CASE WHEN m = 0 THEN 0 {_D8_PICK} END AS flow_dir,
       m AS best_score
FROM scm
"""


# --------------------------------------------------------------------------
# E24 — D8 watershed basins (`spatial.d8_basins`): every cell drains
# along its D8 pointer to a unique sink (strictly-downhill ⇒ acyclic);
# Spark resolves the forest by POINTER DOUBLING (⌈log₂ L⌉ equi-join
# rounds, plan_snapshotter lineage truncation — the dup_components
# iterative contract), the DuckDB twin by a recursive-CTE walk.
# --------------------------------------------------------------------------


def q_d8_basins(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import d8_basins

    return d8_basins(q_d8_flow(spark, sf_dir).select("x", "y", "flow_dir"))


_D8_DX_SQL = (
    "CASE f.flow_dir "
    + " ".join(f"WHEN {code} THEN {nx}" for code, nx, ny in _D8)
    + " ELSE 0 END"
)
_D8_DY_SQL = (
    "CASE f.flow_dir "
    + " ".join(f"WHEN {code} THEN {ny}" for code, nx, ny in _D8)
    + " ELSE 0 END"
)

SQL_D8_BASINS = f"""
WITH RECURSIVE {_D8_CTES},
ftab AS (
  SELECT x, y, CASE WHEN m = 0 THEN 0 {_D8_PICK} END AS flow_dir FROM scm
),
walk AS (
  SELECT x AS x0, y AS y0, x AS cx, y AS cy FROM ftab
  UNION ALL
  SELECT w.x0, w.y0,
         w.cx + {_D8_DX_SQL},
         w.cy + {_D8_DY_SQL}
  FROM walk w JOIN ftab f ON f.x = w.cx AND f.y = w.cy
  WHERE f.flow_dir <> 0
),
final AS (
  SELECT w.cx, w.cy
  FROM walk w JOIN ftab f ON f.x = w.cx AND f.y = w.cy
  WHERE f.flow_dir = 0
)
SELECT cx AS sink_x, cy AS sink_y, CAST(count(*) AS BIGINT) AS n_cells
FROM final GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E7h — shared-block detection (`images.shared_blocks`): sub-image
# duplicate tiles across images (the watermark/logo dedup primitive).
# 8×8×3 blocks, EXACT integer signature pair (Σp, Σp·(j+1)), one
# shuffle on the signature key; constant (letterbox-bar) blocks are
# pre-filtered mapper-side via sig1·2 == sig0·(n+1) — mirrored in the
# WHERE below.  The generator plants true positives:
# doc k and k+256 produce identical pixels (31·256 ≡ 0 mod 256), and
# the pair survives exactly when neither side is qnt4-quantized — the
# oracle replays blocks from per-channel generator indices.
# --------------------------------------------------------------------------

_SB_BW, _SB_BH = 8, 8
_SB_NLOC = _SB_BW * _SB_BH * 3
_SB_NBX = _IMG_W // _SB_BW
_SB_NB = (_IMG_W // _SB_BW) * (_IMG_H // _SB_BH)
# flat pixel index of block bi, block-local byte j (row-major dy,dx,c)
_SB_I = (
    f"((((bi // {_SB_NBX}) * {_SB_BH} + j // {_SB_BW * 3}) * {_IMG_W}"
    f" + ((bi % {_SB_NBX}) * {_SB_BW} + (j % {_SB_BW * 3}) // 3)) * 3"
    f" + (j % {_SB_BW * 3}) % 3)"
)


def q_shared_blocks(spark, sf_dir):
    from gotrackmaster_spark.operators.images import shared_blocks, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    return shared_blocks(imgs, _SB_BW, _SB_BH, min_images=2)


SQL_SHARED_BLOCKS = f"""
WITH px AS (
  SELECT doc_id, bi, j, {_mom_pix_at(_SB_I)} AS p
  FROM documents, range({_SB_NB}) b(bi), range({_SB_NLOC}) t(j)
),
sig AS (
  SELECT doc_id, bi,
         CAST(sum(p) AS BIGINT) AS sig0,
         CAST(sum(p * (j + 1)) AS BIGINT) AS sig1
  FROM px GROUP BY doc_id, bi
)
SELECT sig0, sig1, CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_imgs
FROM sig
WHERE sig1 * 2 <> sig0 * ({_SB_NLOC} + 1)
GROUP BY 1, 2
HAVING count(DISTINCT doc_id) >= 2
"""


# --------------------------------------------------------------------------
# E25 — PIP with holes (`spatial.point_in_polygon_join_holes`): donut
# polygons (the nation rectangles with a centered half-size hole) via
# COMPOSITION — shell hits LEFT ANTI hole hits on (event_id, poly_id);
# both legs the standard broadcast-covering PIP.  Oracle: inside outer
# AND NOT inside hole, brute-force bounds join.
# --------------------------------------------------------------------------


def donut_polygons(spark, sf_dir) -> DataFrame:
    """The rect_polygons layer with a centered half-size rectangular
    hole — rings[0] = shell, rings[1] = hole."""
    nat = _t(spark, sf_dir, "nation")
    lat0, lat1, lon0, lon1 = _rect_bounds_cols()
    h_lat0, h_lat1 = lat0 + (lat1 - lat0) * 0.25, lat1 - (lat1 - lat0) * 0.25
    h_lon0, h_lon1 = lon0 + (lon1 - lon0) * 0.25, lon1 - (lon1 - lon0) * 0.25

    def rect_ring(a0, a1, b0, b1):
        return F.array(
            F.struct(a0.alias("lat"), b0.alias("lon")),
            F.struct(a0.alias("lat"), b1.alias("lon")),
            F.struct(a1.alias("lat"), b1.alias("lon")),
            F.struct(a1.alias("lat"), b0.alias("lon")),
        )

    return nat.select(
        F.col("n_nationkey").cast("string").alias("poly_id"),
        F.array(
            rect_ring(lat0, lat1, lon0, lon1),
            rect_ring(h_lat0, h_lat1, h_lon0, h_lon1),
        ).alias("rings"),
    )


def q_pip_donut(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import point_in_polygon_join_holes

    pts = geo_events(spark, sf_dir).select("event_id", "lat", "lon")
    hits = point_in_polygon_join_holes(pts, donut_polygons(spark, sf_dir), level=7)
    return hits.groupBy("poly_id").agg(F.count("*").alias("n_points"))


SQL_PIP_DONUT = f"""
WITH {GEO_CTE},
rects AS ({_RECT_SQL}),
donut AS (
  SELECT poly_id, lat0, lat1, lon0, lon1,
         lat0 + (lat1 - lat0) * 0.25 AS h_lat0,
         lat1 - (lat1 - lat0) * 0.25 AS h_lat1,
         lon0 + (lon1 - lon0) * 0.25 AS h_lon0,
         lon1 - (lon1 - lon0) * 0.25 AS h_lon1
  FROM rects
)
SELECT r.poly_id, count(*) AS n_points
FROM geo g JOIN donut r
  ON g.lat > r.lat0 AND g.lat < r.lat1 AND g.lon > r.lon0 AND g.lon < r.lon1
 AND NOT (g.lat > r.h_lat0 AND g.lat < r.h_lat1
          AND g.lon > r.h_lon0 AND g.lon < r.h_lon1)
GROUP BY r.poly_id
"""


# --------------------------------------------------------------------------
# E7i — per-query phash top-k (`images.phash_topk`): the image twin of
# embedding_topk — rank the corpus (base ∪ planted variants) for each
# variant-bearing base image by Hamming distance WITHIN 16 (bounded-
# search pigeonhole contract; banding guarantees candidate completeness
# at ≤ max_hamming).  Exact-int hamming + (hamming, id) rank — DuckDB
# twin replays the brute-force ranking over the generator phashes.
# --------------------------------------------------------------------------

_PTK_K = 5
_PTK_H = 16


def q_phash_topk(spark, sf_dir):
    from gotrackmaster_spark.operators.images import (
        phash_topk,
        synthesize_image_variants,
        synthesize_images,
    )

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    cols = ["img_key", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    both = imgs.select(*cols).unionByName(
        synthesize_image_variants(imgs, every=_PH_EVERY)
    )
    queries = both.filter(
        (F.col("img_key") % _PH_EVERY == 0) & F.col("image_id").startswith("img")
    )
    return phash_topk(
        both.select("image_id", "phash"),
        queries.select("image_id", "phash"),
        k=_PTK_K,
        max_hamming=_PTK_H,
    )


SQL_PHASH_TOPK = f"""
WITH base_bs AS (
  SELECT doc_id, {_phash_bs_sql(_PIX_F)} AS bs FROM documents
),
var_bs AS (
  SELECT doc_id, {_phash_bs_sql(_PIX_VAR)} AS bs
  FROM documents WHERE doc_id % {_PH_EVERY} = 0
),
base AS (
  SELECT doc_id, format('img{{:08d}}', doc_id) AS image_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, bs, list_sum(bs) AS tot FROM base_bs)
),
vars AS (
  SELECT format('var{{:08d}}', doc_id) AS image_id, {_PHASH_FROM_BS} AS phash
  FROM (SELECT doc_id, bs, list_sum(bs) AS tot FROM var_bs)
),
all_imgs AS (
  SELECT image_id, phash FROM base UNION ALL SELECT image_id, phash FROM vars
),
qs AS (SELECT image_id, phash FROM base WHERE doc_id % {_PH_EVERY} = 0),
pairs AS (
  SELECT q.image_id AS q_id, b.image_id AS b_id,
         CAST(bit_count(xor(q.phash, b.phash)) AS INT) AS hamming
  FROM qs q JOIN all_imgs b ON b.image_id <> q.image_id
  WHERE bit_count(xor(q.phash, b.phash)) <= {_PTK_H}
),
ranked AS (
  SELECT q_id, b_id, hamming,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY hamming, b_id)
              AS INT) AS rnk
  FROM pairs
)
SELECT q_id, b_id, hamming, rnk FROM ranked WHERE rnk <= {_PTK_K}
"""


# --------------------------------------------------------------------------
# E26 — distinctive terms per tile (`tile_top_terms` composite): the
# text×geo leg — per 10° tile, the top-3 caption terms ranked by the
# INTEGER-QUANTIZED tf/df score (tf·10⁶ DIV df; a float tf-idf with ln
# would make near-tie ranking engine-dependent).  One word explode,
# two hash aggregates, the tiny global df table broadcast back; rank =
# (score DESC, term ASC) — fully deterministic.
# --------------------------------------------------------------------------

_TTT_K = 3
_TTT_QUANT = 10**6
_TTT_TILE_DEG = 10.0


def q_tile_top_terms(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    lat, lon = _img_geotag_cols(F.col("doc_id"))
    words = docs.select(
        "doc_id",
        tile_name_col(lat, lon, _TTT_TILE_DEG).alias("tile"),
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).filter(F.length("term") > 0)
    tf = words.groupBy("tile", "term").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    j = tf.join(F.broadcast(df_), "term").withColumn(
        "score", F.expr(f"(tf * {_TTT_QUANT}) DIV df")
    )
    w = Window.partitionBy("tile").orderBy(F.col("score").desc(), "term")
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TTT_K)
        .select("tile", "term", "tf", "df", "score", "rnk")
    )


SQL_TILE_TOP_TERMS = f"""
WITH tagged AS (
  SELECT doc_id,
         {tile_name_sql("((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0",
                        "((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0",
                        _TTT_TILE_DEG)} AS tile,
         text
  FROM documents
),
words AS (
  SELECT doc_id, tile, unnest(string_split(lower(text), ' ')) AS term
  FROM tagged
),
flt AS (SELECT * FROM words WHERE length(term) > 0),
tf AS (SELECT tile, term, CAST(count(*) AS BIGINT) AS tf FROM flt GROUP BY 1, 2),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM flt GROUP BY 1),
j AS (
  SELECT tile, t.term, tf, df, (tf * {_TTT_QUANT}) // df AS score
  FROM tf t JOIN df USING (term)
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY tile ORDER BY score DESC, term)
                 AS INT) AS rnk
  FROM j
)
SELECT tile, term, tf, df, score, rnk FROM ranked WHERE rnk <= {_TTT_K}
"""


# --------------------------------------------------------------------------
# E27 — per-user sinuosity (`sinuosity` composite): path length over
# straight-line displacement on the fixed-point lattice, both
# quantized floor(√d²·10³) so the sums are exact int64 (the
# clark_evans determinism trick) and the index is ONE int/int
# division.  One lag window on the user key + one aggregate reusing
# its partitioning.
# --------------------------------------------------------------------------

_SIN_QUANT = 1000


def q_sinuosity(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * F.lit(2654435761)) % 1600000).alias("x"),
        ((F.col("event_id") * 40503 + 7) % 3600000).alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = pts.select(
        "user_id",
        "ts",
        "event_id",
        "x",
        "y",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.first("x").over(w).alias("x0"),
        F.first("y").over(w).alias("y0"),
    )
    d2 = F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")
    leg_q = F.floor(F.sqrt(d2) * F.lit(float(_SIN_QUANT))).cast("long")
    e2 = (F.col("x") - F.col("x0")) * (F.col("x") - F.col("x0")) + (
        F.col("y") - F.col("y0")
    ) * (F.col("y") - F.col("y0"))
    end_q = F.floor(F.sqrt(e2) * F.lit(float(_SIN_QUANT))).cast("long")
    agg = legs.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("dx").isNotNull(), leg_q)), F.lit(0)).alias(
            "path_q"
        ),
        F.count(F.col("dx")).alias("n_legs"),
        # endpoint displacement = end_q of the LAST row by (ts, event_id):
        # lexicographic struct-max (DuckDB twin: max_by(end_q, (ts, event_id)))
        F.max(F.struct("ts", "event_id", end_q.alias("eq")))["eq"].alias(
            "straight_q"
        ),
    )
    guard = F.col("straight_q") > 0
    return agg.select(
        "user_id",
        "n_legs",
        "path_q",
        "straight_q",
        F.when(guard, F.col("path_q") / F.col("straight_q")).alias("sinuosity"),
    )


SQL_SINUOSITY = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 2654435761) % 1600000 AS x,
         (event_id * 40503 + 7) % 3600000 AS y
  FROM events
),
legs AS (
  SELECT user_id, ts, event_id, x, y,
         x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy,
         first_value(x) OVER w AS x0, first_value(y) OVER w AS y0
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
q AS (
  SELECT user_id, ts, event_id,
         CASE WHEN dx IS NOT NULL THEN
           CAST(floor(sqrt(CAST(dx * dx + dy * dy AS DOUBLE))
                      * CAST({float(_SIN_QUANT)} AS DOUBLE)) AS BIGINT)
         END AS leg_q,
         CAST(floor(sqrt(CAST((x - x0) * (x - x0) + (y - y0) * (y - y0) AS DOUBLE))
                    * CAST({float(_SIN_QUANT)} AS DOUBLE)) AS BIGINT) AS end_q
  FROM legs
),
q2 AS (
  SELECT user_id, leg_q,
         last_value(end_q) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_eq
  FROM q
)
SELECT user_id,
       CAST(count(leg_q) AS BIGINT) AS n_legs,
       CAST(coalesce(sum(leg_q), 0) AS BIGINT) AS path_q,
       CAST(max(last_eq) AS BIGINT) AS straight_q,
       CASE WHEN max(last_eq) > 0 THEN
         coalesce(sum(leg_q), 0) / max(last_eq)
       END AS sinuosity
FROM q2 GROUP BY user_id
"""


# --------------------------------------------------------------------------
# E28 — space-time KDE (`spatial.stkde_raster`): the kde_raster shape
# with a separable day axis — quantized Epanechnikov product kernel
# (Q_s − d²)·(Q_t − dt²), all exact int64 (t pre-quantized to DAYS so
# Q_t stays tiny).  ONE ×25·3 explode + ONE hash aggregate.
# --------------------------------------------------------------------------

_STK_CELL, _STK_R = 1000, 2
_STK_TBIN, _STK_RT = 2, 1
_STK_QS = (_STK_R * _STK_CELL) ** 2
_STK_QT = (_STK_RT * _STK_TBIN) ** 2


def q_stkde(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import stkde_raster

    geo = geo_events(spark, sf_dir)
    pts = geo.select(
        F.round((F.col("lon") + 180.0) * 1000, 0).cast("long").alias("x"),
        F.round((F.col("lat") + 80.0) * 1000, 0).cast("long").alias("y"),
        F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}").alias("t"),
    )
    return stkde_raster(pts, _STK_CELL, _STK_R, _STK_TBIN, _STK_RT)


SQL_STKDE = f"""
WITH {GEO_CTE},
pts AS (
  SELECT CAST(round((lon + 180.0) * 1000) AS BIGINT) AS x,
         CAST(round((lat + 80.0) * 1000) AS BIGINT) AS y,
         epoch_us(ts) // {_US_PER_DAY} AS t
  FROM geo
),
off AS (
  SELECT dx - {_STK_R} AS dx, dy - {_STK_R} AS dy, dt - {_STK_RT} AS dt
  FROM range({2 * _STK_R + 1}) t1(dx), range({2 * _STK_R + 1}) t2(dy),
       range({2 * _STK_RT + 1}) t3(dt)
),
cand AS (
  SELECT CAST(floor(x / {_STK_CELL}.0) AS BIGINT) + dx AS cx,
         CAST(floor(y / {_STK_CELL}.0) AS BIGINT) + dy AS cy,
         CAST(floor(t / {_STK_TBIN}.0) AS BIGINT) + dt AS ct,
         x, y, t
  FROM pts, off
),
wtab AS (
  SELECT cx, cy, ct,
         {_STK_QS} - ((x - (cx * {_STK_CELL} + {_STK_CELL // 2}))
                      * (x - (cx * {_STK_CELL} + {_STK_CELL // 2}))
                      + (y - (cy * {_STK_CELL} + {_STK_CELL // 2}))
                      * (y - (cy * {_STK_CELL} + {_STK_CELL // 2}))) AS ws,
         {_STK_QT} - ((t - (ct * {_STK_TBIN} + {_STK_TBIN // 2}))
                      * (t - (ct * {_STK_TBIN} + {_STK_TBIN // 2}))) AS wt
  FROM cand
)
SELECT cx, cy, ct, CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(ws * wt) AS BIGINT) AS stkde
FROM wtab WHERE ws > 0 AND wt > 0 GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# E29 — OHLC bars (`ohlc_bars` composite): per-(user, day) open/high/
# low/close of the event value — the classic downsampling aggregate,
# entirely map-side combinable (open/close via lexicographic struct
# min/max on (ts, event_id), no window at all).  Exact ints.
# --------------------------------------------------------------------------


def q_ohlc_bars(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}")
    return (
        ev.select("user_id", day.alias("day"), "ts", "event_id", "value")
        .groupBy("user_id", "day")
        .agg(
            F.min(F.struct("ts", "event_id", "value"))["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.struct("ts", "event_id", "value"))["value"].alias("close"),
            F.count("*").alias("n_events"),
        )
    )


SQL_OHLC_BARS = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day, ts, event_id, value
  FROM events
),
w AS (
  SELECT user_id, day, value,
         first_value(value) OVER win AS open_v,
         last_value(value) OVER win AS close_v
  FROM e
  WINDOW win AS (PARTITION BY user_id, day ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       max(open_v) AS open,
       max(value) AS high,
       min(value) AS low,
       max(close_v) AS close,
       count(*) AS n_events
FROM w GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E30 — event-type run lengths (`type_runs` composite): gaps-and-
# islands per user — consecutive same-event-type runs via the
# two-row_number difference trick (both engines replay the identical
# window pair); per (type, run length) histogram output.
# --------------------------------------------------------------------------


def q_type_runs(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        ev.select(
            "user_id",
            "event_type",
            (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count("*").alias("run_len"))
    )
    return (
        runs.groupBy("event_type", "run_len")
        .agg(F.count("*").alias("n_runs"))
    )


SQL_TYPE_RUNS = """
WITH marked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS grp
  FROM events
),
runs AS (
  SELECT user_id, event_type, grp, CAST(count(*) AS BIGINT) AS run_len
  FROM marked GROUP BY 1, 2, 3
)
SELECT event_type, run_len, CAST(count(*) AS BIGINT) AS n_runs
FROM runs GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E31 — areal disaggregation (`spatial.areal_disaggregate`): split each
# nation-rect's integer value exactly over the level-7 cells whose
# centers it contains (value DIV n per cell, remainder to the lowest
# cell ids), summed per cell.  Conservation is exact-int; the oracle
# enumerates centers from the rect bounds and replays the identical
# window allocation.
# --------------------------------------------------------------------------

_AD_LEVEL = 7
_AD_N = 1 << _AD_LEVEL


def q_areal_disagg(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import areal_disaggregate

    polys = rect_polygons(spark, sf_dir).join(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").cast("string").alias("poly_id"),
            ((F.col("n_nationkey").cast("long") + 1) * 1000 + 7).alias("value"),
        ),
        "poly_id",
    )
    return areal_disaggregate(polys, _AD_LEVEL)


SQL_AREAL_DISAGG = f"""
WITH rects AS ({_RECT_SQL}),
vals AS (
  SELECT poly_id, (CAST(poly_id AS BIGINT) + 1) * 1000 + 7 AS v,
         lat0, lat1, lon0, lon1
  FROM rects
),
cand AS (
  SELECT poly_id, v, lat0, lat1, lon0, lon1,
         -90.0 + 180.0 * (j + 0.5) / {_AD_N} AS clat,
         -180.0 + 360.0 * (i + 0.5) / {_AD_N} AS clon
  FROM vals, range({_AD_N}) ti(i), range({_AD_N}) tj(j)
),
inside AS (
  SELECT poly_id, v, {cell_sql('clat', 'clon', _AD_LEVEL)} AS cell
  FROM cand
  WHERE clat > lat0 AND clat < lat1 AND clon > lon0 AND clon < lon1
),
sh AS (
  SELECT poly_id, cell, v,
         count(*) OVER (PARTITION BY poly_id) AS n,
         row_number() OVER (PARTITION BY poly_id ORDER BY cell) AS rn
  FROM inside
)
SELECT cell, CAST(count(*) AS BIGINT) AS n_polys,
       CAST(sum(v // n + CASE WHEN rn <= v % n THEN 1 ELSE 0 END) AS BIGINT) AS total
FROM sh GROUP BY cell
"""


# --------------------------------------------------------------------------
# E32 — Benford first-digit QC (`benford_digits` composite): the
# classic anomaly screen over the event values — first significant
# digit extracted from the EXACT integer cents representation via its
# decimal string (no float log10 near power-of-ten boundaries), counts
# exact ints, expected frequencies log10(1+1/d) embedded as IDENTICAL
# Python-computed literals in both engines.
# --------------------------------------------------------------------------

_BENFORD_EXP = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}


def q_benford_digits(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    per = (
        ev.select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    tot = F.sum("n").over(Window.partitionBy())  # ≤9 rows
    exp = F.element_at(
        F.array(*[F.lit(_BENFORD_EXP[d]) for d in range(1, 10)]), F.col("digit")
    )
    share = F.col("n") / tot
    return per.select(
        "digit",
        "n",
        share.alias("share"),
        exp.alias("expected"),
        (share - exp).alias("deviation"),
    )


_BENFORD_ARR = "[" + ", ".join(
    f"CAST({_BENFORD_EXP[d]!r} AS DOUBLE)" for d in range(1, 10)
) + "]"

SQL_BENFORD_DIGITS = f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM events
),
per AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n
  FROM d WHERE digit IS NOT NULL GROUP BY digit
)
SELECT digit, n,
       n / sum(n) OVER () AS share,
       {_BENFORD_ARR}[digit] AS expected,
       n / sum(n) OVER () - {_BENFORD_ARR}[digit] AS deviation
FROM per
"""


# --------------------------------------------------------------------------
# E33 — incremental-ingest dedup + novelty (`dedup.delta_jaccard_pairs`
# / `dedup.ngram_novelty`): the daily-crawl-against-catalog pair — new
# batch = doc_id % 5 = 4.  Delta dedup probes only the NEW shingles
# against the corpus inverted index (cost scales with the delta);
# novelty anti-joins each new doc's distinct shingles against the
# catalog VOCABULARY.  Exact ints; novelty one long/long division.
# --------------------------------------------------------------------------

_DELTA_NEW_MOD = 5
_DELTA_NEW_REM = 4


def _delta_docs(spark, sf_dir):
    return _t(spark, sf_dir, "documents").withColumn(
        "is_new", F.col("doc_id") % _DELTA_NEW_MOD == _DELTA_NEW_REM
    )


def q_delta_dedup(spark, sf_dir):
    from gotrackmaster_spark.operators.dedup import delta_jaccard_pairs

    return delta_jaccard_pairs(_delta_docs(spark, sf_dir))


def q_ngram_novelty(spark, sf_dir):
    from gotrackmaster_spark.operators.dedup import ngram_novelty

    return ngram_novelty(_delta_docs(spark, sf_dir))


def _sql_delta_flag() -> str:
    return f"doc_id % {_DELTA_NEW_MOD} = {_DELTA_NEW_REM}"


def _sql_delta_dedup() -> str:
    from gotrackmaster_spark.operators.dedup import (
        JACCARD_MAX_SHINGLE_DF,
        _SHINGLES_CTE,
    )

    return f"""
WITH {_SHINGLES_CTE},
capped AS (
  SELECT s.doc_id, s.shingle_h FROM shingles s
  JOIN (SELECT shingle_h FROM shingles GROUP BY 1
        HAVING count(*) <= {JACCARD_MAX_SHINGLE_DF}) k USING (shingle_h)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS old_id, count(*) AS inter
  FROM capped a JOIN capped b ON a.shingle_h = b.shingle_h
  WHERE ({_sql_delta_flag().replace('doc_id', 'a.doc_id')})
    AND NOT ({_sql_delta_flag().replace('doc_id', 'b.doc_id')})
  GROUP BY 1, 2
)
SELECT i.new_id, i.old_id, i.inter, sa.sz AS s_new, sb.sz AS s_old
FROM inter i JOIN sizes sa ON i.new_id = sa.doc_id
             JOIN sizes sb ON i.old_id = sb.doc_id
WHERE 2 * i.inter >= 1 * (sa.sz + sb.sz - i.inter)
"""


def _sql_ngram_novelty() -> str:
    from gotrackmaster_spark.operators.dedup import _SHINGLES_CTE

    return f"""
WITH {_SHINGLES_CTE},
seen AS (
  SELECT DISTINCT shingle_h FROM shingles WHERE NOT ({_sql_delta_flag()})
),
new_sh AS (SELECT doc_id, shingle_h FROM shingles WHERE {_sql_delta_flag()}),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM new_sh GROUP BY 1),
unseen AS (
  SELECT n.doc_id, CAST(count(*) AS BIGINT) AS n_unseen
  FROM new_sh n LEFT JOIN seen s USING (shingle_h)
  WHERE s.shingle_h IS NULL
  GROUP BY 1
)
SELECT t.doc_id, t.n_shingles,
       CAST(coalesce(u.n_unseen, 0) AS BIGINT) AS n_unseen,
       CASE WHEN t.n_shingles > 0 THEN
         coalesce(u.n_unseen, 0) / t.n_shingles
       END AS novelty
FROM tot t LEFT JOIN unseen u ON t.doc_id = u.doc_id
"""


SQL_DELTA_DEDUP = _sql_delta_dedup()
SQL_NGRAM_NOVELTY = _sql_ngram_novelty()


# --------------------------------------------------------------------------
# E34 — row-level snapshot changelog (`plans.checkpoint.
# snapshot_changelog`): CDC between the pre-merge and post-merge
# snapshots of the merge_upsert table — insert/update/unchanged counts
# per partition from ONE co-partitioned full outer join on the key
# (the row-granular complement of load_changes' file granularity).
# Oracle replays the classification from the base/src closed forms.
# --------------------------------------------------------------------------


def q_snapshot_changelog(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from gotrackmaster_spark.plans.checkpoint import Catalog, snapshot_changelog

    root = os.path.join(tempfile.gettempdir(), f"cdc_oracle_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    cat.commit(_merge_base(spark, sf_dir), "t", partition_col="part")
    cat.merge(spark, "t", _merge_source(spark, sf_dir), key_cols=["part", "event_id"])
    snaps = cat.snapshots("t")
    log = snapshot_changelog(cat, spark, "t", snaps[0], snaps[-1], ["part", "event_id"])
    return log.groupBy("part", "change_type").agg(F.count("*").alias("n"))


SQL_SNAPSHOT_CHANGELOG = f"""
WITH {GEO_CTE},
base AS (
  SELECT event_id, CAST(user_id % {_MERGE_NPART} AS VARCHAR) AS part,
         CAST(value AS DOUBLE) AS value
  FROM geo
),
src AS (
  SELECT event_id, CAST(user_id % {_MERGE_NPART} AS VARCHAR) AS part,
         CAST(value * -1.0 AS DOUBLE) AS value
  FROM geo WHERE event_id % 7 = 0
  UNION ALL
  SELECT event_id + 10000000 AS event_id,
         CAST(user_id % {_MERGE_NPART} AS VARCHAR) AS part,
         1.5 AS value
  FROM geo WHERE event_id % 11 = 0
),
merged AS (
  SELECT coalesce(s.part, b.part) AS part,
         coalesce(s.event_id, b.event_id) AS event_id,
         CASE WHEN s.event_id IS NOT NULL THEN s.value ELSE b.value END AS value
  FROM base b FULL OUTER JOIN src s
    ON b.part = s.part AND b.event_id = s.event_id
),
log AS (
  SELECT coalesce(m.part, b.part) AS part,
         CASE WHEN b.event_id IS NULL THEN 'insert'
              WHEN m.event_id IS NULL THEN 'delete'
              WHEN m.value IS NOT DISTINCT FROM b.value THEN 'unchanged'
              ELSE 'update' END AS change_type
  FROM base b FULL OUTER JOIN merged m
    ON b.part = m.part AND b.event_id = m.event_id
)
SELECT part, change_type, CAST(count(*) AS BIGINT) AS n
FROM log GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E35 — rolling 7-day active users (`rolling_active_users` composite):
# EXACT sliding-window distinct — the metric approximate sketches
# usually own, made exact with the bounded ×7 explode: (user, day)
# occupancy → each row contributes to 7 target days → distinct →
# count.  Cost O(activity·window), never a distinct-over-window scan.
# --------------------------------------------------------------------------

_RAU_WINDOW = 7


def q_rolling_active_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}")
    act = ev.select("user_id", day.alias("day")).distinct()
    target = act.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (_RAU_WINDOW - 1))
        ).alias("t_day"),
    ).distinct()
    return target.groupBy("t_day").agg(
        F.countDistinct("user_id").alias("n_active_7d")
    )


SQL_ROLLING_ACTIVE_USERS = f"""
WITH act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day FROM events
),
target AS (
  SELECT DISTINCT user_id, day + d AS t_day
  FROM act, range({_RAU_WINDOW}) t(d)
)
SELECT t_day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_7d
FROM target GROUP BY t_day
"""


# --------------------------------------------------------------------------
# E36 — event-type Markov transitions (`markov_transitions` composite):
# first-order transition counts per (prev_type, type) over each user's
# time-ordered stream + row-normalized probability — one lag window,
# one ≤25-group aggregate, probability a single long/long division
# against the window-sum row total.
# --------------------------------------------------------------------------


def q_markov_transitions(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    per = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    row_tot = F.sum("n").over(Window.partitionBy("prev_type"))
    return per.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n") / row_tot).alias("p"),
    )


SQL_MARKOV_TRANSITIONS = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
),
per AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       n / sum(n) OVER (PARTITION BY prev_type) AS p
FROM per
"""


# --------------------------------------------------------------------------
# E37 — ordered conversion funnel (`funnel_steps` composite): how many
# users performed signup → click → purchase IN ORDER?  Stage k's
# earliest valid timestamp = min ts of a stage-k event AFTER stage
# k-1's — three conditional min-struct aggregates in ONE pass over the
# per-user stream (no joins, no window), the product-analytics classic.
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ("signup", "click", "purchase")


def q_funnel_steps(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    base = ev.select("user_id", "event_type", key.alias("k"))
    s1 = F.min(F.when(F.col("event_type") == _FUNNEL_STEPS[0], F.col("k")))
    per = base.groupBy("user_id").agg(
        s1.alias("k1"),
        F.collect_list(F.struct("k", "event_type")).alias("__evs"),
    )
    # stages 2..3: earliest event of the right type strictly after the
    # previous stage — array minimum over the collected per-user events
    # (bounded by the user's event count; pure Catalyst higher-order fns)
    def stage_after(prev_k, step):
        flt = F.filter(
            F.col("__evs"),
            lambda e: (e["event_type"] == F.lit(step))
            & (
                (e["k"]["ts"] > prev_k["ts"])
                | ((e["k"]["ts"] == prev_k["ts"]) & (e["k"]["event_id"] > prev_k["event_id"]))
            ),
        )
        return F.array_min(flt["k"])

    per = per.withColumn(
        "k2", F.when(F.col("k1").isNotNull(), stage_after(F.col("k1"), _FUNNEL_STEPS[1]))
    ).withColumn(
        "k3", F.when(F.col("k2").isNotNull(), stage_after(F.col("k2"), _FUNNEL_STEPS[2]))
    )
    return per.agg(
        F.count("*").alias("n_users"),
        F.coalesce(F.sum(F.col("k1").isNotNull().cast("long")), F.lit(0)).alias("n_step1"),
        F.coalesce(F.sum(F.col("k2").isNotNull().cast("long")), F.lit(0)).alias("n_step2"),
        F.coalesce(F.sum(F.col("k3").isNotNull().cast("long")), F.lit(0)).alias("n_step3"),
    )


SQL_FUNNEL_STEPS = f"""
WITH s1 AS (
  SELECT user_id, min(ROW(ts, event_id)) AS k1
  FROM events WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(ROW(e.ts, e.event_id)) AS k2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND ROW(e.ts, e.event_id) > s1.k1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(ROW(e.ts, e.event_id)) AS k3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND ROW(e.ts, e.event_id) > s2.k2
  GROUP BY e.user_id
),
u AS (SELECT count(DISTINCT user_id) AS n_users FROM events)
SELECT u.n_users,
       (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_step1,
       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_step2,
       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_step3
FROM u
"""


# --------------------------------------------------------------------------
# E7j — per-image gradient-orientation histogram (`image_orientation`,
# `images.orientation_hist`): HOG-lite over the real decode chain —
# (gx, gy) lead-stride gradients classified into the 8 half-open 45°
# octants with PURE integer comparisons (the movement_rose rule — no
# atan2), counts + Σmag² exact int64.  Oracle replays the identical
# mutually-exclusive CASE arms over the closed-form generator.
# --------------------------------------------------------------------------

_OH_CONDS = [
    "gx > 0 AND gy >= 0 AND gy < gx",
    "gy > 0 AND gx > 0 AND gx <= gy",
    "gy > 0 AND gx <= 0 AND -gx < gy",
    "gx < 0 AND gy > 0 AND gy <= -gx",
    "gx < 0 AND gy <= 0 AND -gy < -gx",
    "gy < 0 AND gx < 0 AND -gx <= -gy",
    "gy < 0 AND gx >= 0 AND gx < -gy",
    "gx > 0 AND gy < 0 AND -gy <= gx",
]


def q_image_orientation(spark, sf_dir):
    from gotrackmaster_spark.operators.images import (
        orientation_hist,
        synthesize_images,
    )

    return orientation_hist(synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H))


_OH_SUMS = ",\n         ".join(
    f"CAST(sum(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS o{k}"
    for k, c in enumerate(_OH_CONDS)
)

SQL_IMAGE_ORIENTATION = f"""
WITH px AS (
  SELECT doc_id, i,
         CASE WHEN doc_id % 3 = 2 THEN {_PIX} - ({_PIX}) % 4
              ELSE {_PIX} END AS p
  FROM documents, range({_N_PIX}) t(i)
),
g AS (
  SELECT doc_id, i,
         (lead(p, 3) OVER w) - p AS gx,
         (lead(p, {3 * _IMG_W}) OVER w) - p AS gy
  FROM px
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
v AS (SELECT doc_id, gx, gy FROM g WHERE i < {_N_PIX - 3 * _IMG_W})
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       {_OH_SUMS},
       CAST(sum(CASE WHEN gx = 0 AND gy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(sum(gx * gx + gy * gy) AS BIGINT) AS mag2_sum
FROM v GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# E38 — lang × fmt chi-square independence (`chi2_contingency`
# composite): is the caption language independent of the image format?
# The 5×3 contingency lands as 15 conditional-sum columns in ONE
# aggregate row; margins, expectations and the chi² sum are a
# FIXED-ORDER Python-generated expression (a SQL SUM over cells would
# have engine-dependent float accumulation order), replayed verbatim
# by the DuckDB twin.  Known-vocabulary contract: langs/fmts are the
# generator's closed sets.
# --------------------------------------------------------------------------

_CHI_LANGS = ("de", "en", "es", "fr", "zh")
_CHI_FMTS = (0, 1, 2)  # doc_id % 3 → raw / png / qnt4


def q_chi2_contingency(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    cells = [(lg, fm) for lg in _CHI_LANGS for fm in _CHI_FMTS]
    aggs = [
        F.coalesce(
            F.sum(
                (
                    (F.col("lang") == lg) & (F.col("doc_id") % 3 == fm)
                ).cast("long")
            ),
            F.lit(0),
        ).alias(f"c_{lg}_{fm}")
        for lg, fm in cells
    ]
    one = docs.agg(F.count("*").alias("n"), *aggs)
    n_d = F.col("n").cast("double")
    rows = {
        lg: sum(F.col(f"c_{lg}_{fm}") for fm in _CHI_FMTS) for lg in _CHI_LANGS
    }
    colsums = {
        fm: sum(F.col(f"c_{lg}_{fm}") for lg in _CHI_LANGS) for fm in _CHI_FMTS
    }
    chi2 = None
    for lg, fm in cells:  # FIXED summation order: the cells tuple order
        exp = rows[lg].cast("double") * colsums[fm].cast("double") / n_d
        # empty row/col ⇒ exp = 0 ⇒ the cell contributes nothing (and an
        # unguarded division throws under ANSI)
        term = F.when(
            exp > 0,
            (F.col(f"c_{lg}_{fm}") - exp) * (F.col(f"c_{lg}_{fm}") - exp) / exp,
        ).otherwise(F.lit(0.0))
        chi2 = term if chi2 is None else chi2 + term
    dof = (len(_CHI_LANGS) - 1) * (len(_CHI_FMTS) - 1)
    guard = F.col("n") > 0
    return one.select(
        "n",
        F.lit(dof).cast("long").alias("dof"),
        F.when(guard, chi2).alias("chi2"),
        F.when(
            guard,
            F.sqrt(chi2 / (n_d * F.lit(float(min(len(_CHI_LANGS), len(_CHI_FMTS)) - 1)))),
        ).alias("cramers_v"),
    )


def _sql_chi2() -> str:
    cells = [(lg, fm) for lg in _CHI_LANGS for fm in _CHI_FMTS]
    sums = ",\n       ".join(
        f"CAST(coalesce(sum(CASE WHEN lang = '{lg}' AND doc_id % 3 = {fm} "
        f"THEN 1 ELSE 0 END), 0) AS BIGINT) AS c_{lg}_{fm}"
        for lg, fm in cells
    )
    rows = {
        lg: "(" + " + ".join(f"c_{lg}_{fm}" for fm in _CHI_FMTS) + ")"
        for lg in _CHI_LANGS
    }
    colsums = {
        fm: "(" + " + ".join(f"c_{lg}_{fm}" for lg in _CHI_LANGS) + ")"
        for fm in _CHI_FMTS
    }
    terms = []
    for lg, fm in cells:
        exp = (
            f"(CAST({rows[lg]} AS DOUBLE) * CAST({colsums[fm]} AS DOUBLE)"
            f" / CAST(n AS DOUBLE))"
        )
        terms.append(
            f"(CASE WHEN {exp} > 0 THEN "
            f"(c_{lg}_{fm} - {exp}) * (c_{lg}_{fm} - {exp}) / {exp} "
            f"ELSE CAST(0.0 AS DOUBLE) END)"
        )
    # left-assoc + chain replays Spark's Python-loop accumulation order
    chi2 = terms[0]
    for t in terms[1:]:
        chi2 = f"({chi2} + {t})"
    dof = (len(_CHI_LANGS) - 1) * (len(_CHI_FMTS) - 1)
    kmin = float(min(len(_CHI_LANGS), len(_CHI_FMTS)) - 1)
    return f"""
WITH agg AS (
  SELECT count(*) AS n,
       {sums}
  FROM documents
)
SELECT n, CAST({dof} AS BIGINT) AS dof,
       CASE WHEN n > 0 THEN {chi2} END AS chi2,
       CASE WHEN n > 0 THEN
         sqrt({chi2} / (CAST(n AS DOUBLE) * CAST({kmin!r} AS DOUBLE)))
       END AS cramers_v
FROM agg
"""


SQL_CHI2_CONTINGENCY = _sql_chi2()


# --------------------------------------------------------------------------
# E39 — term co-occurrence PMI (`term_pmi` composite): which caption
# term pairs co-occur more than chance?  Distinct terms per doc →
# within-doc pair self-join (bounded by vocabulary, the colocation
# shape) → INTEGER-QUANTIZED pointwise mutual information
# pmi_q = (n_ab·N·10⁶) DIV (n_a·n_b) (a float log PMI would rank
# near-ties engine-dependently; integer quotients cannot).
# --------------------------------------------------------------------------

_PMI_QUANT = 10**6
_PMI_MIN_PAIRS = 5


def q_term_pmi(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("term"),
    ).filter(F.length("term") > 0)
    # 1-row N attach (no driver-side count(): the scalar rides the plan)
    nd = words.agg(F.countDistinct("doc_id").alias("n_docs"))
    tf = words.groupBy("term").agg(F.count("*").alias("df"))
    a = words.select(F.col("doc_id"), F.col("term").alias("t_a"))
    b = words.select(F.col("doc_id"), F.col("term").alias("t_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_PAIRS)
    )
    j = (
        pairs.join(F.broadcast(tf.withColumnRenamed("term", "t_a").withColumnRenamed("df", "df_a")), "t_a")
        .join(F.broadcast(tf.withColumnRenamed("term", "t_b").withColumnRenamed("df", "df_b")), "t_b")
    )
    j = j.crossJoin(F.broadcast(nd))
    pmi_q = F.expr(f"(n_ab * n_docs * {_PMI_QUANT}) DIV (df_a * df_b)")
    return j.select("t_a", "t_b", "n_ab", "df_a", "df_b", pmi_q.alias("pmi_q"))


def _sql_term_pmi(sf_dir_unused: str = "") -> str:
    return f"""
WITH words AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
  WHERE length(t.term) > 0
),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM words),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM words GROUP BY term),
pairs AS (
  SELECT a.term AS t_a, b.term AS t_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
  HAVING count(*) >= {_PMI_MIN_PAIRS}
)
SELECT p.t_a, p.t_b, p.n_ab, fa.df AS df_a, fb.df AS df_b,
       (p.n_ab * nd.n_docs * {_PMI_QUANT}) // (fa.df * fb.df) AS pmi_q
FROM pairs p
JOIN tf fa ON fa.term = p.t_a
JOIN tf fb ON fb.term = p.t_b
CROSS JOIN nd
"""


SQL_TERM_PMI = _sql_term_pmi()


# --------------------------------------------------------------------------
# E40 — cohort retention matrix (`cohort_retention` composite): users
# cohorted by first-event week; matrix cell (cohort, offset) = distinct
# users of that cohort active offset weeks later.  Two occupancy
# aggregates + one broadcast join of the tiny per-user cohort table —
# the product-analytics classic, all exact ints.
# --------------------------------------------------------------------------

_US_PER_WEEK = 7 * 86_400_000_000


def q_cohort_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    week = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_WEEK}")
    act = ev.select("user_id", week.alias("week")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    j = act.join(F.broadcast(cohort), "user_id")
    return (
        j.groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("offset")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


SQL_COHORT_RETENTION = f"""
WITH act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_WEEK} AS week FROM events
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id)
SELECT c.cohort_week, a.week - c.cohort_week AS offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM act a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E41 — per-cell net flow vectors (`cell_flow_vectors` composite): the
# aggregate movement field — per origin grid cell, the exact-int sum of
# outgoing displacement legs (Σdx, Σdy) + the net direction octant via
# the comparison-only classifier; one lag window + one hash aggregate.
# --------------------------------------------------------------------------

_CFV_CELL = 400_000


def q_cell_flow_vectors(spark, sf_dir):
    from pyspark.sql import Window

    from gotrackmaster_spark.operators.spatial import octant_sector

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * F.lit(2654435761)) % 1600000).alias("x"),
        ((F.col("event_id") * 40503 + 7) % 3600000).alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = pts.select(
        F.floor(F.col("x") / _CFV_CELL).cast("long").alias("gx"),
        F.floor(F.col("y") / _CFV_CELL).cast("long").alias("gy"),
        (F.lead("x").over(w) - F.col("x")).alias("dx"),
        (F.lead("y").over(w) - F.col("y")).alias("dy"),
    ).filter(F.col("dx").isNotNull())
    agg = legs.groupBy("gx", "gy").agg(
        F.count("*").alias("n_legs"),
        F.sum("dx").alias("sum_dx"),
        F.sum("dy").alias("sum_dy"),
    )
    return agg.select(
        "gx",
        "gy",
        "n_legs",
        "sum_dx",
        "sum_dy",
        octant_sector(F.col("sum_dx"), F.col("sum_dy")).alias("net_octant"),
    )


SQL_CELL_FLOW_VECTORS = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 2654435761) % 1600000 AS x,
         (event_id * 40503 + 7) % 3600000 AS y
  FROM events
),
legs AS (
  SELECT x // {_CFV_CELL} AS gx, y // {_CFV_CELL} AS gy,
         (lead(x) OVER w) - x AS dx,
         (lead(y) OVER w) - y AS dy
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
agg AS (
  SELECT gx, gy, CAST(count(*) AS BIGINT) AS n_legs,
         CAST(sum(dx) AS BIGINT) AS sum_dx,
         CAST(sum(dy) AS BIGINT) AS sum_dy
  FROM legs WHERE dx IS NOT NULL GROUP BY 1, 2
)
SELECT gx, gy, n_legs, sum_dx, sum_dy,
       CASE
         WHEN sum_dx = 0 AND sum_dy = 0 THEN CAST(NULL AS INT)
         WHEN sum_dx > 0 AND sum_dy >= 0 AND sum_dy < sum_dx THEN 0
         WHEN sum_dy > 0 AND sum_dx > 0 AND sum_dx <= sum_dy THEN 1
         WHEN sum_dy > 0 AND sum_dx <= 0 AND -sum_dx < sum_dy THEN 2
         WHEN sum_dx < 0 AND sum_dy > 0 AND sum_dy <= -sum_dx THEN 3
         WHEN sum_dx < 0 AND sum_dy <= 0 AND -sum_dy < -sum_dx THEN 4
         WHEN sum_dy < 0 AND sum_dx < 0 AND -sum_dx <= -sum_dy THEN 5
         WHEN sum_dy < 0 AND sum_dx >= 0 AND sum_dx < -sum_dy THEN 6
         ELSE 7
       END AS net_octant
FROM agg
"""


# --------------------------------------------------------------------------
# E42 — per-user burstiness (`user_burstiness` composite): Fano factor
# (VMR) of each user's daily event counts over their OWN active span
# (first..last day inclusive — empty days count, the quadrat_test
# trap temporally).  Σc² exact int; VMR fixed-order scalar algebra;
# two hash aggregates on the user key, no joins beyond the tiny
# per-user span attach.
# --------------------------------------------------------------------------


def q_user_burstiness(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}")
    per_day = ev.select("user_id", day.alias("day")).groupBy("user_id", "day").agg(
        F.count("*").alias("c")
    )
    agg = per_day.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        (F.max("day") - F.min("day") + 1).alias("span_days"),
        F.count("*").alias("active_days"),
    )
    n_d = F.col("span_days").cast("double")
    mean = F.col("n_events") / n_d
    ss = F.col("sum_c2") - mean * F.col("n_events")
    guard = (F.col("span_days") > 1) & (F.col("n_events") > 0)
    return agg.select(
        "user_id",
        "n_events",
        "span_days",
        "active_days",
        "sum_c2",
        mean.alias("mean_per_day"),
        F.when(guard, (ss / (n_d - F.lit(1.0))) / mean).alias("vmr"),
    )


SQL_USER_BURSTINESS = f"""
WITH per_day AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT user_id,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(c * c) AS BIGINT) AS sum_c2,
         max(day) - min(day) + 1 AS span_days,
         CAST(count(*) AS BIGINT) AS active_days
  FROM per_day GROUP BY user_id
)
SELECT user_id, n_events, span_days, active_days, sum_c2,
       n_events / CAST(span_days AS DOUBLE) AS mean_per_day,
       CASE WHEN span_days > 1 AND n_events > 0 THEN
         ((sum_c2 - (n_events / CAST(span_days AS DOUBLE)) * n_events)
          / (CAST(span_days AS DOUBLE) - CAST(1.0 AS DOUBLE)))
         / (n_events / CAST(span_days AS DOUBLE))
       END AS vmr
FROM agg
"""


# --------------------------------------------------------------------------
# E43 — per-type median + MAD (`value_mad` composite): robust
# location/scale by DOUBLE rank-select — median of value, then median
# of |value − median| — never a float accumulation (the theil_sen
# order-statistics idiom, applied twice); ties on equal doubles are
# value-interchangeable so the window order is deterministic.
# --------------------------------------------------------------------------


def q_value_mad(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("event_type", "value")

    def rank_median(df, col, part):
        w = Window.partitionBy(part)
        ranked = df.select(
            part,
            col,
            F.row_number().over(w.orderBy(col)).alias("__rn"),
            F.count("*").over(w).alias("__n"),
        )
        return (
            ranked.groupBy(part)
            .agg(
                F.max("__n").alias("__n"),
                F.min(
                    F.when(F.col("__rn") == F.floor((F.col("__n") + 1) / 2), F.col(col))
                ).alias("__lo"),
                F.min(
                    F.when(F.col("__rn") == F.floor(F.col("__n") / 2) + 1, F.col(col))
                ).alias("__hi"),
            )
            .select(
                part,
                F.col("__n").alias("n"),
                ((F.col("__lo") + F.col("__hi")) / F.lit(2.0)).alias("med"),
            )
        )

    med = rank_median(ev, "value", "event_type")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = rank_median(dev, "adev", "event_type").select(
        "event_type", F.col("med").alias("mad")
    )
    return med.join(mad, "event_type").select(
        "event_type", "n", F.col("med").alias("median"), "mad"
    )


_MAD_RANKSEL = """
  SELECT {part}, CAST(max(n) AS BIGINT) AS n,
         (min(CASE WHEN rn = (n + 1) // 2 THEN {col} END)
          + min(CASE WHEN rn = n // 2 + 1 THEN {col} END))
         / CAST(2.0 AS DOUBLE) AS med
  FROM (
    SELECT {part}, {col},
           row_number() OVER (PARTITION BY {part} ORDER BY {col}) AS rn,
           count(*) OVER (PARTITION BY {part}) AS n
    FROM {src}
  ) GROUP BY {part}
"""

SQL_VALUE_MAD = f"""
WITH med AS ({_MAD_RANKSEL.format(part="event_type", col="value", src="events")}),
dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS adev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS ({_MAD_RANKSEL.format(part="event_type", col="adev", src="dev")})
SELECT med.event_type, med.n, med.med AS median, mad.med AS mad
FROM med JOIN mad ON med.event_type = mad.event_type
"""


# --------------------------------------------------------------------------
# E7k — center-surround luma bias (`image_center_bias`,
# computed inline over images.image_moments-style decode): is the
# image's mass concentrated centrally (subject-centered photo) or at
# the border?  Exact int64 luma sums over the center box (middle half
# in both axes) vs the border; the contrast sum_c·n_b − sum_b·n_c is
# one exact integer, the ratio a fixed-order double.
# --------------------------------------------------------------------------


def q_image_center_bias(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from gotrackmaster_spark.operators.images import decode_image, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)

    def stats(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"image_id": [], "fmt": [], "sum_center": [], "n_center": [],
                   "sum_border": [], "n_border": []}
            for r in pdf.itertuples(index=False):
                px = decode_image(r.bytes, r.w, r.h, r.fmt).astype(np.int64)
                luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
                x0, x1 = r.w // 4, 3 * r.w // 4
                y0, y1 = r.h // 4, 3 * r.h // 4
                c = luma[y0:y1, x0:x1]
                sc, nc = int(c.sum()), int(c.size)
                st, nt = int(luma.sum()), int(luma.size)
                out["image_id"].append(r.image_id)
                out["fmt"].append(r.fmt)
                out["sum_center"].append(sc)
                out["n_center"].append(nc)
                out["sum_border"].append(st - sc)
                out["n_border"].append(nt - nc)
            yield pd.DataFrame(out)

    st = imgs.mapInPandas(
        stats,
        "image_id string, fmt string, sum_center long, n_center long, "
        "sum_border long, n_border long",
    )
    contrast = (
        F.col("sum_center") * F.col("n_border")
        - F.col("sum_border") * F.col("n_center")
    )
    guard = (F.col("n_center") > 0) & (F.col("n_border") > 0) & (F.col("sum_border") > 0)
    ratio = (F.col("sum_center") / F.col("n_center")) / (
        F.col("sum_border") / F.col("n_border")
    )
    return st.select(
        "image_id",
        "fmt",
        "sum_center",
        "n_center",
        "sum_border",
        "n_border",
        contrast.alias("contrast"),
        F.when(guard, ratio).alias("center_bias"),
    )


SQL_IMAGE_CENTER_BIAS = f"""
WITH lum AS (
  SELECT doc_id, j % {_IMG_W} AS x, j // {_IMG_W} AS y,
         (299 * {_mom_pix_at('j * 3')}
          + 587 * {_mom_pix_at('j * 3 + 1')}
          + 114 * {_mom_pix_at('j * 3 + 2')}) // 1000 AS l
  FROM documents, range({_IMG_W * _IMG_H}) t(j)
),
feat AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN x >= {_IMG_W // 4} AND x < {3 * _IMG_W // 4}
                        AND y >= {_IMG_H // 4} AND y < {3 * _IMG_H // 4}
                       THEN l ELSE 0 END) AS BIGINT) AS sum_center,
         CAST(sum(CASE WHEN x >= {_IMG_W // 4} AND x < {3 * _IMG_W // 4}
                        AND y >= {_IMG_H // 4} AND y < {3 * _IMG_H // 4}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_center,
         CAST(sum(CASE WHEN x >= {_IMG_W // 4} AND x < {3 * _IMG_W // 4}
                        AND y >= {_IMG_H // 4} AND y < {3 * _IMG_H // 4}
                       THEN 0 ELSE l END) AS BIGINT) AS sum_border,
         CAST(sum(CASE WHEN x >= {_IMG_W // 4} AND x < {3 * _IMG_W // 4}
                        AND y >= {_IMG_H // 4} AND y < {3 * _IMG_H // 4}
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_border
  FROM lum GROUP BY doc_id
)
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       sum_center, n_center, sum_border, n_border,
       sum_center * n_border - sum_border * n_center AS contrast,
       CASE WHEN n_center > 0 AND n_border > 0 AND sum_border > 0 THEN
         (sum_center / CAST(n_center AS DOUBLE))
         / (sum_border / CAST(n_border AS DOUBLE))
       END AS center_bias
FROM feat
"""


# --------------------------------------------------------------------------
# E44 — per-user triangle counts + clustering coefficient
# (`triangle_counts`, operators/graph.py::triangle_counts) over the
# co-location graph (colocation_pairs at n_shared >= 3): the
# degree-ordered oriented wedge join (Suri & Vassilvitskii) — each
# triangle enumerated exactly once, so corner counts are exact ints and
# the a<b<c 3-way self-join oracle reproduces them identically; the
# coefficient is a fixed-order double expression.
# --------------------------------------------------------------------------

_TRI_MIN_SHARED = 3


def q_triangle_counts(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import triangle_counts
    from gotrackmaster_spark.operators.spatial import colocation_pairs

    ev = geo_events(spark, sf_dir).select("user_id", "lat", "lon", "ts")
    edges = colocation_pairs(
        ev, level=12, coarse_shift=14, bucket_us=_COLOC_BUCKET_US
    ).filter(F.col("n_shared") >= _TRI_MIN_SHARED)
    return triangle_counts(edges, "user_a", "user_b").select(
        F.col("v").alias("user_id"), "degree", "n_triangles", "clustering"
    )


SQL_TRIANGLE_COUNTS = f"""
WITH {GEO_CTE},
occ AS (
  SELECT DISTINCT user_id AS u,
         ({cell_sql('lat', 'lon', 12)} >> 14) AS cell,
         epoch_us(ts) - ((epoch_us(ts) % {_COLOC_BUCKET_US} + {_COLOC_BUCKET_US}) % {_COLOC_BUCKET_US}) AS bucket
  FROM geo
),
ed AS (
  SELECT a.u AS lo, b.u AS hi
  FROM occ a JOIN occ b ON a.cell = b.cell AND a.bucket = b.bucket
  WHERE a.u < b.u
  GROUP BY 1, 2
  HAVING count(*) >= {_TRI_MIN_SHARED}
),
deg AS (
  SELECT v, count(*) AS d
  FROM (SELECT lo AS v FROM ed UNION ALL SELECT hi AS v FROM ed)
  GROUP BY 1
),
tri AS (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM ed e1
  JOIN ed e2 ON e2.lo = e1.hi
  JOIN ed e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
),
tcnt AS (
  SELECT v, count(*) AS t
  FROM (SELECT a AS v FROM tri UNION ALL SELECT b AS v FROM tri
        UNION ALL SELECT c AS v FROM tri)
  GROUP BY 1
)
SELECT deg.v AS user_id,
       CAST(deg.d AS BIGINT) AS degree,
       CAST(coalesce(tcnt.t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.d > 1 THEN
         (CAST(2.0 AS DOUBLE) * coalesce(tcnt.t, 0))
         / (CAST(deg.d AS DOUBLE) * CAST(deg.d - 1 AS DOUBLE))
       END AS clustering
FROM deg LEFT JOIN tcnt ON deg.v = tcnt.v
"""


# --------------------------------------------------------------------------
# E45 — robust-winnowing fingerprint dedup (`winnow_pairs`,
# operators/dedup.py::winnow_fingerprints/winnow_pairs): the MOSS
# algorithm — positional-polynomial k-gram hashes (exact int64), window
# of w hashes, rightmost-min selection via lexicographic struct-min on
# (hash, -pos); cross-doc pairs sharing >= 4 fingerprints after the
# stop-fingerprint cap.  Guarantee: any shared substring of length
# >= k + w - 1 shares a selected fingerprint.
# --------------------------------------------------------------------------


def q_winnow_pairs(spark, sf_dir):
    return D.winnow_pairs(_t(spark, sf_dir, "documents"))


SQL_WINNOW_PAIRS = D.sql_winnow_pairs()


# --------------------------------------------------------------------------
# E46 — integer-quantized Okapi BM25 (`bm25_scores`,
# operators/search.py): corpus relevance ranking for a fixed query-term
# set — rational idf ((N−df)·10⁶ DIV df, no ln), k1 = 6/5, b = 3/4
# multiplied through by 20·T so every term score is ONE exact int64
# quotient; Σ over terms is an exact int, making the (score, doc_id)
# ranking bit-deterministic across engines.
# --------------------------------------------------------------------------


def q_bm25_scores(spark, sf_dir):
    from gotrackmaster_spark.operators.search import bm25_scores

    return bm25_scores(_t(spark, sf_dir, "documents"), list(_GEO_SEARCH_TERMS))


def _sql_bm25_scores():
    from gotrackmaster_spark.operators.search import sql_bm25_scores

    return sql_bm25_scores(list(_GEO_SEARCH_TERMS))


SQL_BM25_SCORES = _sql_bm25_scores()


# --------------------------------------------------------------------------
# E47 — polygon dissolve / union area on the cell lattice
# (`union_area`, operators/spatial.py::dissolve_union_cells): per
# market-segment union of the 1,500 customer rects — ST_Union+ST_Area
# without a geometry lib: distinct covered 1° cells via the exact
# half-open center test (ceil arithmetic identical in both engines);
# sum_cells / union_cells exact ints, overlap_ratio one fixed-order
# double quotient.
# --------------------------------------------------------------------------


def q_union_area(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import dissolve_union_cells

    cust = _t(spark, sf_dir, "customer")
    n = F.col("c_custkey").cast("long")
    lat0 = ((n * 911) % 150 - 75).cast("double") + 0.00005
    lon0 = ((n * 1931) % 340 - 170).cast("double") + 0.00005
    rects = cust.select(
        F.col("c_mktsegment").alias("segment"),
        lat0.alias("lat0"),
        (lat0 + (3 + (n % 5)).cast("double")).alias("lat1"),
        lon0.alias("lon0"),
        (lon0 + (4 + (n % 7)).cast("double")).alias("lon1"),
    )
    return dissolve_union_cells(rects, "segment")


SQL_UNION_AREA = f"""
WITH rect AS ({_CUST_RECT_SQL.replace("CAST(c_custkey AS VARCHAR) AS poly_id",
                                      "c_mktsegment AS segment")}),
b AS (
  SELECT segment,
         CAST(ceil(lat0 / 1.0 - 0.5) AS BIGINT) AS y0,
         CAST(ceil(lat1 / 1.0 - 0.5) AS BIGINT) - 1 AS y1,
         CAST(ceil(lon0 / 1.0 - 0.5) AS BIGINT) AS x0,
         CAST(ceil(lon1 / 1.0 - 0.5) AS BIGINT) - 1 AS x1
  FROM rect
  WHERE CAST(ceil(lat1 / 1.0 - 0.5) AS BIGINT) - 1 >= CAST(ceil(lat0 / 1.0 - 0.5) AS BIGINT)
    AND CAST(ceil(lon1 / 1.0 - 0.5) AS BIGINT) - 1 >= CAST(ceil(lon0 / 1.0 - 0.5) AS BIGINT)
),
per AS (
  SELECT segment, count(*) AS n_polys,
         CAST(sum((y1 - y0 + 1) * (x1 - x0 + 1)) AS BIGINT) AS sum_cells
  FROM b GROUP BY 1
),
rows_y AS (SELECT segment, unnest(generate_series(y0, y1)) AS iy, x0, x1 FROM b),
cells0 AS (SELECT segment, iy, unnest(generate_series(x0, x1)) AS ix FROM rows_y),
cellset AS (SELECT DISTINCT segment, iy, ix FROM cells0),
uni AS (SELECT segment, CAST(count(*) AS BIGINT) AS union_cells FROM cellset GROUP BY 1)
SELECT per.segment, per.n_polys, per.sum_cells, uni.union_cells,
       CAST(per.sum_cells AS DOUBLE) / CAST(uni.union_cells AS DOUBLE) AS overlap_ratio
FROM per JOIN uni USING (segment)
"""


# --------------------------------------------------------------------------
# E48 — 2-D skyline / Pareto frontier (`skyline_events`,
# operators/search.py::skyline_2d): per event type, the
# earliest-and-highest frontier over (ts_us MIN, value MAX) — exact
# sort-based dominance via one distinct aggregate + one window (running
# max over strictly-preceding rows), no self-join; the DuckDB twin is
# an independent NOT-EXISTS dominance anti-join (a stronger check than
# replaying the window).
# --------------------------------------------------------------------------


def q_skyline_events(spark, sf_dir):
    from gotrackmaster_spark.operators.search import skyline_2d

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    return skyline_2d(ev, "event_type", "ts_us", "value")


SQL_SKYLINE_EVENTS = """
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS ts_us, value, count(*) AS n_dups
  FROM events GROUP BY 1, 2, 3
)
SELECT p.event_type, p.ts_us, p.value, p.n_dups
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.event_type = p.event_type
    AND q.ts_us <= p.ts_us AND q.value >= p.value
    AND (q.ts_us < p.ts_us OR q.value > p.value)
)
"""


# --------------------------------------------------------------------------
# E49 — two-sided CUSUM changepoints (`cusum_changepoints`,
# operators/timeseries.py): per-type daily-count level-shift detection
# with the recursion max(0, S+a) replaced by the EXACT prefix-sum −
# running-min identity (two windows, all int64 — a_t = x_t·D − T so
# Σa = 0 and no rational mean appears); empty days inside the span
# count as zero via a bounded sequence explode.
# --------------------------------------------------------------------------


def q_cusum_changepoints(spark, sf_dir):
    from gotrackmaster_spark.operators.timeseries import cusum_changepoints

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}").alias("day"),
        F.lit(1).alias("x"),
    )
    return cusum_changepoints(ev, "event_type", "day", "x")


SQL_CUSUM_CHANGEPOINTS = f"""
WITH obs AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT event_type, min(day) AS d0, max(day) AS d1,
         CAST(sum(x) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS n_days
  FROM obs GROUP BY 1
),
days AS (
  SELECT event_type, tot, n_days, d1 - d0 + 1 AS span_days,
         unnest(generate_series(d0, d1)) AS day
  FROM span
),
filled AS (
  SELECT d.event_type, d.day, d.tot, d.n_days, d.span_days,
         coalesce(o.x, 0) * d.span_days - d.tot AS a
  FROM days d LEFT JOIN obs o ON o.event_type = d.event_type AND o.day = d.day
),
pref AS (
  SELECT event_type, day, tot, n_days, span_days,
         CAST(sum(a) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
  FROM filled
),
s AS (
  SELECT event_type, day, tot, n_days, span_days,
         p - least(CAST(min(least(p, 0)) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS su,
         greatest(CAST(max(greatest(p, 0)) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) - p AS sd
  FROM pref
),
agg AS (
  SELECT event_type, max(n_days) AS n_days, max(span_days) AS span_days,
         max(tot) AS total,
         max({{'s': su, 'nd': -day}}) AS u,
         max({{'s': sd, 'nd': -day}}) AS d
  FROM s GROUP BY 1
)
SELECT event_type, n_days, span_days, total,
       (u).s AS max_up, -((u).nd) AS day_up,
       (d).s AS max_down, -((d).nd) AS day_down
FROM agg
"""


# --------------------------------------------------------------------------
# E50 — seasonal day-of-week anomalies (`seasonal_anomalies`,
# operators/timeseries.py): per-type top-5 deviant days vs their OWN
# weekly phase — residual r = c·n_p − T_p exact int (no float mean),
# cross-phase score |r|·10⁶ DIV n_p one integer quotient; empty days
# inside the span count as zero.
# --------------------------------------------------------------------------


def q_seasonal_anomalies(spark, sf_dir):
    from gotrackmaster_spark.operators.timeseries import seasonal_anomalies

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}").alias("day"),
        F.lit(1).alias("x"),
    )
    return seasonal_anomalies(ev, "event_type", "day", "x")


SQL_SEASONAL_ANOMALIES = f"""
WITH obs AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY 1),
days AS (
  SELECT event_type, unnest(generate_series(d0, d1)) AS day FROM span
),
filled AS (
  SELECT d.event_type, d.day,
         ((d.day % 7) + 7) % 7 AS phase,
         coalesce(o.x, 0) AS c
  FROM days d LEFT JOIN obs o ON o.event_type = d.event_type AND o.day = d.day
),
base AS (
  SELECT event_type, phase, CAST(count(*) AS BIGINT) AS n_phase,
         CAST(sum(c) AS BIGINT) AS t_phase
  FROM filled GROUP BY 1, 2
),
scored AS (
  SELECT f.event_type, f.day, f.phase, f.c, b.n_phase, b.t_phase,
         (abs(f.c * b.n_phase - b.t_phase) * 1000000) // b.n_phase AS score
  FROM filled f JOIN base b ON f.event_type = b.event_type AND f.phase = b.phase
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                 ORDER BY score DESC, day ASC) AS INT) AS rnk
  FROM scored
)
SELECT event_type, day, phase, c, n_phase, t_phase, score, rnk
FROM ranked WHERE rnk <= 5
"""


# --------------------------------------------------------------------------
# E7l — Hasler–Süsstrunk colorfulness (`image_colorfulness`,
# operators/images.py::colorfulness_stats): per-image opponent-channel
# moments Σrg, Σrg², Σyb2, Σyb2² as exact int64 from one decode pass;
# C = (sqrt(4·V_rg + V_yb2) + 0.3·sqrt(4·(Σrg)² + (Σyb2)²)) / (2n) —
# two correctly-rounded IEEE sqrts on exact ints + one fixed-order
# divide, bit-identical across engines.
# --------------------------------------------------------------------------


def q_image_colorfulness(spark, sf_dir):
    from gotrackmaster_spark.operators.images import (
        colorfulness_stats,
        synthesize_images,
    )

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    st = colorfulness_stats(imgs)
    v_rg = F.col("n_px") * F.col("sum_rg2") - F.col("sum_rg") * F.col("sum_rg")
    v_yb = (
        F.col("n_px") * F.col("sum_yb2sq") - F.col("sum_yb2") * F.col("sum_yb2")
    )
    a = F.lit(4) * v_rg + v_yb
    b = (
        F.lit(4) * (F.col("sum_rg") * F.col("sum_rg"))
        + F.col("sum_yb2") * F.col("sum_yb2")
    )
    c = (F.sqrt(a.cast("double")) + F.lit(0.3) * F.sqrt(b.cast("double"))) / (
        F.lit(2.0) * F.col("n_px").cast("double")
    )
    return st.select(
        "image_id", "fmt", "n_px", "sum_rg", "sum_rg2", "sum_yb2", "sum_yb2sq",
        c.alias("colorfulness"),
    )


SQL_IMAGE_COLORFULNESS = f"""
WITH px AS (
  SELECT doc_id,
         ({_mom_pix_at('j * 3')}) - ({_mom_pix_at('j * 3 + 1')}) AS rg,
         ({_mom_pix_at('j * 3')}) + ({_mom_pix_at('j * 3 + 1')})
           - 2 * ({_mom_pix_at('j * 3 + 2')}) AS yb2
  FROM documents, range({_IMG_W * _IMG_H}) t(j)
),
feat AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_px,
         CAST(sum(rg) AS BIGINT) AS sum_rg,
         CAST(sum(rg * rg) AS BIGINT) AS sum_rg2,
         CAST(sum(yb2) AS BIGINT) AS sum_yb2,
         CAST(sum(yb2 * yb2) AS BIGINT) AS sum_yb2sq
  FROM px GROUP BY 1
)
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       n_px, sum_rg, sum_rg2, sum_yb2, sum_yb2sq,
       (sqrt(CAST(4 * (n_px * sum_rg2 - sum_rg * sum_rg)
                  + (n_px * sum_yb2sq - sum_yb2 * sum_yb2) AS DOUBLE))
        + CAST(0.3 AS DOUBLE)
          * sqrt(CAST(4 * (sum_rg * sum_rg) + sum_yb2 * sum_yb2 AS DOUBLE)))
       / (CAST(2.0 AS DOUBLE) * CAST(n_px AS DOUBLE)) AS colorfulness
FROM feat
"""


# --------------------------------------------------------------------------
# E51 — integer-quantized PageRank (`pagerank_cells`,
# operators/graph.py::pagerank): hub cells of the movement graph —
# directed cell-transition edges (consecutive events per user on the
# integer lattice, weight = leg count), 5 fixed power-iteration rounds
# with all-int64 arithmetic (rank·w DIV w_out; damping 85/100 as
# integer quotients) so the oracle replays the run as unrolled CTEs
# bit-for-bit.
# --------------------------------------------------------------------------

_PR_CELL = 100_000
_PR_ROUNDS = 5


def _pr_edges(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * F.lit(2654435761)) % 1600000).alias("x"),
        ((F.col("event_id") * 40503 + 7) % 3600000).alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = (F.col("x") / _PR_CELL).cast("long") * 100 + (F.col("y") / _PR_CELL).cast(
        "long"
    )
    legs = pts.select(
        v.alias("src"),
        F.lead(v).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return legs


def q_pagerank_cells(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import pagerank

    return pagerank(_pr_edges(spark, sf_dir), n_rounds=_PR_ROUNDS).select(
        F.col("v").alias("cell"), "rank_q"
    )


def _sql_pagerank_cells():
    from gotrackmaster_spark.operators.graph import sql_pagerank

    edges_cte = f"""
  SELECT src, dst, 1 AS w FROM (
    SELECT (x // {_PR_CELL}) * 100 + (y // {_PR_CELL}) AS src,
           (lead(x) OVER w) // {_PR_CELL} * 100 + (lead(y) OVER w) // {_PR_CELL} AS dst
    FROM (
      SELECT user_id, ts, event_id,
             (event_id * 2654435761) % 1600000 AS x,
             (event_id * 40503 + 7) % 3600000 AS y
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ) WHERE dst IS NOT NULL
"""
    inner = sql_pagerank(edges_cte, n_rounds=_PR_ROUNDS)
    return inner.replace(
        f"SELECT v, rank_q FROM r{_PR_ROUNDS}",
        f"SELECT v AS cell, rank_q FROM r{_PR_ROUNDS}",
    )


SQL_PAGERANK_CELLS = _sql_pagerank_cells()


# --------------------------------------------------------------------------
# E52 — multi-source BFS distance field (`bfs_hops`,
# operators/graph.py::bfs_hops): hop distance from the nearest hotspot
# cell (count >= 6) over the occupied 64×64 lattice with 8-adjacency —
# the service-area / cost-distance primitive.  Frontier BFS settles
# each cell once (O(E) total work); oracle = bounded-depth recursive
# CTE with min(d) per cell.
# --------------------------------------------------------------------------

_BFS_N = 64
_BFS_SEED_MIN = 6
_BFS_MAX_ROUNDS = 40


def q_bfs_hops(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import bfs_hops

    pts = geo_events(spark, sf_dir)
    n = _BFS_N
    occ = (
        pts.select(
            F.floor((F.col("lon") + 180.0) / 360.0 * n).cast("long").alias("i"),
            F.floor((F.col("lat") + 90.0) / 180.0 * n).cast("long").alias("j"),
        )
        .groupBy("i", "j")
        .agg(F.count("*").alias("c"))
    )
    v = (F.col("i") * 1000 + F.col("j")).alias("v")
    cells = occ.select(v, "c")
    seeds = cells.filter(F.col("c") >= _BFS_SEED_MIN).select("v")
    offs = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in (-1, 0, 1) for dj in (-1, 0, 1) if (di, dj) != (0, 0)
    ])
    nbrs = occ.select("i", "j", F.explode(offs).alias("o")).select(
        (F.col("i") * 1000 + F.col("j")).alias("src"),
        ((F.col("i") + F.col("o.di")) * 1000 + (F.col("j") + F.col("o.dj"))).alias(
            "dst"
        ),
    )
    edges = nbrs.join(cells.select(F.col("v").alias("dst")), "dst")
    hops = bfs_hops(edges, seeds, max_rounds=_BFS_MAX_ROUNDS)
    return hops.select(
        F.expr("v DIV 1000").alias("i"), F.pmod(F.col("v"), 1000).alias("j"), "hops"
    )


SQL_BFS_HOPS = f"""
WITH RECURSIVE {GEO_CTE.strip().rstrip(')').rstrip()}
),
counts AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * {_BFS_N}) AS BIGINT) AS i,
         CAST(floor((lat + 90.0) / 180.0 * {_BFS_N}) AS BIGINT) AS j,
         count(*) AS c
  FROM geo GROUP BY 1, 2
),
cells AS (SELECT i * 1000 + j AS v FROM counts),
seeds AS (SELECT i * 1000 + j AS v FROM counts WHERE c >= {_BFS_SEED_MIN}),
offs AS (
  SELECT di, dj FROM (VALUES (-1), (0), (1)) a(di), (VALUES (-1), (0), (1)) b(dj)
  WHERE NOT (di = 0 AND dj = 0)
),
edges AS (
  SELECT (i * 1000 + j) AS src, ((i + di) * 1000 + (j + dj)) AS dst
  FROM counts, offs
  WHERE ((i + di) * 1000 + (j + dj)) IN (SELECT v FROM cells)
),
walk(v, d) AS (
  SELECT v, 0 FROM seeds
  UNION
  SELECT e.dst, w.d + 1
  FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.d < {_BFS_MAX_ROUNDS}
)
SELECT v // 1000 AS i, v % 1000 AS j, CAST(min(d) AS BIGINT) AS hops
FROM walk GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E53 — deterministic fixed-round k-means (`kmeans_clusters`,
# operators/clustering.py::kmeans_quantized): Lloyd over the integer
# event lattice — seeds = k lowest event ids, exact-int64 d² argmin
# with lowest-cid ties, INTEGER centroid means (floor division), empty
# clusters keep their centroid; 3 rounds unrolled as oracle CTEs.
# Centroids live on the driver between rounds (O(k) collect — the
# ivf_centroids contract) and enter assignment as literal codegen.
# --------------------------------------------------------------------------

_KM_K = 8
_KM_ROUNDS = 3


def q_kmeans_clusters(spark, sf_dir):
    from gotrackmaster_spark.operators.clustering import kmeans_quantized

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_id").alias("id"),
        ((F.col("event_id") * F.lit(2654435761)) % 1600000).alias("x"),
        ((F.col("event_id") * 40503 + 7) % 3600000).alias("y"),
    )
    return kmeans_quantized(pts, k=_KM_K, n_rounds=_KM_ROUNDS)


def _sql_kmeans_clusters(k: int = _KM_K, n_rounds: int = _KM_ROUNDS) -> str:
    d2 = (
        "(p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy)"
    )
    parts = [
        """pts AS (
  SELECT event_id AS id,
         (event_id * 2654435761) % 1600000 AS x,
         (event_id * 40503 + 7) % 3600000 AS y
  FROM events
)""",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid,
         x AS cx, y AS cy
  FROM (SELECT id, x, y FROM pts ORDER BY id LIMIT {k})
)""",
    ]
    for r in range(1, n_rounds + 1):
        parts.append(
            f"""a{r} AS (
  SELECT p.id, p.x, p.y,
         (min({{'d2': {d2}, 'cid': c.cid}})).cid AS cid
  FROM pts p CROSS JOIN c{r - 1} c GROUP BY p.id, p.x, p.y
)"""
        )
        parts.append(
            f"""u{r} AS (
  SELECT cid, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS cx,
         CAST(sum(y) AS BIGINT) // CAST(count(*) AS BIGINT) AS cy
  FROM a{r} GROUP BY 1
)"""
        )
        parts.append(
            f"""c{r} AS (
  SELECT c{r - 1}.cid, coalesce(u{r}.cx, c{r - 1}.cx) AS cx,
         coalesce(u{r}.cy, c{r - 1}.cy) AS cy
  FROM c{r - 1} LEFT JOIN u{r} USING (cid)
)"""
        )
    parts.append(
        f"""af AS (
  SELECT p.id, (min({{'d2': {d2}, 'cid': c.cid}})).cid AS cid
  FROM pts p CROSS JOIN c{n_rounds} c GROUP BY p.id
)"""
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT af.cid, count(*) AS n_points, c.cx, c.cy
FROM af JOIN c{n_rounds} c ON af.cid = c.cid
GROUP BY af.cid, c.cx, c.cy
"""


SQL_KMEANS_CLUSTERS = _sql_kmeans_clusters()


# --------------------------------------------------------------------------
# E54 — pairwise corpus-drift distance (`stratum_tv_distance`
# composite): total-variation distance between per-language term
# distributions — TV = Σ|p−q|/2 made EXACT: over the SHARED vocabulary
# Σ|c_a·N_b − c_b·N_a| (exact int), and each side's unshared mass
# enters via the identity Σ_{a-only} c_a = N_a − S_a, so NO outer join
# and no float sum; TV is one fixed-order double division.  Per-term
# join fan-out is bounded by strata² — scalable over any corpus.
# (KL/JS were rejected: ln is a float SUM whose accumulation order no
# engine pins.)
# --------------------------------------------------------------------------


def q_stratum_tv_distance(spark, sf_dir):
    from gotrackmaster_spark.operators.search import stratum_tv_pairs

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.length("term") > 0)
    return stratum_tv_pairs(words, "lang", "term").select(
        F.col("stratum_a").alias("lang_a"),
        F.col("stratum_b").alias("lang_b"),
        "n_shared", "tot_a", "tot_b", "tv_num", "tv",
    )


SQL_STRATUM_TV_DISTANCE = """
WITH words AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
flt AS (SELECT * FROM words WHERE length(term) > 0),
tc AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c FROM flt GROUP BY 1, 2),
tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM flt GROUP BY 1),
agg AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, ta.n AS tot_a, tb.n AS tot_b,
         count(*) AS n_shared,
         CAST(sum(abs(a.c * tb.n - b.c * ta.n)) AS BIGINT) AS d_shared,
         CAST(sum(a.c) AS BIGINT) AS sa,
         CAST(sum(b.c) AS BIGINT) AS sb
  FROM tc a
  JOIN tc b ON a.term = b.term AND a.lang < b.lang
  JOIN tot ta ON ta.lang = a.lang
  JOIN tot tb ON tb.lang = b.lang
  GROUP BY 1, 2, 3, 4
)
SELECT lang_a, lang_b, n_shared, tot_a, tot_b,
       d_shared + (tot_a - sa) * tot_b + (tot_b - sb) * tot_a AS tv_num,
       CAST(d_shared + (tot_a - sa) * tot_b + (tot_b - sb) * tot_a AS DOUBLE)
       / (CAST(2.0 AS DOUBLE) * CAST(tot_a * tot_b AS DOUBLE)) AS tv
FROM agg
"""


# --------------------------------------------------------------------------
# E55 — weighted travel-cost field (`sssp_costs`,
# operators/graph.py::sssp_weighted): multi-source Bellman-Ford over
# the occupied 32×32 lattice with integer 10/14 straight/diagonal
# weights, seeds = cells with count >= 20 — the weighted companion to
# bfs_hops.  Changed-frontier relaxation converges in shortest-path
# hop-count rounds; distances exact int64.  Oracle = bounded recursive
# CTE (walk cost cap 200 > measured max 160 — the bounded-enumeration
# contract).
# --------------------------------------------------------------------------

_SSSP_N = 32
_SSSP_SEED_MIN = 20
_SSSP_CAP = 200


def q_sssp_costs(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import sssp_weighted

    pts = geo_events(spark, sf_dir)
    n = _SSSP_N
    occ = (
        pts.select(
            F.floor((F.col("lon") + 180.0) / 360.0 * n).cast("long").alias("i"),
            F.floor((F.col("lat") + 90.0) / 180.0 * n).cast("long").alias("j"),
        )
        .groupBy("i", "j")
        .agg(F.count("*").alias("c"))
    )
    cells = occ.select((F.col("i") * 1000 + F.col("j")).alias("v"))
    seeds = occ.filter(F.col("c") >= _SSSP_SEED_MIN).select(
        (F.col("i") * 1000 + F.col("j")).alias("v")
    )
    offs = F.array(*[
        F.struct(
            F.lit(di).alias("di"), F.lit(dj).alias("dj"),
            F.lit(10 if di * dj == 0 else 14).alias("w"),
        )
        for di in (-1, 0, 1) for dj in (-1, 0, 1) if (di, dj) != (0, 0)
    ])
    nbrs = occ.select("i", "j", F.explode(offs).alias("o")).select(
        (F.col("i") * 1000 + F.col("j")).alias("src"),
        ((F.col("i") + F.col("o.di")) * 1000 + (F.col("j") + F.col("o.dj"))).alias(
            "dst"
        ),
        F.col("o.w").alias("w"),
    )
    edges = nbrs.join(cells.select(F.col("v").alias("dst")), "dst")
    d = sssp_weighted(edges, seeds, max_rounds=40)
    return d.select(
        F.expr("v DIV 1000").alias("i"), F.pmod(F.col("v"), 1000).alias("j"), "dist"
    )


SQL_SSSP_COSTS = f"""
WITH RECURSIVE {GEO_CTE.strip().rstrip(')').rstrip()}
),
counts AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * {_SSSP_N}) AS BIGINT) AS i,
         CAST(floor((lat + 90.0) / 180.0 * {_SSSP_N}) AS BIGINT) AS j,
         count(*) AS c
  FROM geo GROUP BY 1, 2
),
cells AS (SELECT i * 1000 + j AS v FROM counts),
seeds AS (SELECT i * 1000 + j AS v FROM counts WHERE c >= {_SSSP_SEED_MIN}),
offs AS (
  SELECT di, dj, CASE WHEN di * dj = 0 THEN 10 ELSE 14 END AS w
  FROM (VALUES (-1), (0), (1)) a(di), (VALUES (-1), (0), (1)) b(dj)
  WHERE NOT (di = 0 AND dj = 0)
),
edges AS (
  SELECT (i * 1000 + j) AS src, ((i + di) * 1000 + (j + dj)) AS dst, w
  FROM counts, offs
  WHERE ((i + di) * 1000 + (j + dj)) IN (SELECT v FROM cells)
),
walk(v, d) AS (
  SELECT v, 0 FROM seeds
  UNION
  SELECT e.dst, w.d + e.w
  FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.d + e.w <= {_SSSP_CAP}
)
SELECT v // 1000 AS i, v % 1000 AS j, CAST(min(d) AS BIGINT) AS dist
FROM walk GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E56 — D8 downstream flow length (`d8_flow_length`,
# operators/spatial.py::d8_flow_length): weighted distance each cell
# drains to its sink (integer 10/14 step weights) — pointer doubling
# WITH weight accumulation (parallel list ranking: parent' =
# parent(parent), len' = len + len(parent); ⌈log₂ L⌉ rounds).  Oracle
# = recursive-CTE walk summing the same weights.
# --------------------------------------------------------------------------

_D8_STEP_SQL = (
    "CASE f.flow_dir WHEN 0 THEN 0 "
    + " ".join(
        f"WHEN {code} THEN {10 if nx * ny == 0 else 14}"
        for code, nx, ny in _D8
    )
    + " END"
)


def q_d8_flow_length(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import d8_flow_length

    return d8_flow_length(q_d8_flow(spark, sf_dir).select("x", "y", "flow_dir"))


SQL_D8_FLOW_LENGTH = f"""
WITH RECURSIVE {_D8_CTES},
ftab AS (
  SELECT x, y, CASE WHEN m = 0 THEN 0 {_D8_PICK} END AS flow_dir FROM scm
),
walk AS (
  SELECT x AS x0, y AS y0, x AS cx, y AS cy, 0 AS l FROM ftab
  UNION ALL
  SELECT w.x0, w.y0,
         w.cx + {_D8_DX_SQL},
         w.cy + {_D8_DY_SQL},
         w.l + {_D8_STEP_SQL}
  FROM walk w JOIN ftab f ON f.x = w.cx AND f.y = w.cy
  WHERE f.flow_dir <> 0
),
final AS (
  SELECT w.x0, w.y0, w.cx, w.cy, w.l
  FROM walk w JOIN ftab f ON f.x = w.cx AND f.y = w.cy
  WHERE f.flow_dir = 0
)
SELECT x0 AS x, y0 AS y, cx AS sink_x, cy AS sink_y, CAST(l AS BIGINT) AS flow_len
FROM final
"""


# --------------------------------------------------------------------------
# E57 — Z-range window scan (`zrange_scan`,
# functions/cells.py::zranges_for_rect): the bbox→cell-range planner —
# the lat [−22.5°, 45°) × lon [−45°, 90°) window decomposed into the
# minimal EXACT Z-curve range cover (5 BETWEEN predicates at level 6),
# per-cell counts answered from range predicates alone.  The oracle
# filters on raw lat/lon bounds instead — equality PROVES the cover is
# exact; on a cell-range file layout (skew.repartition_by_cell_range)
# these BETWEENs are the row-group pruning predicate at 10¹² rows.
# --------------------------------------------------------------------------

_ZR_LEVEL = 6
_ZR_RECT = (24, 47, 24, 47)  # == lat [-22.5, 45) x lon [-45, 90) at level 6


def q_zrange_scan(spark, sf_dir):
    from gotrackmaster_spark.functions.cells import zranges_for_rect

    pts = geo_events(spark, sf_dir)
    cell = cell_col(F.col("lat"), F.col("lon"), _ZR_LEVEL)
    ranges = zranges_for_rect(*_ZR_RECT, _ZR_LEVEL)
    tagged = pts.select(cell.alias("cell6"))
    pred = None
    for lo, hi in ranges:
        p = F.col("cell6").between(F.lit(lo), F.lit(hi))
        pred = p if pred is None else (pred | p)
    return tagged.filter(pred).groupBy("cell6").agg(F.count("*").alias("n"))


SQL_ZRANGE_SCAN = f"""
WITH {GEO_CTE}
SELECT {cell_sql('lat', 'lon', _ZR_LEVEL)} AS cell6, count(*) AS n
FROM geo
WHERE lat >= -22.5 AND lat < 45.0 AND lon >= -45.0 AND lon < 90.0
GROUP BY 1
"""


# --------------------------------------------------------------------------
# E58 — quantized DEM viewshed (`dem_viewshed` composite): line-of-
# sight along the 8 principal rays from an observer tower at (0, 0) —
# cell k is visible iff its QUANTIZED elevation slope
# ((e − e0)·10⁶) DIV k strictly exceeds the running max over nearer
# cells (the constant √2 of diagonal rays cancels within a ray, and
# integer quantization replaces the unpinnable float ratio — the
# documented quantized-viewshed contract).  Pure codegen ray explode
# (no DEM join: elevations from the synthetic formula) + ONE window
# per ray; at scale the rays explode from the observer table and join
# the DEM raster cell-keyed.
# --------------------------------------------------------------------------

_VS_E0 = 31870 + 100  # formula elevation at (0,0) + 100 m tower
_VS_STEPS = 60
_VS_QUANT = 10**6


def q_dem_viewshed(spark, sf_dir):
    from pyspark.sql import Window

    rays = spark.range(8).select(
        F.col("id").cast("int").alias("ray"),
        F.expr(f"explode(sequence(1, {_VS_STEPS}))").alias("k"),
    )
    dx = F.expr("CASE ray WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 0 WHEN 3 THEN -1 "
                "WHEN 4 THEN -1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END")
    dy = F.expr("CASE ray WHEN 0 THEN 0 WHEN 1 THEN -1 WHEN 2 THEN -1 WHEN 3 THEN -1 "
                "WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END")
    pts = rays.select(
        "ray", "k", (dx * F.col("k")).alias("x"), (dy * F.col("k")).alias("y")
    )
    ele = ((F.col("y") + 90) * 361 + (F.col("x") + 180)) * F.lit(2654435761) % 40000
    # (e - e0) is negative below the tower: both Spark DIV and DuckDB //
    # truncate toward zero (verified: -7 // 2 = -3 in DuckDB), so the
    # quantized slope is the same one-quotient expression in both engines
    slope_q = F.expr(f"((ele - {_VS_E0}) * {_VS_QUANT}) DIV k")
    w = (
        Window.partitionBy("ray")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = pts.withColumn("ele", ele).withColumn("slope_q", slope_q)
    prev = F.max("slope_q").over(w)
    return scored.select(
        "ray",
        "k",
        "x",
        "y",
        "ele",
        "slope_q",
        (prev.isNull() | (F.col("slope_q") > prev)).alias("visible"),
    )


SQL_DEM_VIEWSHED = f"""
WITH rays AS (
  SELECT ray, unnest(generate_series(1, {_VS_STEPS})) AS k
  FROM (SELECT CAST(r AS INT) AS ray FROM range(8) t(r))
),
pts AS (
  SELECT ray, k,
         (CASE ray WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 0 WHEN 3 THEN -1
                   WHEN 4 THEN -1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END) * k AS x,
         (CASE ray WHEN 0 THEN 0 WHEN 1 THEN -1 WHEN 2 THEN -1 WHEN 3 THEN -1
                   WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END) * k AS y
  FROM rays
),
scored AS (
  SELECT ray, k, x, y,
         ((y + 90) * 361 + (x + 180)) * 2654435761 % 40000 AS ele,
         ((((y + 90) * 361 + (x + 180)) * 2654435761 % 40000 - {_VS_E0})
          * {_VS_QUANT}) // k AS slope_q
  FROM pts
)
SELECT ray, k, x, y, ele, slope_q,
       coalesce(slope_q > max(slope_q) OVER (PARTITION BY ray ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), TRUE) AS visible
FROM scored
"""


# --------------------------------------------------------------------------
# E59 — canonical document selection (`canonical_docs` composite): the
# final stage of the dedup pipeline — near-dup pairs → connected
# components → per-cluster KEEP decision by (quality score, lowest id)
# via one lexicographic struct-max; the engine-exact integer quality
# score (functions/text.py) makes the argmax deterministic.  Completes
# detection → clustering → canonicalization as driver-checked stages.
# --------------------------------------------------------------------------


def q_canonical_docs(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import connected_components

    pairs = q_simhash_near_dups(spark, sf_dir)
    comp = connected_components(pairs, "a_id", "b_id")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", quality_score_col("text").alias("q")
    )
    labeled = comp.join(docs, comp["v"] == docs["doc_id"])
    best = labeled.groupBy("l").agg(
        F.count("*").alias("n_docs"),
        F.max(
            F.struct(F.col("q"), (-F.col("v")).alias("nid"))
        ).alias("b"),
    )
    return best.select(
        F.col("l").alias("root"),
        "n_docs",
        F.col("b.q").alias("kept_quality"),
        (-F.col("b.nid")).alias("kept_id"),
    )


SQL_CANONICAL_DOCS = f"""
WITH RECURSIVE ed AS (
  SELECT a_id AS a, b_id AS b FROM ({SQL_SIMHASH_NEAR_DUPS}) s
  UNION
  SELECT b_id, a_id FROM ({SQL_SIMHASH_NEAR_DUPS}) s
),
nodes AS (SELECT DISTINCT a AS v FROM ed),
reach AS (
  SELECT v, v AS u FROM nodes
  UNION
  SELECT r.v, e.b AS u FROM reach r JOIN ed e ON e.a = r.u
),
comp AS (SELECT v, min(u) AS root FROM reach GROUP BY v),
q AS (SELECT doc_id, {quality_score_sql('text')} AS q FROM documents),
best AS (
  SELECT comp.root, count(*) AS n_docs,
         max({{'q': q.q, 'nid': -comp.v}}) AS b
  FROM comp JOIN q ON q.doc_id = comp.v
  GROUP BY comp.root
)
SELECT root, n_docs, (b).q AS kept_quality, -((b).nid) AS kept_id FROM best
"""


# --------------------------------------------------------------------------
# E60 — per-cell OLS trend (`ols_trends` composite): the parametric
# companion to Mann-Kendall/Theil-Sen — least-squares slope of the
# daily count series per trend cell from SIX exact int64 sums
# (n, Σx, Σy, Σx², Σy², Σxy over observed days); slope = Sxy/Sxx and
# r² = Sxy²/(Sxx·Syy) as fixed-order doubles on the exact integer
# moments (Sxy² would overflow int64 — squared in doubles by design).
# ONE hash aggregate, no joins, no windows.
# --------------------------------------------------------------------------


def q_ols_trends(spark, sf_dir):
    geo = geo_events(spark, sf_dir)
    occ = geo.groupBy(
        F.floor(F.col("lon") / _TREND_G).cast("long").alias("gx"),
        F.floor(F.col("lat") / _TREND_G).cast("long").alias("gy"),
        F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}").alias("t"),
    ).agg(F.count("*").alias("cnt"))
    agg = occ.groupBy("gx", "gy").agg(
        F.count("*").alias("n"),
        F.sum("t").alias("sx"),
        F.sum("cnt").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx0"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("syy0"),
        F.sum(F.col("t") * F.col("cnt")).alias("sxy0"),
    )
    sxx = F.col("n") * F.col("sxx0") - F.col("sx") * F.col("sx")
    syy = F.col("n") * F.col("syy0") - F.col("sy") * F.col("sy")
    sxy = F.col("n") * F.col("sxy0") - F.col("sx") * F.col("sy")
    slope = F.when(sxx > 0, sxy.cast("double") / sxx.cast("double"))
    r2 = F.when(
        (sxx > 0) & (syy > 0),
        (sxy.cast("double") * sxy.cast("double"))
        / (sxx.cast("double") * syy.cast("double")),
    )
    return agg.select(
        "gx", "gy", "n",
        sxy.alias("sxy"), sxx.alias("sxx"), syy.alias("syy"),
        slope.alias("slope"), r2.alias("r2"),
    )


SQL_OLS_TRENDS = f"""
WITH {GEO_CTE},
occ AS (
  SELECT CAST(floor(lon / {_TREND_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_TREND_G}) AS BIGINT) AS gy,
         epoch_us(ts) // {_US_PER_DAY} AS t,
         CAST(count(*) AS BIGINT) AS cnt
  FROM geo GROUP BY 1, 2, 3
),
agg AS (
  SELECT gx, gy, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS sx,
         CAST(sum(cnt) AS BIGINT) AS sy,
         CAST(sum(t * t) AS BIGINT) AS sxx0,
         CAST(sum(cnt * cnt) AS BIGINT) AS syy0,
         CAST(sum(t * cnt) AS BIGINT) AS sxy0
  FROM occ GROUP BY 1, 2
)
SELECT gx, gy, n,
       n * sxy0 - sx * sy AS sxy,
       n * sxx0 - sx * sx AS sxx,
       n * syy0 - sy * sy AS syy,
       CASE WHEN n * sxx0 - sx * sx > 0 THEN
         CAST(n * sxy0 - sx * sy AS DOUBLE) / CAST(n * sxx0 - sx * sx AS DOUBLE)
       END AS slope,
       CASE WHEN n * sxx0 - sx * sx > 0 AND n * syy0 - sy * sy > 0 THEN
         (CAST(n * sxy0 - sx * sy AS DOUBLE) * CAST(n * sxy0 - sx * sy AS DOUBLE))
         / (CAST(n * sxx0 - sx * sx AS DOUBLE) * CAST(n * syy0 - sy * sy AS DOUBLE))
       END AS r2
FROM agg
"""


# --------------------------------------------------------------------------
# E61 — caption↔pixel correlation per tile (`caption_pixel_corr`
# composite, E7×text crossover): does caption length co-vary with
# decoded pixel mass within a 10° tile?  Pearson r from SIX exact
# int64 moments over the REAL decode chain (x = caption_len, y =
# pixel_sum); S-terms exact ints, r = Sxy/√(Sxx·Syy) with the product
# squared in doubles (int64 would overflow) in a fixed order.
# --------------------------------------------------------------------------

_CPC_TILE_DEG = 10.0


def q_caption_pixel_corr(spark, sf_dir):
    from gotrackmaster_spark.operators.images import decode_stats, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    st = decode_stats(imgs).select("image_id", "pixel_sum", "caption_len")
    key = _img_key_col()
    lat, lon = _img_geotag_cols(key)
    tagged = st.select(
        tile_name_col(lat, lon, _CPC_TILE_DEG).alias("tile"),
        F.col("caption_len").cast("long").alias("x"),
        F.col("pixel_sum").alias("y"),
    )
    agg = tagged.groupBy("tile").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx0"),
        F.sum(F.col("y") * F.col("y")).alias("syy0"),
        F.sum(F.col("x") * F.col("y")).alias("sxy0"),
    )
    sxx = F.col("n") * F.col("sxx0") - F.col("sx") * F.col("sx")
    syy = F.col("n") * F.col("syy0") - F.col("sy") * F.col("sy")
    sxy = F.col("n") * F.col("sxy0") - F.col("sx") * F.col("sy")
    r = F.when(
        (sxx > 0) & (syy > 0),
        sxy.cast("double") / F.sqrt(sxx.cast("double") * syy.cast("double")),
    )
    return agg.select(
        "tile", "n", sxy.alias("sxy"), sxx.alias("sxx"), syy.alias("syy"),
        r.alias("corr"),
    )


SQL_CAPTION_PIXEL_CORR = f"""
WITH st AS (
  SELECT doc_id,
         CAST(CASE WHEN doc_id % 3 = 2
              THEN list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX} - ({_PIX}) % 4))
              ELSE list_sum(list_transform(generate_series(0, {_N_PIX - 1}),
                            i -> {_PIX}))
         END AS BIGINT) AS y,
         CAST(length(text) AS BIGINT) AS x
  FROM documents
),
tagged AS (
  SELECT {tile_name_sql("((doc_id * 2654435761) % 1600000) / 10000.0 - 80.0",
                        "((doc_id * 40503 + 7) % 3600000) / 10000.0 - 180.0",
                        _CPC_TILE_DEG)} AS tile,
         x, y
  FROM st
),
agg AS (
  SELECT tile, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx0,
         CAST(sum(y * y) AS BIGINT) AS syy0,
         CAST(sum(x * y) AS BIGINT) AS sxy0
  FROM tagged GROUP BY 1
)
SELECT tile, n,
       n * sxy0 - sx * sy AS sxy,
       n * sxx0 - sx * sx AS sxx,
       n * syy0 - sy * sy AS syy,
       CASE WHEN n * sxx0 - sx * sx > 0 AND n * syy0 - sy * sy > 0 THEN
         CAST(n * sxy0 - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx0 - sx * sx AS DOUBLE)
                * CAST(n * syy0 - sy * sy AS DOUBLE))
       END AS corr
FROM agg
"""


# --------------------------------------------------------------------------
# E62 — regional revenue (`regional_revenue` composite): the TPC-H
# Q5-shaped FIVE-way relational join — region ⋈ nation ⋈ customer ⋈
# orders ⋈ lineitem (local-supplier condition via s_nationkey =
# c_nationkey) — proving the relational join/agg surface end-to-end.
# Revenue is summed in EXACT INTEGER CENTS: both engines compute the
# identical double product extprice·(1−disc), round it half-away-from-
# zero at 2 dp (Spark F.round == DuckDB round for positives) and cast
# to int64 BEFORE the sum, so accumulation order cannot perturb the
# result.  Plan: dims broadcast (region/nation/customer/supplier),
# one shuffle on orderkey, map-side partial aggs.
# --------------------------------------------------------------------------


def q_regional_revenue(spark, sf_dir):
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0),
        0,
    ).cast("long")
    j = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return j.groupBy("r_name", "n_name").agg(
        F.count("*").alias("n_items"),
        F.sum(cents).alias("revenue_cents"),
    )


SQL_REGIONAL_REVENUE = """
SELECT r.r_name, n.n_name,
       count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE s.s_nationkey = c.c_nationkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E63 — adaptive quadtree histogram (`quadtree_hist`,
# operators/spatial.py::quadtree_leaves): variable-resolution binning —
# every point lands in the COARSEST Z-cell (levels 4..8) whose
# population is <= 50; dense regions refine, sparse stay coarse.
# Non-iterative: ONE points-scale aggregate to level 8, then prefix
# GROUP-BYs + prefix joins of the tiny cell table and a deterministic
# CASE — exact integer counts, no loop.
# --------------------------------------------------------------------------

_QT_MIN, _QT_MAX, _QT_CAP = 4, 8, 50


def q_quadtree_hist(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import quadtree_leaves

    return quadtree_leaves(
        geo_events(spark, sf_dir),
        min_level=_QT_MIN,
        max_level=_QT_MAX,
        cap=_QT_CAP,
    )


def _sql_quadtree_hist() -> str:
    anc_ctes = []
    joins = []
    for lv in range(_QT_MIN, _QT_MAX):
        shift = 2 * (_QT_MAX - lv)
        anc_ctes.append(
            f"anc{lv} AS (SELECT c >> {shift} AS a{lv}, "
            f"CAST(sum(n) AS BIGINT) AS n{lv} FROM base GROUP BY 1)"
        )
        joins.append(f"JOIN anc{lv} ON base.c >> {shift} = anc{lv}.a{lv}")
    case_level = "CASE " + " ".join(
        f"WHEN n{lv} <= {_QT_CAP} THEN {lv}"
        for lv in range(_QT_MIN, _QT_MAX)
    ) + f" ELSE {_QT_MAX} END"
    case_cell = "CASE " + " ".join(
        f"WHEN n{lv} <= {_QT_CAP} THEN a{lv}"
        for lv in range(_QT_MIN, _QT_MAX)
    ) + " ELSE c END"
    return f"""
WITH {GEO_CTE},
base AS (
  SELECT {cell_sql('lat', 'lon', _QT_MAX)} AS c, CAST(count(*) AS BIGINT) AS n
  FROM geo GROUP BY 1
),
{", ".join(anc_ctes)},
tagged AS (
  SELECT {case_cell} AS leaf_cell, CAST({case_level} AS INT) AS level, n
  FROM base {" ".join(joins)}
)
SELECT leaf_cell, level, CAST(sum(n) AS BIGINT) AS n_points
FROM tagged GROUP BY 1, 2
"""


SQL_QUADTREE_HIST = _sql_quadtree_hist()


# --------------------------------------------------------------------------
# E64 — edit-distance verification of winnow candidates
# (`winnow_verified` composite): the MOSS verify stage — every
# fingerprint-candidate pair re-scored with FULL Levenshtein distance
# (unit costs: a well-defined integer both engines' builtins agree on)
# plus the quantized similarity ((maxlen − lev)·10⁶) DIV maxlen.  The
# candidate cut keeps the O(len²) dynamic program off the corpus —
# it runs on candidate PAIRS only, the two-stage
# cheap-filter → expensive-verify shape of every dedup pipeline here.
# --------------------------------------------------------------------------


def q_winnow_verified(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = D.winnow_pairs(_t(spark, sf_dir, "documents"))
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    lev = F.levenshtein(F.col("ta"), F.col("tb"))
    mx = F.greatest(F.length("ta"), F.length("tb")).cast("long")
    return j.select(
        "doc_a",
        "doc_b",
        "n_shared",
        lev.cast("long").alias("lev"),
        F.expr(
            "((greatest(length(ta), length(tb)) - levenshtein(ta, tb)) * 1000000)"
            " DIV greatest(length(ta), length(tb))"
        ).alias("sim_q"),
    )


SQL_WINNOW_VERIFIED = f"""
WITH pairs AS ({D.sql_winnow_pairs()})
SELECT p.doc_a, p.doc_b, p.n_shared,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
       ((greatest(length(a.text), length(b.text))
         - levenshtein(a.text, b.text)) * 1000000)
       // greatest(length(a.text), length(b.text)) AS sim_q
FROM pairs p
JOIN documents a ON a.doc_id = p.doc_a
JOIN documents b ON b.doc_id = p.doc_b
"""


# --------------------------------------------------------------------------
# E65 — trajectory Hausdorff distance (`hausdorff_pairs`,
# `spatial.hausdorff_cell_pairs`): the set-DISTANCE companion to
# `trajectory_jaccard` — how far apart do two co-located users' visited
# regions actually get?  Inverted-index candidates (>= 2 shared 10-deg
# cells over a deterministic 1-in-4 point sample; hot cells above
# _HD_MAX_CELL_DF dropped from the index), then the exact
# max-min over candidate pairs' cell sets; squared integer grid
# distances end to end, so the whole output hashes exactly.
# --------------------------------------------------------------------------

_HD_G = 10.0           # grid degrees
_HD_MIN_SHARED = 2     # candidate cut: >= 2 shared cells
# hot-cell cap (the spatial.HAUSDORFF_MAX_CELL_DF default): cells visited by
# more trajectories are dropped from the CANDIDATE index (stop-shingle
# convention) — per-cell candidate output bounded at C(cap, 2).  At sf0.01
# the max per-cell df is 8, so driver output is unchanged by the cap.
_HD_MAX_CELL_DF = 64


def _hd_traj(spark, sf_dir):
    return (
        geo_events(spark, sf_dir)
        .filter(F.col("event_id") % 4 == 0)
        .select(
            F.col("user_id").alias("tid"),
            F.floor(F.col("lon") / _HD_G).cast("long").alias("gx"),
            F.floor(F.col("lat") / _HD_G).cast("long").alias("gy"),
        )
        .distinct()
    )


def q_hausdorff_pairs(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import hausdorff_cell_pairs

    out = hausdorff_cell_pairs(_hd_traj(spark, sf_dir), min_shared=_HD_MIN_SHARED)
    return out.select("tid_a", "tid_b", "n_shared", "h2_ab", "h2_ba", "h2")


SQL_HAUSDORFF_PAIRS = f"""
WITH {GEO_CTE},
vis AS (
  SELECT DISTINCT user_id AS tid,
         CAST(floor(lon / {_HD_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_HD_G}) AS BIGINT) AS gy
  FROM geo WHERE event_id % 4 = 0
),
hot AS (
  SELECT gx, gy FROM vis GROUP BY 1, 2
  HAVING count(*) > {_HD_MAX_CELL_DF}
),
idx AS (
  SELECT v.* FROM vis v
  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.gx = v.gx AND h.gy = v.gy)
),
cand AS (
  SELECT a.tid AS tid_a, b.tid AS tid_b, count(*) AS n_shared
  FROM idx a JOIN idx b ON a.gx = b.gx AND a.gy = b.gy AND a.tid < b.tid
  GROUP BY 1, 2 HAVING count(*) >= {_HD_MIN_SHARED}
),
ex AS (
  SELECT c.tid_a, c.tid_b, a.gx AS agx, a.gy AS agy, b.gx AS bgx, b.gy AS bgy,
         (a.gx - b.gx) * (a.gx - b.gx) + (a.gy - b.gy) * (a.gy - b.gy) AS d2
  FROM cand c JOIN vis a ON a.tid = c.tid_a JOIN vis b ON b.tid = c.tid_b
),
ma AS (
  SELECT tid_a, tid_b, max(m) AS h2_ab FROM (
    SELECT tid_a, tid_b, agx, agy, min(d2) AS m FROM ex GROUP BY 1, 2, 3, 4
  ) GROUP BY 1, 2
),
mb AS (
  SELECT tid_a, tid_b, max(m) AS h2_ba FROM (
    SELECT tid_a, tid_b, bgx, bgy, min(d2) AS m FROM ex GROUP BY 1, 2, 3, 4
  ) GROUP BY 1, 2
)
SELECT c.tid_a, c.tid_b, c.n_shared, ma.h2_ab, mb.h2_ba,
       greatest(ma.h2_ab, mb.h2_ba) AS h2
FROM cand c
JOIN ma ON ma.tid_a = c.tid_a AND ma.tid_b = c.tid_b
JOIN mb ON mb.tid_a = c.tid_a AND mb.tid_b = c.tid_b
"""


# --------------------------------------------------------------------------
# E66 — lag-1 autocorrelation of daily activity (`lag_autocorr`
# composite): does yesterday's volume predict today's, per user?
# Pearson r between consecutive-day event counts (both days observed),
# from SIX exact integer moments in one hash aggregate — the ols_trends
# moment-algebra shape applied to a self-join on (user, day+1).  The
# day+1 equi-join is key-local (one shuffle on user shared by both
# sides); no window over the full series is needed.
# --------------------------------------------------------------------------


def q_lag_autocorr(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}")
    per_day = (
        ev.select("user_id", day.alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("c"))
    )
    x = per_day.select("user_id", (F.col("day") + 1).alias("day"), F.col("c").alias("x"))
    y = per_day.select("user_id", "day", F.col("c").alias("y"))
    pairs = x.join(y, ["user_id", "day"])
    agg = pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n_pairs")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = n * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (dxx > 0) & (dyy > 0),
        num.cast("double") / F.sqrt(dxx.cast("double") * dyy.cast("double")),
    )
    return agg.select(
        "user_id",
        "n_pairs",
        num.alias("num"),
        dxx.alias("dxx"),
        dyy.alias("dyy"),
        F.round(r, 6).alias("r_r"),
    )


SQL_LAG_AUTOCORR = f"""
WITH per_day AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT x.user_id, x.c AS x, y.c AS y
  FROM per_day x JOIN per_day y
    ON y.user_id = x.user_id AND y.day = x.day + 1
),
agg AS (
  SELECT user_id, count(*) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY 1
)
SELECT user_id, n_pairs,
       n_pairs * sxy - sx * sy AS num,
       n_pairs * sxx - sx * sx AS dxx,
       n_pairs * syy - sy * sy AS dyy,
       round(CASE WHEN n_pairs * sxx - sx * sx > 0
                   AND n_pairs * syy - sy * sy > 0
              THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                          * CAST(n_pairs * syy - sy * sy AS DOUBLE))
         END, 6) AS r_r
FROM agg
"""


# --------------------------------------------------------------------------
# E67 — raster region labeling (`raster_regions` composite): classic
# connected-component labeling of the occupancy raster — 8-connected
# blobs of occupied 1-degree cells, each labeled by its min-id root
# (the flood-fill / percolation-cluster primitive, the raster twin of
# the near-dup `dup_components`).  Adjacency comes from the x8 offset
# explode EQUI-join (never an |dx|<=1 inequality join); labels from the
# shared iterative min-label operator; singleton cells rejoin as their
# own roots via one anti-join.  The oracle replays the clustering as a
# recursive-CTE closure over the identical edge set.
# --------------------------------------------------------------------------

_bound_rr_cache = make_bounded_cache()


def q_raster_regions(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import connected_components

    geo = geo_events(spark, sf_dir)
    cells = geo.groupBy(
        F.floor(F.col("lon")).cast("long").alias("gx"),
        F.floor(F.col("lat")).cast("long").alias("gy"),
    ).agg(F.count("*").alias("cnt"))
    # integer node id (grid is bounded: |gx|<=180, |gy|<=90)
    nodes = _bound_rr_cache(
        cells.select(
            ((F.col("gx") + 200) * 1000 + F.col("gy") + 200).alias("v"),
            "gx", "gy", "cnt",
        )
    )
    tgt = nodes.withColumn(
        "__o",
        F.explode(F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        ])),
    ).select(
        F.col("v").alias("a"),
        (F.col("gx") + F.col("__o.dx")).alias("tx"),
        (F.col("gy") + F.col("__o.dy")).alias("ty"),
    )
    edges = tgt.join(
        nodes.select(F.col("v").alias("b"), F.col("gx").alias("tx"), F.col("gy").alias("ty")),
        ["tx", "ty"],
    ).select("a", "b")
    comp = connected_components(edges, "a", "b")
    singles = nodes.join(comp, nodes["v"] == comp["v"], "left_anti").select(
        nodes["v"], nodes["v"].alias("l")
    )
    lab = comp.select("v", "l").union(singles)
    return (
        lab.join(nodes, "v")
        .groupBy(F.col("l").alias("root"))
        .agg(
            F.count("*").alias("n_cells"),
            F.sum("cnt").alias("n_points"),
            F.min("gx").alias("gx0"),
            F.max("gx").alias("gx1"),
            F.min("gy").alias("gy0"),
            F.max("gy").alias("gy1"),
        )
    )


SQL_RASTER_REGIONS = f"""
WITH RECURSIVE {GEO_CTE},
cells AS (
  SELECT CAST(floor(lon) AS BIGINT) AS gx, CAST(floor(lat) AS BIGINT) AS gy,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2
),
n AS (SELECT (gx + 200) * 1000 + gy + 200 AS v, gx, gy, cnt FROM cells),
off AS (
  SELECT dx - 1 AS dx, dy - 1 AS dy
  FROM range(3) t1(dx), range(3) t2(dy)
  WHERE NOT (dx = 1 AND dy = 1)
),
ed AS (
  SELECT a.v AS a, b.v AS b
  FROM n a, off o
  JOIN n b ON b.gx = a.gx + o.dx AND b.gy = a.gy + o.dy
),
reach AS (
  SELECT v, v AS u FROM n
  UNION
  SELECT r.v, e.b AS u FROM reach r JOIN ed e ON e.a = r.u
),
comp AS (SELECT v, min(u) AS root FROM reach GROUP BY v)
SELECT c.root,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(n.cnt) AS BIGINT) AS n_points,
       min(n.gx) AS gx0, max(n.gx) AS gx1,
       min(n.gy) AS gy0, max(n.gy) AS gy1
FROM comp c JOIN n ON n.v = c.v
GROUP BY 1
"""


# --------------------------------------------------------------------------
# E68 — Otsu threshold (`otsu_threshold`, `images.luma_histogram`):
# the classic global binarization threshold (Otsu 1979) per image over
# the REAL decode chain — the luma level maximizing between-class
# variance.  One decode pass emits the ≤256-bin histogram; the
# threshold scan is pure JVM: a cumulative window over bins, then
# argmax of σ²_B ∝ (sum0·N − S·w0)² / (w0·(N−w0)) with DETERMINISTIC
# ranking — the ratio derives from exact int64 moments in fixed order,
# ties break on the lowest level, and only occupied bins need scanning
# (σ²_B is constant between occupied levels, so the lowest-t argmax is
# always an occupied bin).  The DuckDB twin replays histogram + scan
# from the closed-form pixel generator.
# --------------------------------------------------------------------------

_bound_otsu_cache = make_bounded_cache()


def q_otsu_threshold(spark, sf_dir):
    from pyspark.sql import Window

    from gotrackmaster_spark.operators.images import luma_histogram, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    # feeds the cumulative scan AND the per-image totals: decode once
    hist = _bound_otsu_cache(luma_histogram(imgs))
    w = Window.partitionBy("image_id").orderBy("l")
    cum = hist.select(
        "image_id", "fmt", "l",
        F.sum("n").over(w).alias("w0"),
        F.sum(F.col("n") * F.col("l")).over(w).alias("sum0"),
    )
    tot = hist.groupBy("image_id").agg(
        F.sum("n").alias("nn"),
        F.sum(F.col("n") * F.col("l")).alias("s"),
    )
    j = cum.join(tot, "image_id").filter(F.col("w0") < F.col("nn"))
    f = (F.col("sum0") * F.col("nn") - F.col("s") * F.col("w0")).cast("double")
    sigma = f * f / (F.col("w0") * (F.col("nn") - F.col("w0"))).cast("double")
    ranked = j.select("image_id", "fmt", "l", "w0", "nn", sigma.alias("sigma"))
    w2 = Window.partitionBy("image_id").orderBy(F.desc("sigma"), F.asc("l"))
    best = ranked.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") == 1)
    return best.select(
        "image_id", "fmt",
        F.col("l").alias("otsu_t"),
        (F.col("nn") - F.col("w0")).alias("n_fg"),
        F.round("sigma", 4).alias("sigma_r"),
    )


def _otsu_luma_at() -> str:
    return (
        f"(299 * {_mom_pix_at('j * 3')}"
        f" + 587 * {_mom_pix_at('j * 3 + 1')}"
        f" + 114 * {_mom_pix_at('j * 3 + 2')}) // 1000"
    )


SQL_OTSU_THRESHOLD = f"""
WITH lum AS (
  SELECT doc_id, {_otsu_luma_at()} AS l
  FROM documents, range({_IMG_W * _IMG_H}) t(j)
),
hist AS (SELECT doc_id, l, count(*) AS n FROM lum GROUP BY 1, 2),
cum AS (
  SELECT doc_id, l,
         CAST(sum(n) OVER (PARTITION BY doc_id ORDER BY l) AS BIGINT) AS w0,
         CAST(sum(n * l) OVER (PARTITION BY doc_id ORDER BY l) AS BIGINT) AS sum0
  FROM hist
),
tot AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS nn, CAST(sum(n * l) AS BIGINT) AS s
  FROM hist GROUP BY 1
),
sc AS (
  SELECT c.doc_id, c.l, c.w0, t.nn,
         CAST(c.sum0 * t.nn - t.s * c.w0 AS DOUBLE) AS f,
         CAST(c.w0 * (t.nn - c.w0) AS DOUBLE) AS den
  FROM cum c JOIN tot t USING (doc_id)
  WHERE c.w0 < t.nn
),
ranked AS (
  SELECT doc_id, l, w0, nn, (f * f) / den AS sigma,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY (f * f) / den DESC, l) AS rn
  FROM sc
)
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       l AS otsu_t,
       nn - w0 AS n_fg,
       round(sigma, 4) AS sigma_r
FROM ranked WHERE rn = 1
"""


# --------------------------------------------------------------------------
# E69 — positional phrase search (`phrase_search`,
# `search.phrase_search`): exact multi-phrase matching via ONE
# postings join against a broadcast (phrase, term, offset) dictionary
# and a distinct-offset reduction — no per-phrase join chains.  Mixed
# phrase lengths in one pass; repeated-term phrases can't double-count
# a posting (DISTINCT offsets).  The DuckDB twin is generated from the
# same dictionary literal.
# --------------------------------------------------------------------------

_PHRASES = [
    "slow hash batch",
    "part filter scan",
    "window fast query",
    "fast table",
    "table table",
]


def q_phrase_search(spark, sf_dir):
    from gotrackmaster_spark.operators.search import phrase_search

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_search(docs, _PHRASES)


SQL_PHRASE_SEARCH = None  # assigned below (generated twin)


def _sql_phrase_search() -> str:
    from gotrackmaster_spark.operators.search import sql_phrase_search

    return sql_phrase_search(_PHRASES)


SQL_PHRASE_SEARCH = _sql_phrase_search()


# --------------------------------------------------------------------------
# E70 — link prediction (`link_prediction`,
# `graph.common_neighbor_scores`): which near-dup edges did the simhash
# candidate generator MISS?  Non-edge pairs of the near-dup graph
# scored by common-neighbor count + quantized neighborhood Jaccard
# (integer DIV — no float ranking).  One wedge self-join on the middle
# node, one anti-join against existing edges, two degree joins.  The
# oracle replays the identical algebra over the same simhash edge set.
# --------------------------------------------------------------------------

_LP_MIN_COMMON = 2


def q_link_prediction(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import common_neighbor_scores

    pairs = q_simhash_near_dups(spark, sf_dir)
    return common_neighbor_scores(
        pairs, "a_id", "b_id", min_common=_LP_MIN_COMMON
    )


SQL_LINK_PREDICTION = f"""
WITH ed AS (
  SELECT a_id AS s, b_id AS t FROM ({SQL_SIMHASH_NEAR_DUPS}) x
  UNION
  SELECT b_id, a_id FROM ({SQL_SIMHASH_NEAR_DUPS}) x
),
und AS (SELECT s, t FROM ed WHERE s <> t),
deg AS (SELECT s AS v, count(*) AS d FROM und GROUP BY 1),
wedges AS (
  SELECT w1.t AS a, w2.t AS b, count(*) AS cn
  FROM und w1 JOIN und w2 ON w1.s = w2.s AND w1.t < w2.t
  GROUP BY 1, 2 HAVING count(*) >= {_LP_MIN_COMMON}
),
cand AS (
  SELECT w.a, w.b, w.cn FROM wedges w
  WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.s = w.a AND e.t = w.b)
)
SELECT c.a, c.b, c.cn, da.d AS d_a, db.d AS d_b,
       (c.cn * 1000000) // (da.d + db.d - c.cn) AS jacc_q
FROM cand c
JOIN deg da ON da.v = c.a
JOIN deg db ON db.v = c.b
"""


# --------------------------------------------------------------------------
# E71 — Simpson diversity per cell (`cell_diversity` composite): how
# mixed is each 5° cell's event-type composition?  Simpson's index as
# an EXACT RATIONAL — λ = Σ n_t(n_t−1) / (N(N−1)) (the probability two
# draws without replacement share a type) — numerator/denominator
# published as int64 alongside the rounded 1−λ diversity.  Two nested
# hash aggregates, both map-side combinable; no joins.
# --------------------------------------------------------------------------


def q_cell_diversity(spark, sf_dir):
    geo = geo_events(spark, sf_dir)
    per_type = geo.groupBy(
        F.floor(F.col("lon") / _HOT_G).cast("long").alias("gx"),
        F.floor(F.col("lat") / _HOT_G).cast("long").alias("gy"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    agg = per_type.groupBy("gx", "gy").agg(
        F.count("*").alias("n_types"),
        F.sum("n").alias("n_events"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("num"),
    )
    nn = F.col("n_events")
    div = F.when(
        nn > 1,
        F.lit(1.0) - F.col("num").cast("double") / (nn * (nn - 1)).cast("double"),
    )
    return agg.select(
        "gx", "gy", "n_types", "n_events", "num",
        F.round(div, 6).alias("diversity_r"),
    )


SQL_CELL_DIVERSITY = f"""
WITH {GEO_CTE},
per_type AS (
  SELECT CAST(floor(lon / {_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_HOT_G}) AS BIGINT) AS gy,
         event_type, count(*) AS n
  FROM geo GROUP BY 1, 2, 3
),
agg AS (
  SELECT gx, gy, count(*) AS n_types,
         CAST(sum(n) AS BIGINT) AS n_events,
         CAST(sum(n * (n - 1)) AS BIGINT) AS num
  FROM per_type GROUP BY 1, 2
)
SELECT gx, gy, n_types, n_events, num,
       round(CASE WHEN n_events > 1
              THEN CAST(1.0 AS DOUBLE)
                   - CAST(num AS DOUBLE)
                     / CAST(n_events * (n_events - 1) AS DOUBLE)
         END, 6) AS diversity_r
FROM agg
"""


# --------------------------------------------------------------------------
# E72 — association rules (`assoc_rules` composite): market-basket
# mining over (user, day) baskets of event types — directed rules
# a → b with support, confidence and lift, all integer-quantized
# (conf_q = s_ab·10⁶ DIV s_a; lift_q = s_ab·n_baskets·10⁶ DIV
# (s_a·s_b)) so ranking is engine-proof.  Within-basket self-join
# bounded by basket width (≤ |event types|); the per-item supports and
# the 1-row basket count attach via broadcast joins.
# --------------------------------------------------------------------------

_AR_QUANT = 10**6
_AR_MIN_SUP = 5


def q_assoc_rules(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}")
    baskets = (
        ev.select("user_id", day.alias("day"), "event_type").distinct()
    )
    nb = baskets.select("user_id", "day").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    sup = baskets.groupBy("event_type").agg(F.count("*").alias("s"))
    a = baskets.select("user_id", "day", F.col("event_type").alias("ant"))
    b = baskets.select("user_id", "day", F.col("event_type").alias("cons"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("ant") != F.col("cons"))
        .groupBy("ant", "cons")
        .agg(F.count("*").alias("s_ab"))
        .filter(F.col("s_ab") >= _AR_MIN_SUP)
    )
    j = (
        pairs.join(F.broadcast(sup.select(F.col("event_type").alias("ant"), F.col("s").alias("s_a"))), "ant")
        .join(F.broadcast(sup.select(F.col("event_type").alias("cons"), F.col("s").alias("s_b"))), "cons")
        .crossJoin(F.broadcast(nb))
    )
    return j.select(
        "ant", "cons", "s_ab", "s_a", "s_b", "n_baskets",
        F.expr(f"(s_ab * {_AR_QUANT}) DIV s_a").alias("conf_q"),
        F.expr(f"(s_ab * n_baskets * {_AR_QUANT}) DIV (s_a * s_b)").alias("lift_q"),
    )


SQL_ASSOC_RULES = f"""
WITH baskets AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day, event_type
  FROM events
),
nb AS (
  SELECT count(*) AS n_baskets
  FROM (SELECT DISTINCT user_id, day FROM baskets)
),
sup AS (SELECT event_type, CAST(count(*) AS BIGINT) AS s FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.event_type AS ant, b.event_type AS cons, count(*) AS s_ab
  FROM baskets a
  JOIN baskets b ON a.user_id = b.user_id AND a.day = b.day
                AND a.event_type <> b.event_type
  GROUP BY 1, 2 HAVING count(*) >= {_AR_MIN_SUP}
)
SELECT p.ant, p.cons, p.s_ab, sa.s AS s_a, sb.s AS s_b, nb.n_baskets,
       (p.s_ab * {_AR_QUANT}) // sa.s AS conf_q,
       (p.s_ab * nb.n_baskets * {_AR_QUANT}) // (sa.s * sb.s) AS lift_q
FROM pairs p
JOIN sup sa ON sa.event_type = p.ant
JOIN sup sb ON sb.event_type = p.cons
CROSS JOIN nb
"""


# --------------------------------------------------------------------------
# E73 — k-core extraction (`kcore_nodes`, `graph.kcore_peel`): the
# dense core of the near-dup graph via FIXED-round peeling (remove
# degree < k, re-derive, repeat) — confluent, so any round count ≥ the
# peel depth is the true k-core, and fixed rounds unroll bit-for-bit
# into the CTE oracle (the pagerank convention).
# --------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 6


def q_kcore_nodes(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import kcore_peel

    pairs = q_simhash_near_dups(spark, sf_dir)
    return kcore_peel(pairs, "a_id", "b_id", k=_KCORE_K, n_rounds=_KCORE_ROUNDS)


def _sql_kcore_nodes() -> str:
    from gotrackmaster_spark.operators.graph import sql_kcore_peel

    return sql_kcore_peel(
        f"SELECT a_id AS s, b_id AS t FROM ({SQL_SIMHASH_NEAR_DUPS}) x",
        k=_KCORE_K,
        n_rounds=_KCORE_ROUNDS,
    )


SQL_KCORE_NODES = _sql_kcore_nodes()


# --------------------------------------------------------------------------
# E74 — image Euler characteristic (`image_euler`,
# `images.euler_stats`): per-image topology of the binarized luma
# plane — E₄ = V − E + Q = #components − #holes (Gray 1971), all four
# terms exact integers from one decode pass (shift products, no
# labeling).  The DuckDB twin replays fg/adjacency/quad counts from
# the closed-form pixel generator at shifted flat indices.
# --------------------------------------------------------------------------

_EULER_T = 128


def q_image_euler(spark, sf_dir):
    from gotrackmaster_spark.operators.images import euler_stats, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    return euler_stats(imgs, thresh=_EULER_T)


def _fg_at(jexpr: str) -> str:
    lum = (
        f"((299 * {_mom_pix_at(f'({jexpr}) * 3')}"
        f" + 587 * {_mom_pix_at(f'({jexpr}) * 3 + 1')}"
        f" + 114 * {_mom_pix_at(f'({jexpr}) * 3 + 2')}) // 1000)"
    )
    return f"(CASE WHEN {lum} >= {_EULER_T} THEN 1 ELSE 0 END)"


SQL_IMAGE_EULER = f"""
WITH px AS (
  SELECT doc_id, j % {_IMG_W} AS x, j // {_IMG_W} AS y,
         {_fg_at('j')} AS fg,
         {_fg_at('j + 1')} AS fgr,
         {_fg_at(f'j + {_IMG_W}')} AS fgd,
         {_fg_at(f'j + {_IMG_W} + 1')} AS fgq
  FROM documents, range({_IMG_W * _IMG_H}) t(j)
),
agg AS (
  SELECT doc_id,
         CAST(sum(fg) AS BIGINT) AS n_fg,
         CAST(sum(CASE WHEN x < {_IMG_W - 1} THEN fg * fgr ELSE 0 END)
              + sum(CASE WHEN y < {_IMG_H - 1} THEN fg * fgd ELSE 0 END)
              AS BIGINT) AS n_adj,
         CAST(sum(CASE WHEN x < {_IMG_W - 1} AND y < {_IMG_H - 1}
                       THEN fg * fgr * fgd * fgq ELSE 0 END)
              AS BIGINT) AS n_quad
  FROM px GROUP BY doc_id
)
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       n_fg, n_adj, n_quad,
       n_fg - n_adj + n_quad AS euler
FROM agg
"""


# --------------------------------------------------------------------------
# E75 — marching-squares contour classification (`contour_cases`
# composite): the raster→vector contouring primitive — each event's
# 1° DEM cell classified by the standard 16-case marching-squares
# index at a fixed iso level over the EXACT-INTEGER corner samples
# (the ×10 DEM closed form kept integer; no float enters the
# predicate).  Saddles (cases 5/10) carry two contour segments, empty/
# full cells none.  Pure codegen: corner values are row-local closed
# forms, so the whole query is one scan + one ≤16-group aggregate —
# no DEM join at all.
# --------------------------------------------------------------------------

_MS_ISO = 20000  # iso level in decimeter units (corner range 0..39999)


def _ms_corner(la, lo):
    """Integer DEM corner sample (decimeters) at integer (la, lo)."""
    return ((la + 90) * 361 + (lo + 180)) * F.lit(2654435761) % 40000


def q_contour_cases(spark, sf_dir):
    geo = geo_events(spark, sf_dir)
    la = F.floor(F.col("lat")).cast("long")
    lo = F.floor(F.col("lon")).cast("long")
    b = lambda v: (v >= _MS_ISO).cast("long")  # noqa: E731
    case = (
        8 * b(_ms_corner(la, lo))
        + 4 * b(_ms_corner(la, lo + 1))
        + 2 * b(_ms_corner(la + 1, lo + 1))
        + 1 * b(_ms_corner(la + 1, lo))
    )
    tagged = geo.select(
        "user_id", la.alias("la"), lo.alias("lo"), case.alias("ms_case")
    )
    segs = (
        F.when(F.col("ms_case").isin(0, 15), F.lit(0))
        .when(F.col("ms_case").isin(5, 10), F.lit(2))
        .otherwise(F.lit(1))
        .cast("int")
    )
    return (
        tagged.groupBy("ms_case")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("la", "lo").alias("n_cells"),
        )
        .select("ms_case", segs.alias("n_segs"), "n_events", "n_users", "n_cells")
    )


def _ms_corner_sql(la: str, lo: str) -> str:
    return f"((({la}) + 90) * 361 + (({lo}) + 180)) * 2654435761 % 40000"


def _ms_b(la: str, lo: str) -> str:
    return f"(CASE WHEN {_ms_corner_sql(la, lo)} >= {_MS_ISO} THEN 1 ELSE 0 END)"


SQL_CONTOUR_CASES = f"""
WITH {GEO_CTE},
tagged AS (
  SELECT user_id,
         CAST(floor(lat) AS BIGINT) AS la,
         CAST(floor(lon) AS BIGINT) AS lo,
         CAST(8 * {_ms_b('CAST(floor(lat) AS BIGINT)', 'CAST(floor(lon) AS BIGINT)')}
         + 4 * {_ms_b('CAST(floor(lat) AS BIGINT)', 'CAST(floor(lon) AS BIGINT) + 1')}
         + 2 * {_ms_b('CAST(floor(lat) AS BIGINT) + 1', 'CAST(floor(lon) AS BIGINT) + 1')}
         + 1 * {_ms_b('CAST(floor(lat) AS BIGINT) + 1', 'CAST(floor(lon) AS BIGINT)')}
         AS BIGINT) AS ms_case
  FROM geo
)
SELECT ms_case,
       CAST(CASE WHEN ms_case IN (0, 15) THEN 0
                 WHEN ms_case IN (5, 10) THEN 2
                 ELSE 1 END AS INT) AS n_segs,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT (la, lo)) AS n_cells
FROM tagged GROUP BY ms_case
"""


# --------------------------------------------------------------------------
# E76 — Kendall rank correlation (`kendall_tau` composite): tau-b with
# tie correction between per-user activity volume and spread (total
# events vs active days) — concordant/discordant/tie counts are EXACT
# integers from one users² self-join (bounded: users, not events) and
# two tiny tie aggregates; only the final τ is a fixed-order double.
# --------------------------------------------------------------------------

_bound_kt_cache = make_bounded_cache()


def q_kendall_tau(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}")
    users = _bound_kt_cache(
        ev.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.count("*").alias("x"), F.countDistinct("day").alias("y"))
    )
    a = users.select(F.col("user_id").alias("ua"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = users.select(F.col("user_id").alias("ub"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    pr = a.join(b, F.col("ua") < F.col("ub"))
    conc = ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb"))) | (
        (F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb"))
    )
    disc = ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb"))) | (
        (F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb"))
    )
    cd = pr.agg(
        F.count("*").alias("n0"),
        F.sum(conc.cast("long")).alias("c"),
        F.sum(disc.cast("long")).alias("d"),
    )
    tx = (
        users.groupBy("x").agg(F.count("*").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) DIV 2")).alias("n1"))
    )
    ty = (
        users.groupBy("y").agg(F.count("*").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) DIV 2")).alias("n2"))
    )
    j = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    den = (F.col("n0") - F.col("n1")).cast("double") * (F.col("n0") - F.col("n2")).cast("double")
    tau = F.when(den > 0, (F.col("c") - F.col("d")).cast("double") / F.sqrt(den))
    return j.select("n0", "c", "d", "n1", "n2", F.round(tau, 6).alias("tau_r"))


SQL_KENDALL_TAU = f"""
WITH users AS (
  SELECT user_id, count(*) AS x,
         count(DISTINCT epoch_us(ts) // {_US_PER_DAY}) AS y
  FROM events GROUP BY 1
),
cd AS (
  SELECT count(*) AS n0,
         CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                         OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                         OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM users a JOIN users b ON a.user_id < b.user_id
),
tx AS (SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1
       FROM (SELECT count(*) AS t FROM users GROUP BY x)),
ty AS (SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2
       FROM (SELECT count(*) AS t FROM users GROUP BY y))
SELECT n0, c, d, n1, n2,
       round(CASE WHEN CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE) > 0
              THEN CAST(c - d AS DOUBLE)
                   / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
         END, 6) AS tau_r
FROM cd, tx, ty
"""


# --------------------------------------------------------------------------
# E77 — Gini concentration (`gini_coefficient` composite): per event
# type, how unequally is volume spread across users?  The rank-sum
# identity G = (2·Σ rᵢxᵢ − (n+1)·Σx) / (n·Σx) over counts ranked by
# (count, user_id) — numerator and denominator published as exact
# int64 (tie-invariant: equal values swap ranks without changing the
# sum), one window + one aggregate per type.
# --------------------------------------------------------------------------


def q_gini_coefficient(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy("c", "user_id")
    ranked = per_user.withColumn("r", F.row_number().over(w))
    agg = ranked.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum("c").alias("total"),
        F.sum(F.col("r") * F.col("c")).alias("rank_sum"),
    )
    num = 2 * F.col("rank_sum") - (F.col("n_users") + 1) * F.col("total")
    den = F.col("n_users") * F.col("total")
    gini = F.when(den > 0, num.cast("double") / den.cast("double"))
    return agg.select(
        "event_type", "n_users", "total",
        num.alias("num"), den.alias("den"),
        F.round(gini, 6).alias("gini_r"),
    )


SQL_GINI_COEFFICIENT = """
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS c
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c, user_id) AS r
  FROM per_user
),
agg AS (
  SELECT event_type, count(*) AS n_users,
         CAST(sum(c) AS BIGINT) AS total,
         CAST(sum(r * c) AS BIGINT) AS rank_sum
  FROM ranked GROUP BY 1
)
SELECT event_type, n_users, total,
       2 * rank_sum - (n_users + 1) * total AS num,
       n_users * total AS den,
       round(CASE WHEN n_users * total > 0
              THEN CAST(2 * rank_sum - (n_users + 1) * total AS DOUBLE)
                   / CAST(n_users * total AS DOUBLE)
         END, 6) AS gini_r
FROM agg
"""


# --------------------------------------------------------------------------
# E78 — vocabulary growth / Heaps' law (`vocab_growth` composite):
# distinct vocabulary vs corpus size at doc-count checkpoints — the
# corpus-health curve (sub-linear growth is Heaps' law; a linear curve
# flags boilerplate/noise).  First-occurrence doc per term (one
# aggregate), bucketed + cumulative-window — NO inequality join against
# the checkpoint list.  Exact integers throughout.
# --------------------------------------------------------------------------

_VG_STEP = 50


def q_vocab_growth(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.length("term") > 0)
    firsts = words.groupBy("term").agg(F.min("doc_id").alias("fd"))
    vb = firsts.groupBy((F.expr(f"fd DIV {_VG_STEP}") + 1).alias("b")).agg(
        F.count("*").alias("new_terms")
    )
    tb = words.groupBy((F.expr(f"doc_id DIV {_VG_STEP}") + 1).alias("b")).agg(
        F.count("*").alias("toks")
    )
    j = vb.join(tb, "b", "full")
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    out = j.select(
        (F.col("b") * _VG_STEP).alias("n_docs"),
        F.sum(F.coalesce(F.col("new_terms"), F.lit(0))).over(w).alias("vocab"),
        F.sum(F.coalesce(F.col("toks"), F.lit(0))).over(w).alias("tokens"),
    )
    return out.select(
        "n_docs", "vocab", "tokens",
        # guarded: a bucket prefix with zero tokens (all-empty docs) yields
        # NULL type-token ratio instead of DIVIDE_BY_ZERO under ANSI.
        F.expr("CASE WHEN tokens > 0 THEN (vocab * 1000000) DIV tokens END").alias(
            "ttr_q"
        ),
    )


SQL_VOCAB_GROWTH = f"""
WITH words AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
  WHERE length(t.term) > 0
),
firsts AS (SELECT term, min(doc_id) AS fd FROM words GROUP BY 1),
vb AS (SELECT fd // {_VG_STEP} + 1 AS b, count(*) AS new_terms FROM firsts GROUP BY 1),
tb AS (SELECT doc_id // {_VG_STEP} + 1 AS b, count(*) AS toks FROM words GROUP BY 1),
cum AS (
  SELECT coalesce(vb.b, tb.b) AS b,
         CAST(sum(coalesce(new_terms, 0))
              OVER (ORDER BY coalesce(vb.b, tb.b)) AS BIGINT) AS vocab,
         CAST(sum(coalesce(toks, 0))
              OVER (ORDER BY coalesce(vb.b, tb.b)) AS BIGINT) AS tokens
  FROM vb FULL JOIN tb ON vb.b = tb.b
)
SELECT b * {_VG_STEP} AS n_docs, vocab, tokens,
       CASE WHEN tokens > 0 THEN (vocab * 1000000) // tokens END AS ttr_q
FROM cum
"""


# --------------------------------------------------------------------------
# E79 — fractal box counting (`box_counting` composite): occupied-cell
# counts of the event point set at a ladder of grid scales — the
# box-counting dimension measurement (N(s) ~ s^-D).  One explode of
# the scale ladder (constant ×5) + one distinct-cell aggregate per
# scale; the successive ratio N(s)/N(2s) is integer-quantized.
# --------------------------------------------------------------------------

_BOX_SCALES = [1, 2, 4, 8, 16]


def q_box_counting(spark, sf_dir):
    geo = geo_events(spark, sf_dir)
    sc = F.explode(F.array(*[F.lit(s) for s in _BOX_SCALES])).alias("scale")
    cells = geo.select("lat", "lon", sc).select(
        "scale",
        F.floor(F.col("lon") / F.col("scale")).cast("long").alias("gx"),
        F.floor(F.col("lat") / F.col("scale")).cast("long").alias("gy"),
    )
    occ = cells.groupBy("scale").agg(F.countDistinct("gx", "gy").alias("n_boxes"))
    nxt = occ.select((F.col("scale") / 2).cast("int").alias("scale"),
                     F.col("n_boxes").alias("n_coarser"))
    return (
        occ.join(nxt, "scale", "left")
        .select(
            "scale", "n_boxes",
            F.expr("(n_boxes * 1000000) DIV n_coarser").alias("ratio_q"),
        )
    )


SQL_BOX_COUNTING = f"""
WITH {GEO_CTE},
sc AS (SELECT unnest(ARRAY{_BOX_SCALES}) AS scale),
occ AS (
  SELECT scale, count(DISTINCT (CAST(floor(lon / scale) AS BIGINT),
                                CAST(floor(lat / scale) AS BIGINT))) AS n_boxes
  FROM geo, sc GROUP BY 1
)
SELECT o.scale, o.n_boxes,
       (o.n_boxes * 1000000) // n2.n_boxes AS ratio_q
FROM occ o LEFT JOIN occ n2 ON n2.scale = o.scale * 2
"""


# --------------------------------------------------------------------------
# E80 — Haar wavelet energy (`haar_energy` composite,
# `images.luma_plane`): per-image horizontal Haar detail energy at
# levels 1-3 — the multi-resolution texture/blur signature (a blurred
# image's fine-level energy collapses).  The decode pass emits the
# luma plane as a RELATION; the transform is pure JVM: unnormalized
# Haar details are SIGNED INTEGER block sums (first half − second
# half of each 2^L run), so detail energies are exact int64 and the
# whole pyramid is one ×3 scale explode + two hash aggregates — no
# bespoke kernel per level.  The DuckDB twin replays the identical
# block algebra from the closed-form pixel generator.
# --------------------------------------------------------------------------

_HAAR_LEVELS = [1, 2, 3]
_bound_haar_cache = make_bounded_cache()


def q_haar_energy(spark, sf_dir):
    from gotrackmaster_spark.operators.images import luma_plane, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    lum = _bound_haar_cache(luma_plane(imgs))
    lv = F.explode(F.array(*[F.lit(v) for v in _HAAR_LEVELS])).alias("level")
    expanded = lum.select("image_id", "fmt", "x", "y", "l", lv)
    blk = F.expr("x DIV (1 << level)")
    sign = F.when(
        F.expr("x % (1 << level) < (1 << (level - 1))"), F.lit(1)
    ).otherwise(F.lit(-1))
    detail = (
        expanded.groupBy("image_id", "fmt", "level", "y", blk.alias("b"))
        .agg(F.sum(sign * F.col("l")).alias("d"))
    )
    return detail.groupBy("image_id", "fmt", "level").agg(
        F.sum(F.col("d") * F.col("d")).alias("energy"),
        F.max(F.abs(F.col("d"))).alias("max_detail"),
    )


SQL_HAAR_ENERGY = f"""
WITH lum AS (
  SELECT doc_id, j % {_IMG_W} AS x, j // {_IMG_W} AS y,
         {_otsu_luma_at()} AS l
  FROM documents, range({_IMG_W * _IMG_H}) t(j)
),
lv AS (SELECT unnest(ARRAY{_HAAR_LEVELS}) AS level),
detail AS (
  SELECT doc_id, level, y, x // (1 << level) AS b,
         CAST(sum(CASE WHEN x % (1 << level) < (1 << (level - 1))
                       THEN l ELSE -l END) AS BIGINT) AS d
  FROM lum, lv GROUP BY 1, 2, 3, 4
)
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       level,
       CAST(sum(d * d) AS BIGINT) AS energy,
       CAST(max(abs(d)) AS BIGINT) AS max_detail
FROM detail GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# E81 — two-sample Kolmogorov-Smirnov statistic (`ks_statistic`
# composite): does doc length distribute the same across the two
# source strata?  D = max |F₁ − F₂| computed as an EXACT RATIONAL —
# max |c₁·n₂ − c₂·n₁| over the merged value ladder, denominator n₁·n₂
# — no floats until the final display division.  One per-value
# aggregate + one cumulative window over the ≤|distinct lengths| rows.
# --------------------------------------------------------------------------


def _ks_groups(docs):
    grp = F.expr("CAST(substring(source, 4) AS INT) % 2")
    return docs.select(grp.alias("g"), F.col("n_chars").alias("v"))


def q_ks_statistic(spark, sf_dir):
    from pyspark.sql import Window

    vals = _ks_groups(_t(spark, sf_dir, "documents"))
    per_v = vals.groupBy("v").agg(
        F.sum((F.col("g") == 0).cast("long")).alias("a"),
        F.sum((F.col("g") == 1).cast("long")).alias("b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "v",
        F.sum("a").over(w).alias("c1"),
        F.sum("b").over(w).alias("c2"),
    )
    # d_num needs n1/n2 on every ladder row — attach the 1-row totals
    tot = vals.agg(
        F.sum((F.col("g") == 0).cast("long")).alias("n1"),
        F.sum((F.col("g") == 1).cast("long")).alias("n2"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    d = j.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))).alias("d_num"),
    )
    return d.select(
        "n1", "n2", "d_num",
        F.round(F.col("d_num").cast("double") / (F.col("n1") * F.col("n2")).cast("double"), 6).alias("d_r"),
    )


SQL_KS_STATISTIC = """
WITH vals AS (
  SELECT CAST(substring(source, 4) AS INT) % 2 AS g, n_chars AS v
  FROM documents
),
per_v AS (
  SELECT v,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM vals GROUP BY 1
),
cum AS (
  SELECT v,
         CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS c1,
         CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS c2
  FROM per_v
),
tot AS (
  SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM vals
)
SELECT max(t.n1) AS n1, max(t.n2) AS n2,
       max(abs(c.c1 * t.n2 - c.c2 * t.n1)) AS d_num,
       round(CAST(max(abs(c.c1 * t.n2 - c.c2 * t.n1)) AS DOUBLE)
             / CAST(max(t.n1) * max(t.n2) AS DOUBLE), 6) AS d_r
FROM cum c CROSS JOIN tot t
"""


# --------------------------------------------------------------------------
# E82 — Mann-Whitney U (`mann_whitney` composite): the rank-sum
# companion to KS over the same strata — 2·U (doubled to keep the
# half-credit tie term integer) via the merged value ladder:
# 2U = Σ_v a(v)·(2·cumB_less(v) + b(v)).  No pair join: the cumulative
# window replaces the |A|·|B| comparison.  The common-language effect
# size u_r = U/(n₁n₂) is the only float.
# --------------------------------------------------------------------------


def q_mann_whitney(spark, sf_dir):
    from pyspark.sql import Window

    vals = _ks_groups(_t(spark, sf_dir, "documents"))
    per_v = vals.groupBy("v").agg(
        F.sum((F.col("g") == 0).cast("long")).alias("a"),
        F.sum((F.col("g") == 1).cast("long")).alias("b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_v.select(
        "a", "b",
        F.coalesce(F.sum("b").over(w), F.lit(0)).alias("b_less"),
    )
    agg = cum.agg(
        F.sum("a").alias("n1"),
        F.sum("b").alias("n2"),
        F.sum(F.col("a") * (2 * F.col("b_less") + F.col("b"))).alias("u2x"),
    )
    return agg.select(
        "n1", "n2", "u2x",
        F.round(
            F.col("u2x").cast("double") / (2 * F.col("n1") * F.col("n2")).cast("double"), 6
        ).alias("u_r"),
    )


SQL_MANN_WHITNEY = """
WITH vals AS (
  SELECT CAST(substring(source, 4) AS INT) % 2 AS g, n_chars AS v
  FROM documents
),
per_v AS (
  SELECT v,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM vals GROUP BY 1
),
cum AS (
  SELECT a, b,
         CAST(coalesce(sum(b) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b_less
  FROM per_v
)
SELECT CAST(sum(a) AS BIGINT) AS n1,
       CAST(sum(b) AS BIGINT) AS n2,
       CAST(sum(a * (2 * b_less + b)) AS BIGINT) AS u2x,
       round(CAST(sum(a * (2 * b_less + b)) AS DOUBLE)
             / CAST(2 * sum(a) * sum(b) AS DOUBLE), 6) AS u_r
FROM cum
"""


# --------------------------------------------------------------------------
# E83 — shipping priority (`shipping_priority` composite): the TPC-H
# Q3-shaped top-k — BUILDING-segment orders not yet fully shipped at
# the cutoff, ranked by outstanding revenue in EXACT INTEGER CENTS
# (the regional_revenue rounding contract), deterministic top-10 via
# (revenue DESC, orderkey) row_number.  Broadcast customer dim, one
# orderkey shuffle, top-k replaces ORDER BY..LIMIT so the driver's
# order-insensitive compare still pins the selected set.
# --------------------------------------------------------------------------

_Q3_SEGMENT = "BUILDING"
_Q3_CUTOFF = "1995-03-15"
_Q3_TOPK = 10


def q_shipping_priority(spark, sf_dir):
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0),
        0,
    ).cast("long")
    j = (
        li.filter(F.col("l_shipdate") > F.lit(_Q3_CUTOFF).cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(_Q3_CUTOFF).cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == _Q3_SEGMENT)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    agg = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(cents).alias("revenue_cents"),
        F.count("*").alias("n_items"),
    )
    w = Window.orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _Q3_TOPK)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority", "n_items", "revenue_cents",
            F.col("rk").cast("int").alias("rk"),
        )
    )


SQL_SHIPPING_PRIORITY = f"""
WITH agg AS (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0, 0)
                       AS BIGINT)) AS BIGINT) AS revenue_cents,
         count(*) AS n_items
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
    AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
    AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY revenue_cents DESC, l_orderkey) AS rk
  FROM agg
)
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority, n_items, revenue_cents, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {_Q3_TOPK}
"""


# --------------------------------------------------------------------------
# E84 — systematic PPS sampling (`pps_sample` composite): deterministic
# probability-proportional-to-size selection of users weighted by event
# volume — the weighted companion to `stratified_sample`'s hash
# sampling.  A user is picked once per integer multiple of W/K inside
# its cumulative-weight interval:  n_picks = (cum·K) DIV W −
# ((cum−w)·K) DIV W  — EXACT integers, no randomness, heavy users can
# legitimately be picked more than once (classic systematic PPS with
# origin 0).  The cumulative weight is a TWO-LEVEL cumsum (the scale
# remedy the r3 docstring promised, now implemented): level 1 is a
# shard-partitioned window (shard = user_id DIV 2¹³ — a RANGE bucket,
# so shard order extends user_id order), level 2 an exclusive prefix
# over the per-shard totals, broadcast back onto the shards.  No
# window in the plan runs unpartitioned over the user table; the only
# single-partition window is over the shard-total table (n_users/2¹³
# rows — 122k shards at 10⁹ users), pinned in test_plan_shapes.py.
# cum is exact either way, so the output is bit-identical to the
# global-window formulation (the DuckDB twin keeps the one-level SQL).
# --------------------------------------------------------------------------

_PPS_K = 20
_PPS_SHARD_W = 1 << 13  # users per cumsum shard (user_id is non-negative)


def q_pps_sample(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(F.count("*").alias("w")).withColumn(
        "shard", F.expr(f"user_id DIV {_PPS_SHARD_W}")
    )
    tot = users.agg(F.sum("w").alias("tw"))
    w1 = Window.partitionBy("shard").orderBy("user_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    part = users.select(
        "user_id", "w", "shard", F.sum("w").over(w1).alias("cum_in")
    )
    w2 = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        users.groupBy("shard")
        .agg(F.sum("w").alias("sw"))
        .select("shard", F.coalesce(F.sum("sw").over(w2), F.lit(0)).alias("off"))
    )
    cum = part.join(F.broadcast(offs), "shard").select(
        "user_id", "w", (F.col("cum_in") + F.col("off")).alias("cum")
    )
    j = cum.crossJoin(F.broadcast(tot))
    picks = F.expr(f"(cum * {_PPS_K}) DIV tw - ((cum - w) * {_PPS_K}) DIV tw")
    return (
        j.select("user_id", "w", "cum", picks.alias("n_picks"))
        .filter(F.col("n_picks") >= 1)
    )


SQL_PPS_SAMPLE = f"""
WITH users AS (
  SELECT user_id, count(*) AS w FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM users),
cum AS (
  SELECT user_id, w,
         CAST(sum(w) OVER (ORDER BY user_id) AS BIGINT) AS cum
  FROM users
)
SELECT c.user_id, c.w, c.cum,
       (c.cum * {_PPS_K}) // t.tw - ((c.cum - c.w) * {_PPS_K}) // t.tw AS n_picks
FROM cum c CROSS JOIN tot t
WHERE (c.cum * {_PPS_K}) // t.tw - ((c.cum - c.w) * {_PPS_K}) // t.tw >= 1
"""


# --------------------------------------------------------------------------
# E85 — prefix-filtered similarity join (`ppjoin_pairs`,
# `dedup.ppjoin_pairs`): the EXACT (non-probabilistic) scale path for
# Jaccard dedup — PPJoin's prefix filter generates candidates from the
# rarest ⌈(1−t)|s|⌉+1 shingles per doc only, then a ROW-LOCAL
# array_intersect verify; output identical to `jaccard_pairs` at the
# same threshold (equality pinned in tests/test_dedup_text.py).
# --------------------------------------------------------------------------


def q_ppjoin_pairs(spark, sf_dir):
    return D.ppjoin_pairs(_t(spark, sf_dir, "documents"))


SQL_PPJOIN_PAIRS = D.sql_ppjoin_pairs()


# --------------------------------------------------------------------------
# E86 — histogram equalization (`hist_equalization` composite): the
# classic contrast-stretch LUT per image over `images.luma_histogram`
# — lut(l) = ((cdf(l) − cdf_min)·255) DIV (N − cdf_min), all integer
# (the exact OpenCV formulation).  Everything after the decode pass is
# JVM windows/aggregates on ≤256-row-per-image bins; outputs are the
# LUT's level counts and remapped-mass checksum (full-LUT fidelity
# without 256 output rows per image).
# --------------------------------------------------------------------------

_bound_he_cache = make_bounded_cache()


def q_hist_equalization(spark, sf_dir):
    from pyspark.sql import Window

    from gotrackmaster_spark.operators.images import luma_histogram, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    hist = _bound_he_cache(luma_histogram(imgs))
    wc = Window.partitionBy("image_id").orderBy("l")
    wa = Window.partitionBy("image_id")
    cum = hist.select(
        "image_id", "fmt", "l", "n",
        F.sum("n").over(wc).alias("cdf"),
    ).select(
        "image_id", "fmt", "l", "n", "cdf",
        F.min("cdf").over(wa).alias("cdf_min"),
        F.max("cdf").over(wa).alias("nn"),
    )
    lut = F.when(
        F.col("nn") > F.col("cdf_min"),
        F.expr("((cdf - cdf_min) * 255) DIV (nn - cdf_min)"),
    ).otherwise(F.lit(0))
    tagged = cum.select("image_id", "fmt", "n", lut.alias("lut"))
    return tagged.groupBy("image_id", "fmt").agg(
        F.count("*").alias("n_levels_in"),
        F.countDistinct("lut").alias("n_levels_out"),
        F.max("lut").alias("max_out"),
        F.sum(F.col("n") * F.col("lut")).alias("mass_out"),
    )


SQL_HIST_EQUALIZATION = f"""
WITH lum AS (
  SELECT doc_id, {_otsu_luma_at()} AS l
  FROM documents, range({_IMG_W * _IMG_H}) t(j)
),
hist AS (SELECT doc_id, l, CAST(count(*) AS BIGINT) AS n FROM lum GROUP BY 1, 2),
cum AS (
  SELECT doc_id, l, n,
         CAST(sum(n) OVER (PARTITION BY doc_id ORDER BY l) AS BIGINT) AS cdf
  FROM hist
),
ext AS (
  SELECT doc_id, l, n, cdf,
         min(cdf) OVER (PARTITION BY doc_id) AS cdf_min,
         max(cdf) OVER (PARTITION BY doc_id) AS nn
  FROM cum
),
tagged AS (
  SELECT doc_id, n,
         CASE WHEN nn > cdf_min
              THEN ((cdf - cdf_min) * 255) // (nn - cdf_min)
              ELSE 0 END AS lut
  FROM ext
)
SELECT format('img{{:08d}}', doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       count(*) AS n_levels_in,
       count(DISTINCT lut) AS n_levels_out,
       CAST(max(lut) AS BIGINT) AS max_out,
       CAST(sum(n * lut) AS BIGINT) AS mass_out
FROM tagged GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E87 — projection profiles (`projection_profile` composite): per-image
# row/column sum variance over `images.luma_plane` — the banding /
# stripe detector (a striped image has high row variance, a uniform
# one near zero).  Variance numerators h·Σs² − (Σs)² are exact int64;
# two tiny nested aggregates per axis on the relational luma plane.
# --------------------------------------------------------------------------

_bound_pp_cache = make_bounded_cache()


def q_projection_profile(spark, sf_dir):
    from gotrackmaster_spark.operators.images import luma_plane, synthesize_images

    imgs = synthesize_images(spark, sf_dir, w=_IMG_W, h=_IMG_H)
    lum = _bound_pp_cache(luma_plane(imgs))

    def _axis(col, m):
        sums = lum.groupBy("image_id", "fmt", col).agg(F.sum("l").alias("s"))
        return sums.groupBy("image_id", "fmt").agg(
            (F.lit(m) * F.sum(F.col("s") * F.col("s"))
             - F.sum("s") * F.sum("s")).alias(f"{col}_var_num"),
        )

    rows = _axis("y", _IMG_H)
    cols = _axis("x", _IMG_W)
    j = rows.join(cols, ["image_id", "fmt"])
    return j.select(
        "image_id", "fmt", "y_var_num", "x_var_num",
        F.round(F.col("y_var_num").cast("double") / F.lit(float(_IMG_H * _IMG_H)), 4).alias("row_var_r"),
        F.round(F.col("x_var_num").cast("double") / F.lit(float(_IMG_W * _IMG_W)), 4).alias("col_var_r"),
    )


SQL_PROJECTION_PROFILE = f"""
WITH lum AS (
  SELECT doc_id, j % {_IMG_W} AS x, j // {_IMG_W} AS y,
         {_otsu_luma_at()} AS l
  FROM documents, range({_IMG_W * _IMG_H}) t(j)
),
rs AS (SELECT doc_id, y, CAST(sum(l) AS BIGINT) AS s FROM lum GROUP BY 1, 2),
cs AS (SELECT doc_id, x, CAST(sum(l) AS BIGINT) AS s FROM lum GROUP BY 1, 2),
ra AS (
  SELECT doc_id,
         {_IMG_H} * CAST(sum(s * s) AS BIGINT)
         - CAST(sum(s) AS BIGINT) * CAST(sum(s) AS BIGINT) AS y_var_num
  FROM rs GROUP BY 1
),
ca AS (
  SELECT doc_id,
         {_IMG_W} * CAST(sum(s * s) AS BIGINT)
         - CAST(sum(s) AS BIGINT) * CAST(sum(s) AS BIGINT) AS x_var_num
  FROM cs GROUP BY 1
)
SELECT format('img{{:08d}}', r.doc_id) AS image_id,
       ['raw', 'png', 'qnt4'][CAST(r.doc_id % 3 AS INT) + 1] AS fmt,
       r.y_var_num, c.x_var_num,
       round(CAST(r.y_var_num AS DOUBLE) / CAST({_IMG_H * _IMG_H} AS DOUBLE), 4) AS row_var_r,
       round(CAST(c.x_var_num AS DOUBLE) / CAST({_IMG_W * _IMG_W} AS DOUBLE), 4) AS col_var_r
FROM ra r JOIN ca c ON c.doc_id = r.doc_id
"""


# --------------------------------------------------------------------------
# E88 — space-filling-curve locality (`curve_locality` composite): the
# index-design measurement behind the engine's cell IDs — over every
# 8-adjacent occupied cell pair of the 64×64 lattice, how far apart do
# Z-order vs Hilbert place the neighbors?  The honest trade (measured,
# not folklore — test-pinned on full lattices): Hilbert wins the
# DISTRIBUTION (≈2× the unit gaps, fewer long jumps → fewer range
# fragments per query box), Z wins total/max gap and encode cost.
# Both curve positions are exact int64 (bit-spread / the xy2d fold,
# `s2.with_hilbert_d` — pinned against the numpy kernel), adjacency is
# the ×8 offset equi-join, output is ONE row of exact counts.
# --------------------------------------------------------------------------

_CL_LEVEL = 6
_bound_cl_cache = make_bounded_cache()


def q_curve_locality(spark, sf_dir):
    from gotrackmaster_spark.functions.cells import _spread_col, quantize_cols
    from gotrackmaster_spark.functions.s2 import with_hilbert_d

    geo = geo_events(spark, sf_dir)
    qi, qj = quantize_cols(F.col("lat"), F.col("lon"), _CL_LEVEL)
    occ = _bound_cl_cache(
        with_hilbert_d(
            geo.select(qi.alias("i"), qj.alias("j")).distinct(),
            "i", "j", _CL_LEVEL, out="h",
        ).select(
            "i", "j",
            _spread_col(F.col("i")).bitwiseOR(
                F.shiftleft(_spread_col(F.col("j")), 1)
            ).alias("z"),
            "h",
        )
    )
    tgt = occ.withColumn(
        "__o",
        F.explode(F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        ])),
    ).select(
        F.col("i").alias("ia"), F.col("j").alias("ja"),
        F.col("z").alias("za"), F.col("h").alias("ha"),
        (F.col("i") + F.col("__o.dx")).alias("ti"),
        (F.col("j") + F.col("__o.dy")).alias("tj"),
    )
    edges = tgt.join(
        occ.select(F.col("i").alias("ti"), F.col("j").alias("tj"),
                   F.col("z").alias("zb"), F.col("h").alias("hb")),
        ["ti", "tj"],
    ).filter(
        (F.col("ia") < F.col("ti"))
        | ((F.col("ia") == F.col("ti")) & (F.col("ja") < F.col("tj")))
    )
    zg, hg = F.abs(F.col("za") - F.col("zb")), F.abs(F.col("ha") - F.col("hb"))
    jump = 1 << _CL_LEVEL
    return edges.agg(
        F.count("*").alias("n_pairs"),
        F.sum(zg).alias("z_gap_sum"),
        F.max(zg).alias("z_gap_max"),
        F.sum((zg == 1).cast("long")).alias("z_unit"),
        F.sum((zg > jump).cast("long")).alias("z_jumps"),
        F.sum(hg).alias("h_gap_sum"),
        F.max(hg).alias("h_gap_max"),
        F.sum((hg == 1).cast("long")).alias("h_unit"),
        F.sum((hg > jump).cast("long")).alias("h_jumps"),
    )


def _sql_curve_locality() -> str:
    from gotrackmaster_spark.functions.cells import _spread_sql
    from gotrackmaster_spark.functions.s2 import hilbert_sql_ctes

    n = 1 << _CL_LEVEL
    qi = f"least(greatest(CAST(floor((lon + 180.0) / 360.0 * {float(n)!r}) AS BIGINT), 0), {n - 1})"
    qj = f"least(greatest(CAST(floor((lat + 90.0) / 180.0 * {float(n)!r}) AS BIGINT), 0), {n - 1})"
    hctes = hilbert_sql_ctes(_CL_LEVEL, "pts", "oi, oj")
    return f"""
WITH {GEO_CTE},
pts AS (
  SELECT DISTINCT {qi} AS i, {qj} AS j, {qi} AS oi, {qj} AS oj FROM geo
),
{hctes},
cells AS (
  SELECT oi AS i, oj AS j,
         ({_spread_sql('oi')} | ({_spread_sql('oj')} << 1)) AS z,
         d AS h
  FROM hdone
),
off AS (
  SELECT dx - 1 AS dx, dy - 1 AS dy
  FROM range(3) t1(dx), range(3) t2(dy)
  WHERE NOT (dx = 1 AND dy = 1)
),
edges AS (
  SELECT a.z AS za, a.h AS ha, b.z AS zb, b.h AS hb
  FROM cells a, off o
  JOIN cells b ON b.i = a.i + o.dx AND b.j = a.j + o.dy
  WHERE a.i < b.i OR (a.i = b.i AND a.j < b.j)
)
SELECT count(*) AS n_pairs,
       CAST(sum(abs(za - zb)) AS BIGINT) AS z_gap_sum,
       CAST(max(abs(za - zb)) AS BIGINT) AS z_gap_max,
       CAST(sum(CASE WHEN abs(za - zb) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS z_unit,
       CAST(sum(CASE WHEN abs(za - zb) > {1 << _CL_LEVEL} THEN 1 ELSE 0 END) AS BIGINT) AS z_jumps,
       CAST(sum(abs(ha - hb)) AS BIGINT) AS h_gap_sum,
       CAST(max(abs(ha - hb)) AS BIGINT) AS h_gap_max,
       CAST(sum(CASE WHEN abs(ha - hb) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h_unit,
       CAST(sum(CASE WHEN abs(ha - hb) > {1 << _CL_LEVEL} THEN 1 ELSE 0 END) AS BIGINT) AS h_jumps
FROM edges
"""


SQL_CURVE_LOCALITY = _sql_curve_locality()


# --------------------------------------------------------------------------
# E89 — bloom-filter semi-join reduction (`bloom_semijoin` composite):
# the classic shuffle-avoidance mechanic, made measurable — a 128-bit
# deterministic bloom (k=3 affine hashes) built from the dim-side user
# set prefilters the fact side, and the query PUBLISHES the filter's
# exact confusion counts: true members passed, false positives, and
# n_missed (pinned 0 — blooms never produce false negatives).  Bits
# and probes are exact integer hashes, so both engines replay the
# identical filter; fp_rate is integer-quantized.
# --------------------------------------------------------------------------

_BL_M = 128
_BL_P = 1_000_000_007
_BL_HASHES = [(2654435761, 1), (2246822519, 7), (3266489917, 13)]
_BL_MOD = 7  # dim side: user_id % 7 == 0


def q_bloom_semijoin(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    dim = users.filter(F.col("user_id") % _BL_MOD == 0)

    def _positions(df):
        pos = F.explode(
            F.array(*[
                ((F.col("user_id") * F.lit(a) + F.lit(b)) % _BL_P % _BL_M)
                for a, b in _BL_HASHES
            ])
        )
        return df.select("user_id", pos.alias("bit"))

    bits = _positions(dim).select("bit").distinct()
    # a user passes iff ALL of its DISTINCT positions are set — comparing
    # against the constant k would false-negative users whose hash
    # positions self-collide (k distinct positions < k)
    pr = _positions(users).distinct()
    probe = (
        pr.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("k_hit"))
    )
    k_probe = pr.groupBy("user_id").agg(F.count("*").alias("k_probe"))
    verdict = (
        users.join(k_probe, "user_id")
        .join(probe, "user_id", "left")
        .select(
            "user_id",
            (F.coalesce(F.col("k_hit"), F.lit(0)) == F.col("k_probe")).alias("passed"),
            (F.col("user_id") % _BL_MOD == 0).alias("member"),
        )
    )
    ev_tag = ev.select("user_id").join(F.broadcast(verdict), "user_id")
    return ev_tag.agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("passed").cast("long")).alias("n_candidates"),
        F.sum((F.col("passed") & F.col("member")).cast("long")).alias("n_true"),
        F.sum((F.col("passed") & ~F.col("member")).cast("long")).alias("n_fp"),
        F.sum((~F.col("passed") & F.col("member")).cast("long")).alias("n_missed"),
    ).select(
        "n_events", "n_candidates", "n_true", "n_fp", "n_missed",
        # guarded: an all-member event table leaves zero non-member events
        # (n_events == n_true) — NULL, not DIVIDE_BY_ZERO, in both engines.
        F.expr(
            "CASE WHEN n_events - n_true > 0"
            " THEN (n_fp * 1000000) DIV (n_events - n_true) END"
        ).alias("fp_rate_q"),
    )


def _bl_pos_sql(col: str) -> list[str]:
    return [
        f"((({col}) * {a} + {b}) % {_BL_P} % {_BL_M})" for a, b in _BL_HASHES
    ]


SQL_BLOOM_SEMIJOIN = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
dim AS (SELECT user_id FROM users WHERE user_id % {_BL_MOD} = 0),
bits AS (
  SELECT DISTINCT unnest(ARRAY[{', '.join(_bl_pos_sql('user_id'))}]) AS bit
  FROM dim
),
probes AS (
  SELECT DISTINCT user_id,
         unnest(ARRAY[{', '.join(_bl_pos_sql('user_id'))}]) AS bit
  FROM users
),
kp AS (SELECT user_id, count(*) AS k_probe FROM probes GROUP BY 1),
hits AS (
  SELECT p.user_id, count(*) AS k_hit
  FROM probes p JOIN bits b ON b.bit = p.bit
  GROUP BY 1
),
verdict AS (
  SELECT u.user_id,
         coalesce(h.k_hit, 0) = kp.k_probe AS passed,
         u.user_id % {_BL_MOD} = 0 AS member
  FROM users u
  JOIN kp ON kp.user_id = u.user_id
  LEFT JOIN hits h ON h.user_id = u.user_id
),
agg AS (
  SELECT count(*) AS n_events,
         CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
         CAST(sum(CASE WHEN passed AND member THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         CAST(sum(CASE WHEN passed AND NOT member THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
         CAST(sum(CASE WHEN NOT passed AND member THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
  FROM events e JOIN verdict v ON v.user_id = e.user_id
)
SELECT n_events, n_candidates, n_true, n_fp, n_missed,
       CASE WHEN n_events - n_true > 0 THEN
         (n_fp * 1000000) // (n_events - n_true) END AS fp_rate_q
FROM agg
"""


# --------------------------------------------------------------------------
# E90 — trailing rolling median (`rolling_median` composite): per
# (event_type, day), the exact median of the trailing 7 OBSERVED days'
# counts — robust time-series smoothing (a spike moves the mean, not
# the median).  No quantile approx: the trailing window materializes
# via a constant ×7 offset explode + equi-join (bounded fan-out, the
# interval-join convention), then the engine's standard double
# rank-select median with (count, source-day) deterministic tie order.
# --------------------------------------------------------------------------

_RM_W = 7


def q_rolling_median(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}")
    per_day = (
        ev.select("event_type", day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("c"))
    )
    off = F.explode(F.array(*[F.lit(k) for k in range(_RM_W)])).alias("k")
    contrib = per_day.select(
        "event_type", F.col("day").alias("src_day"), "c", off
    ).select(
        "event_type", "src_day", "c", (F.col("src_day") + F.col("k")).alias("day")
    )
    windowed = contrib.join(per_day.select("event_type", "day"), ["event_type", "day"])
    w = Window.partitionBy("event_type", "day")
    ranked = windowed.select(
        "event_type", "day", "c",
        F.row_number().over(w.orderBy("c", "src_day")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    return ranked.groupBy("event_type", "day").agg(
        F.max("n").alias("n_days"),
        (
            (
                F.min(F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("c")))
                + F.min(F.when(F.col("rn") == F.floor(F.col("n") / 2) + 1, F.col("c")))
            )
            / F.lit(2.0)
        ).alias("med"),
    )


SQL_ROLLING_MEDIAN = f"""
WITH per_day AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
contrib AS (
  SELECT p.event_type, p.day AS src_day, p.c, p.day + o.k AS day
  FROM per_day p, (SELECT unnest(generate_series(0, {_RM_W - 1})) AS k) o
),
win AS (
  SELECT c.event_type, c.day, c.c, c.src_day
  FROM contrib c JOIN per_day t ON t.event_type = c.event_type AND t.day = c.day
),
ranked AS (
  SELECT event_type, day, c,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY c, src_day) AS rn,
         count(*) OVER (PARTITION BY event_type, day) AS n
  FROM win
)
SELECT event_type, day,
       CAST(max(n) AS BIGINT) AS n_days,
       (min(CASE WHEN rn = (n + 1) // 2 THEN c END)
        + min(CASE WHEN rn = n // 2 + 1 THEN c END)) / CAST(2.0 AS DOUBLE) AS med
FROM ranked GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E91 — Wilson score interval (`wilson_bounds` composite): exact-count
# proportion confidence bounds per event type (share of events with
# value > 50) — the binomial CI that stays sane at extreme p̂ (the A/B
# guardrail).  n and s are exact ints; the z = 1.96 algebra is a fixed
# parenthesization both engines replay bit-for-bit (one sqrt, no
# transcendentals beyond it).
# --------------------------------------------------------------------------

_WI_THRESH = 50.0
_WI_Z = 1.96


def q_wilson_bounds(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") > _WI_THRESH).cast("long")).alias("s"),
    )
    n = F.col("n").cast("double")
    p = F.col("s").cast("double") / n
    z2 = F.lit(_WI_Z * _WI_Z)
    center = p + z2 / (F.lit(2.0) * n)
    half = F.lit(_WI_Z) * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
    denom = F.lit(1.0) + z2 / n
    return agg.select(
        "event_type", "n", "s",
        F.round((center - half) / denom, 6).alias("lo_r"),
        F.round((center + half) / denom, 6).alias("hi_r"),
    )


_WI_Z2 = _WI_Z * _WI_Z

SQL_WILSON_BOUNDS = f"""
WITH agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CASE WHEN value > {_WI_THRESH} THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM events GROUP BY 1
)
SELECT event_type, n, s,
       round(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
               + {_WI_Z2!r} / (CAST(2.0 AS DOUBLE) * CAST(n AS DOUBLE)))
              - {_WI_Z!r} * sqrt((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(1.0 AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE)
                    + {_WI_Z2!r} / (CAST(4.0 AS DOUBLE) * CAST(n AS DOUBLE)
                                    * CAST(n AS DOUBLE))))
             / (CAST(1.0 AS DOUBLE) + {_WI_Z2!r} / CAST(n AS DOUBLE)), 6) AS lo_r,
       round(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
               + {_WI_Z2!r} / (CAST(2.0 AS DOUBLE) * CAST(n AS DOUBLE)))
              + {_WI_Z!r} * sqrt((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(1.0 AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE)
                    + {_WI_Z2!r} / (CAST(4.0 AS DOUBLE) * CAST(n AS DOUBLE)
                                    * CAST(n AS DOUBLE))))
             / (CAST(1.0 AS DOUBLE) + {_WI_Z2!r} / CAST(n AS DOUBLE)), 6) AS hi_r
FROM agg
"""


# --------------------------------------------------------------------------
# E92 — autocorrelation profile (`acf_profile` composite): the full
# correlogram — per event type, Pearson r between daily counts at lags
# 1..7 over observed day pairs (the weekly-rhythm detector; a lag-7
# peak = weekday seasonality).  One constant ×7 lag explode + one
# equi-join + exact integer moments per (type, lag); generalizes
# `lag_autocorr`'s single lag.
# --------------------------------------------------------------------------

_ACF_LAGS = 7


def q_acf_profile(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY}")
    per_day = (
        ev.select("event_type", day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("c"))
    )
    lag = F.explode(F.array(*[F.lit(k) for k in range(1, _ACF_LAGS + 1)])).alias("lag")
    x = per_day.select("event_type", "day", F.col("c").alias("x"), lag).select(
        "event_type", "lag", (F.col("day") + F.col("lag")).alias("day"), "x"
    )
    pairs = x.join(
        per_day.select("event_type", "day", F.col("c").alias("y")),
        ["event_type", "day"],
    )
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n_pairs")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = n * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (dxx > 0) & (dyy > 0),
        num.cast("double") / F.sqrt(dxx.cast("double") * dyy.cast("double")),
    )
    return agg.select(
        "event_type", "lag", "n_pairs",
        num.alias("num"), dxx.alias("dxx"), dyy.alias("dyy"),
        F.round(r, 6).alias("r_r"),
    )


SQL_ACF_PROFILE = f"""
WITH per_day AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT event_type, o.lag, day + o.lag AS day, c AS x
  FROM per_day, (SELECT unnest(generate_series(1, {_ACF_LAGS})) AS lag) o
),
pairs AS (
  SELECT x.event_type, x.lag, x.x, y.c AS y
  FROM x JOIN per_day y ON y.event_type = x.event_type AND y.day = x.day
),
agg AS (
  SELECT event_type, lag, count(*) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag, n_pairs,
       n_pairs * sxy - sx * sy AS num,
       n_pairs * sxx - sx * sx AS dxx,
       n_pairs * syy - sy * sy AS dyy,
       round(CASE WHEN n_pairs * sxx - sx * sx > 0
                   AND n_pairs * syy - sy * sy > 0
              THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                          * CAST(n_pairs * syy - sy * sy AS DOUBLE))
         END, 6) AS r_r
FROM agg
"""


# --------------------------------------------------------------------------
# E93 — MinHash estimator calibration (`minhash_calibration`
# composite): how good is the sketch, measured — for every LSH band
# candidate pair, the signature-agreement ESTIMATE of Jaccard
# (matches·10⁶ DIV 16) side by side with the EXACT shingle-set Jaccard
# (row-local array_intersect on per-doc sorted shingle arrays, the
# ppjoin verify shape) and the signed quantized error.  The
# estimator-quality check every 10⁹-doc dedup tunes bands/rows with.
# --------------------------------------------------------------------------

_bound_mc_cache = make_bounded_cache()


def q_minhash_calibration(spark, sf_dir):
    from gotrackmaster_spark.functions.text import N_MINHASH

    docs = _t(spark, sf_dir, "documents")
    sigs = _bound_mc_cache(D.minhash_signatures(docs))
    cand = D.lsh_candidate_pairs(sigs)
    mh = [f"mh_{j}" for j in range(N_MINHASH)]
    sa = sigs.select(F.col("doc_id").alias("a_id"), *[F.col(c).alias(f"a_{c}") for c in mh])
    sb = sigs.select(F.col("doc_id").alias("b_id"), *[F.col(c).alias(f"b_{c}") for c in mh])
    matches = sum(
        (F.col(f"a_{c}") == F.col(f"b_{c}")).cast("long") for c in mh
    )
    est = cand.join(sa, "a_id").join(sb, "b_id").select(
        "a_id", "b_id", matches.alias("matches")
    )
    sh = D.doc_shingles(docs)
    sets = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle_h")).alias("arr"),
        F.count("*").alias("sz"),
    )
    j = (
        est.join(sets.select(F.col("doc_id").alias("a_id"), F.col("arr").alias("la"),
                             F.col("sz").alias("sa")), "a_id")
        .join(sets.select(F.col("doc_id").alias("b_id"), F.col("arr").alias("lb"),
                          F.col("sz").alias("sb")), "b_id")
        .withColumn("inter", F.size(F.array_intersect(F.col("la"), F.col("lb"))).cast("long"))
    )
    est_q = F.expr(f"(matches * 1000000) DIV {N_MINHASH}")
    jac_q = F.expr("(inter * 1000000) DIV (sa + sb - inter)")
    return j.select(
        "a_id", "b_id", "matches", "inter", "sa", "sb",
        est_q.alias("est_q"), jac_q.alias("jac_q"),
        (est_q - jac_q).alias("err_q"),
    )


def _sql_minhash_calibration() -> str:
    from gotrackmaster_spark.functions.text import N_MINHASH

    match_sum = " + ".join(
        f"(CASE WHEN a.mh_{j} = b.mh_{j} THEN 1 ELSE 0 END)"
        for j in range(N_MINHASH)
    )
    return f"""
WITH cand AS ({D.sql_minhash_band_pairs()}),
{D._SHINGLES_CTE.strip().rstrip()},
{D._sql_minhash_cte()},
sets AS (
  SELECT doc_id, list_sort(list(shingle_h)) AS arr,
         CAST(count(*) AS BIGINT) AS sz
  FROM shingles GROUP BY 1
),
est AS (
  SELECT c.a_id, c.b_id, CAST({match_sum} AS BIGINT) AS matches
  FROM cand c
  JOIN minhash a ON a.doc_id = c.a_id
  JOIN minhash b ON b.doc_id = c.b_id
)
SELECT e.a_id, e.b_id, e.matches,
       CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT) AS inter,
       sa.sz AS sa, sb.sz AS sb,
       (e.matches * 1000000) // {N_MINHASH} AS est_q,
       (CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT) * 1000000)
       // (sa.sz + sb.sz - CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT)) AS jac_q,
       (e.matches * 1000000) // {N_MINHASH}
       - (CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT) * 1000000)
         // (sa.sz + sb.sz - CAST(len(list_intersect(sa.arr, sb.arr)) AS BIGINT)) AS err_q
FROM est e
JOIN sets sa ON sa.doc_id = e.a_id
JOIN sets sb ON sb.doc_id = e.b_id
"""


SQL_MINHASH_CALIBRATION = _sql_minhash_calibration()


# --------------------------------------------------------------------------
# E94 — join-key skew profile (`skew_profile` composite): the
# diagnostic you run BEFORE choosing salt factors — for each hot join
# key family (user, level-7 cell, doc shingle), the key count, the
# top-key share (quantized) and the Gini concentration of the key
# distribution (rank-sum identity, exact int64).  Three bounded
# aggregates + one union; the answer tells you which joins need
# `skew.salt_hot_cells` at 100 TB.
#
# Scale note (the r3 advisor's single-task-window fix): rank_sum is
# TIE-INVARIANT — keys sharing a count c occupy a contiguous rank run
# regardless of intra-tie order — so it folds onto the per-count
# HISTOGRAM:  rank_sum = Σ_c c·(g_c·lo_c + g_c(g_c+1)/2)  with g_c =
# #keys of count c and lo_c = #keys with smaller counts.  No window
# ever touches the O(keys) table; the only ordered window runs over
# the (c, g_c) histogram — O(distinct counts) rows, ≤ O(√n_rows) for
# any distribution since Σ distinct counts ≤ n_rows.  Bit-identical
# to the ranked formulation (exact integer identity; the DuckDB twin
# keeps the explicit row_number form and the parity test pins it).
# --------------------------------------------------------------------------


def _skew_one(keys, family):
    from pyspark.sql import Window

    cnt = keys.groupBy("k").agg(F.count("*").alias("c"))
    hist = cnt.groupBy("c").agg(F.count("*").alias("g"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    hist2 = hist.select(
        "c", "g", F.coalesce(F.sum("g").over(w), F.lit(0)).alias("lo")
    )
    agg = hist2.agg(
        F.sum("g").alias("n_keys"),
        F.sum(F.col("c") * F.col("g")).alias("n_rows"),
        F.max("c").alias("top1"),
        F.sum(F.expr("c * (g * lo + (g * (g + 1)) DIV 2)")).alias("rank_sum"),
    )
    num = 2 * F.col("rank_sum") - (F.col("n_keys") + 1) * F.col("n_rows")
    den = F.col("n_keys") * F.col("n_rows")
    return agg.select(
        F.lit(family).alias("family"),
        "n_rows", "n_keys", "top1",
        F.expr("(top1 * 1000000) DIV n_rows").alias("top1_q"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("gini_r"),
    )


def q_skew_profile(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    geo = geo_events(spark, sf_dir)
    users = ev.select(F.col("user_id").cast("string").alias("k"))
    cells = geo.select(
        cell_col(F.col("lat"), F.col("lon"), 7).cast("string").alias("k")
    )
    shingles = D.doc_shingles(_t(spark, sf_dir, "documents")).select(
        F.col("shingle_h").cast("string").alias("k")
    )
    return (
        _skew_one(users, "user_id")
        .unionByName(_skew_one(cells, "cell_l7"))
        .unionByName(_skew_one(shingles, "shingle"))
    )


def _sql_skew_one(src_sql: str, family: str) -> str:
    return f"""
SELECT '{family}' AS family,
       CAST(sum(c) AS BIGINT) AS n_rows,
       count(*) AS n_keys,
       CAST(max(c) AS BIGINT) AS top1,
       (CAST(max(c) AS BIGINT) * 1000000) // CAST(sum(c) AS BIGINT) AS top1_q,
       round(CAST(2 * sum(r * c) - (count(*) + 1) * sum(c) AS DOUBLE)
             / CAST(count(*) * sum(c) AS DOUBLE), 6) AS gini_r
FROM (
  SELECT c, row_number() OVER (ORDER BY c, k) AS r
  FROM (SELECT k, count(*) AS c FROM ({src_sql}) GROUP BY k)
)
"""


def _sql_skew_profile() -> str:
    users = "SELECT CAST(user_id AS VARCHAR) AS k FROM events"
    cells = (
        f"SELECT CAST({cell_sql('lat', 'lon', 7)} AS VARCHAR) AS k "
        f"FROM (SELECT {_LAT} AS lat, {_LON} AS lon FROM events)"
    )
    sh = (
        "SELECT CAST(shingle_h AS VARCHAR) AS k FROM "
        f"(WITH {D._SHINGLES_CTE.strip()} SELECT * FROM shingles)"
    )
    return " UNION ALL ".join(
        _sql_skew_one(s, f)
        for s, f in [(users, "user_id"), (cells, "cell_l7"), (sh, "shingle")]
    )


SQL_SKEW_PROFILE = _sql_skew_profile()


# --------------------------------------------------------------------------
# E95 — pricing summary (`pricing_summary` composite): the TPC-H Q1
# shape — per (returnflag, linestatus): quantities, gross/discounted/
# charged revenue ALL in exact integer cents (each double product
# rounded to cents per row BEFORE the sum — accumulation-order-proof),
# plus integer-quantized averages (DIV).  One scan, one ≤6-group
# hash aggregate; the canonical whole-stage-codegen benchmark query.
# --------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02").cast("timestamp")
    base = li.filter(F.col("l_shipdate") <= cutoff)
    price_c = F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")
    disc_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0, 0
    ).cast("long")
    charge_c = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax")) * 100.0, 0
    ).cast("long")
    qty_c = F.round(F.col("l_quantity") * 100.0, 0).cast("long")
    agg = base.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(qty_c).alias("sum_qty_c"),
        F.sum(price_c).alias("sum_price_c"),
        F.sum(disc_c).alias("sum_disc_price_c"),
        F.sum(charge_c).alias("sum_charge_c"),
    )
    return agg.select(
        "l_returnflag", "l_linestatus", "n_rows",
        "sum_qty_c", "sum_price_c", "sum_disc_price_c", "sum_charge_c",
        F.expr("sum_qty_c DIV n_rows").alias("avg_qty_cq"),
        F.expr("sum_price_c DIV n_rows").alias("avg_price_cq"),
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0)
                AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                           * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_charge_c,
       CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS BIGINT)
       // count(*) AS avg_qty_cq,
       CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT)
       // count(*) AS avg_price_cq
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# E96 — small-quantity revenue (`small_qty_revenue` composite): the
# TPC-H Q17 shape — revenue locked in orders whose line quantity is
# below 20 % of the part's average, with the correlated aggregate
# decorrelated into a per-part pre-aggregate + broadcast join and the
# threshold compared by EXACT INTEGER cross-multiplication
# (10·qty·n_part < 2·sum_qty over integer centi-quantities — no float
# average enters the predicate).
# --------------------------------------------------------------------------


def q_small_qty_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100.0, 0).cast("long")
    per_part = li.groupBy("l_partkey").agg(
        F.count("*").alias("n_part"),
        F.sum(qty_c).alias("sum_qty_c"),
    )
    j = li.select(
        "l_partkey",
        qty_c.alias("qty_c"),
        F.round(F.col("l_extendedprice") * 100.0, 0).cast("long").alias("price_c"),
    ).join(F.broadcast(per_part), "l_partkey")
    # qty < 0.2 * (sum/n)  ⟺  10*qty*n < 2*sum   (exact integers)
    small = j.filter(
        F.lit(10) * F.col("qty_c") * F.col("n_part") < F.lit(2) * F.col("sum_qty_c")
    )
    return small.agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum("price_c").alias("revenue_c"),
        F.expr("sum(price_c) DIV 7").alias("yearly_c"),
    )


SQL_SMALL_QTY_REVENUE = """
WITH li AS (
  SELECT l_partkey,
         CAST(round(l_quantity * 100.0, 0) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS price_c
  FROM lineitem
),
per_part AS (
  SELECT l_partkey, count(*) AS n_part,
         CAST(sum(qty_c) AS BIGINT) AS sum_qty_c
  FROM li GROUP BY 1
)
SELECT count(*) AS n_lines,
       count(DISTINCT l.l_partkey) AS n_parts,
       CAST(sum(l.price_c) AS BIGINT) AS revenue_c,
       CAST(sum(l.price_c) AS BIGINT) // 7 AS yearly_c
FROM li l JOIN per_part p ON p.l_partkey = l.l_partkey
WHERE 10 * l.qty_c * p.n_part < 2 * p.sum_qty_c
"""


# --------------------------------------------------------------------------
# E97 — degree assortativity (`degree_assortativity` composite): do
# hub documents near-duplicate other hubs?  Pearson correlation of
# endpoint degrees over the near-dup graph's edges (both directions —
# the standard undirected convention), from exact integer moments (the
# ols_trends algebra); one degree aggregate + two node-keyed joins.
# Positive r = assortative mixing (hubs cluster), the spam-ring smell.
# --------------------------------------------------------------------------


def q_degree_assortativity(spark, sf_dir):
    pairs = q_simhash_near_dups(spark, sf_dir)
    und = pairs.select(F.col("a_id").alias("s"), F.col("b_id").alias("t")).union(
        pairs.select(F.col("b_id").alias("s"), F.col("a_id").alias("t"))
    )
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count("*").alias("d"))
    j = (
        und.join(deg.select(F.col("v").alias("s"), F.col("d").alias("dx")), "s")
        .join(deg.select(F.col("v").alias("t"), F.col("d").alias("dy")), "t")
    )
    agg = j.agg(
        F.count("*").alias("n_ends"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    n = F.col("n_ends")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = n * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (dxx > 0) & (dyy > 0),
        num.cast("double") / F.sqrt(dxx.cast("double") * dyy.cast("double")),
    )
    return agg.select(
        "n_ends", num.alias("num"), dxx.alias("dxx"), dyy.alias("dyy"),
        F.round(r, 6).alias("r_r"),
    )


SQL_DEGREE_ASSORTATIVITY = f"""
WITH und AS (
  SELECT a_id AS s, b_id AS t FROM ({SQL_SIMHASH_NEAR_DUPS}) x
  UNION ALL
  SELECT b_id, a_id FROM ({SQL_SIMHASH_NEAR_DUPS}) x
),
deg AS (SELECT s AS v, count(*) AS d FROM und GROUP BY 1),
j AS (
  SELECT da.d AS dx, db.d AS dy
  FROM und u JOIN deg da ON da.v = u.s JOIN deg db ON db.v = u.t
),
agg AS (
  SELECT count(*) AS n_ends,
         CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         CAST(sum(dx * dx) AS BIGINT) AS sxx, CAST(sum(dy * dy) AS BIGINT) AS syy,
         CAST(sum(dx * dy) AS BIGINT) AS sxy
  FROM j
)
SELECT n_ends,
       n_ends * sxy - sx * sy AS num,
       n_ends * sxx - sx * sx AS dxx,
       n_ends * syy - sy * sy AS dyy,
       round(CASE WHEN n_ends * sxx - sx * sx > 0
                   AND n_ends * syy - sy * sy > 0
              THEN CAST(n_ends * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n_ends * sxx - sx * sx AS DOUBLE)
                          * CAST(n_ends * syy - sy * sy AS DOUBLE))
         END, 6) AS r_r
FROM agg
"""


# --------------------------------------------------------------------------
# E98 — trimmed mean (`trimmed_mean` composite): per event type, the
# mean of the middle 80 % of values — the outlier-immune location
# estimate.  Values are quantized to EXACT centi-units first (a raw
# double Σ is accumulation-order-dependent and would never hash
# stably); trim bounds are integer rank cuts (drop lowest/highest
# n DIV 10), so the conditional sum is an exact int64.
# --------------------------------------------------------------------------


def q_trimmed_mean(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    vals = ev.select(
        "event_type",
        F.round(F.col("value") * 100.0, 0).cast("long").alias("vc"),
        "event_id",
    )
    w = Window.partitionBy("event_type")
    ranked = vals.select(
        "event_type", "vc",
        F.row_number().over(w.orderBy("vc", "event_id")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    kept = ranked.filter(
        (F.col("rn") > F.expr("n DIV 10")) & (F.col("rn") <= F.col("n") - F.expr("n DIV 10"))
    )
    agg = kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.sum("vc").alias("sum_c"),
    )
    return agg.select(
        "event_type", "n_kept", "sum_c",
        F.round(F.col("sum_c").cast("double") / F.col("n_kept").cast("double") / 100.0, 6).alias("tmean_r"),
    )


SQL_TRIMMED_MEAN = """
WITH vals AS (
  SELECT event_type, CAST(round(value * 100.0, 0) AS BIGINT) AS vc, event_id
  FROM events
),
ranked AS (
  SELECT event_type, vc,
         row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM vals
),
kept AS (
  SELECT event_type, vc FROM ranked
  WHERE rn > n // 10 AND rn <= n - n // 10
)
SELECT event_type, count(*) AS n_kept,
       CAST(sum(vc) AS BIGINT) AS sum_c,
       round(CAST(sum(vc) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / CAST(100.0 AS DOUBLE), 6) AS tmean_r
FROM kept GROUP BY 1
"""


# --------------------------------------------------------------------------
# E99 — Zipf check + hapax rate (`zipf_check` composite): corpus-law
# diagnostics — the top-20 terms by document frequency with the exact
# rank·df product (Zipf's law predicts it near-constant; a flat
# product curve flags template text), plus the corpus hapax count
# (df = 1 terms) attached to every row (1-row broadcast).
# --------------------------------------------------------------------------

_ZIPF_TOPK = 20


def q_zipf_check(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.length("term") > 0)
    tf = words.groupBy("term").agg(F.count("*").alias("f"))
    hapax = tf.agg(
        F.sum((F.col("f") == 1).cast("long")).alias("n_hapax"),
        F.count("*").alias("n_terms"),
    )
    w = Window.orderBy(F.desc("f"), F.asc("term"))
    top = tf.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= _ZIPF_TOPK)
    return top.crossJoin(F.broadcast(hapax)).select(
        "r", "term", "f",
        (F.col("r") * F.col("f")).alias("rf"),
        "n_hapax", "n_terms",
    )


SQL_ZIPF_CHECK = f"""
WITH words AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
  WHERE length(t.term) > 0
),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS f FROM words GROUP BY 1),
hapax AS (
  SELECT CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         count(*) AS n_terms
  FROM tf
),
top AS (
  SELECT term, f, row_number() OVER (ORDER BY f DESC, term) AS r FROM tf
)
SELECT t.r, t.term, t.f, t.r * t.f AS rf, h.n_hapax, h.n_terms
FROM top t CROSS JOIN hapax h
WHERE t.r <= {_ZIPF_TOPK}
"""


# --------------------------------------------------------------------------
# E100 — Weisfeiler-Leman color refinement (`wl_colors`,
# `graph.wl_refinement`): 1-WL neighborhood hashing over the occupied
# 1-degree lattice's 8-adjacency graph — the canonical-form fingerprint
# behind graph-isomorphism tests and GNN expressiveness bounds.  On a
# lattice the stable colors CLASSIFY LOCAL SHAPE: congruent blob
# neighborhoods land in the same class (16 classes over ~8k occupied
# cells at sf0.01), exactly what 1-WL is for.  Two fixed rounds (degree
# labels → h0(own label || sorted neighbor labels)), unrolled into
# MATERIALIZED CTEs.  Graph = the raster_regions adjacency topology.
# --------------------------------------------------------------------------

_WL_ROUNDS = 2


def _wl_lattice_edges(spark, sf_dir):
    geo = geo_events(spark, sf_dir)
    cells = geo.select(
        F.floor(F.col("lon")).cast("long").alias("gx"),
        F.floor(F.col("lat")).cast("long").alias("gy"),
    ).distinct()
    nodes = cells.select(
        "gx", "gy", ((F.col("gx") + 200) * 1000 + F.col("gy") + 200).alias("v")
    )
    tgt = nodes.withColumn(
        "__o",
        F.explode(F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        ])),
    ).select(
        F.col("v").alias("src"),
        (F.col("gx") + F.col("__o.dx")).alias("tx"),
        (F.col("gy") + F.col("__o.dy")).alias("ty"),
    )
    return tgt.join(
        nodes.select(F.col("v").alias("dst"), F.col("gx").alias("tx"),
                     F.col("gy").alias("ty")),
        ["tx", "ty"],
    ).select("src", "dst")


def q_wl_colors(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import wl_refinement

    return wl_refinement(
        _wl_lattice_edges(spark, sf_dir), "src", "dst", n_rounds=_WL_ROUNDS
    )


def _sql_wl_colors() -> str:
    from gotrackmaster_spark.operators.graph import sql_wl_refinement

    cells = f"""SELECT DISTINCT CAST(floor({_LON}) AS BIGINT) AS gx,
       CAST(floor({_LAT}) AS BIGINT) AS gy,
       (CAST(floor({_LON}) AS BIGINT) + 200) * 1000
       + CAST(floor({_LAT}) AS BIGINT) + 200 AS v
FROM events"""
    edges_cte = f"""
  SELECT a.v AS s, b.v AS t
  FROM ({cells}) a,
       (SELECT dx - 1 AS dx, dy - 1 AS dy
        FROM range(3) t1(dx), range(3) t2(dy)
        WHERE NOT (dx = 1 AND dy = 1)) o
  JOIN ({cells}) b ON b.gx = a.gx + o.dx AND b.gy = a.gy + o.dy
"""
    return sql_wl_refinement(edges_cte, n_rounds=_WL_ROUNDS)


SQL_WL_COLORS = _sql_wl_colors()


# --------------------------------------------------------------------------
# E101 — personalized PageRank (`ppr_scores`,
# `graph.personalized_pagerank`): random-walk-with-restart relevance
# from the HOT cells of the transition graph (out-count >= 20) —
# "which cells gravitate toward the hotspots?", the recommendation /
# similar-node primitive.  Teleport mass restricted to seeds, integer
# DIV arithmetic, fixed rounds; MATERIALIZED unrolled-CTE oracle.
# --------------------------------------------------------------------------

_PPR_ROUNDS = 5
_PPR_SEED_MIN = 20


def _ppr_seeds(spark, sf_dir):
    e = _pr_edges(spark, sf_dir)
    return (
        e.groupBy(F.col("src").alias("v"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= _PPR_SEED_MIN)
        .select("v")
    )


def q_ppr_scores(spark, sf_dir):
    from gotrackmaster_spark.operators.graph import personalized_pagerank

    edges = _pr_edges(spark, sf_dir)
    return personalized_pagerank(
        edges, _ppr_seeds(spark, sf_dir), n_rounds=_PPR_ROUNDS
    ).select(F.col("v").alias("cell"), "rank_q")


def _sql_ppr_scores() -> str:
    from gotrackmaster_spark.operators.graph import sql_personalized_pagerank

    edges_cte = f"""
  SELECT src, dst, 1 AS w FROM (
    SELECT (x // {_PR_CELL}) * 100 + (y // {_PR_CELL}) AS src,
           (lead(x) OVER w) // {_PR_CELL} * 100 + (lead(y) OVER w) // {_PR_CELL} AS dst
    FROM (
      SELECT user_id, ts, event_id,
             (event_id * 2654435761) % 1600000 AS x,
             (event_id * 40503 + 7) % 3600000 AS y
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ) WHERE dst IS NOT NULL
"""
    seeds_cte = f"""
  SELECT src AS v FROM ({edges_cte.strip()}) e
  GROUP BY 1 HAVING count(*) >= {_PPR_SEED_MIN}
"""
    inner = sql_personalized_pagerank(edges_cte, seeds_cte, n_rounds=_PPR_ROUNDS)
    return inner.replace(
        f"SELECT v, rank_q FROM r{_PPR_ROUNDS}",
        f"SELECT v AS cell, rank_q FROM r{_PPR_ROUNDS}",
    )


SQL_PPR_SCORES = _sql_ppr_scores()


# --------------------------------------------------------------------------
# E102 — CUBE aggregation (`cube_counts` composite): the full grouping
# lattice over (event_type, weekday) — every combination plus both
# marginals plus the grand total in ONE pass (Spark `cube()` ⇄ DuckDB
# GROUPING SETS), each row tagged with grouping_id so consumers can
# split the lattice.  Completes the multi-granularity SQL surface next
# to `st_rollup`'s hierarchy.
# --------------------------------------------------------------------------


def q_cube_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    wd = F.expr(f"(unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY} + 4) % 7")
    base = ev.select("event_type", wd.alias("weekday"), "value")
    return (
        base.cube("event_type", "weekday")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100.0, 0).cast("long")).alias("value_c"),
            F.grouping_id("event_type", "weekday").cast("long").alias("gid"),
        )
        .select("event_type", "weekday", "n", "value_c", "gid")
    )


SQL_CUBE_COUNTS = f"""
SELECT event_type,
       (epoch_us(ts) // {_US_PER_DAY} + 4) % 7 AS weekday,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS value_c,
       CAST(GROUPING(event_type) * 2 + GROUPING((epoch_us(ts) // {_US_PER_DAY} + 4) % 7)
            AS BIGINT) AS gid
FROM events
GROUP BY CUBE (event_type, (epoch_us(ts) // {_US_PER_DAY} + 4) % 7)
"""


# --------------------------------------------------------------------------
# E103 — transition graph summary (`graph_summary` composite): the
# one-row structural profile of the directed cell-transition graph —
# nodes, distinct edges, self-loops, reciprocated edge count (both
# directions present) with quantized reciprocity, and the Gini
# concentration of edge weights (rank-sum identity).  Reciprocity via
# one self-join on the reversed key; all integers except the rounded
# Gini.
# --------------------------------------------------------------------------


def q_graph_summary(spark, sf_dir):
    from pyspark.sql import Window

    raw = _pr_edges(spark, sf_dir)
    e = raw.groupBy("src", "dst").agg(F.count("*").alias("w"))
    nodes = e.select(F.col("src").alias("v")).union(
        e.select(F.col("dst").alias("v"))
    ).distinct()
    nonself = e.filter(F.col("src") != F.col("dst"))
    recip = nonself.join(
        nonself.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "left_semi",
    )
    w = Window.orderBy("w", "src", "dst")
    ranked = e.withColumn("r", F.row_number().over(w))
    agg = ranked.agg(
        F.count("*").alias("n_edges"),
        F.sum("w").alias("n_transitions"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("n_self"),
        F.sum(F.col("r") * F.col("w")).alias("rank_sum"),
    )
    counts = (
        agg.crossJoin(F.broadcast(nodes.agg(F.count("*").alias("n_nodes"))))
        .crossJoin(F.broadcast(recip.agg(F.count("*").alias("n_recip"))))
    )
    gnum = 2 * F.col("rank_sum") - (F.col("n_edges") + 1) * F.col("n_transitions")
    gden = F.col("n_edges") * F.col("n_transitions")
    return counts.select(
        "n_nodes", "n_edges", "n_transitions", "n_self", "n_recip",
        # pre-division guard (repo convention, cf. cell_diversity): a graph
        # that is all self-loops (or empty) has no non-self edges — both
        # engines return NULL instead of raising DIVIDE_BY_ZERO under ANSI.
        F.expr(
            "CASE WHEN n_edges - n_self > 0"
            " THEN (n_recip * 1000000) DIV (n_edges - n_self) END"
        ).alias("reciprocity_q"),
        F.round(gnum.cast("double") / gden.cast("double"), 6).alias("w_gini_r"),
    )


SQL_GRAPH_SUMMARY = f"""
WITH raw AS (
  SELECT src, dst FROM (
    SELECT (x // {_PR_CELL}) * 100 + (y // {_PR_CELL}) AS src,
           (lead(x) OVER w) // {_PR_CELL} * 100 + (lead(y) OVER w) // {_PR_CELL} AS dst
    FROM (
      SELECT user_id, ts, event_id,
             (event_id * 2654435761) % 1600000 AS x,
             (event_id * 40503 + 7) % 3600000 AS y
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ) WHERE dst IS NOT NULL
),
e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM raw GROUP BY 1, 2),
nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
nonself AS (SELECT src, dst FROM e WHERE src <> dst),
recip AS (
  SELECT a.src, a.dst FROM nonself a
  WHERE EXISTS (SELECT 1 FROM nonself b WHERE b.src = a.dst AND b.dst = a.src)
),
ranked AS (
  SELECT w, src, dst, row_number() OVER (ORDER BY w, src, dst) AS r FROM e
),
agg AS (
  SELECT count(*) AS n_edges,
         CAST(sum(w) AS BIGINT) AS n_transitions,
         CAST(sum(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT) AS n_self,
         CAST(sum(r * w) AS BIGINT) AS rank_sum
  FROM ranked
)
SELECT (SELECT count(*) FROM nodes) AS n_nodes,
       a.n_edges, a.n_transitions, a.n_self,
       (SELECT CAST(count(*) AS BIGINT) FROM recip) AS n_recip,
       CASE WHEN a.n_edges - a.n_self > 0 THEN
         ((SELECT CAST(count(*) AS BIGINT) FROM recip) * 1000000)
         // (a.n_edges - a.n_self) END AS reciprocity_q,
       round(CAST(2 * a.rank_sum - (a.n_edges + 1) * a.n_transitions AS DOUBLE)
             / CAST(a.n_edges * a.n_transitions AS DOUBLE), 6) AS w_gini_r
FROM agg a
"""


# --------------------------------------------------------------------------
# E104 — reciprocal-rank fusion (`rrf_fusion` composite): the standard
# rank-combiner of modern retrieval stacks (BM25 ⊕ a second signal)
# with INTEGER-QUANTIZED contributions — rrf_q = Σ 10⁶ DIV (60 + rank)
# over both rankings (fractional RRF ranks near-ties engine-
# dependently; integer quotients cannot).  Ranking 1 = the engine's
# BM25 over the search terms; ranking 2 = caption length (the
# "longer docs are richer" prior), both ranked deterministically with
# doc_id tie-breaks; docs absent from a ranking contribute 0 (the
# standard RRF convention).  Deterministic top-20 via row_number.
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOPK = 20


def q_rrf_fusion(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    bm = q_bm25_scores(spark, sf_dir)
    r1 = bm.withColumn(
        "rank1",
        F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
    ).select("doc_id", "rank1")
    r2 = docs.withColumn(
        "rank2",
        F.row_number().over(Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))),
    ).select("doc_id", "rank2")
    fused = (
        docs.select("doc_id")
        .join(r1, "doc_id", "left")
        .join(r2, "doc_id", "left")
        .select(
            "doc_id", "rank1", "rank2",
            (
                F.coalesce(F.expr(f"1000000 DIV ({_RRF_K} + rank1)"), F.lit(0))
                + F.coalesce(F.expr(f"1000000 DIV ({_RRF_K} + rank2)"), F.lit(0))
            ).alias("rrf_q"),
        )
    )
    w = Window.orderBy(F.desc("rrf_q"), F.asc("doc_id"))
    return (
        fused.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _RRF_TOPK)
        .select("rk", "doc_id", "rank1", "rank2", "rrf_q")
    )


SQL_RRF_FUSION = f"""
WITH bm AS ({{bm25}}),
r1 AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank1
  FROM bm
),
r2 AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank2
  FROM documents
),
fused AS (
  SELECT d.doc_id, r1.rank1, r2.rank2,
         coalesce(1000000 // ({_RRF_K} + r1.rank1), 0)
         + coalesce(1000000 // ({_RRF_K} + r2.rank2), 0) AS rrf_q
  FROM documents d
  LEFT JOIN r1 ON r1.doc_id = d.doc_id
  LEFT JOIN r2 ON r2.doc_id = d.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rrf_q DESC, doc_id) AS rk FROM fused
)
SELECT rk, doc_id, rank1, rank2, rrf_q FROM ranked WHERE rk <= {_RRF_TOPK}
"""


def _sql_rrf_fusion() -> str:
    return SQL_RRF_FUSION.replace("{bm25}", _sql_bm25_scores())

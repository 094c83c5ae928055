"""Spatial statistics: hotspots, autocorrelation, point-process tests — split from driver_queries.py (round 4 registry
hygiene); star-re-exported by gotrackmaster_spark.driver_queries, which
remains the single public surface.  See driver_queries.py for the
determinism rules every query/oracle pair follows."""

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

from gotrackmaster_spark.dq_common import *  # noqa: F401,F403,E402


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
# E13 — mobility statistics per user: radius of gyration (haversine from
# the rounded centroid), visited-cell entropy, and top-cell share — the
# classic human-mobility metrics, pure codegen.  The centroid table is
# O(users), so the attach join carries no broadcast hint — AQE
# broadcasts when it fits (points never shuffle) and otherwise
# shuffle-joins on user_id, co-partitioned with the per-user rog
# aggregate that follows; both aggregate branches are map-side
# combinable.
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
        geo.join(cent, "user_id")
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
# IEEE and take 6 dp.  The oracle's theta gets a `+ 0` SIGNED-ZERO
# normalization: DuckDB's round() is IEEE and preserves -0.0 (a user
# whose cxy is exactly -0.0, or whose theta rounds to zero from below,
# hashes as "-0"), while Spark's F.round goes through Java BigDecimal
# which has NO signed zero — found live by the sf0.1 parity sweep
# (user 1376: theta_r Spark 0 vs DuckDB -0).  `x + 0` maps -0.0 to
# +0.0 and is exact for every other double.
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
       round(CASE WHEN n > 1 THEN atan2(2 * cxy, cxx - cyy) / 2 END, 4) + 0 AS theta_r,
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
# autocorrelation statistic over the binary lattice black = cnt STRICTLY
# ABOVE the lower-median cell count (the exact order statistic at rank
# (n+1) DIV 2) — scale-FREE binarization: a fixed absolute threshold
# degenerates when the data grows (at sf0.1 every occupied 5° cell
# clears cnt ≥ 5 and WW vanishes — found by the sf0.1 parity sweep).
# At sf0.01 the lower median is 4, so cnt > 4 ≡ the old cnt ≥ 5 and the
# output is bit-identical to the previous fixed-threshold definition.
# One occupancy pass over the 0/1 indicator; observed BB/BW/WW exact
# integers, expectations exact-int ratios under nonfree
# (hypergeometric) sampling.
# --------------------------------------------------------------------------


def q_join_counts(spark, sf_dir):
    from gotrackmaster_spark.operators.spatial import (
        join_counts,
        join_counts_median_thr,
    )

    cells = join_counts_median_thr(_hot_cells(geo_events(spark, sf_dir)))
    return join_counts(cells, F.col("__thr"))


SQL_JOIN_COUNTS = f"""
WITH {GEO_CTE},
rawcells AS (
  SELECT CAST(floor(lon / {_HOT_G}) AS BIGINT) AS gx,
         CAST(floor(lat / {_HOT_G}) AS BIGINT) AS gy,
         count(*) AS cnt
  FROM geo GROUP BY 1, 2
),
med AS (
  SELECT cnt + 1 AS thr FROM (
    SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn,
           count(*) OVER () AS n
    FROM rawcells
  ) WHERE rn = (n + 1) // 2
),
cells AS (
  SELECT gx, gy,
         CASE WHEN cnt >= (SELECT thr FROM med) THEN 1 ELSE 0 END AS cnt
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


__all__ = [
    "q_od_matrix",
    "SQL_OD_MATRIX",
    "q_dwell_cells",
    "SQL_DWELL_CELLS",
    "_FOCAL_N",
    "q_focal_density",
    "SQL_FOCAL_DENSITY",
    "_DBSCAN_EPS",
    "_DBSCAN_MIN_PTS",
    "blob_points",
    "_SQL_BLOB_PTS",
    "q_dbscan_clusters",
    "SQL_DBSCAN_CLUSTERS",
    "q_colocation_pairs",
    "SQL_COLOCATION_PAIRS",
    "q_idw_interpolation",
    "SQL_IDW_INTERPOLATION",
    "q_density_raster_stats",
    "SQL_DENSITY_RASTER_STATS",
    "q_mobility_stats",
    "_MOB_HAV",
    "SQL_MOBILITY_STATS",
    "_RET_BUCKET_US",
    "q_cell_retention",
    "SQL_CELL_RETENTION",
    "q_st_rollup",
    "SQL_ST_ROLLUP",
    "_HOT_G",
    "_hot_cells",
    "q_hotspot_cells",
    "SQL_HOTSPOT_CELLS",
    "q_moran_i",
    "SQL_MORAN_I",
    "q_lisa_cells",
    "SQL_LISA_CELLS",
    "q_trend_cells",
    "SQL_TREND_CELLS",
    "_RIPLEY_RADII",
    "_RIPLEY_AREA",
    "q_ripley_k",
    "_RIPLEY_G",
    "_RIPLEY_COUNTS",
    "_RIPLEY_LADDER",
    "SQL_RIPLEY_K",
    "_KNOX_DELTA",
    "_KNOX_TAU_US",
    "_knox_layout",
    "q_knox_stat",
    "SQL_KNOX_STAT",
    "_VARIO_EDGES",
    "q_semivariogram",
    "_VARIO_G",
    "_VARIO_BANDS",
    "_VARIO_COUNTS",
    "_VARIO_LADDER",
    "SQL_SEMIVARIOGRAM",
    "q_sd_ellipses",
    "SQL_SD_ELLIPSES",
    "q_emerging_hotspots",
    "SQL_EMERGING_HOTSPOTS",
    "q_geary_c",
    "_STAT_CELLS_CTE",
    "SQL_GEARY_C",
    "q_general_g",
    "SQL_GENERAL_G",
    "q_join_counts",
    "SQL_JOIN_COUNTS",
    "q_bivariate_moran",
    "SQL_BIVARIATE_MORAN",
    "_KDE_CELL",
    "_KDE_R",
    "_KDE_Q",
    "q_kde_raster",
    "SQL_KDE_RASTER",
    "_SFCA_RADIUS",
    "_SFCA_SCALE",
    "q_accessibility_2sfca",
    "SQL_ACCESSIBILITY_2SFCA",
    "_CE_RMAX",
    "_CE_AREA",
    "_CE_QUANT",
    "q_clark_evans",
    "SQL_CLARK_EVANS",
    "_GFN_STEP",
    "_GFN_BANDS",
    "q_nn_gfunction",
    "SQL_NN_GFUNCTION",
    "_QT_CELL",
    "_QT_W",
    "_QT_H",
    "_QT_NQ",
    "q_quadrat_test",
    "SQL_QUADRAT_TEST",
    "_XK_RADII",
    "_XK_AREA",
    "_XK_G",
    "q_cross_k",
    "_XK_COUNTS",
    "_XK_LADDER",
    "SQL_CROSS_K",
    "q_theil_sen",
    "SQL_THEIL_SEN",
    "q_movement_rose",
    "SQL_MOVEMENT_ROSE",
    "_GRAV_QUANT",
    "q_gravity_od",
    "_GRAV_NUM",
    "_GRAV_EXP",
    "SQL_GRAVITY_OD",
    "_STK_CELL",
    "_STK_R",
    "_STK_TBIN",
    "_STK_RT",
    "_STK_QS",
    "_STK_QT",
    "q_stkde",
    "SQL_STKDE",
    "_AD_LEVEL",
    "_AD_N",
    "q_areal_disagg",
    "SQL_AREAL_DISAGG",
    "_CFV_CELL",
    "q_cell_flow_vectors",
    "SQL_CELL_FLOW_VECTORS",
    "q_user_burstiness",
    "SQL_USER_BURSTINESS",
    "_KM_K",
    "_KM_ROUNDS",
    "q_kmeans_clusters",
    "_sql_kmeans_clusters",
    "SQL_KMEANS_CLUSTERS",
    "_QT_MIN",
    "_QT_MAX",
    "_QT_CAP",
    "q_quadtree_hist",
    "_sql_quadtree_hist",
    "SQL_QUADTREE_HIST",
    "q_cell_diversity",
    "SQL_CELL_DIVERSITY",
    "_BOX_SCALES",
    "q_box_counting",
    "SQL_BOX_COUNTING",
    "_CL_LEVEL",
    "_bound_cl_cache",
    "q_curve_locality",
    "_sql_curve_locality",
    "SQL_CURVE_LOCALITY",
]

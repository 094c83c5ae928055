"""Iterative graph queries (doubling, peeling, power iteration, frontier) — split from driver_queries.py (round 4 registry
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
# E103 — transition graph summary (`graph_summary` composite): the
# one-row structural profile of the directed cell-transition graph —
# nodes, distinct edges, self-loops, reciprocated edge count (both
# directions present) with quantized reciprocity, and the Gini
# concentration of edge weights (rank-sum identity).  Reciprocity via
# one self-join on the reversed key; all integers except the rounded
# Gini.
#
# Scale note (the skew_profile fold, applied here too): rank_sum over
# (w, src, dst)-ranked edges is TIE-INVARIANT in w — edges sharing a
# weight occupy a contiguous rank run and contribute w·Σr regardless
# of intra-tie order — so it folds onto the per-weight HISTOGRAM:
# rank_sum = Σ_w w·(g_w·lo_w + g_w(g_w+1)/2).  No window touches the
# O(edges) table (10⁹+ distinct edges at corpus scale); the only
# ordered window runs over the (w, g_w) histogram — O(distinct
# weights) ≤ O(√n_transitions) rows.  Exact integer identity, so the
# output is bit-identical to the ranked formulation, which the DuckDB
# twin keeps (parity-pinned).
# --------------------------------------------------------------------------


_bound_gs_cache = make_bounded_cache()


def q_graph_summary(spark, sf_dir):
    from pyspark.sql import Window

    raw = _pr_edges(spark, sf_dir)
    # 4 readers (nodes union ×2 via distinct, nonself ×2, hist) — bounded
    # cache so the events scan + lag window runs once, not four times.
    e = _bound_gs_cache(
        raw.groupBy("src", "dst").agg(F.count("*").alias("w"))
    )
    nodes = e.select(F.col("src").alias("v")).union(
        e.select(F.col("dst").alias("v"))
    ).distinct()
    nonself = e.filter(F.col("src") != F.col("dst"))
    recip = nonself.join(
        nonself.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "left_semi",
    )
    hist = e.groupBy("w").agg(
        F.count("*").alias("g"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("selfs"),
    )
    wlo = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, -1)
    hist2 = hist.select(
        "w", "g", "selfs",
        F.coalesce(F.sum("g").over(wlo), F.lit(0)).alias("lo"),
    )
    agg = hist2.agg(
        F.sum("g").alias("n_edges"),
        F.sum(F.col("w") * F.col("g")).alias("n_transitions"),
        F.sum("selfs").alias("n_self"),
        F.sum(F.expr("w * (g * lo + (g * (g + 1)) DIV 2)")).alias("rank_sum"),
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


__all__ = [
    "q_d8_basins",
    "_D8_DX_SQL",
    "_D8_DY_SQL",
    "SQL_D8_BASINS",
    "q_markov_transitions",
    "SQL_MARKOV_TRANSITIONS",
    "_TRI_MIN_SHARED",
    "q_triangle_counts",
    "SQL_TRIANGLE_COUNTS",
    "_PR_CELL",
    "_PR_ROUNDS",
    "_pr_edges",
    "q_pagerank_cells",
    "_sql_pagerank_cells",
    "SQL_PAGERANK_CELLS",
    "_BFS_N",
    "_BFS_SEED_MIN",
    "_BFS_MAX_ROUNDS",
    "q_bfs_hops",
    "SQL_BFS_HOPS",
    "_SSSP_N",
    "_SSSP_SEED_MIN",
    "_SSSP_CAP",
    "q_sssp_costs",
    "SQL_SSSP_COSTS",
    "_D8_STEP_SQL",
    "q_d8_flow_length",
    "SQL_D8_FLOW_LENGTH",
    "_LP_MIN_COMMON",
    "q_link_prediction",
    "SQL_LINK_PREDICTION",
    "_KCORE_K",
    "_KCORE_ROUNDS",
    "q_kcore_nodes",
    "_sql_kcore_nodes",
    "SQL_KCORE_NODES",
    "q_degree_assortativity",
    "SQL_DEGREE_ASSORTATIVITY",
    "_WL_ROUNDS",
    "_wl_lattice_edges",
    "q_wl_colors",
    "_sql_wl_colors",
    "SQL_WL_COLORS",
    "_PPR_ROUNDS",
    "_PPR_SEED_MIN",
    "_ppr_seeds",
    "q_ppr_scores",
    "_sql_ppr_scores",
    "SQL_PPR_SCORES",
    "_bound_gs_cache",
    "q_graph_summary",
    "SQL_GRAPH_SUMMARY",
]

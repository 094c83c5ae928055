"""Relational/statistical composites over events and TPC-H tables — split from driver_queries.py (round 4 registry
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
from gotrackmaster_spark.operators.importer import custom_format_sql  # noqa: E402


def q_embedding_topk(spark, sf_dir):
    return D.embedding_topk(_t(spark, sf_dir, "embeddings"), k=10, query_mod=50)


def q_track_profiles(spark, sf_dir):
    from gotrackmaster_spark.operators.quality import track_profiles

    pts = synthetic_tracks(spark, sf_dir)
    return track_profiles(pts).select(
        "track_id", "time_quality", "distance_quality", "srtm_accuracy",
        "quality", "classification", "n_points",
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
    """FixTimes repair counters over tracks with PLANTED time spikes —
    the clean synthetic walk produced num_fixes ≡ 0 (degenerate: the
    kernel's repair arm never ran).  Every pt_idx % 11 == 5 interior
    point now jumps +2 h (> the kernel's 1 h max_valid horizon), so
    fix_times_segment repairs it by interpolation and the per-track
    counters are non-trivial.  Exact kernel semantics stay pinned by
    the carlos 39-fix golden in tests/test_fixture_parity.py."""
    from gotrackmaster_spark.operators.repair import count_time_fixes

    pts = synthetic_tracks(spark, sf_dir)
    spike = (F.col("pt_idx") % 11 == 5) & (F.col("pt_idx") > 0)
    pts = pts.withColumn(
        "ts_ns",
        F.when(spike, F.col("ts_ns") + F.lit(7_200_000_000_000))  # +2 h in ns
        .otherwise(F.col("ts_ns")),
    ).withColumn("ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")))
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
    # incremental_refresh returns None when no partition changed (an empty
    # merge batch — valid input); the view is then consistent with latest
    s1 = m1["metrics"]["src_snapshot_id"] if m1 else cat.manifest("t")["snapshot_id"]

    # batch 2: delete every event_id % 13 == 0 row
    dels = geo_events(spark, sf_dir).filter(F.col("event_id") % 13 == 0).select(
        "event_id",
        (F.col("user_id") % _MERGE_NPART).cast("string").alias("part"),
        F.lit(0.0).alias("value"),
    )
    cat.merge(spark, "t", dels, key_cols=["part", "event_id"], when_matched="delete")
    incremental_refresh(spark, cat, "t", "v", _iv_transform, s1)
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
    # try_cast + BETWEEN 1 AND 9, not a plain cast + isNotNull:
    #  * a value that rounds to exactly 0 cents yields digit 0 (no first
    #    significant digit), and ANSI element_at(arr, 0) ERRORS — fires
    #    at sf0.1 (one |value| < 0.005 event), found by the sf0.1 parity
    #    sweep;
    #  * a NEGATIVE value's leading character is "-", and under ANSI a
    #    plain cast("int") ERRORS on it instead of yielding NULL (found
    #    by the planted-data regression test).  Negatives carry no
    #    Benford digit here by design — they are excluded, mirroring
    #    TRY_CAST in the DuckDB twin.
    digit = F.substring(cents.cast("string"), 1, 1).try_cast("int")
    per = (
        ev.select(digit.alias("digit"))
        .filter(F.col("digit").between(1, 9))
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
  SELECT TRY_CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit
  FROM events
),
per AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n
  FROM d WHERE digit BETWEEN 1 AND 9 GROUP BY digit
)
SELECT digit, n,
       n / sum(n) OVER () AS share,
       {_BENFORD_ARR}[digit] AS expected,
       n / sum(n) OVER () - {_BENFORD_ARR}[digit] AS deviation
FROM per
"""


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
# E37 — ordered conversion funnel (`funnel_steps` composite): how many
# users performed signup → click → purchase IN ORDER?  Stage k's
# earliest valid timestamp = min ts of a stage-k event AFTER stage
# k-1's — sequential per-user min-struct aggregates, each stage a
# user-keyed join of the (type-filtered) events against the previous
# stage's 1-row-per-user table (the SAME shape the DuckDB twin uses).
# An earlier formulation collected EVERY event of a user into one
# array (collect_list) and filtered it with higher-order functions —
# one power user with 10⁷ events materializes a 10⁷-element array in a
# single aggregation buffer; the join form keeps per-row state O(1)
# and all three joins + aggregates share the user_id partitioning.
# Struct comparison k > k1 is lexicographic (ts, event_id) — identical
# tie semantics in both engines.
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ("signup", "click", "purchase")


def q_funnel_steps(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    base = ev.select("user_id", "event_type", key.alias("k"))
    s1 = (
        base.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("k").alias("k1"))
    )
    s2 = (
        base.filter(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("k") > F.col("k1"))
        .groupBy("user_id")
        .agg(F.min("k").alias("k2"))
    )
    s3 = (
        base.filter(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("k") > F.col("k2"))
        .groupBy("user_id")
        .agg(F.min("k").alias("k3"))
    )
    # 1-row scalar attaches (BNLJ-allowlisted convention)
    return (
        base.agg(F.countDistinct("user_id").alias("n_users"))
        .crossJoin(F.broadcast(s1.agg(F.count("*").alias("n_step1"))))
        .crossJoin(F.broadcast(s2.agg(F.count("*").alias("n_step2"))))
        .crossJoin(F.broadcast(s3.agg(F.count("*").alias("n_step3"))))
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
# E40 — cohort retention matrix (`cohort_retention` composite): users
# cohorted by first-event week; matrix cell (cohort, offset) = distinct
# users of that cohort active offset weeks later.  Two occupancy
# aggregates + one user-keyed join of the per-user cohort table — the
# product-analytics classic, all exact ints.  The cohort table is
# O(users) (10⁹ at corpus scale) so it is NOT force-broadcast: AQE
# broadcasts it when it fits and shuffle-joins co-partitioned with the
# downstream user-keyed aggregate when it doesn't.
# --------------------------------------------------------------------------

_US_PER_WEEK = 7 * 86_400_000_000


def q_cohort_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    week = F.expr(f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_WEEK}")
    act = ev.select("user_id", week.alias("week")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    j = act.join(cohort, "user_id")
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
    # pre-division guard (ANSI mode): one empty stratum => NULL like the
    # oracle, don't raise (K=1 degenerate sweep).  Guard each factor
    # separately and multiply as doubles — an int64 n1*n2 product would
    # itself overflow under ANSI before any > 0 comparison applied once
    # per-stratum cardinalities pass 2^63 (plausible at 100 TB).
    return d.select(
        "n1", "n2", "d_num",
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double")),
                6,
            ),
        ).alias("d_r"),
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
       CASE WHEN max(t.n1) > 0 AND max(t.n2) > 0
            THEN round(CAST(max(abs(c.c1 * t.n2 - c.c2 * t.n1)) AS DOUBLE)
                       / (CAST(max(t.n1) AS DOUBLE) * CAST(max(t.n2) AS DOUBLE)), 6)
       END AS d_r
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
    # pre-division guard (ANSI mode): one empty stratum => NULL like the
    # oracle, don't raise (K=1 degenerate sweep).  Guard each factor
    # separately and multiply as doubles — the int64 n1*n2 product would
    # overflow under ANSI before the > 0 comparison once the per-stratum
    # cardinalities pass 2^63 (plausible at 100 TB).
    return agg.select(
        "n1", "n2", "u2x",
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            F.round(
                F.col("u2x").cast("double")
                / (F.lit(2.0) * F.col("n1").cast("double") * F.col("n2").cast("double")),
                6,
            ),
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
       CASE WHEN sum(a) > 0 AND sum(b) > 0
            THEN round(CAST(sum(a * (2 * b_less + b)) AS DOUBLE)
                       / (2.0 * CAST(sum(a) AS DOUBLE) * CAST(sum(b) AS DOUBLE)), 6)
       END AS u_r
FROM cum
"""


# --------------------------------------------------------------------------
# E83 — shipping priority (`shipping_priority` composite): the TPC-H
# Q3-shaped top-k — BUILDING-segment orders not yet fully shipped at
# the cutoff, ranked by outstanding revenue in EXACT INTEGER CENTS
# (the regional_revenue rounding contract), deterministic top-10 via
# (revenue DESC, orderkey) order.  Broadcast customer dim, one
# orderkey shuffle.  The top-k itself is orderBy().limit(k) — Spark
# plans TakeOrderedAndProject (per-partition partial top-k, k rows to
# the driver-side merge), NOT a global row_number window that would
# funnel every aggregated order through one task; ranks are then
# assigned over the k-row result (a 10-row window, the movement_rose
# convention).  Same rows, same rk, scale-safe plan.
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
    topk = agg.orderBy(F.desc("revenue_cents"), F.asc("l_orderkey")).limit(
        _Q3_TOPK
    )
    w = Window.orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
    return (
        topk.withColumn("rk", F.row_number().over(w))
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
    # verdict is O(users) — no forced broadcast (the 128-bit `bits` set
    # above IS broadcast: it is bounded by the filter size _BL_M).
    ev_tag = ev.select("user_id").join(verdict, "user_id")
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
    # top-k via orderBy().limit() → TakeOrderedAndProject (distributed
    # partial top-k), not a global row_number window over the vocab-sized
    # tf table; ranks assigned over the 20-row result.
    topk = tf.orderBy(F.desc("f"), F.asc("term")).limit(_ZIPF_TOPK)
    w = Window.orderBy(F.desc("f"), F.asc("term"))
    top = topk.withColumn("r", F.row_number().over(w))
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


def _rank_two_level(df, key, out):
    """Exact global row_number over (``key`` DESC, doc_id ASC) WITHOUT an
    unpartitioned window over the whole table — the pps_sample/skew_profile
    two-level convention applied to ranking:

    * within-tie rank: ``row_number`` partitioned BY the key (ordered by
      doc_id) — a normal key-shuffled window, never one global task;
    * offset: #rows with a strictly greater key, from the per-key count
      histogram via an exclusive cumulative window over O(distinct key)
      rows (≤ O(√n) for integer-quantized scores);
    * rank = offset + within-tie rank, attached with a plain equi-join on
      the SAME key the window shuffled on (co-partitioned; NOT broadcast —
      the offset table is O(distinct key), which for near-unique keys is
      O(rows): broadcasting it would be the r2 ``broadcast(sizes)``
      anti-pattern).

    Exact integer identity ⇒ bit-identical to the global-window form (the
    DuckDB twin keeps the one-level SQL; parity pins it).  Residual skew:
    a single pathological tie group (every doc the same score) concentrates
    one window partition — still strictly better than the global window,
    which concentrates ALL rows ALWAYS.
    """
    from pyspark.sql import Window

    win = Window.partitionBy(key).orderBy(F.asc("doc_id"))
    inner = df.select("doc_id", key).withColumn(
        "_ir", F.row_number().over(win)
    )
    woff = Window.orderBy(F.desc(key)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        df.groupBy(key)
        .agg(F.count("*").alias("_g"))
        .select(key, F.coalesce(F.sum("_g").over(woff), F.lit(0)).alias("_off"))
    )
    return inner.join(offs, key).select(
        "doc_id", (F.col("_off") + F.col("_ir")).cast("int").alias(out)
    )


def q_rrf_fusion(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    bm = q_bm25_scores(spark, sf_dir)
    r1 = _rank_two_level(bm, "score", "rank1")
    r2 = _rank_two_level(docs, "n_chars", "rank2")
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
    # exact top-k via orderBy().limit() → TakeOrderedAndProject
    # (distributed partial top-k), not a global row_number window over
    # the fused O(docs) table; ranks assigned over the k-row result.
    topk = fused.orderBy(F.desc("rrf_q"), F.asc("doc_id")).limit(_RRF_TOPK)
    w = Window.orderBy(F.desc("rrf_q"), F.asc("doc_id"))
    return (
        topk.withColumn("rk", F.row_number().over(w))
        .select("rk", "doc_id", "rank1", "rank2", "rrf_q")
    )


__all__ = [
    "custom_format_sql",
    "q_embedding_topk",
    "q_track_profiles",
    "_DIR_FMT",
    "_ARC_FMT",
    "_KINDS",
    "q_import_paths",
    "_sql_corner_tiles",
    "SQL_IMPORT_PATHS",
    "q_scalar_ops",
    "SQL_SCALAR_OPS",
    "tz_band_polygons",
    "q_tz_localized",
    "SQL_TZ_LOCALIZED",
    "q_fix_counters",
    "q_embedding_neardup",
    "SQL_EMBEDDING_NEARDUP",
    "q_embedding_ivf_topk",
    "SQL_EMBEDDING_IVF_TOPK",
    "q_embedding_lsh_topk",
    "SQL_EMBEDDING_LSH_TOPK",
    "q_filter_funnel",
    "SQL_FILTER_FUNNEL",
    "q_asof_state",
    "SQL_ASOF_STATE",
    "_SESSION_GAP_US",
    "q_sessionized",
    "SQL_SESSIONIZED",
    "q_value_percentiles",
    "SQL_VALUE_PERCENTILES",
    "q_cms_estimates",
    "_sql_cms_estimates",
    "SQL_CMS_ESTIMATES",
    "_BIGRAM_EXPR",
    "q_distinct_sketch",
    "_sql_distinct_sketch",
    "SQL_DISTINCT_SKETCH",
    "_SAMPLE_N",
    "q_stratified_sample",
    "_sql_stratified_sample",
    "SQL_STRATIFIED_SAMPLE",
    "_IV_EPOCH",
    "_IV_STEP_S",
    "_IV_UNIT_US",
    "_IV_BUCKET_S",
    "q_interval_events",
    "SQL_INTERVAL_EVENTS",
    "q_props_stats",
    "SQL_PROPS_STATS",
    "q_table_profile",
    "SQL_TABLE_PROFILE",
    "_MERGE_NPART",
    "_merge_base",
    "_merge_source",
    "q_merge_upsert",
    "SQL_MERGE_UPSERT",
    "_iv_transform",
    "q_incremental_view",
    "SQL_INCREMENTAL_VIEW",
    "q_ohlc_bars",
    "SQL_OHLC_BARS",
    "q_type_runs",
    "SQL_TYPE_RUNS",
    "_BENFORD_EXP",
    "q_benford_digits",
    "_BENFORD_ARR",
    "SQL_BENFORD_DIGITS",
    "q_snapshot_changelog",
    "SQL_SNAPSHOT_CHANGELOG",
    "_RAU_WINDOW",
    "q_rolling_active_users",
    "SQL_ROLLING_ACTIVE_USERS",
    "_FUNNEL_STEPS",
    "q_funnel_steps",
    "SQL_FUNNEL_STEPS",
    "_CHI_LANGS",
    "_CHI_FMTS",
    "q_chi2_contingency",
    "_sql_chi2",
    "SQL_CHI2_CONTINGENCY",
    "_US_PER_WEEK",
    "q_cohort_retention",
    "SQL_COHORT_RETENTION",
    "q_value_mad",
    "_MAD_RANKSEL",
    "SQL_VALUE_MAD",
    "q_skyline_events",
    "SQL_SKYLINE_EVENTS",
    "q_cusum_changepoints",
    "SQL_CUSUM_CHANGEPOINTS",
    "q_seasonal_anomalies",
    "SQL_SEASONAL_ANOMALIES",
    "q_stratum_tv_distance",
    "SQL_STRATUM_TV_DISTANCE",
    "q_ols_trends",
    "SQL_OLS_TRENDS",
    "q_regional_revenue",
    "SQL_REGIONAL_REVENUE",
    "q_lag_autocorr",
    "SQL_LAG_AUTOCORR",
    "_AR_QUANT",
    "_AR_MIN_SUP",
    "q_assoc_rules",
    "SQL_ASSOC_RULES",
    "_bound_kt_cache",
    "q_kendall_tau",
    "SQL_KENDALL_TAU",
    "q_gini_coefficient",
    "SQL_GINI_COEFFICIENT",
    "_ks_groups",
    "q_ks_statistic",
    "SQL_KS_STATISTIC",
    "q_mann_whitney",
    "SQL_MANN_WHITNEY",
    "_Q3_SEGMENT",
    "_Q3_CUTOFF",
    "_Q3_TOPK",
    "q_shipping_priority",
    "SQL_SHIPPING_PRIORITY",
    "_PPS_K",
    "_PPS_SHARD_W",
    "q_pps_sample",
    "SQL_PPS_SAMPLE",
    "_BL_M",
    "_BL_P",
    "_BL_HASHES",
    "_BL_MOD",
    "q_bloom_semijoin",
    "_bl_pos_sql",
    "SQL_BLOOM_SEMIJOIN",
    "_RM_W",
    "q_rolling_median",
    "SQL_ROLLING_MEDIAN",
    "_WI_THRESH",
    "_WI_Z",
    "q_wilson_bounds",
    "_WI_Z2",
    "SQL_WILSON_BOUNDS",
    "_ACF_LAGS",
    "q_acf_profile",
    "SQL_ACF_PROFILE",
    "_skew_one",
    "q_skew_profile",
    "_sql_skew_one",
    "_sql_skew_profile",
    "SQL_SKEW_PROFILE",
    "q_pricing_summary",
    "SQL_PRICING_SUMMARY",
    "q_small_qty_revenue",
    "SQL_SMALL_QTY_REVENUE",
    "q_trimmed_mean",
    "SQL_TRIMMED_MEAN",
    "_ZIPF_TOPK",
    "q_zipf_check",
    "SQL_ZIPF_CHECK",
    "q_cube_counts",
    "SQL_CUBE_COUNTS",
    "_rank_two_level",
    "q_rrf_fusion",
]

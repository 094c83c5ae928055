"""E1b — S2-style cube-face cell index with a Hilbert space-filling curve.

The north rule names "H3/S2 index"; ``functions.cells`` provides the
equirectangular Z-order quadtree (great for oracle-exact bit math, but its
cells shrink toward the poles).  This module adds the genuine S2 shape —
public-domain geometry, written from the published construction (S2
geometry docs; Hilbert curve per the classic Wikipedia ``xy2d`` loop), not
from any library source:

* project (lat, lon) onto the unit cube gnomonically: 6 faces — 4 side
  faces picked by exact 90° longitude quadrants (the cube's vertical edges
  project to the ±45°/±135° meridians), polar faces where
  ``|tan lat| > cos(lon − face_center)``;
* per-face (u, v) ∈ [−1, 1]² via tangent-plane ratios (side:
  ``u = tan λ'``, ``v = tan φ / cos λ'``; polar: ``u = sin λ / |tan φ|``,
  ``v = ∓cos λ / |tan φ|``);
* S2's quadratic reprojection ``s = u≥0 ? √(1+3u)/2 : 1−√(1−3u)/2`` which
  roughly equalizes cell areas (the point of the cube construction);
* quantize to 2^L × 2^L and walk the HILBERT curve (not Z): neighboring
  cell IDs are neighboring squares, so range-partitioning by cell ID gives
  contiguous, compact shards — the property S2 itself is built on;
* ``cell = marker | face·4^L | d`` with the trailing-marker level trick
  shared with ``cells.py``: ``parent = cell >> 2`` (Hilbert positions
  nest: a parent's four children are consecutive in d), faces preserved.

Three mirrors with IDENTICAL arithmetic: numpy, pyspark Column (chained
per-step via ``with_s2_cell`` so Catalyst sees linear-size expressions),
and a DuckDB SQL CTE-chain generator for the driver oracle.  The only
float ops are tan/cos/sin/sqrt/div on bit-identical double inputs — both
engines' libm agree to ≤1 ulp and a flip would additionally need the
quadratic value to land within 2^-44 of a 2^-L grid line, so the mirrors
are equal in practice on the synthetic grids (asserted by tests and the
driver gate, like every other float-bearing oracle in this repo).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_S2_LEVEL = 29  # 3 face bits + 2L + marker < 63

_PI = math.pi


# ----------------------------------------------------------------- numpy ---

def _face_uv_np(lat: np.ndarray, lon: np.ndarray):
    """(face, u, v) for degree arrays.  Face layout: 0 lon∈[−45,45),
    1 [45,135), 2 [135,180]∪[−180,−135), 3 [−135,−45), 4 north, 5 south."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    side = np.where(
        (lon >= -45.0) & (lon < 45.0), 0,
        np.where((lon >= 45.0) & (lon < 135.0), 1,
                 np.where((lon >= -135.0) & (lon < -45.0), 3, 2)),
    ).astype(np.int64)
    center = np.choose(side, [0.0, 90.0, 180.0, -90.0])
    dlon = lon - center
    dlon = np.where(dlon < -180.0, dlon + 360.0, dlon)  # face 2 wrap

    lat_r = lat / 180.0 * _PI
    dlon_r = dlon / 180.0 * _PI
    lon_r = lon / 180.0 * _PI
    t = np.tan(lat_r)
    c = np.cos(dlon_r)

    north = t > c
    south = t < -c
    face = np.where(north, 4, np.where(south, 5, side)).astype(np.int64)

    # side faces: gnomonic onto the tangent plane at (0, center)
    u_side = np.tan(dlon_r)
    v_side = np.where(north | south, 0.0, t / c)
    # polar faces: gnomonic from the pole; |t| >= |cos dlon| > 0 there
    at = np.abs(t)
    safe = np.where(north | south, at, 1.0)
    u_pole = np.sin(lon_r) / safe
    v_pole_n = -np.cos(lon_r) / safe
    v_pole_s = np.cos(lon_r) / safe

    u = np.where(north | south, u_pole, u_side)
    v = np.where(north, v_pole_n, np.where(south, v_pole_s, v_side))
    return face, u, v


def _st_np(u: np.ndarray) -> np.ndarray:
    """S2 quadratic projection [−1,1] → [0,1]."""
    with np.errstate(invalid="ignore"):  # unused np.where branch hits sqrt(<0)
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def hilbert_d_np(i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Hilbert curve position of (i, j) on the 2^level grid (classic xy2d)."""
    i = np.asarray(i, dtype=np.int64).copy()
    j = np.asarray(j, dtype=np.int64).copy()
    n = np.int64(1 << level)
    d = np.zeros_like(i)
    s = np.int64(1 << (level - 1))
    while s > 0:
        rx = ((i & s) > 0).astype(np.int64)
        ry = ((j & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate: when ry==0 flip (if rx==1) then swap i/j
        fi = np.where((ry == 0) & (rx == 1), n - 1 - i, i)
        fj = np.where((ry == 0) & (rx == 1), n - 1 - j, j)
        i = np.where(ry == 0, fj, fi)
        j = np.where(ry == 0, fi, fj)
        s >>= 1
    return d


def s2_cell_np(lat, lon, level: int) -> np.ndarray:
    """lat/lon degree arrays → int64 S2-style cell IDs at ``level``."""
    face, u, v = _face_uv_np(lat, lon)
    n = float(1 << level)
    i = np.clip(np.floor(_st_np(u) * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(_st_np(v) * n), 0, n - 1).astype(np.int64)
    d = hilbert_d_np(i, j, level)
    marker = np.int64(1) << np.int64(3 + 2 * level)
    return marker | (face << np.int64(2 * level)) | d


def s2_parent(cell, steps: int = 1):
    """Parent ``steps`` levels up — ints, arrays, or Columns (same trailing
    marker trick as cells.cell_parent; Hilbert children are consecutive)."""
    if isinstance(cell, Column):
        return F.shiftright(cell, 2 * steps)
    return cell >> (2 * steps)


# ---------------------------------------------------------------- Column ---

def with_s2_cell(
    df: DataFrame, lat: Column, lon: Column, level: int, out: str = "s2_cell"
) -> DataFrame:
    """Append column ``out`` with the S2-style cell ID.  The Hilbert loop is
    unrolled as chained intermediate columns (linear-size plan, all
    whole-stage codegen; no Python).  Identical arithmetic to s2_cell_np."""
    pi = F.lit(_PI)
    # stage the trig/face intermediates as REAL columns: each is referenced
    # several times downstream, and Catalyst's CollapseProject keeps
    # multiply-referenced non-cheap expressions staged instead of inlining
    # (one tan/cos/sin evaluation each, compact codegen)
    side = (
        F.when((lon >= -45.0) & (lon < 45.0), F.lit(0))
        .when((lon >= 45.0) & (lon < 135.0), F.lit(1))
        .when((lon >= -135.0) & (lon < -45.0), F.lit(3))
        .otherwise(F.lit(2))
    )
    center = (
        F.when(side == 0, F.lit(0.0))
        .when(side == 1, F.lit(90.0))
        .when(side == 3, F.lit(-90.0))
        .otherwise(F.lit(180.0))
    )
    dlon0 = lon - center
    df = (
        df.withColumn("__s2lat", lat)
        .withColumn("__s2lon", lon)
        .withColumn("__s2side", side)
        .withColumn("__s2dlon", F.when(dlon0 < -180.0, dlon0 + 360.0).otherwise(dlon0))
        .withColumn("__s2t", F.tan(F.col("__s2lat") / F.lit(180.0) * pi))
        .withColumn("__s2c", F.cos(F.col("__s2dlon") / F.lit(180.0) * pi))
    )
    t, c = F.col("__s2t"), F.col("__s2c")
    df = (
        df.withColumn("__s2n", t > c)
        .withColumn("__s2s", t < -c)
    )
    north, south = F.col("__s2n"), F.col("__s2s")
    lonc = F.col("__s2lon")
    safe = F.when(north | south, F.abs(t)).otherwise(F.lit(1.0))
    df = (
        df.withColumn(
            "__s2u",
            F.when(north | south, F.sin(lonc / F.lit(180.0) * pi) / safe).otherwise(
                F.tan(F.col("__s2dlon") / F.lit(180.0) * pi)
            ),
        )
        .withColumn(
            "__s2v",
            F.when(north, -F.cos(lonc / F.lit(180.0) * pi) / safe)
            .when(south, F.cos(lonc / F.lit(180.0) * pi) / safe)
            .otherwise(t / c),
        )
    )
    face = F.when(north, F.lit(4)).when(south, F.lit(5)).otherwise(F.col("__s2side"))

    def st(x: Column) -> Column:
        return F.when(
            x >= 0.0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * x)
        ).otherwise(F.lit(1.0) - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * x))

    n = 1 << level
    nf = float(n)
    qi = F.least(
        F.greatest(F.floor(st(F.col("__s2u")) * F.lit(nf)).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    qj = F.least(
        F.greatest(F.floor(st(F.col("__s2v")) * F.lit(nf)).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )

    fcol, icol, jcol, dcol = "__s2f", "__s2i", "__s2j", "__s2d"
    df = (
        df.withColumn(fcol, face.cast("long"))
        .withColumn(icol, qi)
        .withColumn(jcol, qj)
        .withColumn(dcol, F.lit(0).cast("long"))
        .drop(
            "__s2lat", "__s2lon", "__s2side", "__s2dlon", "__s2t", "__s2c",
            "__s2n", "__s2s", "__s2u", "__s2v",
        )
    )
    s = 1 << (level - 1)
    while s > 0:
        i_, j_, d_ = F.col(icol), F.col(jcol), F.col(dcol)
        rx = F.shiftright(i_, int(math.log2(s))).bitwiseAND(F.lit(1))
        ry = F.shiftright(j_, int(math.log2(s))).bitwiseAND(F.lit(1))
        flip = (ry == 0) & (rx == 1)
        fi = F.when(flip, F.lit(n - 1) - i_).otherwise(i_)
        fj = F.when(flip, F.lit(n - 1) - j_).otherwise(j_)
        df = (
            df.withColumn(dcol, d_ + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry))
            .withColumn("__s2ti", F.when(ry == 0, fj).otherwise(fi))
            .withColumn(jcol, F.when(ry == 0, fi).otherwise(fj))
            .withColumn(icol, F.col("__s2ti"))
            .drop("__s2ti")
        )
        s >>= 1
    marker = 1 << (3 + 2 * level)
    cell = (
        F.lit(marker).cast("long")
        .bitwiseOR(F.shiftleft(F.col(fcol), 2 * level))
        .bitwiseOR(F.col(dcol))
    )
    return df.withColumn(out, cell).drop(fcol, icol, jcol, dcol)


# ------------------------------------------------------------------- SQL ---

def s2_sql_ctes(lat: str, lon: str, level: int, src: str, keep: str) -> str:
    """DuckDB CTE chain computing the identical S2-style cell ID.

    ``src`` is the name of an existing CTE/table providing ``lat``/``lon``
    expressions and the passthrough columns in ``keep`` (comma-joined
    select list).  Returns CTE text defining final CTE ``s2done`` with
    columns ``{keep}, s2_cell``; splice into ``WITH {GEO_CTE}, {ctes}``."""
    n = 1 << level
    t = f"tan(({lat}) / 180.0 * pi())"
    side = (
        f"(CASE WHEN ({lon}) >= -45.0 AND ({lon}) < 45.0 THEN 0 "
        f"WHEN ({lon}) >= 45.0 AND ({lon}) < 135.0 THEN 1 "
        f"WHEN ({lon}) >= -135.0 AND ({lon}) < -45.0 THEN 3 ELSE 2 END)"
    )
    head = f"""
s2a AS (
  SELECT {keep}, ({lat}) AS _lat, ({lon}) AS _lon, {side} AS side, {t} AS t
  FROM {src}
),
s2b AS (
  SELECT *, (CASE WHEN _lon - (CASE side WHEN 0 THEN 0.0 WHEN 1 THEN 90.0
                   WHEN 3 THEN -90.0 ELSE 180.0 END) < -180.0
             THEN _lon - (CASE side WHEN 0 THEN 0.0 WHEN 1 THEN 90.0
                   WHEN 3 THEN -90.0 ELSE 180.0 END) + 360.0
             ELSE _lon - (CASE side WHEN 0 THEN 0.0 WHEN 1 THEN 90.0
                   WHEN 3 THEN -90.0 ELSE 180.0 END) END) AS dlon
  FROM s2a
),
s2c AS (
  SELECT *, cos(dlon / 180.0 * pi()) AS c,
         (t > cos(dlon / 180.0 * pi())) AS north,
         (t < -cos(dlon / 180.0 * pi())) AS south
  FROM s2b
),
s2d AS (
  SELECT *,
         (CASE WHEN north THEN 4 WHEN south THEN 5 ELSE side END) AS face,
         (CASE WHEN north OR south
               THEN sin(_lon / 180.0 * pi()) / abs(t)
               ELSE tan(dlon / 180.0 * pi()) END) AS u,
         (CASE WHEN north THEN -cos(_lon / 180.0 * pi()) / abs(t)
               WHEN south THEN cos(_lon / 180.0 * pi()) / abs(t)
               ELSE t / c END) AS v
  FROM s2c
),
s2e AS (
  SELECT {keep}, face,
         least(greatest(CAST(floor((CASE WHEN u >= 0.0
             THEN 0.5 * sqrt(1.0 + 3.0 * u)
             ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END) * {float(n)!r}) AS BIGINT),
             0), {n - 1}) AS i,
         least(greatest(CAST(floor((CASE WHEN v >= 0.0
             THEN 0.5 * sqrt(1.0 + 3.0 * v)
             ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END) * {float(n)!r}) AS BIGINT),
             0), {n - 1}) AS j,
         CAST(0 AS BIGINT) AS d
  FROM s2d
)"""
    ctes = [head]
    prev = "s2e"
    s = 1 << (level - 1)
    step = 0
    while s > 0:
        rx = f"((i >> {int(math.log2(s))}) & 1)"
        ry = f"((j >> {int(math.log2(s))}) & 1)"
        flip = f"({ry} = 0 AND {rx} = 1)"
        fi = f"(CASE WHEN {flip} THEN {n - 1} - i ELSE i END)"
        fj = f"(CASE WHEN {flip} THEN {n - 1} - j ELSE j END)"
        name = f"s2h{step}"
        ctes.append(f"""
{name} AS (
  SELECT {keep}, face,
         (CASE WHEN {ry} = 0 THEN {fj} ELSE {fi} END) AS i,
         (CASE WHEN {ry} = 0 THEN {fi} ELSE {fj} END) AS j,
         d + {s * s} * xor(3 * {rx}, {ry}) AS d
  FROM {prev}
)""")
        prev = name
        s >>= 1
        step += 1
    marker = 1 << (3 + 2 * level)
    ctes.append(f"""
s2done AS (
  SELECT {keep}, ({marker} | (CAST(face AS BIGINT) << {2 * level}) | d) AS s2_cell
  FROM {prev}
)""")
    return ",".join(ctes)


def with_hilbert_d(
    df: DataFrame, i_col: str, j_col: str, level: int, out: str = "h"
) -> DataFrame:
    """Hilbert curve position of integer grid columns ``(i, j)`` on the
    2^level grid — the DataFrame twin of :func:`hilbert_d_np` (same
    xy2d fold).  Each round materializes its i/j/d as NAMED columns:
    nesting them as one expression instead quadruples the tree per
    round (4^level leaves) and stalls codegen for minutes at level 6 —
    the expression-level cousin of the iterative-lineage pitfall.
    Pure bit/CASE math, whole-stage-codegen friendly."""
    n = 1 << level
    df = df.withColumn(out, F.lit(0).cast("long"))
    ci, cj = f"__h_{i_col}", f"__h_{j_col}"
    df = df.withColumn(ci, F.col(i_col)).withColumn(cj, F.col(j_col))
    s = 1 << (level - 1)
    while s > 0:
        sh = s.bit_length() - 1
        i, j = F.col(ci), F.col(cj)
        rx = F.shiftright(i, sh).bitwiseAND(F.lit(1))
        ry = F.shiftright(j, sh).bitwiseAND(F.lit(1))
        flip = (ry == 0) & (rx == 1)
        fi = F.when(flip, F.lit(n - 1) - i).otherwise(i)
        fj = F.when(flip, F.lit(n - 1) - j).otherwise(j)
        df = (
            df.withColumn(out, F.col(out) + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry))
            .withColumn(f"{ci}_n", F.when(ry == 0, fj).otherwise(fi))
            .withColumn(cj, F.when(ry == 0, fi).otherwise(fj))
            .withColumn(ci, F.col(f"{ci}_n"))
            .drop(f"{ci}_n")
        )
        s >>= 1
    return df.drop(ci, cj)


def hilbert_sql_ctes(level: int, src: str, keep: str) -> str:
    """DuckDB CTE chain computing :func:`hilbert_d_col` for an existing
    CTE ``src`` providing integer columns ``i``/``j`` plus the
    passthrough ``keep`` list; final CTE ``hdone`` has ``{keep}, d``."""
    import math as _math

    n = 1 << level
    ctes = [f"h0 AS (SELECT {keep}, i, j, CAST(0 AS BIGINT) AS d FROM {src})"]
    prev = "h0"
    s = 1 << (level - 1)
    step = 1
    while s > 0:
        rx = f"((i >> {int(_math.log2(s))}) & 1)"
        ry = f"((j >> {int(_math.log2(s))}) & 1)"
        flip = f"({ry} = 0 AND {rx} = 1)"
        fi = f"(CASE WHEN {flip} THEN {n - 1} - i ELSE i END)"
        fj = f"(CASE WHEN {flip} THEN {n - 1} - j ELSE j END)"
        name = f"h{step}"
        ctes.append(
            f"{name} AS (SELECT {keep}, "
            f"(CASE WHEN {ry} = 0 THEN {fj} ELSE {fi} END) AS i, "
            f"(CASE WHEN {ry} = 0 THEN {fi} ELSE {fj} END) AS j, "
            f"d + {s * s} * xor(3 * {rx}, {ry}) AS d FROM {prev})"
        )
        prev = name
        s >>= 1
        step += 1
    ctes.append(f"hdone AS (SELECT {keep}, i, j, d FROM {prev})")
    return ",\n".join(ctes)

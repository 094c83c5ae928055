"""Degree-grid tile naming (reference T1/T2) + web-mercator z/x/y tiles (E4).

Reference semantics (`/root/reference/trackmaster/distance.go:376-424`):
``lat -> ('N' if lat>=0 else 'S') + %02.0f(abs(round(lat/deg))*deg)`` — note
**round half away from zero** (Go ``math.Round``), NOT floor: a point at
41.6° with deg=1 lands in tile N42.  Longitude uses E/W and width 3.  When
``deg < 1`` the format gains one decimal (``%02.1f`` / ``%03.1f``).

``CalculateTiles`` (T2) names the 4 bbox corners, deduping in the fixed order
[minlat·minlon, minlat·maxlon, maxlat·minlon, maxlat·maxlon].
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _round_half_away(x: float) -> float:
    # Go math.Round: half away from zero (Python round() is banker's).
    return math.copysign(math.floor(abs(x) + 0.5), x)


def lat_tile_s(lat: float, degree: float) -> str:
    ns = "N" if lat >= 0 else "S"
    part = abs(_round_half_away(lat / degree)) * degree
    return f"{ns}{part:02.1f}" if degree < 1 else f"{ns}{part:02.0f}"


def lon_tile_s(lon: float, degree: float) -> str:
    ew = "E" if lon >= 0 else "W"
    part = abs(_round_half_away(lon / degree)) * degree
    return f"{ew}{part:03.1f}" if degree < 1 else f"{ew}{part:03.0f}"


def calculate_tiles_s(min_lat, max_lat, min_lon, max_lon, degree: float) -> list[str]:
    # distance.go:404-424 — ordered dedup of the 4 corners (1, 2 or 4 tiles).
    lat1 = lat_tile_s(min_lat, degree)
    lon1 = lon_tile_s(min_lon, degree)
    lat2 = lat_tile_s(max_lat, degree)
    lon2 = lon_tile_s(max_lon, degree)
    tiles = [lat1 + lon1]
    if lon1 != lon2:
        tiles.append(lat1 + lon2)
    if lat1 != lat2:
        tiles.append(lat2 + lon1)
    if lat1 != lat2 and lon1 != lon2:
        tiles.append(lat2 + lon2)
    return tiles


# ---------------------------------------------------------------- Column ---

def lat_tile_col(lat: Column, degree: float) -> Column:
    # Spark round() is BigDecimal HALF_UP = half away from zero — matches Go.
    part = F.abs(F.round(lat / F.lit(degree), 0)) * F.lit(degree)
    fmt = "%02.1f" if degree < 1 else "%02.0f"
    return F.concat(
        F.when(lat >= 0, F.lit("N")).otherwise(F.lit("S")),
        F.format_string(fmt, part),
    )


def lon_tile_col(lon: Column, degree: float) -> Column:
    part = F.abs(F.round(lon / F.lit(degree), 0)) * F.lit(degree)
    fmt = "%03.1f" if degree < 1 else "%03.0f"
    return F.concat(
        F.when(lon >= 0, F.lit("E")).otherwise(F.lit("W")),
        F.format_string(fmt, part),
    )


def tile_name_col(lat: Column, lon: Column, degree: float) -> Column:
    """Full T1 tile name for a single point."""
    return F.concat(lat_tile_col(lat, degree), lon_tile_col(lon, degree))


def calculate_tiles_col(
    min_lat: Column, max_lat: Column, min_lon: Column, max_lon: Column, degree: float
) -> Column:
    """T2: array of 1/2/4 corner tile names in reference order, deduped."""
    lat1 = lat_tile_col(min_lat, degree)
    lon1 = lon_tile_col(min_lon, degree)
    lat2 = lat_tile_col(max_lat, degree)
    lon2 = lon_tile_col(max_lon, degree)
    arr = F.array(
        F.concat(lat1, lon1),
        F.when(lon1 != lon2, F.concat(lat1, lon2)),
        F.when(lat1 != lat2, F.concat(lat2, lon1)),
        F.when((lat1 != lat2) & (lon1 != lon2), F.concat(lat2, lon2)),
    )
    return F.filter(arr, lambda x: x.isNotNull())


# ------------------------------------------------------------------- SQL ---

def lat_tile_sql(lat: str, degree: float) -> str:
    # `+ 0.0` normalizes -0.0 (DuckDB abs() preserves the sign bit of -0.0;
    # Go math.Abs and Spark abs() do not)
    fmt = "%02.1f" if degree < 1 else "%02.0f"
    return (
        f"concat(CASE WHEN ({lat}) >= 0 THEN 'N' ELSE 'S' END, "
        f"printf('{fmt}', abs(round(({lat})/{degree!r})) * {degree!r} + 0.0))"
    )


def lon_tile_sql(lon: str, degree: float) -> str:
    fmt = "%03.1f" if degree < 1 else "%03.0f"
    return (
        f"concat(CASE WHEN ({lon}) >= 0 THEN 'E' ELSE 'W' END, "
        f"printf('{fmt}', abs(round(({lon})/{degree!r})) * {degree!r} + 0.0))"
    )


def tile_name_sql(lat: str, lon: str, degree: float) -> str:
    return f"concat({lat_tile_sql(lat, degree)}, {lon_tile_sql(lon, degree)})"


# ------------------------------------------------- web-mercator z/x/y (E4) ---

def mercator_tile_cols(lat: Column, lon: Column, zoom: int) -> tuple[Column, Column]:
    """Slippy-map tile (x, y) at a zoom level; standard OSM formula."""
    n = float(1 << zoom)
    x = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    lat_rad = lat / F.lit(180.0) * F.lit(math.pi)
    y = F.floor(
        (1.0 - F.log(F.tan(lat_rad) + (F.lit(1.0) / F.cos(lat_rad))) / math.pi)
        / 2.0
        * n
    ).cast("long")
    x = F.least(F.greatest(x, F.lit(0)), F.lit(int(n) - 1))
    y = F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1))
    return x, y


def mercator_tile_sql(lat: str, lon: str, zoom: int) -> tuple[str, str]:
    n = float(1 << zoom)
    x = (
        f"least(greatest(CAST(floor((({lon}) + 180.0) / 360.0 * {n!r}) AS BIGINT), 0), {int(n) - 1})"
    )
    lat_rad = f"(({lat})/180.0*pi())"
    y = (
        f"least(greatest(CAST(floor((1.0 - ln(tan({lat_rad}) + (1.0/cos({lat_rad})))/pi()) / 2.0 * {n!r}) AS BIGINT), 0), {int(n) - 1})"
    )
    return x, y


# ------------------------------------------------------------ pyramid ------

def tile_pyramid(counts, z_base: int, z_min: int):
    """Roll a per-tile aggregate up a slippy-map pyramid: ``counts(tx, ty,
    n)`` at ``z_base`` → union of levels ``z_min..z_base`` as ``(z, tx,
    ty, n)``.

    Exact by the nested-floor identity ``floor(2^z·f) = floor(2^{z_base}·f)
    >> (z_base − z)`` (clamping commutes: saturated indices stay saturated
    one level up).

    Single-pass plan: each base tile row EXPLODES into its (z, parent)
    tuple per level, then ONE groupBy over all levels — one scan and two
    exchanges total regardless of level count.  (The naive
    level-aggregates-level union re-executed the base aggregation once
    per level: 5 scans for a z8→z4 pyramid, no ReusedExchange.)  The
    explode fans out only the already-collapsed base tile set, ≤ 4^z_base
    rows, so shuffle volume stays trivial next to the base aggregation.
    """
    levels = F.array(
        *[
            F.struct(
                F.lit(z).alias("z"),
                F.shiftright(F.col("tx"), z_base - z).alias("tx"),
                F.shiftright(F.col("ty"), z_base - z).alias("ty"),
            )
            for z in range(z_base, z_min - 1, -1)
        ]
    )
    return (
        counts.select(F.explode(levels).alias("l"), "n")
        .groupBy("l.z", "l.tx", "l.ty")
        .agg(F.sum("n").alias("n"))
    )


# ------------------------------------------------------------ geohash ------

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_col(lat: Column, lon: Column, precision: int) -> Column:
    """Standard geohash (base32, lon-bit-first interleave) as a Column —
    pure bit math + substring, fully codegen.  ``precision`` in [1, 10]
    (50 bits max keeps every intermediate < 2^63)."""
    if not 1 <= precision <= 10:
        raise ValueError("precision must be in [1, 10]")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    ix = F.floor((lon + 180.0) / 360.0 * F.lit(float(1 << lon_bits))).cast("long")
    iy = F.floor((lat + 90.0) / 180.0 * F.lit(float(1 << lat_bits))).cast("long")
    ix = F.least(F.greatest(ix, F.lit(0)), F.lit((1 << lon_bits) - 1))
    iy = F.least(F.greatest(iy, F.lit(0)), F.lit((1 << lat_bits) - 1))
    # interleave MSB-first, lon first: bit (total-1-k) of the code is
    # lon-bit (lon_bits-1-k/2) for even k, lat-bit (lat_bits-1-(k-1)/2) odd
    code = F.lit(0).cast("long")
    for k in range(total):
        if k % 2 == 0:
            src, src_bit = ix, lon_bits - 1 - k // 2
        else:
            src, src_bit = iy, lat_bits - 1 - (k - 1) // 2
        bit = F.shiftright(src, src_bit).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(bit, total - 1 - k))
    chars = [
        F.substring(
            F.lit(_GEOHASH32),
            (F.shiftright(code, total - 5 * (c + 1)).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lat: str, lon: str, precision: int) -> str:
    """The identical geohash as a DuckDB SQL expression."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    ix = (
        f"least(greatest(CAST(floor((({lon}) + 180.0) / 360.0 * "
        f"{float(1 << lon_bits)!r}) AS BIGINT), 0), {(1 << lon_bits) - 1})"
    )
    iy = (
        f"least(greatest(CAST(floor((({lat}) + 90.0) / 180.0 * "
        f"{float(1 << lat_bits)!r}) AS BIGINT), 0), {(1 << lat_bits) - 1})"
    )
    terms = []
    for k in range(total):
        if k % 2 == 0:
            src, src_bit = ix, lon_bits - 1 - k // 2
        else:
            src, src_bit = iy, lat_bits - 1 - (k - 1) // 2
        terms.append(f"(((({src}) >> {src_bit}) & 1) << {total - 1 - k})")
    code = "(" + " | ".join(terms) + ")"
    chars = [
        f"substring('{_GEOHASH32}', CAST((({code} >> {total - 5 * (c + 1)}) & 31) + 1 AS INT), 1)"
        for c in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"


# ------------------------------------------------------------ quadkey ------

def quadkey_col(tx: Column, ty: Column, zoom: int) -> Column:
    """Bing-maps quadkey: base-4 string with one digit per zoom level
    (MSB first), digit = x-bit + 2*y-bit.  Pure codegen (fixed-length
    concat); parent tile = prefix, which makes prefix aggregation the
    pyramid roll-up."""
    digits = [
        (
            F.shiftright(tx, k).bitwiseAND(F.lit(1))
            + F.shiftright(ty, k).bitwiseAND(F.lit(1)) * 2
        ).cast("string")
        for k in range(zoom - 1, -1, -1)
    ]
    return F.concat(*digits)


def quadkey_sql(tx: str, ty: str, zoom: int) -> str:
    parts = [
        f"CAST(((({tx}) >> {k}) & 1) + 2 * ((({ty}) >> {k}) & 1) AS VARCHAR)"
        for k in range(zoom - 1, -1, -1)
    ]
    return " || ".join(parts)

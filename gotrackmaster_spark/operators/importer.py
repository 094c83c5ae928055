"""Import/organize pipeline (reference S7 + P6 + T2/T3,
``/root/reference/cmd/import.go``): path templating, bbox corner-tile
fan-out, duplicate-target suppression, and the partitioned write.

The reference copies each GPX file into every (degree1 × degree0.5) tile
directory computed from its bbox (`cmd/import.go:160-183`) with a
`{placeholder}`-templated path (`customFormat`, `cmd/import.go:45-64`).
Spark-first: the directory layout IS a partition spec — the plan is a
DataFrame of (track_id, directory, archive) rows produced by explode of
the corner-tile arrays, and the "copy" is `write.partitionBy`.

Lazy-metadata quirk preserved: quality/geocode/tiles are only computed
when the format string references them (`isQuality`/`isDegree1`/… guards,
`cmd/import.go:73-99`) — here Catalyst's column pruning does it for free,
but the fan-out branching (no valid bounds → single un-tiled row) is
replicated explicitly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gotrackmaster_spark.functions.tiles import calculate_tiles_col

_BAD_CHARS = re.compile(r':|\\|\*|\?|"|<|>|\||\^')

PLACEHOLDERS = [
    "year", "month", "day", "hour", "minute", "country", "countrycode",
    "city", "state", "degree1", "degree0.5", "original", "kind", "creator",
    "quality",
]


def is_valid_format(fmt: str) -> bool:
    """cmd/import.go:65-71 — must contain ≥1 placeholder and no bad chars."""
    has_placeholder = any("{%s}" % p in fmt for p in PLACEHOLDERS)
    return has_placeholder and not _BAD_CHARS.search(fmt)


def custom_format_col(fmt: str, cols: dict[str, Column]) -> Column:
    """customFormat (cmd/import.go:45-64) as a Column expression: literal
    ReplaceAll of each `{placeholder}` with its column, in the reference's
    order."""
    out: Column = F.lit(fmt)
    for name in PLACEHOLDERS:
        token = "{%s}" % name
        if token in fmt and name in cols:
            out = F.replace(out, F.lit(token), cols[name].cast("string"))
    return out


def custom_format_sql(fmt: str, cols: dict[str, str]) -> str:
    out = f"'{fmt}'"
    for name in PLACEHOLDERS:
        token = "{%s}" % name
        if token in fmt and name in cols:
            out = f"replace({out}, '{token}', CAST({cols[name]} AS VARCHAR))"
    return out


def import_plan(
    summaries: DataFrame,
    directory_format: str,
    archive_format: str,
) -> DataFrame:
    """Build the import plan: one row per (track, degree1-tile,
    degree0.5-tile) — the T3 fan-out — with templated directory/archive
    paths and first-wins duplicate-target suppression
    (cmd/import.go:112-117: a later track whose (directory, archive) pair
    collides with an earlier one is dropped).

    ``summaries`` columns: track_id, start_ts (timestamp), creator,
    quality, original (base filename), kind (classification), min_lat,
    max_lat, min_lon, max_lon, file_rank (dedup order).
    """
    use_d1 = "{degree1}" in directory_format + archive_format
    use_d5 = "{degree0.5}" in directory_format + archive_format

    s = summaries
    bounds_valid = (
        (F.col("min_lat") != 90.0) | (F.col("max_lat") != -90.0)
    )  # sentinel init per GetBounds (distance.go:345-370)

    if use_d1 or use_d5:
        t1 = calculate_tiles_col(
            F.col("min_lat"), F.col("max_lat"), F.col("min_lon"), F.col("max_lon"), 1.0
        )
        t5 = calculate_tiles_col(
            F.col("min_lat"), F.col("max_lat"), F.col("min_lon"), F.col("max_lon"), 0.5
        )
        d1 = t1 if use_d1 else F.array(F.lit(""))
        d5 = t5 if use_d5 else F.array(F.lit(""))
        s = s.withColumn(
            "degree1", F.when(bounds_valid, d1).otherwise(F.array(F.lit("")))
        ).withColumn(
            "degree05", F.when(bounds_valid, d5).otherwise(F.array(F.lit("")))
        )
    else:
        s = s.withColumn("degree1", F.array(F.lit(""))).withColumn(
            "degree05", F.array(F.lit(""))
        )

    fan = s.select(
        "*", F.explode("degree1").alias("deg1")
    ).select("*", F.explode("degree05").alias("deg5"))

    # Go renders {quality} via %0.0f (cmd/import.go:62); integral quality
    # columns (synthetic tests) cast cleanly either way.  Geocode fields
    # substitute as empty strings — the zero geo.Address of a run without
    # the network geocoder (documented S5 substitution).
    q = (
        F.format_string("%.0f", F.col("quality"))
        if dict(fan.dtypes).get("quality") in ("double", "float")
        else F.col("quality")
    )
    cols = {
        "year": F.year("start_ts"),
        "month": F.format_string("%02d", F.month("start_ts")),
        "day": F.format_string("%02d", F.dayofmonth("start_ts")),
        "hour": F.format_string("%02d", F.hour("start_ts")),
        "minute": F.format_string("%02d", F.minute("start_ts")),
        "country": F.lit(""),
        "countrycode": F.lit(""),
        "city": F.lit(""),
        "state": F.lit(""),
        "degree1": F.col("deg1"),
        "degree0.5": F.col("deg5"),
        "original": F.col("original"),
        "kind": F.col("kind"),
        "creator": F.col("creator"),
        "quality": q,
    }
    plan = fan.select(
        "track_id",
        "file_rank",
        custom_format_col(directory_format, cols).alias("directory"),
        custom_format_col(archive_format, cols).alias("archive"),
    )

    from pyspark.sql import Window

    w = Window.partitionBy("directory", "archive").orderBy("file_rank", "track_id")
    return (
        plan.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def import_write(points: DataFrame, plan: DataFrame, destination: str) -> None:
    """The S7 sink: points joined to their plan rows, written partitioned
    by directory (the layout IS the partition spec)."""
    out = points.join(plan.select("track_id", "directory", "archive"), "track_id")
    out.write.mode("overwrite").partitionBy("directory").parquet(destination)

"""§2.11 SQL function surface: macros must match the Column builders and
stay JVM-side (no BatchEvalPython in the plan)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_sql_functions_match_column_builders(spark):
    import io
    import contextlib

    from pyspark.sql import functions as F

    from gotrackmaster_spark.functions.cells import cell_col
    from gotrackmaster_spark.functions.geodesy import haversine_col
    from gotrackmaster_spark.functions.registry import register_sql_functions
    from gotrackmaster_spark.functions.tiles import tile_name_col

    register_sql_functions(spark)
    df = spark.range(500).select(
        ((F.col("id") * 37) % 160 - 80 + 0.25).alias("lat"),
        ((F.col("id") * 91) % 360 - 180 + 0.25).alias("lon"),
    )
    df.createOrReplaceTempView("pts_reg")
    got = spark.sql(
        "SELECT gts_haversine(lat, lon, 10.0, 20.0) AS h, gts_tile1(lat, lon) AS t1, "
        "gts_cell12(lat, lon) AS c FROM pts_reg"
    ).collect()
    want = df.select(
        haversine_col(F.col("lat"), F.col("lon"), F.lit(10.0), F.lit(20.0)).alias("h"),
        tile_name_col(F.col("lat"), F.col("lon"), 1.0).alias("t1"),
        cell_col(F.col("lat"), F.col("lon"), 12).alias("c"),
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    plan_df = spark.sql("SELECT gts_haversine(lat, lon, 0.0, 0.0) FROM pts_reg")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain()
    assert "BatchEvalPython" not in buf.getvalue()  # stays in codegen

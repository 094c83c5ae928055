"""Semantic pins for the quadkey encoding and the focal-density op.

The oracle parity test already proves Spark==DuckDB on both queries;
these pin the FORMULAS themselves: quadkey bijectivity + the
parent-is-prefix law (property-based), and mass conservation of the
3×3 focal sum (every cell's count lands in exactly
3 × |valid latitude rows| target cells — longitude wraps, latitude
clamps).
"""

from __future__ import annotations

import sys

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from gotrackmaster_spark import driver_queries as Q

SF_DIR = "/root/testdata/sf0.001"
_Z = 12


def _qk_py(x: int, y: int, z: int) -> str:
    return "".join(
        str(((x >> k) & 1) + 2 * ((y >> k) & 1)) for k in range(z - 1, -1, -1)
    )


@given(st.integers(0, (1 << _Z) - 1), st.integers(0, (1 << _Z) - 1))
@settings(max_examples=300, deadline=None)
def test_quadkey_bijective_and_parent_is_prefix(x, y):
    qk = _qk_py(x, y, _Z)
    assert len(qk) == _Z
    dx = dy = 0
    for ch in qk:
        d = int(ch)
        dx = (dx << 1) | (d & 1)
        dy = (dy << 1) | (d >> 1)
    assert (dx, dy) == (x, y)
    assert _qk_py(x >> 1, y >> 1, _Z - 1) == qk[: _Z - 1]


def test_quadkey_col_matches_python_twin(spark):
    from gotrackmaster_spark.functions.tiles import mercator_tile_cols, quadkey_col

    pts = Q.geo_events(spark, SF_DIR).limit(500)
    tx, ty = mercator_tile_cols(F.col("lat"), F.col("lon"), 8)
    rows = pts.select(tx.alias("tx"), ty.alias("ty"),
                      quadkey_col(tx, ty, 8).alias("qk")).collect()
    assert rows
    for r in rows:
        assert r.qk == _qk_py(r.tx, r.ty, 8)


def test_focal_density_conserves_mass(spark):
    n = Q._FOCAL_N
    counts = (
        Q.geo_events(spark, SF_DIR)
        .select(
            F.floor((F.col("lon") + 180.0) / 360.0 * n).cast("int").alias("i"),
            F.floor((F.col("lat") + 90.0) / 180.0 * n).cast("int").alias("j"),
        )
        .groupBy("i", "j")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    # each cell's count reaches 3 (lon wraps) × valid-j targets
    expected = sum(
        r.c * 3 * sum(1 for dj in (-1, 0, 1) if 0 <= r.j + dj < n)
        for r in counts
    )
    got = Q.q_focal_density(spark, SF_DIR).agg(F.sum("focal_sum")).first()[0]
    assert got == expected

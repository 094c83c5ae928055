"""T1/T2 degree-grid tiles and the E1 cell index."""

import numpy as np
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from gotrackmaster_spark.functions import cells, tiles


def test_tile_names_round_not_floor():
    # distance.go:376-402 uses math.Round: 41.6 with deg=1 -> N42.
    assert tiles.lat_tile_s(41.6, 1.0) == "N42"
    assert tiles.lat_tile_s(41.4, 1.0) == "N41"
    assert tiles.lat_tile_s(-0.3, 1.0) == "S00"
    assert tiles.lon_tile_s(1.7, 1.0) == "E002"
    assert tiles.lon_tile_s(-73.98, 1.0) == "W074"
    assert tiles.lat_tile_s(41.6, 0.5) == "N41.5"
    assert tiles.lon_tile_s(1.72, 0.5) == "E1.5"


def test_calculate_tiles_corner_dedup():
    # one tile
    assert tiles.calculate_tiles_s(41.4, 41.4, 1.7, 1.7, 1.0) == ["N41E002"]
    # two tiles (lon differs)
    assert tiles.calculate_tiles_s(41.4, 41.4, 1.4, 1.7, 1.0) == ["N41E001", "N41E002"]
    # four tiles, reference order
    assert tiles.calculate_tiles_s(41.4, 42.6, 1.4, 1.7, 1.0) == [
        "N41E001",
        "N41E002",
        "N43E001",
        "N43E002",
    ]


def test_tile_col_matches_scalar(spark):
    rows = [(41.6, 1.7), (41.4, -0.3), (-33.9, 151.2), (0.0, 0.0), (-0.2, -0.4)]
    df = spark.createDataFrame(rows, "lat double, lon double")
    for degree in (1.0, 0.5):
        got = df.select(
            tiles.tile_name_col(F.col("lat"), F.col("lon"), degree).alias("t")
        ).collect()
        want = [tiles.lat_tile_s(a, degree) + tiles.lon_tile_s(b, degree) for a, b in rows]
        assert [r.t for r in got] == want


def test_cell_roundtrip_and_hierarchy():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89, 89, 1000)
    lon = rng.uniform(-179.9, 179.9, 1000)
    c12 = cells.cell_np(lat, lon, 12)
    i, j, level = cells.cell_to_ij_np(c12)
    assert level == 12
    # re-encode round-trips
    assert np.array_equal(cells.cell_from_ij_np(i, j, 12), c12)
    # parent is a prefix: parent(cell@12, 3 steps) == cell@9 computed directly
    c9 = cells.cell_np(lat, lon, 9)
    assert np.array_equal(cells.cell_parent(c12, 3), c9)


def test_cell_col_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = [(float(a), float(b)) for a, b in zip(rng.uniform(-90, 90, 200), rng.uniform(-180, 180, 200))]
    df = spark.createDataFrame(rows, "lat double, lon double")
    got = np.array(
        [r.c for r in df.select(cells.cell_col(F.col("lat"), F.col("lon"), 14).alias("c")).collect()]
    )
    want = cells.cell_np(np.array([r[0] for r in rows]), np.array([r[1] for r in rows]), 14)
    assert np.array_equal(got, want)


def test_cell_sql_matches_numpy():
    import duckdb

    rng = np.random.default_rng(3)
    lat = rng.uniform(-90, 90, 500)
    lon = rng.uniform(-180, 180, 500)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (VALUES " +
                ",".join(f"({a!r}, {b!r})" for a, b in zip(lat, lon)) +
                ") t(lat, lon)")
    got = np.array([r[0] for r in con.execute(
        f"SELECT {cells.cell_sql('lat', 'lon', 14)} FROM pts").fetchall()])
    assert np.array_equal(got, cells.cell_np(lat, lon, 14))


def test_k_ring():
    c = cells.cell_np(np.array([40.0]), np.array([-3.0]), 10)
    ring = cells.k_ring_np(c, 1)
    assert ring.shape == (1, 9)
    assert len(set(ring[0].tolist())) == 9  # interior cell: all distinct
    assert int(c[0]) in ring[0].tolist()


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(-90, 90, allow_nan=False),
    lon=st.floats(-180, 180, allow_nan=False),
)
def test_tile_name_contains_point_property(lat, lon):
    """Round-based tile naming: the named tile center is within degree/2
    of the point (modulo the rounding convention)."""
    name = tiles.lat_tile_s(lat, 1.0)
    val = float(name[1:])
    assert abs(abs(lat) - val) <= 0.5 + 1e-9

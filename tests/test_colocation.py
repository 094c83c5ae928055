"""Co-location join semantics pins (operators/spatial.colocation_pairs).

The driver query `colocation_pairs` pins the full pipeline against a
DuckDB replay at sf0.01; these tests pin the occupancy dedup (repeat
pings collapse), the group-size cap, and bucket-boundary behavior.
"""

from datetime import datetime

import pytest

from gotrackmaster_spark.operators.spatial import colocation_pairs

_HOUR_US = 3_600_000_000


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "lat", "lon", "ts"])


@pytest.fixture(scope="module")
def base(spark):
    # u1/u2 share (cell, hour-bucket) twice: once at 10:00-11:00 with
    # repeat pings (must collapse to ONE shared group), once at 12:00.
    # u3 visits the same place but a different hour -> no pair with u1/u2
    # in that hour; u3 overlaps u1 only at 14:00.
    return _ev(
        spark,
        [
            ("u1", 10.0, 10.0, datetime(2024, 1, 1, 10, 0)),
            ("u1", 10.0, 10.0, datetime(2024, 1, 1, 10, 20)),  # repeat ping
            ("u2", 10.0, 10.0, datetime(2024, 1, 1, 10, 40)),
            ("u2", 10.0, 10.0, datetime(2024, 1, 1, 10, 50)),  # repeat ping
            ("u1", 10.0, 10.0, datetime(2024, 1, 1, 12, 10)),
            ("u2", 10.0, 10.0, datetime(2024, 1, 1, 12, 50)),
            ("u3", 10.0, 10.0, datetime(2024, 1, 1, 11, 30)),
            ("u1", 10.0, 10.0, datetime(2024, 1, 1, 14, 5)),
            ("u3", 10.0, 10.0, datetime(2024, 1, 1, 14, 55)),
        ],
    )


def test_repeat_pings_collapse(spark, base):
    got = {
        (r["user_a"], r["user_b"]): r["n_shared"]
        for r in colocation_pairs(base, bucket_us=_HOUR_US).collect()
    }
    # u1-u2 co-located in exactly 2 hour-buckets despite 4+2 raw pings.
    assert got[("u1", "u2")] == 2
    assert got[("u1", "u3")] == 1
    assert ("u2", "u3") not in got


def test_different_cells_never_pair(spark):
    ev = _ev(
        spark,
        [
            ("u1", 10.0, 10.0, datetime(2024, 1, 1, 10, 0)),
            ("u2", -40.0, 120.0, datetime(2024, 1, 1, 10, 30)),
        ],
    )
    assert colocation_pairs(ev, bucket_us=_HOUR_US).count() == 0


def test_group_size_cap(spark):
    # 4 users in one (cell, bucket) -> 6 pairs uncapped; cap at 3 drops
    # the whole group deterministically.
    rows = [
        (f"u{i}", 10.0, 10.0, datetime(2024, 1, 1, 10, i)) for i in range(4)
    ]
    rows.append(("u8", 10.0, 10.0, datetime(2024, 1, 1, 20, 0)))
    rows.append(("u9", 10.0, 10.0, datetime(2024, 1, 1, 20, 30)))
    ev = _ev(spark, rows)
    uncapped = colocation_pairs(ev, bucket_us=_HOUR_US)
    assert uncapped.count() == 6 + 1
    capped = colocation_pairs(ev, bucket_us=_HOUR_US, max_users_per_group=3)
    got = {(r["user_a"], r["user_b"]) for r in capped.collect()}
    # only the 2-user 20:00 group survives the cap
    assert got == {("u8", "u9")}


def test_pre_epoch_timestamps_floor_bucket(spark):
    # ts before 1970 → negative epoch micros; the bucket must FLOOR
    # (toward -inf), not truncate toward zero, or events 1 µs apart on
    # either side of the epoch would land in the same bucket.
    rows = [
        ("u1", 10.0, 10.0, datetime(1969, 12, 31, 23, 30)),
        ("u2", 10.0, 10.0, datetime(1969, 12, 31, 23, 45)),
        ("u3", 10.0, 10.0, datetime(1970, 1, 1, 0, 15)),     # post-epoch
    ]
    ev = _ev(spark, rows)
    got = {
        (r["user_a"], r["user_b"])
        for r in colocation_pairs(ev, bucket_us=_HOUR_US).collect()
    }
    # u1+u2 share the 23:00-24:00 pre-epoch bucket; u3 is in 00:00-01:00
    # post-epoch — truncation toward zero would merge all three into
    # "bucket 0" and emit 3 pairs
    assert got == {("u1", "u2")}

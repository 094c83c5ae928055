"""Incremental materialized-view maintenance: refresh only the changed
source partitions and converge to the full recompute exactly —
including the emptied-partition case load_changes alone cannot see."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from gotrackmaster_spark.plans.checkpoint import Catalog
from gotrackmaster_spark.plans.incremental import incremental_refresh


def _transform(df):
    return df.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("tot")
    )


def _rows():
    return [
        Row(user_id=str(u), event_id=10 * u + i, value=float(100 * u + i))
        for u in range(4)
        for i in range(3)
    ]


def _assert_view_matches_full(spark, cat):
    cols = ["user_id", "n", "tot"]
    got = sorted(map(tuple, cat.load(spark, "v").select(cols).collect()))
    want = sorted(
        map(tuple, _transform(cat.load(spark, "src")).select(cols).collect())
    )
    assert got == want


def test_incremental_refresh_converges_to_full_recompute(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cat.commit(spark.createDataFrame(_rows()), "src", partition_col="user_id")
    s0 = cat.manifest("src")["snapshot_id"]
    cat.commit(_transform(cat.load(spark, "src")), "v", partition_col="user_id")
    _assert_view_matches_full(spark, cat)

    # batch 1: update partition 1, insert partition 7
    cat.merge(
        spark,
        "src",
        spark.createDataFrame(
            [
                Row(user_id="1", event_id=11, value=-50.0),
                Row(user_id="7", event_id=70, value=7.0),
            ]
        ),
        key_cols=["user_id", "event_id"],
    )
    m, changed = incremental_refresh(spark, cat, "src", "v", _transform, s0)
    assert set(changed) == {"1", "7"}
    assert m["metrics"]["partitions_replaced"] == 2
    assert m["metrics"]["partitions_reused"] == 3  # 0, 2, 3 untouched
    _assert_view_matches_full(spark, cat)
    s1 = m["metrics"]["src_snapshot_id"]

    # batch 2: EMPTY partition 2 entirely (delete-mode merge)
    cat.merge(
        spark,
        "src",
        spark.createDataFrame(
            [Row(user_id="2", event_id=e, value=0.0) for e in (20, 21, 22)]
        ),
        key_cols=["user_id", "event_id"],
        when_matched="delete",
    )
    m2, changed2 = incremental_refresh(spark, cat, "src", "v", _transform, s1)
    assert changed2 == ["2"]
    # the vanished group is DROPPED from the view, not left stale
    assert "2" not in m2["partitions"]
    _assert_view_matches_full(spark, cat)

    # no change since -> no new snapshot
    m3, changed3 = incremental_refresh(
        spark, cat, "src", "v", _transform, m2["metrics"]["src_snapshot_id"]
    )
    assert m3 is None and changed3 == []


def test_changed_partitions_sees_emptied_partition(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cat.commit(spark.createDataFrame(_rows()), "src", partition_col="user_id")
    s0 = cat.manifest("src")["snapshot_id"]
    cat.merge(
        spark,
        "src",
        spark.createDataFrame(
            [Row(user_id="3", event_id=e, value=0.0) for e in (30, 31, 32)]
        ),
        key_cols=["user_id", "event_id"],
        when_matched="delete",
    )
    assert cat.changed_partitions("src", s0) == ["3"]
    # but no file became live -> load_changes is empty (documented gap
    # changed_partitions exists to close)
    assert cat.load_changes(spark, "src", s0).count() == 0

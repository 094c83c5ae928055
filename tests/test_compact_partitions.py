"""Catalog.compact_partitions — partition-level small-file compaction
(Iceberg rewrite_data_files at CoW-partition granularity): only fragmented
partitions rewrite; everything else rides along by reference."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gotrackmaster_spark.plans.checkpoint import Catalog


def _rows(u, n, base=0):
    return [
        Row(user_id=str(u), event_id=100 * u + base + i, value=float(i))
        for i in range(n)
    ]


@pytest.fixture()
def fragmented(spark, tmp_path):
    """Table with 4 partitions; '0' and '1' fragmented into ~4 files each
    (repartition before commit), '2' and '3' single-file."""
    cat = Catalog(str(tmp_path / "cat"))
    frag = spark.createDataFrame(_rows(0, 16) + _rows(1, 16)).repartition(4)
    tidy = spark.createDataFrame(_rows(2, 16) + _rows(3, 16)).coalesce(1)
    cat.commit(frag.unionByName(tidy), "t", partition_col="user_id",
               stats_cols=["event_id"])
    return cat


def _files_per_partition(m):
    out: dict[str, int] = {}
    for fs in m["file_stats"]:
        out[fs["partition"]] = out.get(fs["partition"], 0) + 1
    return out


def test_compacts_only_fragmented_partitions(spark, fragmented):
    cat = fragmented
    before = cat.load(spark, "t")
    rows_before = sorted((r.user_id, r.event_id, r.value) for r in before.collect())
    fp = _files_per_partition(cat.manifest("t"))
    assert fp["0"] >= 2 and fp["1"] >= 2
    assert fp["2"] == 1 and fp["3"] == 1
    parent_dir = cat.manifest("t")["data_dir"]

    m = cat.compact_partitions(spark, "t", min_files=2, sort_col="event_id",
                               stats_cols=["event_id"])
    assert m["metrics"]["partitions_compacted"] == 2
    assert m["metrics"]["partitions_reused"] == 2
    assert m["metrics"]["files_before"] >= 4
    assert m["metrics"]["files_after"] == 2  # one file per rewritten partition

    # untouched partitions are referenced, not copied
    assert set(m["reused_partitions"]) == {"2", "3"}
    assert set(m["reused_partitions"].values()) == {parent_dir}
    # no data files for '2'/'3' under the new snapshot dir
    written = {
        d.split("=", 1)[1]
        for d in os.listdir(m["data_dir"])
        if d.startswith("user_id=")
    }
    assert written == {"0", "1"}

    after = cat.load(spark, "t")
    rows_after = sorted((r.user_id, r.event_id, r.value) for r in after.collect())
    assert rows_after == rows_before
    # compacted partitions are single-file now
    fp2 = _files_per_partition(cat.manifest("t"))
    assert fp2["0"] == 1 and fp2["1"] == 1

    # time travel: the fragmented snapshot is still readable
    assert cat.load(spark, "t", snapshot_id=1).count() == len(rows_before)


def test_compacted_files_keep_pruning_stats(spark, fragmented):
    cat = fragmented
    cat.compact_partitions(spark, "t", min_files=2, sort_col="event_id",
                           stats_cols=["event_id"])
    m = cat.manifest("t")
    rewritten = [fs for fs in m["file_stats"] if fs["partition"] in ("0", "1")]
    assert rewritten and all(fs.get("stats", {}).get("event_id") for fs in rewritten)
    # range read over partition 1's ids must not open partition 0's file
    pruned = cat.load_pruned(spark, "t", "event_id", 100, 115)
    assert sorted(r.event_id for r in pruned.collect()) == list(range(100, 116))
    opened = pruned.inputFiles()
    assert opened and all("user_id=0" not in f for f in opened)


def test_noop_when_nothing_fragmented(spark, fragmented):
    cat = fragmented
    cat.compact_partitions(spark, "t", min_files=2)
    n1 = cat.load(spark, "t").count()
    m = cat.compact_partitions(spark, "t", min_files=2)
    assert m["metrics"]["partitions_compacted"] == 0
    assert m["metrics"]["partitions_reused"] == 4
    assert cat.load(spark, "t").count() == n1


def test_compact_after_merge_chain(spark, fragmented):
    """Merges fragment hot partitions over time; compaction then heals
    exactly those — the maintenance loop a streaming upsert needs."""
    cat = fragmented
    cat.compact_partitions(spark, "t", min_files=2)
    src = spark.createDataFrame(_rows(2, 8, base=50))
    cat.merge(spark, "t", src, key_cols=["user_id", "event_id"])
    expect = sorted(
        (r.user_id, r.event_id) for r in cat.load(spark, "t").collect()
    )
    m = cat.compact_partitions(spark, "t", min_files=2)
    got = sorted((r.user_id, r.event_id) for r in cat.load(spark, "t").collect())
    assert got == expect
    # every partition resolvable after reference-chains + compaction
    assert set(cat.manifest("t")["partitions"]) == {"0", "1", "2", "3"}
    assert m["metrics"]["partitions_compacted"] <= 2


def test_unpartitioned_raises(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cat.commit(spark.createDataFrame(_rows(0, 4)), "u")
    with pytest.raises(ValueError, match="unpartitioned"):
        cat.compact_partitions(spark, "u")

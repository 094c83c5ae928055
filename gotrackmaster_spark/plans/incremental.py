"""Incremental materialized-view maintenance over the snapshot catalog.

``incremental_refresh`` keeps ``view_table = transform(src_table)`` up to
date by recomputing ``transform`` ONLY over the source partitions whose
file set changed since the last refresh, then dynamic-partition-
overwriting exactly those partitions of the view.  At 100 TB this is the
difference between an hourly full recompute and touching the handful of
partitions an ingest batch landed in.

Contract on ``transform`` (the standard partition-local IVM condition):
every output row must derive only from input rows sharing its value of
the source partition column, and must carry that column — per-partition
aggregates, per-partition dedup, tile rollups within a partition all
qualify; cross-partition joins/windows do not.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gotrackmaster_spark.plans.checkpoint import Catalog


def incremental_refresh(
    spark: SparkSession,
    cat: Catalog,
    src_table: str,
    view_table: str,
    transform: Callable[[DataFrame], DataFrame],
    since_snapshot: int,
    stats_cols: list[str] | None = None,
) -> tuple[dict | None, list[str]]:
    """Refresh ``view_table`` for every src partition changed in
    ``(since_snapshot, latest]``.  Returns (new view manifest | None if
    nothing changed, changed partition values).

    Uses :meth:`Catalog.changed_partitions` (file-set diff), so rewrites,
    inserts, AND fully-emptied partitions all refresh; an emptied source
    partition yields zero transform rows and is dropped from the view by
    the overwrite.  The new view manifest records the src snapshot it is
    consistent with under ``metrics["src_snapshot_id"]`` — pass that back
    as ``since_snapshot`` on the next refresh.
    """
    src_m = cat.manifest(src_table)
    changed = cat.changed_partitions(src_table, since_snapshot)
    if not changed:
        return None, []
    live = [p for p in changed if p in src_m["partitions"]]
    src_slice = cat._read_partitions(spark, src_m, live)
    refreshed = transform(src_slice)
    manifest = cat.replace_partitions(
        spark,
        view_table,
        refreshed,
        partition_vals=changed,
        stats_cols=stats_cols,
        extra_metrics={"src_snapshot_id": src_m["snapshot_id"]},
    )
    return manifest, changed

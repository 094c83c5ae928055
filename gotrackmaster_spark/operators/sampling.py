"""Deterministic stratified sampling — the reproducible-subset path of a
training-data curation pipeline at 100 TB.

``bottom_n_sample`` draws a uniform-without-replacement sample of n rows
per group as the rows with the smallest ``(hash, key)`` — hash-order
("distinct / bottom-k") sampling: because the hash is the explicit
modular family of :mod:`gotrackmaster_spark.functions.sketch`, the sample
is a pure FUNCTION of the data — independent of partitioning, cluster
size, and engine (the DuckDB oracle draws the identical sample), unlike
``DataFrame.sample`` whose output changes with the split layout.

Scale shape mirrors ``kmv_distinct``: a per-partition vectorized bottom-n
pre-filter bounds state at n rows per group per partition (the bottom-n
of a union is contained in the union of bottom-n's), then one rank over
≤ n · partitions rows per group.  Ties on hash (collisions) break by key
in BOTH the pre-filter and the final rank, so the sample stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bottom_n_sample(
    items: DataFrame,
    group_col: str,
    hash_col: str,
    key_col: str,
    n: int,
    prune_rows: int = 65536,
) -> DataFrame:
    """The n rows with smallest ``(hash, key)`` per group.

    ``items`` must carry ``group_col``, ``hash_col`` (deterministic hash,
    e.g. ``functions.sketch.kmv_hash_expr``), ``key_col`` (unique row
    key, the tie-break).  Output: ``(group_col, hash_col, key_col)`` of
    the sampled rows.
    """
    from gotrackmaster_spark.functions.sketch import bounded_bottom_k_prefilter

    cand = bounded_bottom_k_prefilter(
        items.select(group_col, hash_col, key_col),
        group_col,
        [hash_col, key_col],
        n,
        prune_rows,
    )

    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(hash_col).asc(), F.col(key_col).asc()
    )
    return (
        cand.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )

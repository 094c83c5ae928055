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
    import pandas as pd

    dtypes = dict(items.dtypes)
    cols = [group_col, hash_col, key_col]

    def prefilter(batches):
        acc = None
        for pdf in batches:
            cur = pdf[cols].drop_duplicates()
            acc = cur if acc is None else pd.concat(
                [acc, cur], ignore_index=True
            ).drop_duplicates()
            if len(acc) > prune_rows:
                acc = (
                    acc.sort_values([hash_col, key_col])
                    .groupby(group_col, sort=False)
                    .head(n)
                )
        if acc is not None and len(acc):
            yield (
                acc.sort_values([hash_col, key_col])
                .groupby(group_col, sort=False)
                .head(n)
            )

    cand = items.select(*cols).mapInPandas(
        prefilter, ", ".join(f"{c} {dtypes[c]}" for c in cols)
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

"""E5 — explicit skew handling: salt-and-broadcast joins + cell-range
partitioning (north_rule: "explicit salt-and-broadcast skew handling and
range-partitioned shuffles keyed on hierarchical cell IDs").

AQE's skew-join splitting covers sort-merge joins automatically (enabled in
session.py); these utilities cover the cases AQE cannot touch:

* a shuffle HASH join where one key (a hot cell: urban core, equator
  antimeridian artifacts) dominates a partition → ``salted_join`` spreads
  the hot key over S subkeys, exploding only the SMALL side ×S.
* writing cell-indexed tables so downstream scans prune: Z-order cell IDs
  are spatially local, so ``repartition_by_cell_range`` + sortWithinPartitions
  gives every output file a tight min/max cell range → parquet row-group
  skipping turns cell-range predicates into partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt`` subkeys.

    big gains ``_salt = pmod(hash(salt_by | monotonically_increasing_id), S)``;
    small is exploded ×S (it is the broadcast/replicated side, so the blow-up
    is bounded by S·|small|).  Result == big.join(small, key, how) exactly.
    """
    src = F.col(salt_by) if salt_by else F.monotonically_increasing_id()
    b = big.withColumn("_salt", F.pmod(F.hash(src), F.lit(salt)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def repartition_by_cell_range(
    df: DataFrame, cell_col_name: str = "cell", num_partitions: int | None = None
) -> DataFrame:
    """Range-partition on the hierarchical cell ID and sort within
    partitions — the write-side layout that makes cell-range scans prune
    at the file level (Z-order IDs keep spatial neighbours in the same
    byte range)."""
    if num_partitions:
        out = df.repartitionByRange(num_partitions, F.col(cell_col_name))
    else:
        out = df.repartitionByRange(F.col(cell_col_name))
    return out.sortWithinPartitions(cell_col_name)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and per-bucket sorted) on its join
    key — Spark's co-located layout.  Two tables bucketed the same way
    (same column, same ``n_buckets``) join with ZERO exchange on either
    side: each task zips bucket i with bucket i, so the shuffle that
    dominates repeated big-big joins (points ⋈ points dedup bands,
    cell ⋈ cell candidate joins) is paid ONCE at write time instead of
    per query.  Pair with the cell index: bucket on the level-k cell and
    every downstream spatial self-join over the same key is shuffle-free.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def salted_topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_by: list,
    k: int,
    n_salt: int = 16,
    salt_by: str | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact per-key top-k with the hot key's sort spread over ``n_salt``
    reducers — the mosaic-selection / leaderboard primitive at web scale.

    A plain ``row_number() OVER (PARTITION BY key ORDER BY ...)`` funnels
    EVERY row of a key through one reducer; at 10^12 images a popular map
    tile holds billions of rows and that single task spills or dies.  Two
    phases fix it without changing the result:

    1. partition on ``(key, salt)`` (salt = ``pmod(hash(salt_by), S)``,
       deterministic when ``salt_by`` is given) and keep each subgroup's
       top-k — the hot key's sort now spreads over S reducers and at most
       ``S * k`` rows per key survive;
    2. re-rank the survivors on ``key`` alone — a shuffle of ``S * k``
       rows per key, trivially bounded.

    Phase 1 is lossless: the global top-k of a key is a subset of the
    union of its per-salt top-k (each global winner wins its own salt
    bucket too).  ``order_by`` must be a TOTAL order (break ties — e.g.
    append the id column ascending) or ranks are nondeterministic, same
    contract as the plain window.
    """
    from pyspark.sql import Window

    survivors = _topk_phase1_survivors(df, key_cols, order_by, k, n_salt, salt_by)
    w2 = Window.partitionBy(*key_cols).orderBy(*order_by)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )


def _topk_phase1_survivors(
    df: DataFrame,
    key_cols: list[str],
    order_by: list,
    k: int,
    n_salt: int,
    salt_by: str | None,
) -> DataFrame:
    """Phase 1 of ``salted_topk_per_key``: per-(key, salt) top-k — at most
    ``n_salt * k`` rows per key survive (the bound the phase-2 re-rank
    relies on; pinned directly by tests/test_engine_extras.py)."""
    from pyspark.sql import Window

    if k < 1 or n_salt < 1:
        raise ValueError("k and n_salt must be >= 1")
    src = F.col(salt_by) if salt_by else F.monotonically_increasing_id()
    salted = df.withColumn("_salt", F.pmod(F.hash(src), F.lit(n_salt)).cast("int"))
    w1 = Window.partitionBy(*(key_cols + ["_salt"])).orderBy(*order_by)
    return (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )

"""Connected components over a pair/edge table — the canonicalization
step of a dedup pipeline at 100 TB: near-dup PAIRS (minhash/simhash/
phash band joins) become duplicate CLUSTERS, from which one canonical
document per cluster (the min-id root) is kept.

`connected_components` is iterative min-label propagation: each round,
every node adopts the smallest label among itself and its neighbours —
one shuffle (join + groupBy-min) per round, converging in graph-diameter
rounds.  Near-dup graphs are dense clusters with tiny diameters (a dup
cluster is near-clique), so 2-4 rounds suffice in practice; for
adversarial long-chain graphs the large-star/small-star variant
(Kiveris et al. 2014) bounds rounds at O(log n) with the same per-round
plan shape — the propagation step here is exactly its small-star half.
Convergence is checked with a changed-label count per round (an action;
each round's labels are persisted and the previous round's unpersisted,
so lineage stays flat and no recompute chain builds up).

Deterministic (min over int64 labels), so the DuckDB oracle reproduces
the exact clustering via a recursive-CTE transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node of the (undirected) edge table with its
    component's minimum node id.

    Output: ``(v, l)`` — one row per node appearing in any edge, ``l``
    the component root.  Singleton nodes (no edges) are not emitted;
    union the node table back in if they are needed.
    """
    e = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    # localCheckpoint, not persist: an iterative loop must TRUNCATE the
    # logical plan each round — persisted frames keep their full lineage,
    # so Catalyst re-analyzes a plan that doubles per iteration (the
    # classic iterative-Spark pitfall) and the upstream edge producer
    # (e.g. a simhash band join) reappears in every round's plan.
    bi = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        bi.select(F.col("src").alias("v")).distinct().withColumn("l", F.col("v"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        msgs = bi.join(labels, bi["src"] == labels["v"]).select(
            F.col("dst").alias("v"), "l"
        )
        new = (
            labels.unionByName(msgs).groupBy("v").agg(F.min("l").alias("l"))
        ).localCheckpoint(eager=True)
        changed = (
            new.join(labels.withColumnRenamed("l", "l_old"), "v")
            .filter(F.col("l") != F.col("l_old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels

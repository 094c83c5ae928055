"""Count-min sketch over a token stream — the bounded-memory heavy-hitter
path for open vocabularies at 100 TB.

An exact token-frequency groupBy keeps one row per DISTINCT token; on a
web-scale corpus that vocabulary is unbounded.  The CMS keeps a fixed
``depth × width`` counter grid instead: each token increments one bucket
per hash row, a point estimate is the MIN over its row buckets, and the
estimate over-counts by at most ``2N/width`` with probability
``1 − 2^-depth`` (Cormode & Muthukrishnan 2005).  The grid build is a
single ``groupBy(row, bucket).count()`` — constant state per executor,
perfect partial aggregation, one tiny shuffle.

Like everything in :mod:`functions.text`, the hashing is explicit modular
arithmetic with a DuckDB SQL twin (``*_sql``) so the driver oracle replays
the sketch bit-for-bit: the sketch is DETERMINISTIC, not sampled — two
engines build identical grids, so correctness is hash-checkable even
though the estimates are approximate with respect to the true counts.

Hash family: ``bucket_d(t) = ((a_d·h0(t) + b_d) mod P) mod width`` with
``h0`` the position-weighted codepoint hash (``functions.text``),
``a_d = 40503·d + 13``, ``b_d = 2654435761·d + 101 mod P`` — all products
< 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gotrackmaster_spark.functions.text import P, h0_spark_expr, h0_sql

CMS_DEPTH = 4
CMS_WIDTH = 512


def _ab(d: int) -> tuple[int, int]:
    return (40503 * d + 13) % P, (2654435761 * d + 101) % P


def cms_bucket_expr(tok_expr: str, d: int, width: int = CMS_WIDTH) -> str:
    """Spark SQL expression for the row-``d`` bucket of a token."""
    a, b = _ab(d)
    return f"(({a} * {h0_spark_expr(tok_expr)} + {b}) % {P}) % {width}"


def cms_bucket_sql(tok_expr: str, d: int, width: int = CMS_WIDTH) -> str:
    """The identical bucket as a DuckDB SQL expression."""
    a, b = _ab(d)
    return f"(({a} * {h0_sql(tok_expr)} + {b}) % {P}) % {width}"


def cms_build(
    tokens: DataFrame,
    tok_col: str = "tok",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch grid from a token stream (one row per token
    OCCURRENCE).  Output: ``(row int, bucket long, c long)`` —
    ≤ depth·width rows regardless of input size."""
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                F.expr(cms_bucket_expr(tok_col, d, width)).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        tokens.select(F.explode(rows).alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    tok_col: str = "tok",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for each probe token: min over the token's row
    buckets.  ``probes`` keeps its other columns; output adds ``est_n``.
    The (tiny) sketch is broadcast — probing never shuffles the probe side.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                F.expr(cms_bucket_expr(tok_col, d, width)).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    exploded = probes.withColumn("rb", F.explode(rows)).select(
        "*", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).drop("rb")
    j = exploded.join(F.broadcast(cms), ["row", "bucket"], "left").fillna(
        {"c": 0}
    )
    keys = [c for c in probes.columns]
    return j.groupBy(*keys).agg(F.min("c").alias("est_n"))


def cms_sql(
    token_source_sql: str,
    probe_source_sql: str,
    tok_col: str = "tok",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of ``cms_build`` + ``cms_estimate``: a WITH-clause body
    producing ``(<probe columns>, est_n)``.  ``token_source_sql`` must
    yield one row per token occurrence with column ``tok``;
    ``probe_source_sql`` one row per probe token (extra columns pass
    through)."""
    rb_rows = " UNION ALL ".join(
        f"SELECT {d} AS row, {cms_bucket_sql(tok_col, d, width)} AS bucket, "
        f"{tok_col} FROM toksrc"
        for d in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT p.*, {d} AS row, {cms_bucket_sql('p.' + tok_col, d, width)} "
        f"AS bucket FROM probesrc p"
        for d in range(depth)
    )
    return f"""
toksrc AS ({token_source_sql}),
probesrc AS ({probe_source_sql}),
rb AS ({rb_rows}),
cms AS (SELECT row, bucket, count(*) AS c FROM rb GROUP BY 1, 2),
probe_rb AS ({probe_rows}),
est AS (
  SELECT pr.* EXCLUDE (row, bucket),
         min(coalesce(cms.c, 0)) AS est_n
  FROM probe_rb pr LEFT JOIN cms USING (row, bucket)
  GROUP BY ALL
)
"""


# ------------------------------------------------------------------ KMV ---
#
# K-minimum-values (bottom-k) distinct-count sketch — the bounded-memory
# cardinality path for open vocabularies at 100 TB (Bar-Yossef et al. 2002;
# Beyer et al. 2007).  est = (k−1)·P // h_(k) over the k smallest DISTINCT
# hash values (integer division: the estimator is integer-exact, so the
# DuckDB oracle reproduces it bit-for-bit); groups with < k distinct
# hashes report their exact distinct-hash count.
#
# Like the CMS above the hash is explicit modular arithmetic with a SQL
# twin, making the approximate sketch hash-CHECKABLE: both engines build
# the identical bottom-k set.

KMV_K = 64
_KMV_A = 48271
_KMV_B = 2147483647 % P


def kmv_hash_expr(tok_expr: str) -> str:
    """Spark SQL expression for the KMV hash of a token (uniform on [0, P))."""
    return f"(({_KMV_A} * {h0_spark_expr(tok_expr)} + {_KMV_B}) % {P})"


def kmv_hash_sql(tok_expr: str) -> str:
    """The identical KMV hash as a DuckDB SQL expression."""
    return f"(({_KMV_A} * {h0_sql(tok_expr)} + {_KMV_B}) % {P})"


def bounded_bottom_k_prefilter(
    items: DataFrame,
    group_col: str,
    sort_cols: list[str],
    n: int,
    prune_rows: int = 65536,
) -> DataFrame:
    """Per-partition bounded bottom-n pre-filter shared by `kmv_distinct`
    and `operators.sampling.bottom_n_sample`: accumulate DISTINCT rows
    (over all of ``items``' columns), prune to the n smallest rows per
    group (ordered by ``sort_cols``) whenever the accumulator exceeds
    ``prune_rows``, and emit the partition's final bottom-n per group.

    Sound for any consumer that re-ranks the union globally with the
    same ordering: the global bottom-n of a union is contained in the
    union of per-partition bottom-n sets, so the downstream result is
    independent of partitioning (pinned in tests of both consumers).
    State is bounded by ``prune_rows`` + one Arrow batch.
    """
    import pandas as pd

    dtypes = dict(items.dtypes)
    cols = list(items.columns)

    def prefilter(batches):
        acc = None
        for pdf in batches:
            cur = pdf[cols].drop_duplicates()
            acc = cur if acc is None else pd.concat(
                [acc, cur], ignore_index=True
            ).drop_duplicates()
            if len(acc) > prune_rows:
                acc = (
                    acc.sort_values(sort_cols)
                    .groupby(group_col, sort=False)
                    .head(n)
                )
        if acc is not None and len(acc):
            yield (
                acc.sort_values(sort_cols).groupby(group_col, sort=False).head(n)
            )

    return items.mapInPandas(
        prefilter, ", ".join(f"{c} {dtypes[c]}" for c in cols)
    )


def kmv_distinct(
    items: DataFrame,
    group_col: str,
    hash_col: str = "h",
    k: int = KMV_K,
    prune_rows: int = 65536,
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum distinct hashes.

    Scale shape: the bounded per-partition pre-filter
    (`bounded_bottom_k_prefilter` — at most k smallest distinct hashes
    per group per partition) feeds one dedup + rank over ≤ k · partitions
    rows per group; partition-invariant by the KMV merge property.

    Output: ``(group_col, est_distinct long)``.
    """
    cand = bounded_bottom_k_prefilter(
        items.select(group_col, hash_col), group_col, [hash_col], k, prune_rows
    )

    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(hash_col)
    ranked = (
        cand.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    agg = ranked.groupBy(group_col).agg(
        F.count("*").alias("n_h"),
        F.max(F.when(F.col("rn") == k, F.col(hash_col))).alias("hk"),
    )
    est = F.when(F.col("hk").isNull(), F.col("n_h")).otherwise(
        F.expr(f"{(k - 1) * P} DIV hk")
    )
    return agg.select(group_col, est.cast("long").alias("est_distinct"))

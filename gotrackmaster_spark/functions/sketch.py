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

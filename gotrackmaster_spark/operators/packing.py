"""Training-sequence assembly for the LLM-data pipeline: stride chunking
and token-budget sequence packing.

Chunking is pure codegen (split → sequence → explode → slice) — no Python
in the hot path, fan-out bounded by ceil(n_tokens / stride) per document.

Packing is the canonical *stateful sequential* pipeline op: greedy
next-fit over a deterministic document order.  The global problem is
inherently serial, so the engine shards it (``doc_id % n_shards``) and
runs the serial scan per shard inside one ``applyInPandas`` — one shuffle
on the shard key, state bounded to a shard, shards independent.  At
100 TB you raise ``n_shards`` to O(cores) (each training shard is packed
exactly, order within a shard is stable), which is how packing runs in
real corpus builders; there is no cross-shard coordination to bottleneck.

Both ops ship a DuckDB twin (``sql_chunk_documents`` /
``sql_pack_sequences`` — the packing twin replays the same greedy scan
with a recursive CTE) for the driver's exact-hash correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gotrackmaster_spark.functions.text import h0_spark_expr, h0_sql, n_tokens_col, n_tokens_sql


# ----------------------------------------------------------------- chunking --

def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 64, stride_tokens: int = 48
) -> DataFrame:
    """Split each document's whitespace tokens into windows of
    ``chunk_tokens`` starting every ``stride_tokens`` (tail windows may be
    short; every token is covered since stride <= chunk is the caller's
    contract).  Emits (doc_id, chunk_id, n_toks, chunk_h) with ``chunk_h``
    the portable h0 fingerprint of the re-joined window text.
    """
    if stride_tokens <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride_tokens must be positive")
    if stride_tokens > chunk_tokens:
        raise ValueError(
            f"stride {stride_tokens} > chunk {chunk_tokens} would leave "
            "token gaps between windows"
        )
    toks = F.split(F.col("text"), " ")
    out = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(
                    F.lit(0), F.size("toks") - 1, F.lit(stride_tokens)
                )
            ).alias("s"),
        )
        .select(
            "doc_id",
            (F.col("s") / stride_tokens).cast("int").alias("chunk_id"),
            F.least(F.lit(chunk_tokens), F.size("toks") - F.col("s")).alias(
                "n_toks"
            ),
            F.array_join(
                F.slice("toks", F.col("s") + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
    )
    return out.select(
        "doc_id",
        "chunk_id",
        "n_toks",
        F.expr(h0_spark_expr("chunk_text")).alias("chunk_h"),
    )


def sql_chunk_documents(chunk_tokens: int = 64, stride_tokens: int = 48) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {stride_tokens})) AS s
  FROM t
),
w AS (
  SELECT doc_id,
         CAST(s // {stride_tokens} AS INT) AS chunk_id,
         CAST(least({chunk_tokens}, len(toks) - s) AS INT) AS n_toks,
         array_to_string(list_slice(toks, s + 1, s + {chunk_tokens}), ' ') AS chunk_text
  FROM c
)
SELECT doc_id, chunk_id, n_toks, {h0_sql('chunk_text')} AS chunk_h
FROM w
"""


# ------------------------------------------------------------------ packing --

def pack_sequences(
    docs: DataFrame, budget: int = 256, n_shards: int = 8
) -> DataFrame:
    """Greedy next-fit packing of documents into training sequences of at
    most ``budget`` whitespace tokens, sharded by ``doc_id % n_shards``
    and scanned in doc_id order within a shard.

    Rule (replayed verbatim by the SQL twin): a document opens a new
    sequence when the current one cannot fit it; a document longer than
    the budget gets a sequence of its own (which exceeds the budget — the
    downstream truncation policy owns that case, not the packer).

    Emits one row per document: (shard, doc_id, seq_id, n_toks).
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    import pandas as pd

    sized = docs.select(
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        "doc_id",
        n_tokens_col("text").cast("long").alias("n_toks"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, fill = -1, 0
        for ntok in pdf["n_toks"]:
            if seq < 0 or fill + ntok > budget:
                seq += 1
                fill = int(ntok)
            else:
                fill += int(ntok)
            seq_ids.append(seq)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int32")
        return pdf[["shard", "doc_id", "seq_id", "n_toks"]]

    return sized.groupBy("shard").applyInPandas(
        pack, "shard int, doc_id long, seq_id int, n_toks long"
    )


def sql_pack_sequences(budget: int = 256, n_shards: int = 8) -> str:
    return f"""
WITH RECURSIVE d AS (
  SELECT CAST(doc_id % {n_shards} AS INT) AS shard, doc_id,
         CAST({n_tokens_sql('text')} AS BIGINT) AS n_toks,
         row_number() OVER (PARTITION BY doc_id % {n_shards} ORDER BY doc_id) AS rn
  FROM documents
),
p AS (
  SELECT shard, doc_id, n_toks, rn, 0 AS seq_id, n_toks AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.doc_id, d.n_toks, d.rn,
         CASE WHEN p.fill + d.n_toks > {budget} THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.fill + d.n_toks > {budget} THEN d.n_toks ELSE p.fill + d.n_toks END
  FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT shard, doc_id, CAST(seq_id AS INT) AS seq_id, n_toks FROM p
"""

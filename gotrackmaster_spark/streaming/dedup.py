"""Structured Streaming ingest deduplication.

The batch dedup family (``operators.dedup``) answers "which existing rows
are duplicates"; at ingest time a 100 TB pipeline ALSO wants duplicates
dropped before they ever land — otherwise every downstream stage pays for
them.  Spark-first shape:

* ``dedup_stream`` — exact streaming dedup on a key (content hash,
  image_id, …) via ``dropDuplicatesWithinWatermark``: state holds one
  entry per key seen inside the watermark horizon, so memory is bounded
  by (arrival rate × watermark) instead of the stream's full history —
  the only viable contract on an unbounded source.  Exactly-once file
  sinks compose downstream.
* ``content_key`` — deterministic content fingerprint column (xxhash64 of
  the payload columns) so byte-identical documents/images dedup even when
  their ids differ (the common crawl-ingest case).

Semantics: within the watermark horizon the FIRST arrival wins and later
copies are dropped; a copy arriving after the key's state expired is kept
(and will be caught by the periodic batch MinHash/phash sweeps — the
standard two-tier dedup architecture for training-data ingest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_key(*cols: str) -> Column:
    """64-bit content fingerprint over the given columns (JVM xxhash64 —
    no Python, stable across batches/sessions)."""
    return F.xxhash64(*[F.col(c) for c in cols])


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Drop duplicate rows by ``keys`` on an unbounded stream with bounded
    state: the event-time watermark on ``ts_col`` lets Spark evict each
    key's dedup state once no duplicate can still arrive.  Use on the
    ingest edge before any shuffle-heavy stage."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)

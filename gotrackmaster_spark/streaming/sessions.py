"""Structured Streaming sessionization via native session windows.

The batch twin (``operators.timeseries.sessionize``) splits a key's
history at gaps with lag + running sum; on an unbounded stream Spark's
``session_window`` is the idiomatic operator: per-key windows that extend
``gap`` past each event and merge on overlap, with the event-time
watermark bounding state and admitting late data up to the watermark
delay.  State per key is O(open sessions), closed sessions emit once the
watermark passes — no custom state code needed.

Semantics vs the batch twin: ``session_window`` merges an event into the
open session when it lands STRICTLY inside [last_ts, last_ts + gap)
(half-open), while the batch lag-split keeps events ``<= gap`` apart
together — they differ only on an event at EXACTLY ``gap`` distance, a
measure-zero boundary on microsecond timestamps.  The batch-parity test
pins agreement on the real events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_aggregates(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "12 hours",
    watermark: str | None = "24 hours",
) -> DataFrame:
    """Per-(key, session) aggregates over a stream (or static frame —
    ``session_window`` works identically in batch, which is how the
    batch-parity test verifies the semantics).

    Output: (key, session_start, session_end, n_events, sum_value).
    """
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )

"""Custom stateful streaming: per-track summary maintenance with
``applyInPandasWithState``.

The batch engine computes per-track profiles in one shuffle
(`operators.quality.track_profiles`); the streaming twin below maintains
the incrementally-computable slice of that profile (point count, bbox,
time range — the A1 bounds and the J1/import summary fields) as ARBITRARY
STATE over an unbounded point stream: one state row per track, updated
per micro-batch, idle tracks closed by a processing-time timeout (the
streaming analog of "file finished" in the reference's per-file loop).

Plan shape at scale: the stream shuffles once on track_id (hash state
partitioning); state size is O(live tracks) — a handful of doubles each —
and the timeout bounds it regardless of stream length.  The non-streamable
kernel stages (MaxSpeed fixes etc. need the whole track) run batch-side on
closed tracks, exactly how a bronze→silver pipeline splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

STATE_SCHEMA = (
    "n_points long, min_lat double, max_lat double, "
    "min_lon double, max_lon double, min_ts_ns long, max_ts_ns long"
)
OUTPUT_SCHEMA = (
    "user_id long, n_points long, min_lat double, max_lat double, "
    "min_lon double, max_lon double, min_ts_ns long, max_ts_ns long, "
    "closed boolean"
)


def streaming_track_bounds(
    stream: DataFrame, idle_timeout_ms: int = 60_000
) -> DataFrame:
    """Maintain per-track (bbox, count, time-range) state over a geotagged
    point stream; emits the refreshed summary every micro-batch the track
    appears in, plus a final ``closed=true`` row when the track has been
    idle for ``idle_timeout_ms`` of processing time."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            n, mla, xla, mlo, xlo, mts, xts = state.get
            state.remove()
            yield pd.DataFrame(
                [{
                    "user_id": uid, "n_points": n,
                    "min_lat": mla, "max_lat": xla,
                    "min_lon": mlo, "max_lon": xlo,
                    "min_ts_ns": mts, "max_ts_ns": xts,
                    "closed": True,
                }]
            )
            return
        n, mla, xla, mlo, xlo = 0, None, None, None, None
        mts, xts = None, None
        if state.exists:
            n, mla, xla, mlo, xlo, mts, xts = state.get
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            la_min, la_max = pdf["lat"].min(), pdf["lat"].max()
            lo_min, lo_max = pdf["lon"].min(), pdf["lon"].max()
            t_min, t_max = int(pdf["ts_ns"].min()), int(pdf["ts_ns"].max())
            mla = la_min if mla is None else min(mla, la_min)
            xla = la_max if xla is None else max(xla, la_max)
            mlo = lo_min if mlo is None else min(mlo, lo_min)
            xlo = lo_max if xlo is None else max(xlo, lo_max)
            mts = t_min if mts is None else min(mts, t_min)
            xts = t_max if xts is None else max(xts, t_max)
        state.update((n, mla, xla, mlo, xlo, mts, xts))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{
                "user_id": uid, "n_points": n,
                "min_lat": mla, "max_lat": xla,
                "min_lon": mlo, "max_lon": xlo,
                "min_ts_ns": mts, "max_ts_ns": xts,
                "closed": False,
            }]
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

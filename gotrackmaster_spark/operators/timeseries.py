"""Time-series operators: as-of join and gap sessionization.

The reference's analytics are per-track time series (its kernels scan
points ordered by timestamp — ``/root/reference/trackmaster/time.go:80-83``)
but it has no cross-table temporal join; these operators provide the two
standard time-series primitives a track/event store needs at engine scale:

* :func:`as_of_join` — every left row joined to the latest right row at or
  before its timestamp (per key).  Spark has no ASOF join operator; the
  classic distributed formulation is tag → union → ordered window
  back-fill, which costs exactly ONE shuffle on the key (the same
  sort-merge exchange a direct join would pay) and no Python.
* :func:`sessionize` — split each key's event stream into sessions at
  gaps > ``gap`` (lag + cumulative sum over one window; one shuffle).

Both are SQL-expressible, so the driver queries carry exact DuckDB oracles
(DuckDB's native ``ASOF LEFT JOIN`` verifies ``as_of_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """For every ``left`` row, attach ``value_cols`` from the latest
    ``right`` row with ``right.ts <= left.ts`` for the same ``key``
    (NULLs when no such row exists — ASOF LEFT semantics).

    ``right`` must be unique per (key, ts) — dedupe upstream, or ties make
    any engine's pick arbitrary.  Right rows sort BEFORE left rows at
    equal timestamps, so an exactly-simultaneous right row is visible to
    the left row (<= semantics, matching DuckDB ``ASOF JOIN ... >=``).

    Plan: union of the two tagged sides → window back-fill ordered by
    (ts, side) per key → filter back to left rows.  One exchange on
    ``key`` total; the window's sort rides the same shuffle.  At 100 TB
    both sides usually already arrive bucketed by key, making the
    exchange a local sort.
    """
    lcols = left.columns
    l = left
    for v in value_cols:
        l = l.withColumn(v, F.lit(None).cast(dict(right.dtypes)[v]))
    l = l.withColumn("_side", F.lit(1))
    r = right.select(
        key, ts_col, *value_cols, F.lit(0).alias("_side")
    )
    for c in lcols:
        if c not in (key, ts_col) and c not in value_cols:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in value_cols:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_us: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the gap
    to the previous event exceeds ``gap_us`` microseconds.

    Output: input columns + ``session_no`` (0-based per key, in time
    order).  Deterministic given a total order — pass ``order_tiebreak``
    (e.g. an id column) when timestamps can tie.

    Plan: lag + running sum over one key-partitioned window — a single
    shuffle; session aggregates downstream reuse the same partitioning.
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    is_new = F.when(
        prev.isNull() | ((ts_us - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_no", F.sum(is_new).over(wc) - 1)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    bucket_s: int | None,
    ts_col: str = "ts_us",
    t0_col: str = "t0_us",
    t1_col: str = "t1_us",
    broadcast_intervals: bool = True,
    max_fanout: int | None = 100_000,
) -> DataFrame:
    """Temporal interval join: every (event, interval) pair with
    ``t0 <= ts < t1`` (half-open), timestamps in integer µs.

    The temporal analogue of the spatial circle-range join (E8):
    intervals explode to their covered time buckets (``sequence`` — pure
    codegen, no Python), events carry ``ts DIV bucket``; candidates come
    from a broadcast equi-join on the bucket, refined by the exact
    inequality filter.  The (big) events side never shuffles; candidate
    fan-in per event is the number of intervals overlapping its bucket,
    so size ``bucket_s`` near the median interval length.
    ``broadcast_intervals=False`` shuffle-hash-joins both sides on the
    bucket for interval sets too large to broadcast.

    Robustness guards (the explode is the scale hazard — one bad interval
    can fan out without bound):

    - **Inverted intervals** (``t1 <= t0``) match no event, but a naive
      ``sequence(t0 DIV b, (t1-1) DIV b)`` generates a DESCENDING bucket
      range — |t0−t1|/b spurious candidate rows per bad interval.  The
      stop is clamped with ``greatest``, so an inverted interval costs
      exactly one bucket row (then dies in the refine filter).
    - **``bucket_s=None``** derives the bucket from the interval table
      itself (median interval length, one cheap aggregate over the SMALL
      side) — the fanout-balanced choice when lengths are unknown.
    - **``max_fanout``** bounds the per-interval explode: a single
      year-long interval over 1 s buckets is 31.5 M bucket rows from ONE
      input row.  Intervals whose bucket span exceeds the cap raise
      ``ValueError`` naming the offender count and the bucket size that
      would fit (one aggregate over the small side; ``None`` disables).
    - **Broadcast demotion**: the broadcast hint is only honoured while
      the ESTIMATED exploded side stays under ``_BROADCAST_ROW_CAP``
      rows; past that (e.g. the guard was disabled on purpose) the join
      silently demotes to the shuffle-hash path — forcing a multi-GB
      broadcast build is exactly the failure the hint would cause on a
      memory-tight driver.
    """
    b, iv_src, est_rows = _resolve_bucket(
        intervals, bucket_s, t0_col, t1_col, max_fanout,
        need_est=broadcast_intervals,
    )
    iv = iv_src.withColumn(
        "bucket",
        F.explode(
            F.expr(
                f"sequence({t0_col} DIV {b}, "
                f"greatest({t0_col} DIV {b}, ({t1_col} - 1) DIV {b}))"
            )
        ),
    )
    ev = events.withColumn("bucket", F.expr(f"{ts_col} DIV {b}"))
    if broadcast_intervals and (est_rows is None or est_rows <= _BROADCAST_ROW_CAP):
        j = ev.join(F.broadcast(iv), "bucket", "inner")
    else:
        j = ev.join(iv.hint("shuffle_hash"), "bucket", "inner")
    return j.filter(
        (F.col(t0_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(t1_col))
    ).drop("bucket")


# past this many estimated exploded bucket rows the interval side is no
# longer broadcast-safe (~100 MB at typical row widths) — demote to the
# shuffle-hash path instead of forcing a broadcast build that can OOM
_BROADCAST_ROW_CAP = 2_000_000


def _resolve_bucket(
    intervals: DataFrame,
    bucket_s: int | None,
    t0_col: str,
    t1_col: str,
    max_fanout: int | None,
    need_est: bool,
) -> tuple[int, DataFrame, int | None]:
    """Pick/validate the bucket width (µs) and estimate the exploded row
    count.  The auto-bucket median, the fanout check, and the size
    estimate are all single aggregates over the INTERVAL side — the
    small side of the join — so the guards never touch the event table.
    NO action runs unless a guard actually needs one: with an explicit
    ``bucket_s``, ``max_fanout=None`` and ``need_est=False`` the
    function is pure plan construction (streaming-safe)."""
    if bucket_s is None:
        med = intervals.select(
            F.expr(
                f"percentile_approx(greatest({t1_col} - {t0_col}, 1), 0.5)"
            ).alias("med")
        ).first()["med"]
        b = max(int(med or 1_000_000), 1)
    else:
        b = int(bucket_s) * 1_000_000
    if max_fanout is None and not need_est:
        return b, intervals, None
    # EXTRA bucket rows per interval beyond the first, with the SAME
    # integer DIV arithmetic the explode uses — a float length ratio
    # undercounts by up to 2 buckets at the boundaries, letting an
    # interval at the guard threshold slip through.
    span = F.greatest(
        F.expr(f"(({t1_col} - 1) DIV {b}) - ({t0_col} DIV {b})"),
        F.lit(0).cast("long"),
    )
    stats = intervals.select(
        F.sum(
            F.when(span + 1 >= (max_fanout or 0), 1).otherwise(0)
        ).alias("n_over"),
        F.max(span).alias("max_span"),
        (F.sum(span) + F.count(F.lit(1))).alias("est_rows"),
    ).first()
    est_rows = int(stats["est_rows"] or 0)
    if max_fanout is not None:
        if stats["n_over"]:
            worst = int(stats["max_span"] or 0) + 1
            need_s = max((worst * b) // max_fanout // 1_000_000, 1)
            raise ValueError(
                f"interval_join fan-out guard: {stats['n_over']} interval(s) "
                f"explode to >= {max_fanout} bucket rows each at "
                f"bucket_s={b // 1_000_000}s (worst: {worst} buckets). "
                f"Use bucket_s >= {need_s}, bucket_s=None (auto), or raise "
                f"max_fanout explicitly."
            )
    return b, intervals, est_rows


def resample_time_grid(
    points: DataFrame,
    period_us: int,
    group_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("lat", "lon"),
    max_fanout: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Resample each group's irregular time series onto the uniform grid
    ``k·period_us``: for every consecutive pair of fixes, emit the grid
    ticks in ``[t_i, t_{i+1})`` with the values LINEARLY interpolated by
    time fraction — the fixed-rate view a downstream model consumes.

    Plan at scale: one window exchange on the group key (the lead pair),
    then a codegen ``sequence``/``explode`` bounded by the per-leg tick
    count — the points side shuffles exactly once.  Legs with duplicate
    or inverted timestamps are dropped BEFORE the explode (Spark's
    ``sequence`` would otherwise step backwards and fan out the full
    negative range — the interval-join inversion hazard).

    ``max_fanout`` mirrors ``interval_join``'s guard intent: when set,
    any leg spanning ≥ max_fanout ticks raises (no silent truncation) —
    but unlike interval_join (whose eager pre-count aggregates only the
    small intervals side) this guard is folded INTO the explode plan via
    ``raise_error``, so it costs zero extra passes over the points-scale
    window and fires at execution time (Spark runtime error, not a
    call-time ValueError).  When ``None`` the caller asserts gaps are
    bounded (e.g. session-split upstream).  Timestamps must be
    non-negative epoch µs (integer ``div`` truncation == floor only
    holds there; the synthetic tables qualify).
    ``tiebreak_col`` breaks duplicate-timestamp ordering so the leg
    pairing is deterministic (and oracle-replayable) — pass the row id.

    Output: ``group_col, k (grid index), tick_us`` + one interpolated
    ``g_<col>`` per value column.
    """
    b = int(period_us)
    t0 = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = points.select(
        group_col,
        t0.alias("__t0"),
        *([F.col(tiebreak_col).alias("__tb")] if tiebreak_col else []),
        *[F.col(c).alias(f"__v0_{c}") for c in value_cols],
    )
    order = ["__t0", "__tb"] if tiebreak_col else ["__t0"]
    w = Window.partitionBy(group_col).orderBy(*order)
    legs = base.select(
        group_col,
        "__t0",
        F.lead("__t0").over(w).alias("__t1"),
        *[F.col(f"__v0_{c}") for c in value_cols],
        *[F.lead(f"__v0_{c}").over(w).alias(f"__v1_{c}") for c in value_cols],
    ).filter(F.col("__t1") > F.col("__t0"))
    k0 = F.expr(f"(__t0 + {b - 1}) div {b}")
    k1 = F.expr(f"(__t1 + {b - 1}) div {b} - 1")
    seq = F.when(k1 >= k0, F.sequence(k0, k1)).otherwise(
        F.array().cast("array<long>")
    )
    if max_fanout is not None:
        # in-plan guard: fires inside the same codegen stage as the
        # explode (NULL unifies with array<long> in the when-chain), so
        # enabling it never re-executes the points-scale window
        seq = F.when(
            k1 - k0 + 1 >= F.lit(max_fanout),
            F.raise_error(
                F.lit(
                    f"resample_time_grid fan-out guard: a leg spans >= "
                    f"{max_fanout} grid ticks at period_us={b}. Split long "
                    f"gaps upstream or use a coarser period."
                )
            ),
        ).otherwise(seq)
    ticks = legs.withColumn("k", F.explode(seq)).withColumn(
        "tick_us", F.col("k") * b
    )
    frac = (F.col("tick_us") - F.col("__t0")) / (F.col("__t1") - F.col("__t0"))
    out_cols = [F.col(group_col), F.col("k"), F.col("tick_us")]
    for c in value_cols:
        v0, v1 = F.col(f"__v0_{c}"), F.col(f"__v1_{c}")
        out_cols.append((v0 + frac * (v1 - v0)).alias(f"g_{c}"))
    return ticks.select(*out_cols)


def cusum_changepoints(
    series: DataFrame,
    group_col: str = "grp",
    day_col: str = "day",
    x_col: str = "x",
) -> DataFrame:
    """Two-sided CUSUM level-shift detection over a per-group daily
    count series — the classic SPC changepoint statistic, made EXACT:

    The textbook recursion S_t = max(0, S_{t-1} + a_t) is not a window
    function, but it equals the prefix-sum-minus-running-min identity
    ``S_t = P_t − min(0, min_{j<=t} P_j)`` with ``P_t = Σ_{i<=t} a_i``
    — two plain windows.  Deviations are scaled integers
    ``a_t = x_t·D − T`` (D = span days, T = group total; Σ a_t = 0),
    so every prefix sum, running min and CUSUM value is an exact int64
    and both engines agree bit-for-bit.  The downward statistic runs
    the same identity on ``−a_t``.

    MISSING days inside each group's [first, last] span count as x = 0
    (the quadrat trap, temporal edition — skipping empty days would
    blind the detector to activity DROPS): the span is enumerated with
    a bounded per-group ``sequence`` explode and outer-joined against
    the observed days.

    Plan at scale: one (group, day) aggregate, one per-group span agg +
    explode (fan-out = span days), one co-partitioned left join, two
    windows on the SAME (group × day-order) partitioning (one exchange),
    one final argmax aggregate via lexicographic struct-max (earliest
    day wins ties).  No self-joins.

    Output: ``(group_col, n_days, span_days, total, max_up, day_up,
    max_down, day_down)`` — max CUSUM value and its (earliest) day for
    upward and downward shifts; scaled by D (divide by D for per-day
    units).
    """
    g = F.col(group_col)
    obs = series.groupBy(group_col, day_col).agg(F.sum(x_col).alias("__x"))
    span = obs.groupBy(group_col).agg(
        F.min(day_col).alias("__d0"),
        F.max(day_col).alias("__d1"),
        F.sum("__x").alias("__tot"),
        F.count("*").alias("n_days"),
    )
    days = span.select(
        group_col, "__tot", "__d0", "__d1", "n_days",
        F.explode(F.expr("sequence(__d0, __d1)")).alias(day_col),
    )
    filled = days.join(obs, [group_col, day_col], "left").select(
        group_col,
        day_col,
        "__tot",
        "n_days",
        (F.col("__d1") - F.col("__d0") + F.lit(1)).alias("__span"),
        F.coalesce(F.col("__x"), F.lit(0)).alias("__xf"),
    )
    a = F.col("__xf") * F.col("__span") - F.col("__tot")
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = filled.select(
        group_col, day_col, "n_days", "__span", "__tot",
        F.sum(a).over(wcum).alias("__p"),
    )
    runmin = F.min(F.least(F.col("__p"), F.lit(0))).over(wcum)
    runmax = F.max(F.greatest(F.col("__p"), F.lit(0))).over(wcum)
    s = pref.select(
        group_col, day_col, "n_days", "__span", "__tot",
        (F.col("__p") - F.least(runmin, F.lit(0))).alias("__su"),
        (F.greatest(runmax, F.lit(0)) - F.col("__p")).alias("__sd"),
    )
    up = F.max(F.struct(F.col("__su").alias("s"), (-F.col(day_col)).alias("nd")))
    dn = F.max(F.struct(F.col("__sd").alias("s"), (-F.col(day_col)).alias("nd")))
    return s.groupBy(group_col).agg(
        F.max("n_days").alias("n_days"),
        F.max("__span").alias("span_days"),
        F.max("__tot").alias("total"),
        up.alias("__u"),
        dn.alias("__d"),
    ).select(
        group_col,
        "n_days",
        "span_days",
        "total",
        F.col("__u.s").alias("max_up"),
        (-F.col("__u.nd")).alias("day_up"),
        F.col("__d.s").alias("max_down"),
        (-F.col("__d.nd")).alias("day_down"),
    )


def seasonal_anomalies(
    series: DataFrame,
    group_col: str = "grp",
    day_col: str = "day",
    x_col: str = "x",
    period: int = 7,
    top_k: int = 5,
    quant: int = 10**6,
) -> DataFrame:
    """Seasonal-baseline anomaly ranking over a per-group daily count
    series: each day is compared against its OWN phase of the weekly
    cycle (day-of-week baseline — a Monday is only anomalous relative
    to Mondays), and the ``top_k`` most deviant days per group are
    returned.  The dropout/spike detector that plain z-scores over the
    whole series miss when the series has a strong weekly shape.

    Exactness: the phase baseline mean T_p/n_p never materializes as a
    float — the residual is the scaled integer ``r = c·n_p − T_p`` and
    the cross-phase-comparable score is ``|r|·quant DIV n_p`` (one
    integer quotient; phases observe different n_p inside the span, so
    the DIV normalization is required for a fair ranking).  Ranking
    (score DESC, day ASC) is bit-deterministic.

    Missing days inside each group's [first, last] span count as c = 0
    (the :func:`cusum_changepoints` convention) — a silent dead Monday
    IS the anomaly.

    Plan at scale: one (group, day) aggregate, span fill (bounded
    explode), one (group, phase) aggregate joined back co-partitioned,
    one per-group top-k window.  No self-joins.

    Output: ``(group_col, day, phase, c, n_phase, t_phase, score, rnk)``.
    """
    obs = series.groupBy(group_col, day_col).agg(F.sum(x_col).alias("__x"))
    span = obs.groupBy(group_col).agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    days = span.select(
        group_col, F.explode(F.expr("sequence(__d0, __d1)")).alias(day_col)
    )
    filled = days.join(obs, [group_col, day_col], "left").select(
        group_col,
        day_col,
        F.pmod(F.col(day_col), F.lit(period)).alias("phase"),
        F.coalesce(F.col("__x"), F.lit(0)).alias("c"),
    )
    base = filled.groupBy(group_col, "phase").agg(
        F.count("*").alias("n_phase"), F.sum("c").alias("t_phase")
    )
    scored = filled.join(base, [group_col, "phase"]).withColumn(
        "score",
        F.expr(f"(abs(c * n_phase - t_phase) * {quant}) DIV n_phase"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col(day_col).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(group_col, day_col, "phase", "c", "n_phase", "t_phase", "score", "rnk")
    )

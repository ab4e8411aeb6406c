"""Temporal joins Spark lacks as built-ins: as-of (point-in-time) join.

An as-of join attaches, to every left row, the most recent right row
with ``right.time <= left.time`` for the same key — the
training-data/feature-store primitive ("what was the last observed
value when this example happened") and a classic custom operator for
engines without it.

Scale shape (the reason this is NOT a theta join): a naive
``left.join(right, key).filter(r.ts <= l.ts)`` + max-window explodes to
the full per-key cross product before filtering.  Here both sides are
UNIONED and sorted once per key — one shuffle of n_left + n_right rows,
no pair blow-up:

1. tag rows: right carries its payload, left carries nulls,
2. one window per key ordered by (time, side, tiebreak) — right before
   left at equal timestamps so ``>=`` matches an exactly-simultaneous
   right row,
3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING →
   CURRENT carries the latest right payload forward,
4. keep the left rows.

DuckDB's native ``ASOF JOIN`` is the independent oracle in the driver
contract (same greatest-``ts <=`` semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the latest right payload at
    ``right[time_col] <= left[time_col]`` per key (null when no right
    row precedes).  ``payload_cols`` are emitted as ``asof_<name>``.
    ``tiebreak_col`` (a right-side column) makes the pick deterministic
    when several right rows share the qualifying timestamp.
    """
    left_cols = [c for c in left.columns]
    right_types = dict(right.dtypes)
    left_types = dict(left.dtypes)
    # payloads travel as ONE nullable struct: last(ignorenulls) then
    # skips whole left rows, never individual null payload FIELDS — a
    # per-column carry would stitch values from different right rows
    # whenever a payload column is legitimately null
    payload_struct_type = (
        "struct<" + ", ".join(f"{c}: {right_types[c]}" for c in payload_cols) + ">"
    )
    left_row_type = (
        "struct<" + ", ".join(f"{c}: {left_types[c]}" for c in left_cols) + ">"
    )
    tagged_left = left.select(
        *key_cols,
        F.col(time_col).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(payload_struct_type).alias("__payload"),
        F.struct(*left_cols).alias("__row"),
    )
    tb = (
        F.col(tiebreak_col).cast("long")
        if tiebreak_col is not None
        else F.lit(0).cast("long")
    )
    tagged_right = right.select(
        *key_cols,
        F.col(time_col).alias("__t"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        F.struct(*payload_cols).alias("__payload"),
        F.lit(None).cast(left_row_type).alias("__row"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__row",
        F.last("__payload", ignorenulls=True).over(w).alias("__asof"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left_cols],
        *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in payload_cols],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    time_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Interval (range) join: point rows matched to interval rows with
    ``start <= time <= end`` per key — binned so Catalyst gets an
    EQUI-join instead of the theta join it would otherwise plan as a
    per-key cross product.

    Both sides are quantized to ``bin_seconds`` buckets: points join on
    their single bucket, intervals explode into the buckets they cover
    (an interval of length L adds ~L/bin replicas — pick the bin near
    the median interval length so replication stays O(1) per interval).
    Every qualifying (point, interval) pair meets in EXACTLY the
    point's bucket, so no dedup pass is needed; the residual
    ``BETWEEN`` filter runs post-join on equi-matched candidates only.
    """
    p = points.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(time_col)) / bin_seconds)
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
            )
        ),
    )
    return (
        p.join(iv, key_cols + ["__bin"])
        .filter(F.col(time_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bin")
    )


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: consecutive events of one user belong
    to one session while the inter-event gap stays ≤ ``gap_minutes``;
    a longer silence starts a new session.  The canonical traffic /
    crawl-log operator (per-visit analytics, bot-burst detection,
    crawl-revisit accounting).

    Scale shape: ONE shuffle on the user key, then two windows over the
    same sort (lag → new-session flag, running sum → session index) —
    never a self-join on time ranges, state is O(1) per row.  The gap
    compare uses whole-second epoch truncation on both engines
    (``cast long`` ≡ second-boundary ``date_diff``), so the session
    boundaries are bit-identical cross-engine.  Returns per-session
    rows (user, session_idx, session_start, session_end, n_events);
    the aggregate is order-stable even under equal-timestamp ties
    (ties always land in the same session regardless of tie order).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # parquet timestamps load as TIMESTAMP_NTZ, which has no direct
    # long cast — hop through timestamp (session tz pinned to UTC, so
    # the hop is the identity) to get truncated epoch seconds
    epoch = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    new_sess = F.when(
        prev.isNull() | (epoch(F.col(ts_col)) - epoch(prev) > gap_minutes * 60),
        1,
    ).otherwise(0)
    sess_idx = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("session_idx", sess_idx)
        .groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


def retention_cohorts(
    events: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Day-cohort retention: users grouped by their first-seen day,
    counted as active on each later day offset — the (cohort_day,
    day_k, n_active) triangle every engagement dashboard draws.

    Two map-side-combinable aggregations and one broadcast-sized join:
    per-user first day (output bounded by |users|), then distinct
    (user, day) activity joined back to compute the day offset.  The
    join key is the user id — the activity side is already shuffled by
    user from the distinct, and the cohort side is the SAME partitioning
    (AQE reuses it), so no extra corpus-wide shuffle materializes.
    """
    day = F.to_date(F.col(ts_col))
    cohorts = (
        events.select(F.col(user_col), day.alias("day"))
        .groupBy(user_col)
        .agg(F.min("day").alias("cohort_day"))
    )
    activity = events.select(F.col(user_col), day.alias("day")).distinct()
    return (
        activity.join(cohorts, user_col)
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_k"),
            F.col(user_col),
        )
        .groupBy("cohort_day", "day_k")
        .agg(F.countDistinct(user_col).alias("n_active"))
    )

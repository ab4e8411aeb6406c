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

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


def event_funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_minutes: int | None = None,
) -> DataFrame:
    """Ordered-step funnel: how many users completed step k after
    having completed steps 1..k-1, in order?  A user "reaches" step k
    at the EARLIEST event of that type strictly after their step-k-1
    time (the standard product-analytics funnel rule; re-orderings
    don't count, repeats pick the first qualifying occurrence).  With
    ``within_minutes`` set, every later step must also land within that
    many minutes of the user's step-1 time (the conversion window —
    without one, any sufficiently long log converts everybody).

    Returns one row per step: (step_idx, step, users_reached,
    conv_from_prev, conv_from_first), conversions rounded to 6 dp.

    Scale shape: step 1 is one groupBy(user) over the step-1 slice;
    every later step is a groupBy(user) over ITS slice joined to the
    previous frontier — each shuffle is bounded by that event type's
    row count, never the whole log, and the user-key partitioning is
    reused across the chain (AQE broadcasts the frontier once it's
    small, which funnels make monotonically true).  The step count is
    a literal (funnels are 3-6 steps), so the chain length is fixed at
    plan time — no iteration state.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    # frontier_k: (user, t) = users who reached step k, at what time.
    # All frontiers stay LAZY — one union'd plan, one job, no per-step
    # driver actions.
    epoch = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
        .withColumn("t0", F.col("t"))
    )
    tagged = [
        frontier.select(
            F.lit(1).alias("step_idx"), F.lit(steps[0]).alias("step"), user_col
        )
    ]
    for i, step in enumerate(steps[1:], start=2):
        cand = (
            events.filter(F.col(type_col) == step)
            .join(frontier.select(user_col, "t", "t0"), user_col)
            .filter(F.col(ts_col) > F.col("t"))
        )
        if within_minutes is not None:
            # whole-second epoch compare (≡ oracle's epoch() math) so
            # the window boundary is bit-identical cross-engine
            cand = cand.filter(
                epoch(F.col(ts_col)) - epoch(F.col("t0"))
                <= within_minutes * 60
            )
        frontier = cand.groupBy(user_col).agg(
            F.min(ts_col).alias("t"), F.min("t0").alias("t0")
        )
        tagged.append(
            frontier.select(
                F.lit(i).alias("step_idx"), F.lit(step).alias("step"), user_col
            )
        )
    union = tagged[0]
    for t in tagged[1:]:
        union = union.unionByName(t)
    per_step = union.groupBy("step_idx", "step").agg(
        F.count("*").alias("users_reached")
    )
    w = Window.orderBy("step_idx")
    return per_step.select(
        "step_idx",
        "step",
        "users_reached",
        F.round(
            F.col("users_reached")
            / F.coalesce(F.lag("users_reached").over(w), F.col("users_reached")),
            6,
        ).alias("conv_from_prev"),
        F.round(
            F.col("users_reached") / F.first("users_reached").over(w),
            6,
        ).alias("conv_from_first"),
    )


def kleinberg_bursts(
    series: DataFrame,
    key_col: str,
    t_col: str,
    count_col: str,
    s: float = 2.0,
    gamma: float = 1.0,
) -> DataFrame:
    """Kleinberg two-state burst detection (Kleinberg, KDD 2002) over
    per-key count series: a base state emits at the key's mean rate r0,
    a burst state at ``s * r0``; entering the burst state costs
    ``gamma``, leaving is free; the minimum-cost state sequence is the
    Viterbi path.  The crawl/trend primitive behind "is this host /
    topic / error type suddenly hot" — a threshold alarm fires on every
    Poisson spike, the transition cost makes bursts SUSTAINED.

    Emission cost is the Poisson negative log-likelihood with the
    x!-term dropped (state-independent): ``e_i(x) = r_i - x*ln(r_i)``,
    ROUNDED to 6 dp before accumulation — the DP then sums identical
    rounded doubles in identical order on every engine, so the argmin
    path (ties prefer the base state) is bit-reproducible; the DuckDB
    oracle is a recursive CTE that carries both state costs AND both
    argmin paths as strings through the recursion.

    Returns (key, t, cnt, state) for every input point.  Scale shape:
    one groupBy(key) feeds the rate aggregate and ONE
    applyInPandas(viterbi) over the same key partitioning — the DP is
    genuinely sequential per key (the one shape built-ins can't
    express), keys distribute across tasks, and per-key state is two
    doubles regardless of series length.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} string, {t_col} timestamp, cnt long, state int"
    )

    def _viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values("__t").reset_index(drop=True)
        x = pdf["__cnt"].to_numpy()
        n = len(x)
        r0 = float(x.sum()) / n
        r1 = s * r0
        l0, l1 = math.log(r0), math.log(r1)
        c0 = c1 = 0.0
        p0: list[int] = []
        p1: list[int] = []
        first = True
        for xi in x:
            e0 = round(r0 - xi * l0, 6)
            e1 = round(r1 - xi * l1, 6)
            if first:
                # must start in the base state (Kleinberg's automaton
                # starts at q0); entering q1 on the first step pays gamma
                n0, n1 = c0 + e0, c0 + gamma + e1
                np0, np1 = p0 + [0], p0 + [1]
                first = False
            else:
                if c0 <= c1:
                    n0, np0 = c0 + e0, p0 + [0]
                else:
                    n0, np0 = c1 + e0, p1 + [0]
                if c0 + gamma <= c1:
                    n1, np1 = c0 + gamma + e1, p0 + [1]
                else:
                    n1, np1 = c1 + e1, p1 + [1]
            c0, c1, p0, p1 = n0, n1, np0, np1
        states = p0 if c0 <= c1 else p1
        return pd.DataFrame(
            {
                key_col: pdf["__k"],
                t_col: pdf["__t"],
                "cnt": pdf["__cnt"],
                "state": states,
            }
        )

    prepared = series.select(
        F.col(key_col).cast("string").alias("__k"),
        F.col(t_col).alias("__t"),
        F.col(count_col).cast("long").alias("__cnt"),
    )
    return prepared.groupBy("__k").applyInPandas(_viterbi, out_schema)


def event_transitions(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next = b | current = a) with counts — the behavioral
    fingerprint used for bot/crawler detection (near-deterministic
    transition rows), funnel design, and session simulation.

    ``order_col`` breaks timestamp ties so the lag sequence is
    engine-deterministic.  Scale shape: one window partitioned by user
    (the state lives per user, never global), then ONE
    map-side-combinable groupBy on (prev, next); the normalizer is a
    window sum over the |types|^2 result frame, not a second pass over
    the events.  Returns (prev_type, next_type, n, prob) rounded 6 dp.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    steps = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n")
    )
    w_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_prev), 6).alias("prob"),
    )


def behavior_entropy(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str,
) -> DataFrame:
    """Per-user behavioral regularity — the bot/crawler signal built
    on :func:`event_transitions`: the Shannon entropy of the user's
    own transition distribution, the share of their single most
    common transition, and the inter-arrival coefficient of variation.
    Scripted clients sit in the low-entropy / high-top-share /
    low-CV corner; humans are diffuse on all three.

    Entropy uses the aggregation identity
    ``H = log2(N) - sum(n * log2 n) / N`` so ONE groupBy computes it —
    no per-user window over probabilities.  Inter-arrival math is in
    whole epoch seconds (BIGINT lag diff).  Users with a single event
    have no transitions and are excluded (documented).

    Scale shape: one per-user lag window, one groupBy(user, prev,
    next), one groupBy(user) + a user-keyed join of the two 1-row-
    per-user aggregates.  Returns (user, n_steps, entropy_bits,
    top_transition_frac, iat_mean_sec, iat_cv) rounded 6 dp.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    steps = events.select(
        F.col(user_col).alias("user"),
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
        (
            F.unix_timestamp(ts_col)
            - F.lag(F.unix_timestamp(ts_col)).over(w)
        ).alias("iat"),
    ).filter(F.col("prev_type").isNotNull())
    edges = steps.groupBy("user", "prev_type", "next_type").agg(
        F.count("*").alias("n")
    )
    ent = edges.groupBy("user").agg(
        F.sum("n").alias("n_steps"),
        F.sum(F.col("n") * F.log2("n")).alias("s2"),
        F.max("n").alias("top_n"),
    )
    iat = steps.groupBy("user").agg(
        F.avg("iat").alias("iat_mean"),
        F.stddev_pop("iat").alias("iat_sd"),
    )
    return ent.join(iat, "user").select(
        F.col("user"),
        "n_steps",
        # abs: H >= 0 mathematically, but a single-transition user
        # computes log2(N) - (N*log2 N)/N, which each engine may land
        # at +-1 ulp of zero -> round gives -0.0 on one and +0.0 on
        # the other; abs folds both to +0.0
        F.abs(
            F.round(
                F.log2("n_steps") - F.col("s2") / F.col("n_steps"), 6
            )
        ).alias("entropy_bits"),
        F.round(F.col("top_n") / F.col("n_steps"), 6).alias(
            "top_transition_frac"
        ),
        F.round("iat_mean", 6).alias("iat_mean_sec"),
        F.round(
            F.when(
                F.col("iat_mean") > 0, F.col("iat_sd") / F.col("iat_mean")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("iat_cv"),
    )


def hour_profile(
    events: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-user diurnal concentration — the :func:`behavior_entropy`
    complement on the TIME axis: humans concentrate activity in a
    handful of waking hours (moderate entropy, clear peak), scripted
    clients run flat around the clock (near-log2(24) entropy, peak
    share ~ 1/24) or in a single cron hour (zero entropy, share 1.0).

    Same one-aggregation entropy identity as behavior_entropy
    (``H = log2 N - sum(n log2 n)/N``, abs-folded so the one-hour user
    lands on +0.0 on every engine); peak hour picked by
    ``min(struct(-cnt, hour))`` — largest count, ties to the earliest
    hour.  Scale shape: groupBy(user, hour) with map-side partial
    counts (<= 24 rows/user) then groupBy(user).  Returns (user,
    n_events, n_active_hours, peak_hour, peak_share,
    hour_entropy_bits) rounded 6 dp.
    """
    per_hour = events.groupBy(
        F.col(user_col).alias("user"),
        F.hour(ts_col).alias("hr"),
    ).agg(F.count("*").alias("cnt"))
    return (
        per_hour.groupBy("user")
        .agg(
            F.sum("cnt").alias("n_events"),
            F.count("*").alias("n_active_hours"),
            F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("hr")))
            .alias("peak"),
            F.max("cnt").alias("top_n"),
            F.sum(F.col("cnt") * F.log2("cnt")).alias("s2"),
        )
        .select(
            "user",
            "n_events",
            "n_active_hours",
            F.col("peak.hr").alias("peak_hour"),
            F.round(F.col("top_n") / F.col("n_events"), 6).alias(
                "peak_share"
            ),
            F.abs(
                F.round(
                    F.log2("n_events") - F.col("s2") / F.col("n_events"),
                    6,
                )
            ).alias("hour_entropy_bits"),
        )
    )


def km_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    churn_gap_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier survival estimator over user lifetimes — the
    censoring-correct upgrade of :func:`retention_cohorts`: a user
    silent for ``churn_gap_days`` before the study end (the table's
    max date) CHURNED at ``t = last_day − first_day``; a user still
    active inside the gap is right-CENSORED at
    ``t = study_end − first_day`` (we know they survived at least that
    long, not when they leave).  Naive retention treats censored users
    as churned and biases survival down.

    ``S(t) = Π_{u<=t} (1 − d_u / n_u)`` over distinct lifetimes, with
    the cumulative product computed as ``exp(cumsum(ln(factor)))`` —
    the only cross-engine floats are ln/exp over exact integer ratios
    (a factor of exactly 0 propagates as -inf → exp 0.0, IEEE on both
    engines).  Scale shape: one groupBy(user) to a per-user (T,
    churned) row, one groupBy(T) to ≤|days| rows, windows on that tiny
    frame.  Returns (t_days, n_at_risk, n_churned, n_censored,
    survival), 6 dp.
    """
    span = events.agg(F.max(F.to_date(ts_col)).alias("study_end"))
    per_user = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(
            F.min(F.to_date(ts_col)).alias("first_day"),
            F.max(F.to_date(ts_col)).alias("last_day"),
        )
        .crossJoin(F.broadcast(span))
        .select(
            F.datediff(F.col("last_day"), F.col("first_day")).alias("tl"),
            F.datediff(F.col("study_end"), F.col("first_day")).alias("tc"),
            (
                F.datediff(F.col("study_end"), F.col("last_day"))
                >= churn_gap_days
            ).alias("churned"),
        )
        .select(
            F.when(F.col("churned"), F.col("tl"))
            .otherwise(F.col("tc"))
            .alias("t"),
            "churned",
        )
    )
    per_t = per_user.groupBy("t").agg(
        F.sum(F.col("churned").cast("long")).alias("d"),
        F.sum((~F.col("churned")).cast("long")).alias("c"),
    )
    w_all = Window.partitionBy(F.lit(1))
    w_prev = (
        Window.partitionBy(F.lit(1))
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(F.lit(1))
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = per_t.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).alias("n_at_risk"),
    )
    # a factor of exactly 0 (every remaining at-risk user churns at t)
    # must yield survival 0 from t on — but Spark's log(0) is NULL
    # while DuckDB's ln(0) is -inf, so the zero factor is carried as an
    # explicit cumulative flag instead of relying on engine log(0)
    ln_term = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk")),
    ).otherwise(F.lit(0.0))
    zero_flag = (F.col("d") == F.col("n_at_risk")).cast("int")
    surv = F.when(
        F.max(zero_flag).over(w_cum) == 1, F.lit(0.0)
    ).otherwise(F.exp(F.sum(ln_term).over(w_cum)))
    return staged.select(
        F.col("t").alias("t_days"),
        "n_at_risk",
        F.col("d").alias("n_churned"),
        F.col("c").alias("n_censored"),
        F.round(surv, 6).alias("survival"),
    )


def assoc_rules(
    events: DataFrame,
    user_col: str,
    item_col: str,
    *,
    min_pair_users: int = 5,
) -> DataFrame:
    """Pairwise association rules (support / confidence / lift) over
    per-user item baskets — the market-basket view of the event
    stream ("users who do A also do B") that drives next-action
    suggestions and funnel design.

    Baskets deduplicate to DISTINCT (user, item) before the pair
    self-join, so the join cost is Σ_u C(|basket_u|, 2) with baskets
    bounded by the item-type cardinality — never a row-level cross
    product.  All three metrics derive from exact integer user counts;
    both rule directions are emitted.  Returns (antecedent,
    consequent, n_both, support, confidence, lift), 6 dp.
    """
    baskets = events.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).distinct()
    n_users = baskets.agg(
        F.countDistinct("u").alias("n_users")
    )
    item_n = baskets.groupBy("i").agg(F.count("*").alias("s"))
    a = baskets.select("u", F.col("i").alias("ia"))
    b = baskets.select("u", F.col("i").alias("ib"))
    pairs = (
        a.join(b, "u")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= min_pair_users)
    )
    both_dirs = pairs.select("ia", "ib", "n_both").union(
        pairs.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "n_both"
        )
    )
    enriched = (
        both_dirs.join(
            F.broadcast(item_n.select(F.col("i").alias("ia"),
                                      F.col("s").alias("sa"))),
            "ia",
        )
        .join(
            F.broadcast(item_n.select(F.col("i").alias("ib"),
                                      F.col("s").alias("sb"))),
            "ib",
        )
        .crossJoin(F.broadcast(n_users))
    )
    return enriched.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "n_both",
        F.round(F.col("n_both") / F.col("n_users").cast("double"), 6).alias(
            "support"
        ),
        F.round(F.col("n_both") / F.col("sa").cast("double"), 6).alias(
            "confidence"
        ),
        F.round(
            F.col("n_both").cast("double") * F.col("n_users")
            / (F.col("sa").cast("double") * F.col("sb")),
            6,
        ).alias("lift"),
    )


def mann_kendall_trend(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    *,
    z_crit: float = 1.96,
) -> DataFrame:
    """Mann-Kendall trend test over per-group daily counts — the
    nonparametric is-my-volume-drifting monitor (no distribution
    assumption, robust to outliers) that complements the
    distributional drift family (PSI / KS): ``S = Σ_{i<j}
    sign(x_j − x_i)`` over day-ordered pairs, tie-corrected variance
    ``Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18``, z with the
    ±1 continuity correction.

    S and every tie term are EXACT INTEGERS; the only floats are the
    final sqrt and division.  Scale shape: daily counts collapse each
    group to ≤|days| rows, so the pair self-join is C(|days|, 2) per
    group — a constant in corpus size, never row-level.  Returns
    (group, n_days, s_stat, var_s, z, trend), 6 dp.
    """
    daily = events.groupBy(
        F.col(group_col).alias("grp"), F.to_date(ts_col).alias("day")
    ).agg(F.count("*").alias("x"))
    a = daily.select("grp", F.col("day").alias("di"), F.col("x").alias("xi"))
    b = daily.select("grp", F.col("day").alias("dj"), F.col("x").alias("xj"))
    s = (
        a.join(b, "grp")
        .filter(F.col("di") < F.col("dj"))
        .groupBy("grp")
        .agg(
            F.sum(F.signum(F.col("xj") - F.col("xi")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    nd = daily.groupBy("grp").agg(F.count("*").alias("n_days"))
    ties = (
        daily.groupBy("grp", "x")
        .agg(F.count("*").alias("t"))
        .groupBy("grp")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    base = s.join(nd, "grp").join(ties, "grp")
    var_s = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ).cast("double") / 18.0
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(var_s),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(var_s),
        )
        .otherwise(F.lit(0.0))
    )
    return base.select(
        F.col("grp").alias(group_col),
        "n_days",
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.when(z > z_crit, F.lit("increasing"))
        .when(z < -z_crit, F.lit("decreasing"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )


def cusum_changepoint(
    events: DataFrame,
    group_col: str,
    ts_col: str,
) -> DataFrame:
    """CUSUM changepoint detection over per-group daily counts: the
    day where the cumulative deviation from the group mean peaks —
    "when did the level shift" where Mann-Kendall answers "is there a
    monotone trend" and Kleinberg answers "where are the bursts".

    The argmax compares ``|n·cumsum(x) − i·total|`` — an ALL-INTEGER
    rescaling of the classic ``|Σ(x−μ)|`` (multiply by n), so the
    changepoint pick is bit-exact on every engine and ties break to
    the earliest day; only the reported magnitudes divide.  Scale
    shape: one daily-count groupBy, windows over ≤|days| rows per
    group.  Returns (group, changepoint_day, n_days, s_at_peak,
    s_range), 6 dp.
    """
    daily = events.groupBy(
        F.col(group_col).alias("grp"), F.to_date(ts_col).alias("day")
    ).agg(F.count("*").alias("x"))
    wg = Window.partitionBy("grp")
    wc = wg.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    staged = daily.select(
        "grp",
        "day",
        F.sum("x").over(wc).alias("cs"),
        F.sum("x").over(wg).alias("tot"),
        F.count("*").over(wg).alias("n"),
        F.row_number().over(wg.orderBy("day")).alias("i"),
    ).select(
        "grp",
        "day",
        "n",
        (F.col("n") * F.col("cs") - F.col("i") * F.col("tot")).alias("sn"),
    )
    ranked = staged.select(
        "*",
        F.row_number()
        .over(wg.orderBy(F.abs(F.col("sn")).desc(), F.col("day")))
        .alias("rk"),
        F.max("sn").over(wg).alias("snmax"),
        F.min("sn").over(wg).alias("snmin"),
    ).filter(F.col("rk") == 1)
    return ranked.select(
        F.col("grp").alias(group_col),
        F.col("day").alias("changepoint_day"),
        F.col("n").alias("n_days"),
        F.round(F.col("sn").cast("double") / F.col("n"), 6).alias(
            "s_at_peak"
        ),
        F.round(
            (F.col("snmax") - F.col("snmin")).cast("double") / F.col("n"), 6
        ).alias("s_range"),
    )

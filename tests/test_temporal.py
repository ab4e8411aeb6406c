"""As-of join edge semantics: exact-tie timestamps, null payload
fields, rows with no preceding match, and the no-pair-blowup plan."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clawrag_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:05:00"), "a"),   # after r2
            (1, _ts("2024-01-01T00:02:00"), "b"),   # exact tie with r1@02:00
            (1, _ts("2024-01-01T00:00:30"), "c"),   # before any right row
            (2, _ts("2024-01-01T09:00:00"), "d"),   # key with null-payload row
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:01:00"), 10, 1.0),
            (1, _ts("2024-01-01T00:02:00"), 11, 2.0),   # tie candidate
            (1, _ts("2024-01-01T00:02:00"), 12, 3.0),   # same ts, higher tiebreak
            (1, _ts("2024-01-01T00:04:00"), 13, 4.0),
            (2, _ts("2024-01-01T08:00:00"), 14, None),  # null payload FIELD
            (2, _ts("2024-01-01T07:00:00"), 15, 9.0),
        ],
        "k long, ts timestamp, rid long, v double",
    )
    return left, right


def test_asof_semantics(spark, frames):
    left, right = frames
    out = {
        r["tag"]: (r["asof_rid"], r["asof_v"])
        for r in asof_join(
            left, right, ["k"], "ts", ["rid", "v"], tiebreak_col="rid"
        ).collect()
    }
    assert out["a"] == (13, 4.0)          # latest ts <= 05:00
    assert out["b"] == (12, 3.0)          # ts tie: >= includes it; max tiebreak
    assert out["c"] == (None, None)       # nothing precedes
    # the 08:00 row IS the as-of match even though its v is null — a
    # per-column carry would have stitched v=9.0 from 07:00 onto rid=14
    assert out["d"] == (14, None)


def test_asof_no_cartesian_plan(spark, frames):
    left, right = frames
    plan = (
        asof_join(left, right, ["k"], "ts", ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # union + window, not a join at all


def test_asof_preserves_left_rowcount(spark, frames):
    left, right = frames
    assert asof_join(left, right, ["k"], "ts", ["v"]).count() == left.count()
    # empty right: all-null payloads, same rowcount
    empty = right.limit(0)
    got = asof_join(left, empty, ["k"], "ts", ["v"]).collect()
    assert len(got) == left.count() and all(r["asof_v"] is None for r in got)


def test_range_join_binned_matches_theta(spark):
    """Binned equi range-join must equal the naive theta join for every
    bin width (including bins smaller and larger than the intervals),
    and plan as a hash/merge join, never cartesian."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), f"p{k}_{m}")
         for k in (1, 2) for m in range(0, 600, 7)],
        "k long, ts timestamp, pid string",
    )
    intervals = spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=10), base + dt.timedelta(minutes=25), "i1"),
            (1, base + dt.timedelta(minutes=24), base + dt.timedelta(minutes=300), "i2"),  # overlaps i1
            (2, base + dt.timedelta(minutes=0), base + dt.timedelta(minutes=1), "i3"),
            (2, base + dt.timedelta(minutes=550), base + dt.timedelta(minutes=620), "i4"),
        ],
        "k long, s timestamp, e timestamp, iid string",
    )
    from clawrag_spark.operators.temporal import range_join_binned

    theta = {
        (r["pid"], r["iid"])
        for r in points.join(intervals, "k")
        .filter(F.col("ts").between(F.col("s"), F.col("e")))
        .collect()
    }
    assert theta, "fixture produced no matches"
    for bin_s in (60, 3600, 86400):
        got = {
            (r["pid"], r["iid"])
            for r in range_join_binned(
                points, intervals, ["k"], "ts", "s", "e", bin_seconds=bin_s
            ).collect()
        }
        assert got == theta, f"bin={bin_s}"
    plan = (
        range_join_binned(points, intervals, ["k"], "ts", "s", "e")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


# ------------------------------------------------------- sessionize


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts"]).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_sessionize_gap_boundary(spark):
    from clawrag_spark.operators.temporal import sessionize

    rows = [
        (1, "2025-01-01 10:00:00"),
        (1, "2025-01-01 10:30:00"),   # exactly 1800 s → SAME session
        (1, "2025-01-01 11:00:01"),   # 1801 s → NEW session
        (2, "2025-01-01 10:00:00"),   # other user isolated
    ]
    out = sessionize(_ev(spark, rows), "user_id", "ts", gap_minutes=30)
    got = {(r["user_id"], r["session_idx"]): r["n_events"] for r in out.collect()}
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_sessionize_tie_timestamps_one_session(spark):
    from clawrag_spark.operators.temporal import sessionize

    rows = [(1, "2025-01-01 10:00:00")] * 3 + [(1, "2025-01-01 12:00:00")]
    out = sessionize(_ev(spark, rows), "user_id", "ts").collect()
    sizes = sorted(r["n_events"] for r in out)
    assert sizes == [1, 3] and len(out) == 2


def test_sessionize_single_shuffle_plan(spark):
    from clawrag_spark.operators.temporal import sessionize

    out = sessionize(_ev(spark, [(1, "2025-01-01 10:00:00")]), "user_id", "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both windows + the session aggregate reuse ONE user_id exchange
    assert plan.count("Exchange hashpartitioning") == 1


# ------------------------------------------------- retention cohorts


def test_retention_cohorts_triangle(spark):
    from clawrag_spark.operators.temporal import retention_cohorts

    rows = [
        (1, "2025-01-01 09:00:00"),
        (1, "2025-01-01 23:00:00"),   # same day → one activity row
        (1, "2025-01-03 10:00:00"),   # day_k = 2
        (2, "2025-01-01 12:00:00"),
        (2, "2025-01-02 12:00:00"),   # day_k = 1
        (3, "2025-01-02 08:00:00"),   # later cohort, day_k = 0
    ]
    out = retention_cohorts(_ev(spark, rows), "user_id", "ts")
    got = {(str(r["cohort_day"]), r["day_k"]): r["n_active"] for r in out.collect()}
    assert got == {
        ("2025-01-01", 0): 2,
        ("2025-01-01", 1): 1,
        ("2025-01-01", 2): 1,
        ("2025-01-02", 0): 1,
    }


# ---------------------------------------------------------- event_funnel


def test_event_funnel_hand_case(spark):
    from clawrag_spark.operators.temporal import event_funnel

    ev = spark.createDataFrame(
        [
            # u1: full ordered conversion inside the window
            (1, _ts("2024-01-01T00:00:00"), "view"),
            (1, _ts("2024-01-01T00:05:00"), "click"),
            (1, _ts("2024-01-01T00:10:00"), "purchase"),
            # u2: click BEFORE view — out of order, never reaches step 2
            (2, _ts("2024-01-01T00:00:00"), "click"),
            (2, _ts("2024-01-01T00:05:00"), "view"),
            (2, _ts("2024-01-01T00:06:00"), "purchase"),
            # u3: converts but outside the 30-min window
            (3, _ts("2024-01-01T00:00:00"), "view"),
            (3, _ts("2024-01-01T01:00:00"), "click"),
            # u4: view only
            (4, _ts("2024-01-01T00:00:00"), "view"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    rows = {
        r["step"]: r
        for r in event_funnel(
            ev, "user_id", "ts", "event_type",
            ["view", "click", "purchase"], within_minutes=30,
        ).collect()
    }
    assert rows["view"]["users_reached"] == 4
    assert rows["click"]["users_reached"] == 1      # only u1
    assert rows["purchase"]["users_reached"] == 1
    assert rows["click"]["conv_from_prev"] == 0.25
    assert rows["purchase"]["conv_from_first"] == 0.25
    # u2's purchase exists but step order gates it out entirely


def test_event_funnel_window_boundary(spark):
    from clawrag_spark.operators.temporal import event_funnel

    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "view"),
            (1, _ts("2024-01-01T00:30:00"), "click"),  # exactly 30 min: kept
            (2, _ts("2024-01-01T00:00:00"), "view"),
            (2, _ts("2024-01-01T00:30:01"), "click"),  # one second over: out
        ],
        "user_id long, ts timestamp, event_type string",
    )
    rows = {
        r["step"]: r["users_reached"]
        for r in event_funnel(
            ev, "user_id", "ts", "event_type", ["view", "click"],
            within_minutes=30,
        ).collect()
    }
    assert rows == {"view": 2, "click": 1}


# ------------------------------------------------------ kleinberg_bursts


def _viterbi_ref(xs, s=2.0, gamma=1.0):
    """Independent pure-python two-state Viterbi (same rounding rule)."""
    import math

    r0 = sum(xs) / len(xs)
    r1 = s * r0
    c0 = c1 = None
    p0, p1 = [], []
    first = True
    for x in xs:
        e0 = round(r0 - x * math.log(r0), 6)
        e1 = round(r1 - x * math.log(r1), 6)
        if first:
            c0, p0 = e0, [0]
            c1, p1 = gamma + e1, [1]
            first = False
            continue
        if c0 <= c1:
            n0, np0 = c0 + e0, p0 + [0]
        else:
            n0, np0 = c1 + e0, p1 + [0]
        if c0 + gamma <= c1:
            n1, np1 = c0 + gamma + e1, p0 + [1]
        else:
            n1, np1 = c1 + e1, p1 + [1]
        c0, c1, p0, p1 = n0, n1, np0, np1
    return p0 if c0 <= c1 else p1


def test_kleinberg_planted_burst(spark):
    """A sustained 3x spike becomes ONE burst; an isolated single-point
    spike of the same height is absorbed by the transition cost."""
    from clawrag_spark.operators.temporal import kleinberg_bursts

    base = [10, 11, 9, 10, 10, 30, 31, 29, 30, 10, 9, 11, 10, 25, 10, 10]
    rows = [
        ("k", _ts("2024-01-01T00:00:00") + dt.timedelta(hours=i), c)
        for i, c in enumerate(base)
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, cnt long")
    got = (
        kleinberg_bursts(df, "k", "t", "cnt", s=2.0, gamma=1.0)
        .orderBy("t")
        .collect()
    )
    states = [r["state"] for r in got]
    assert states == _viterbi_ref(base)
    # the sustained plateau (idx 5-8) is a burst...
    assert states[5:9] == [1, 1, 1, 1]
    # ...the lone spike at idx 13 may or may not clear gamma, but the
    # flat stretches are base state
    assert states[:5] == [0] * 5 and states[9:13] == [0] * 4


def test_kleinberg_flat_series_no_burst(spark):
    from clawrag_spark.operators.temporal import kleinberg_bursts

    rows = [
        ("k", _ts("2024-01-01T00:00:00") + dt.timedelta(hours=i), 10)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, cnt long")
    got = kleinberg_bursts(df, "k", "t", "cnt").collect()
    assert all(r["state"] == 0 for r in got)


def test_event_transitions_probs(spark):
    """view->view, view->click, click->view on a 4-event stream; per-
    prev probabilities normalize over the counts; ts ties broken by
    the order column."""
    import datetime as dt

    from clawrag_spark.operators.temporal import event_transitions

    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    ev = spark.createDataFrame(
        [
            (1, t, 1, "view"), (2, t + s, 1, "view"),
            (3, t + 2 * s, 1, "click"), (4, t + 3 * s, 1, "view"),
            # user 2: simultaneous pair ordered by event_id
            (5, t, 2, "b"), (6, t, 2, "a"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {
        (r["prev_type"], r["next_type"]): r
        for r in event_transitions(
            ev, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert got[("view", "view")]["prob"] == 0.5
    assert got[("view", "click")]["prob"] == 0.5
    assert got[("click", "view")]["prob"] == 1.0
    assert got[("b", "a")]["n"] == 1  # event_id tie-break
    assert ("a", "b") not in got


def test_behavior_entropy_bot_vs_diffuse(spark):
    """A strictly periodic one-transition user scores exactly 0 bits
    (never -0.0), top share 1.0, CV 0; a diffuse user scores the
    hand-computed entropy of their transition counts."""
    import datetime as dt
    import math

    from clawrag_spark.operators.temporal import behavior_entropy

    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=60)
    rows = [(i, t + i * s, 1, "ping") for i in range(5)]  # bot: 4 steps
    # user 2: a-b, b-a, a-c (counts 1,1,1 -> H = log2(3))
    seq = ["a", "b", "a", "c"]
    rows += [
        (100 + i, t + i * dt.timedelta(seconds=10 * (i + 1)), 2, e)
        for i, e in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["user"]: r
        for r in behavior_entropy(
            ev, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    bot = got[1]
    assert bot["n_steps"] == 4
    assert bot["entropy_bits"] == 0.0 and str(bot["entropy_bits"]) == "0.0"
    assert bot["top_transition_frac"] == 1.0
    assert bot["iat_mean_sec"] == 60.0 and bot["iat_cv"] == 0.0
    diffuse = got[2]
    assert diffuse["n_steps"] == 3
    assert diffuse["entropy_bits"] == round(math.log2(3), 6)
    assert diffuse["top_transition_frac"] == round(1 / 3, 6)


def test_hour_profile_cron_vs_flat(spark):
    """Single-hour 'cron' user: entropy exactly 0.0 (+0.0, never
    -0.0), share 1.0; a perfectly flat 4-hour user: entropy exactly
    2 bits, peak tie resolves to the earliest hour."""
    import datetime as dt

    from clawrag_spark.operators.temporal import hour_profile

    rows = [(1, dt.datetime(2024, 1, 1 + d, 3, 5, 0)) for d in range(6)]
    rows += [
        (2, dt.datetime(2024, 1, 1, h, 0, 0)) for h in (9, 11, 13, 15)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["user"]: r for r in hour_profile(ev, "user_id", "ts").collect()
    }
    cron = got[1]
    assert cron["n_active_hours"] == 1 and cron["peak_hour"] == 3
    assert cron["peak_share"] == 1.0
    assert str(cron["hour_entropy_bits"]) == "0.0"
    flat = got[2]
    assert flat["hour_entropy_bits"] == 2.0
    assert flat["peak_hour"] == 9 and flat["peak_share"] == 0.25


class TestKmRetention:
    def test_all_censored_survival_one(self, spark):
        """Every user active inside the churn gap -> zero churn events,
        survival 1.0 at every timepoint."""
        from clawrag_spark.operators.temporal import km_retention
        import pyspark.sql.functions as F

        rows = [(u, "2024-01-0%d 00:00:00" % (u + 1)) for u in range(5)]
        rows += [(u, "2024-01-09 00:00:00") for u in range(5)]
        ev = spark.createDataFrame(
            rows, "user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = km_retention(ev, "user_id", "ts", churn_gap_days=7).collect()
        assert all(r["n_churned"] == 0 for r in out)
        assert all(r["survival"] == 1.0 for r in out)

    def test_hand_case_with_censoring(self, spark):
        """3 users: A churns at t=2, B churns at t=5, C censored at
        t=9 (active at study end).  KM: S(2)=2/3, S(5)=1/3, C's
        censoring row keeps S unchanged."""
        from clawrag_spark.operators.temporal import km_retention
        import pyspark.sql.functions as F

        rows = [
            (1, "2024-01-01 00:00:00"), (1, "2024-01-03 00:00:00"),  # A t=2
            (2, "2024-01-01 00:00:00"), (2, "2024-01-06 00:00:00"),  # B t=5
            (3, "2024-01-01 00:00:00"), (3, "2024-01-15 00:00:00"),  # C end
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {r["t_days"]: r for r in
               km_retention(ev, "user_id", "ts", churn_gap_days=7).collect()}
        assert out[2]["n_at_risk"] == 3 and out[2]["n_churned"] == 1
        assert out[2]["survival"] == pytest.approx(2 / 3, abs=1e-6)
        assert out[5]["n_at_risk"] == 2 and out[5]["n_churned"] == 1
        assert out[5]["survival"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[14]["n_censored"] == 1
        assert out[14]["survival"] == out[5]["survival"]

    def test_zero_factor_propagates_zero(self, spark):
        """If every remaining at-risk user churns at the max lifetime,
        survival hits exactly 0.0 (the Spark log(0)=NULL trap)."""
        from clawrag_spark.operators.temporal import km_retention
        import pyspark.sql.functions as F

        # both users churn (silent >= 7 days before study end, which a
        # third short-lived late user pins)
        rows = [
            (1, "2024-01-01 00:00:00"), (1, "2024-01-04 00:00:00"),
            (2, "2024-01-01 00:00:00"), (2, "2024-01-04 00:00:00"),
            (3, "2024-01-20 00:00:00"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {r["t_days"]: r for r in
               km_retention(ev, "user_id", "ts", churn_gap_days=7).collect()}
        assert out[3]["n_churned"] == 2 and out[3]["n_at_risk"] >= 2
        # user 3 is censored at t=0; after the t=3 all-churn step the
        # curve is 0 exactly
        assert out[3]["survival"] == 0.0


def test_assoc_rules_hand_case(spark):
    """4 users with {a,b}, 1 with {a}, 1 with {b}: support(a,b)=4/6,
    conf(a->b)=4/5, lift = 6*4/(5*5)."""
    from clawrag_spark.operators.temporal import assoc_rules

    rows = []
    for u in range(4):
        rows += [(u, "a"), (u, "b"), (u, "a")]  # dup proves basket dedup
    rows += [(4, "a"), (5, "b")]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {(r["antecedent"], r["consequent"]): r
           for r in assoc_rules(ev, "user_id", "event_type",
                                min_pair_users=1).collect()}
    ab = out[("a", "b")]
    assert ab["n_both"] == 4
    assert ab["support"] == pytest.approx(4 / 6, abs=1e-6)
    assert ab["confidence"] == pytest.approx(4 / 5, abs=1e-6)
    assert ab["lift"] == pytest.approx(6 * 4 / 25, abs=1e-6)
    # symmetric metrics for the reverse direction except confidence
    ba = out[("b", "a")]
    assert ba["support"] == ab["support"] and ba["lift"] == ab["lift"]


def test_mann_kendall_monotone_series_flags_trend(spark):
    """Strictly increasing daily counts -> S = C(n,2), z > 1.96,
    'increasing'; a flat series has S = 0 and 'none'."""
    from clawrag_spark.operators.temporal import mann_kendall_trend
    import pyspark.sql.functions as F

    rows = []
    for d in range(10):
        for k in range(d + 1):  # day d has d+1 'up' events
            rows.append((len(rows), "2024-01-%02d 01:00:00" % (d + 1), "up"))
        for k in range(3):      # flat series
            rows.append((len(rows), "2024-01-%02d 01:00:00" % (d + 1), "flat"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_type"]: r for r in
           mann_kendall_trend(ev, "event_type", "ts").collect()}
    up = out["up"]
    assert up["s_stat"] == 45  # C(10,2), all pairs concordant
    assert up["trend"] == "increasing" and up["z"] > 1.96
    flat = out["flat"]
    assert flat["s_stat"] == 0 and flat["trend"] == "none" and flat["z"] == 0.0


def test_cusum_changepoint_finds_level_shift(spark):
    """A series that jumps from 2/day to 10/day on day 6 peaks its
    cumulative deviation exactly on day 5 (the last low day)."""
    from clawrag_spark.operators.temporal import cusum_changepoint
    import pyspark.sql.functions as F

    rows = []
    for d in range(10):
        n = 2 if d < 5 else 10
        for k in range(n):
            rows.append((len(rows), "2024-01-%02d 01:00:00" % (d + 1), "a"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = cusum_changepoint(ev, "event_type", "ts").collect()[0]
    assert r["changepoint_day"].isoformat() == "2024-01-05"
    assert r["n_days"] == 10
    # mean is 6/day; days 1-5 each contribute -4 -> S peaks at -20
    assert r["s_at_peak"] == pytest.approx(-20.0, abs=1e-6)
    assert r["s_range"] == pytest.approx(20.0, abs=1e-6)

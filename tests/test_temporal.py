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

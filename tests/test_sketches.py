"""Deterministic-HLL unit tests: accuracy envelope on both estimator
branches, partitioning-invariance, and parameter validation.

The cross-engine bit-parity of the register math is covered by the
``hll_user_days`` entry-oracle test; here we pin the statistical and
distributed-execution properties that the oracle comparison cannot see.
"""

import pytest

from clawrag_spark.operators.sketches import hll_distinct


def _estimate(spark, n_distinct, b=6, group="g"):
    df = spark.range(n_distinct * 3).selectExpr(
        f"'{group}' AS grp",
        # 3 duplicate mentions of each of n_distinct values: distinct
        # count must ignore multiplicity
        f"cast(id % {n_distinct} as string) AS v",
    )
    row = hll_distinct(df, ["grp"], "v", b=b).collect()[0]
    return row["hll_estimate"], row["n_registers"]


def test_linear_counting_branch_small_cardinality(spark):
    # 12 distinct values over m=64 registers: zeros > 0 and
    # e_raw <= 2.5m, so the linear-counting branch fires; LC is very
    # accurate at this occupancy (rel err < 15% with high probability).
    est, n_regs = _estimate(spark, 12)
    assert n_regs <= 12
    assert abs(est - 12) / 12 < 0.15


def test_raw_branch_large_cardinality(spark):
    # 5000 distinct over m=64: every register occupied (zeros == 0),
    # forcing the raw-estimator branch; standard error 1.04/sqrt(64)
    # = 13%, assert within 3 sigma.
    est, n_regs = _estimate(spark, 5000)
    assert n_regs == 64
    assert abs(est - 5000) / 5000 < 0.39


def test_estimate_invariant_under_repartition(spark):
    # register max + integer Z-sum are order- and partitioning-free:
    # the estimate must be bit-identical at any parallelism
    df = spark.range(3000).selectExpr(
        "cast(id % 7 as string) AS grp", "cast(id as string) AS v"
    )
    a = {
        r["grp"]: (r["hll_estimate"], r["n_registers"])
        for r in hll_distinct(df, ["grp"], "v").collect()
    }
    b = {
        r["grp"]: (r["hll_estimate"], r["n_registers"])
        for r in hll_distinct(df.repartition(17), ["grp"], "v").collect()
    }
    assert a == b
    assert len(a) == 7


def test_duplicates_do_not_inflate(spark):
    # same value 10_000 times -> estimate of exactly 1 (one register,
    # LC: 64 * ln(64/63) rounds to ~1.01; must be < 2)
    df = spark.range(10_000).selectExpr("'g' AS grp", "'only' AS v")
    est, n_regs = _estimate_from(df)
    assert n_regs == 1
    assert 0.5 < est < 2.0


def _estimate_from(df):
    row = hll_distinct(df, ["grp"], "v").collect()[0]
    return row["hll_estimate"], row["n_registers"]


def test_b_validation():
    with pytest.raises(ValueError, match="b must be"):
        hll_distinct(None, ["g"], "v", b=3)
    with pytest.raises(ValueError, match="b must be"):
        hll_distinct(None, ["g"], "v", b=17)


# ---------------------------------------------------------------- bloom

from pyspark.sql import functions as F

from clawrag_spark.operators.sketches import bloom_build, bloom_probe


def _plan_of(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bloom_no_false_negatives(spark):
    members = spark.range(300).selectExpr("concat('m', id) AS key")
    bloom = bloom_build(members, "key", m_bits=4096, k=3)
    out = bloom_probe(bloom, members, "key", m_bits=4096, k=3)
    assert out.filter(~F.col("in_bloom")).count() == 0


def test_bloom_fp_rate_in_theory_ballpark(spark):
    members = spark.range(300).selectExpr("concat('m', id) AS key")
    others = spark.range(2000).selectExpr("concat('x', id) AS key")
    bloom = bloom_build(members, "key", m_bits=4096, k=3)
    fp = bloom_probe(bloom, others, "key", m_bits=4096, k=3).filter(
        F.col("in_bloom")
    ).count()
    # theory: (1 - e^{-kn/m})^k = (1 - e^{-0.2197})^3 ~= 0.0077
    # over 2000 probes ~ 15 expected; accept a generous band
    assert 1 <= fp <= 60


def test_bloom_filter_is_sparse_and_bounded(spark):
    members = spark.range(5000).selectExpr("concat('m', id) AS key")
    bloom = bloom_build(members, "key", m_bits=1024, k=3).collect()
    assert len(bloom) <= 1024 // 32
    assert all(0 <= r["word_idx"] < 1024 // 32 for r in bloom)


def test_bloom_probe_broadcasts_filter(spark):
    members = spark.range(100).selectExpr("concat('m', id) AS key")
    bloom = bloom_build(members, "key", m_bits=1024, k=3)
    out = bloom_probe(bloom, members, "key", m_bits=1024, k=3)
    assert "BroadcastHashJoin" in _plan_of(out)


def test_bloom_k_validation(spark):
    members = spark.range(10).selectExpr("concat('m', id) AS key")
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(members, "key", k=5)

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


# ------------------------------------------------ count-min sketch


def test_cms_never_undercounts_and_is_tight_when_wide(spark):
    from clawrag_spark.operators.sketches import cms_build, cms_estimate

    # Zipf-ish stream: value v appears (50 - v) times
    df = spark.range(50).selectExpr(
        "explode(sequence(1, 50 - cast(id AS int))) AS _", "id AS v"
    ).select("v")
    exact = {r["v"]: r["c"] for r in df.groupBy("v").count()
             .withColumnRenamed("count", "c").collect()}
    probes = df.select("v").distinct()

    # narrow sketch: collisions guaranteed, but NEVER an undercount
    sk = cms_build(df, "v", depth=4, width=16)
    est = {r["v"]: r["cms_est"]
           for r in cms_estimate(sk, probes, "v", depth=4, width=16).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    assert any(est[k] > exact[k] for k in exact)  # collisions visible

    # wide sketch: 50 keys into 4x4096 cells — exact with high prob.
    sk2 = cms_build(df, "v", depth=4, width=4096)
    est2 = {r["v"]: r["cms_est"]
            for r in cms_estimate(sk2, probes, "v", depth=4, width=4096).collect()}
    assert est2 == exact


def test_cms_sketch_is_bounded_and_merges_by_sum(spark):
    from clawrag_spark.operators.sketches import cms_build, cms_estimate
    from pyspark.sql import functions as F

    a = spark.range(1000).selectExpr("cast(id % 37 AS string) AS k")
    b = spark.range(500).selectExpr("cast(id % 11 AS string) AS k")
    sa, sb = cms_build(a, "k"), cms_build(b, "k")
    assert sa.count() <= 4 * 64
    # cell-wise sum of two sketches == sketch of the union
    merged = (
        sa.unionByName(sb)
        .groupBy("row_i", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(a.unionByName(b), "k")
    assert (
        merged.exceptAll(direct).count() == 0
        and direct.exceptAll(merged).count() == 0
    )


def test_cms_depth_validation(spark):
    from clawrag_spark.operators.sketches import cms_build

    df = spark.range(3).selectExpr("cast(id AS string) AS k")
    with pytest.raises(ValueError):
        cms_build(df, "k", depth=5)


class TestKmv:
    def test_jaccard_estimate_within_sampling_error(self, spark):
        from clawrag_spark.operators import sketches as SK

        # two groups sharing exactly 600 of 1000/800 keys: J = 0.5
        rows = (
            [("a", f"k{i}") for i in range(1000)]
            + [("b", f"k{i}") for i in range(400, 1200)]
        )
        df = spark.createDataFrame(rows, "grp string, key string")
        sk = SK.kmv_sketch(df, "grp", "key", k=128)
        est = {
            (r["grp_a"], r["grp_b"]): r["jaccard_est"]
            for r in SK.kmv_jaccard(sk, sk, k=128).collect()
        }
        true_j = 600 / 1200
        # k=128 → std err ≈ sqrt(J(1-J)/k) ≈ 0.044; allow 4 sigma
        assert abs(est[("a", "b")] - true_j) < 0.18
        assert est[("a", "a")] == 1.0

    def test_distinct_estimate_and_small_group_exact(self, spark):
        from clawrag_spark.operators import sketches as SK

        rows = [("big", f"k{i % 5000}") for i in range(20000)] + [
            ("small", f"s{i}") for i in range(40)
        ]
        df = spark.createDataFrame(rows, "grp string, key string")
        est = {
            r["grp"]: (r["est_distinct"], r["n_keys_seen"])
            for r in SK.kmv_estimate_distinct(
                SK.kmv_sketch(df, "grp", "key", k=256), k=256
            ).collect()
        }
        # k=256 → relative error ≈ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
        assert abs(est["big"][0] - 5000) / 5000 < 0.25
        assert est["big"][1] == 5000
        # below-k groups are exact
        assert est["small"] == (40.0, 40)

    def test_sketch_is_fixed_size_and_sorted(self, spark):
        from clawrag_spark.operators import sketches as SK

        df = spark.createDataFrame(
            [("g", f"k{i}") for i in range(5000)], "grp string, key string"
        )
        row = SK.kmv_sketch(df, "grp", "key", k=32).collect()[0]
        assert len(row["hashes"]) == 32
        assert row["hashes"] == sorted(row["hashes"])
        with pytest.raises(ValueError):
            SK.kmv_sketch(df, "grp", "key", k=0)


class TestBottomkQuantiles:
    def test_small_table_sample_is_exact(self, spark):
        """n <= k: the sample IS the table, so est == exact at every q
        and k_used == n."""
        from clawrag_spark.operators.sketches import bottomk_quantiles

        df = spark.range(100).selectExpr("id", "id * 1.5 AS v")
        out = bottomk_quantiles(df, "id", "v", k=1024).collect()
        assert len(out) == 5
        assert all(r["k_used"] == 100 and r["n_rows"] == 100 for r in out)
        assert all(r["abs_err"] == 0.0 for r in out)

    def test_estimates_monotone_and_bounded(self, spark):
        """k < n: estimates are monotone in q and within the value
        range; the sample is deterministic (same result twice)."""
        from clawrag_spark.operators.sketches import bottomk_quantiles

        df = spark.range(5000).selectExpr("id", "(id % 977) * 1.0 AS v")
        out1 = sorted(
            bottomk_quantiles(df, "id", "v", k=256).collect(),
            key=lambda r: r["q"],
        )
        ests = [r["est"] for r in out1]
        assert ests == sorted(ests)
        assert all(0 <= r["est"] <= 976 for r in out1)
        out2 = sorted(
            bottomk_quantiles(df, "id", "v", k=256).collect(),
            key=lambda r: r["q"],
        )
        assert [tuple(r) for r in out1] == [tuple(r) for r in out2]

"""Sequence packing (distributed prefix sum), crawl-snapshot CDC,
URL-trap templates, DSIR importance weights, SemDeDup.

The packing tests pin the property that makes the two-phase prefix sum
trustworthy: the result is IDENTICAL at every partition count (the
global order key is unique, so shard layout is a pure function of the
data), while the physical plan never runs a global single-partition
window.
"""

import math

import pytest
from pyspark.sql import functions as F

from clawrag_spark.operators import dataset as DS
from clawrag_spark.operators import packing as PK
from clawrag_spark.operators import webtext as WT


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, (i * 37) % 100 + 1) for i in range(500)], "doc_id long, n_tok long"
    )


class TestPackShards:
    def expected(self, rows, budget):
        import hashlib

        order = sorted(
            rows, key=lambda r: hashlib.md5(f"pack|{r[0]}".encode()).hexdigest()
        )
        out, acc = {}, 0
        for doc_id, tok in order:
            out[doc_id] = (acc, acc // budget)
            acc += tok
        return out

    def test_matches_serial_prefix_sum(self, spark, docs):
        got = {
            r["doc_id"]: (r["start_offset"], r["shard_id"])
            for r in PK.pack_training_shards(docs, "doc_id", "n_tok", 700).collect()
        }
        want = self.expected(
            [(r["doc_id"], r["n_tok"]) for r in docs.collect()], 700
        )
        assert got == want

    def test_partition_count_invariant(self, spark, docs):
        a = PK.pack_training_shards(
            docs, "doc_id", "n_tok", 700, num_partitions=3
        ).collect()
        b = PK.pack_training_shards(
            docs, "doc_id", "n_tok", 700, num_partitions=17
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_every_shard_full_except_last(self, spark, docs):
        out = PK.pack_training_shards(docs, "doc_id", "n_tok", 700)
        per = (
            out.groupBy("shard_id")
            .agg(F.min("start_offset").alias("lo"))
            .orderBy("shard_id")
            .collect()
        )
        # shard k's first doc starts inside [k*B, (k+1)*B): the stream
        # is chopped with no gaps
        for r in per:
            assert 700 * r["shard_id"] <= r["lo"] < 700 * (r["shard_id"] + 1)

    def test_no_global_single_partition_window(self, spark, docs):
        out = PK.pack_training_shards(docs, "doc_id", "n_tok", 700)
        plan = plan_of(out)
        # the doc-bearing window must be partitioned (__pid); the only
        # unpartitioned window is the P-row offset cumsum.  A global
        # "Exchange SinglePartition" feeding a Sort of the full input
        # would betray the naive plan.
        assert "windowspecdefinition(__pid" in plan or "__pid" in plan
        # the full-input exchange is range or hash, never SinglePartition
        first_scan = plan.index("Range") if "Range" in plan else 0
        assert plan.count("Exchange SinglePartition") <= 1  # P-row offsets only

    def test_rejects_nonpositive_budget(self, spark, docs):
        with pytest.raises(ValueError):
            PK.pack_training_shards(docs, "doc_id", "n_tok", 0)


class TestPackSequences:
    CTX = 97  # prime, so boundaries land everywhere in the doc stream

    def test_spans_tile_sequences_exactly(self, spark, docs):
        out = PK.pack_sequences(
            docs, "doc_id", "n_tok", self.CTX, eos_tokens=1
        ).persist()
        total = docs.select(F.sum(F.col("n_tok") + 1)).collect()[0][0]
        per = {
            r["seq_id"]: r["filled"]
            for r in out.groupBy("seq_id")
            .agg(F.sum("n_span").alias("filled"))
            .collect()
        }
        n_seq = -(-total // self.CTX)
        # contiguous sequence ids, every one full except possibly the last
        assert set(per) == set(range(n_seq))
        for sid, filled in per.items():
            if sid < n_seq - 1:
                assert filled == self.CTX
        assert per[n_seq - 1] == total - (n_seq - 1) * self.CTX
        # within-sequence offsets stay inside [0, ctx] and are non-empty
        bad = out.filter(
            (F.col("tok_start") < 0)
            | (F.col("tok_end") > self.CTX)
            | (F.col("n_span") <= 0)
            | (F.col("tok_end") - F.col("tok_start") != F.col("n_span"))
        ).count()
        assert bad == 0
        out.unpersist()

    def test_doc_spans_reassemble_doc(self, spark, docs):
        out = PK.pack_sequences(docs, "doc_id", "n_tok", self.CTX, eos_tokens=1)
        per_doc = {
            r["doc_id"]: r["n"]
            for r in out.groupBy("doc_id").agg(F.sum("n_span").alias("n")).collect()
        }
        for r in docs.collect():
            assert per_doc[r["doc_id"]] == r["n_tok"] + 1

    def test_split_spans_are_adjacent_sequences(self, spark, docs):
        out = PK.pack_sequences(docs, "doc_id", "n_tok", self.CTX, eos_tokens=1)
        rows = sorted(
            ((r["doc_id"], r["seq_id"], r["tok_start"], r["tok_end"]) for r in out.collect()),
        )
        from itertools import groupby

        for doc, grp in groupby(rows, key=lambda t: t[0]):
            grp = list(grp)
            seqs = [g[1] for g in grp]
            assert seqs == list(range(seqs[0], seqs[0] + len(grp)))
            # interior boundaries: span ends at ctx, next starts at 0
            for a, b in zip(grp, grp[1:]):
                assert a[3] == self.CTX and b[2] == 0

    def test_partition_count_invariant(self, spark, docs):
        a = PK.pack_sequences(
            docs, "doc_id", "n_tok", self.CTX, num_partitions=3
        ).collect()
        b = PK.pack_sequences(
            docs, "doc_id", "n_tok", self.CTX, num_partitions=17
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_agrees_with_shard_assignment_on_first_token(self, spark, docs):
        """A doc's FIRST span lands in pack_training_shards' shard when
        ctx == budget and eos == 0 — the two layouts share the prefix sum."""
        shards = {
            r["doc_id"]: r["shard_id"]
            for r in PK.pack_training_shards(docs, "doc_id", "n_tok", 700).collect()
        }
        first = (
            PK.pack_sequences(docs, "doc_id", "n_tok", 700, eos_tokens=0)
            .groupBy("doc_id")
            .agg(F.min("seq_id").alias("s0"))
            .collect()
        )
        assert {r["doc_id"]: r["s0"] for r in first} == shards


class TestSnapshotDiff:
    def test_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, fp string"
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "C"), (4, "d")], "k long, fp string"
        )
        got = {
            r["k"]: r["status"]
            for r in WT.snapshot_diff(old, new, "k", "fp").collect()
        }
        assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    def test_fingerprints_carried(self, spark):
        old = spark.createDataFrame([(1, "x")], "k long, fp string")
        new = spark.createDataFrame([(1, "y")], "k long, fp string")
        row = WT.snapshot_diff(old, new, "k", "fp").collect()[0]
        assert (row["fp_old"], row["fp_new"]) == ("x", "y")


class TestUrlTemplates:
    def test_collapses_and_thresholds(self, spark):
        urls = [
            (f"https://ex.com/cal/2024/{d:02d}/view",) for d in range(1, 13)
        ] + [("https://ex.com/about",)]
        df = spark.createDataFrame(urls, "url string")
        out = WT.url_path_templates(df, min_urls=10).collect()
        assert len(out) == 1
        assert out[0]["template"] == "https://ex.com/cal/N/N/view"
        assert out[0]["n_urls"] == 12
        assert out[0]["example_url"] == "https://ex.com/cal/2024/01/view"

    def test_hex_runs_collapse(self, spark):
        df = spark.createDataFrame(
            [(f"https://ex.com/s/{h * 8}/p",) for h in "abcdef" * 2],
            "url string",
        )
        out = WT.url_path_templates(df, min_urls=2).collect()
        assert len(out) == 1 and out[0]["template"] == "https://ex.com/s/H/p"


class TestDsir:
    def test_target_like_docs_score_higher(self, spark):
        rows = [(i, "the quick brown fox jumps over lazy dogs", "en")
                for i in range(20)]
        rows += [(100 + i, "zzz qqq xxx www yyy vvv kkk jjj", "xx")
                 for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        target = docs.filter(F.col("lang") == "en")
        out = {
            r["doc_id"]: r["log_ratio"]
            for r in WT.dsir_importance(docs, target, "doc_id", "text").collect()
        }
        en_avg = sum(out[i] for i in range(20)) / 20
        xx_avg = sum(out[100 + i] for i in range(20)) / 20
        assert en_avg > xx_avg

    def test_deterministic(self, spark):
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma {i}", "en" if i % 2 else "de")
             for i in range(30)],
            "doc_id long, text string, lang string",
        )
        tgt = docs.filter(F.col("lang") == "en")
        a = sorted(map(tuple, WT.dsir_importance(docs, tgt, "doc_id", "text").collect()))
        b = sorted(map(tuple, WT.dsir_importance(docs, tgt, "doc_id", "text").collect()))
        assert a == b


class TestSemanticDedup:
    def test_keeps_min_id_per_dup_group(self, spark):
        rows = [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),     # dup of 1, same cell -> dropped
            (3, [0.0, 1.0], 0),     # orthogonal -> kept
            (4, [1.0, 0.0], 1),     # dup vector but different cell -> kept
            (5, [0.70710678, 0.70710678], 1),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        kept = sorted(
            r["vec_id"]
            for r in DS.semantic_dedup(emb, "vec_id", "embedding", "label", 0.9).collect()
        )
        assert kept == [1, 3, 4, 5]

    def test_threshold_respected(self, spark):
        # cos(v1, v2) = 0.8 exactly
        rows = [(1, [1.0, 0.0], 0), (2, [0.8, 0.6], 0)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        at_low = DS.semantic_dedup(emb, "vec_id", "embedding", "label", 0.79).count()
        at_high = DS.semantic_dedup(emb, "vec_id", "embedding", "label", 0.81).count()
        assert at_low == 1 and at_high == 2

    def test_boundary_is_inclusive_on_6dp_grid(self, spark):
        rows = [(1, [1.0, 0.0], 0), (2, [0.8, 0.6], 0)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        # round(cos,6) == 0.8 >= 0.8 -> dominated
        assert DS.semantic_dedup(emb, "vec_id", "embedding", "label", 0.8).count() == 1


class TestGlobalRank:
    def test_matches_serial_rank_and_partition_invariant(self, spark, docs):
        # total order: value desc, id asc; values collide across docs
        want = {
            d: r + 1
            for r, (d, _) in enumerate(
                sorted(
                    ((r["doc_id"], r["n_tok"]) for r in docs.collect()),
                    key=lambda t: (-t[1], t[0]),
                )
            )
        }
        for p in (3, 17):
            got = {
                r["doc_id"]: r["rank"]
                for r in PK.global_rank(
                    docs,
                    [F.col("n_tok").desc(), F.col("doc_id")],
                    num_partitions=p,
                ).collect()
            }
            assert got == want

    def test_no_single_partition_sort_of_input(self, spark, docs):
        out = PK.global_rank(docs, [F.col("n_tok").desc(), F.col("doc_id")])
        plan = plan_of(out)
        # the doc-bearing window is partitioned by __pid; the only
        # SinglePartition exchange is the P-row offset cumsum
        assert plan.count("Exchange SinglePartition") <= 1
        assert "rangepartitioning" in plan.lower()


class TestPackSequencesRandomized:
    def test_matches_serial_reference_randomized(self, spark):
        """Seeded random token-count tables vs a serial Python
        reference of the concat-and-chunk layout."""
        import hashlib
        import random

        rng = random.Random(77)
        for trial in range(5):
            ctx = rng.choice([16, 53, 100])
            eos = rng.choice([0, 1])
            rows = [(i, rng.randint(0, 3 * ctx)) for i in range(rng.randint(1, 120))]
            order = sorted(
                rows, key=lambda r: hashlib.md5(f"pack|{r[0]}".encode()).hexdigest()
            )
            want, acc = set(), 0
            for doc_id, tok in order:
                n = tok + eos
                if n <= 0:
                    continue
                s, e = acc, acc + n
                acc = e
                for seq in range(s // ctx, (e - 1) // ctx + 1):
                    lo, hi = max(s, seq * ctx), min(e, (seq + 1) * ctx)
                    want.add((seq, doc_id, lo - seq * ctx, hi - seq * ctx, hi - lo))
            df = spark.createDataFrame(rows, "doc_id long, n_tok long")
            got = {
                tuple(r)
                for r in PK.pack_sequences(
                    df, "doc_id", "n_tok", ctx, eos_tokens=eos
                ).collect()
            }
            assert got == want, f"trial {trial} (ctx={ctx}, eos={eos}) diverged"


def test_shard_manifest_tamper_detection(spark):
    """The xor checksum is partition-order independent but layout
    sensitive: repartitioning changes nothing; swapping two docs'
    offsets, editing a text, or dropping a doc changes the shard's
    checksum."""
    from pyspark.sql import functions as F
    from clawrag_spark.operators.packing import (
        pack_training_shards,
        shard_manifest,
    )

    docs = spark.createDataFrame(
        [(i, f"doc body {i} " * 5) for i in range(40)], ["doc_id", "text"]
    )
    toks = docs.select(
        "doc_id", F.lit(15).cast("long").alias("n_tokens")
    )
    packed = pack_training_shards(toks, "doc_id", "n_tokens", 100).persist()
    base = {
        r["shard_id"]: r.asDict()
        for r in shard_manifest(packed, docs, "doc_id", "text").collect()
    }
    assert sum(m["n_docs"] for m in base.values()) == 40
    assert all(m["n_tokens"] == m["n_docs"] * 15 for m in base.values())

    # partition order must not matter
    scrambled = {
        r["shard_id"]: r["content_xor"]
        for r in shard_manifest(
            packed.repartition(7), docs.repartition(3), "doc_id", "text"
        ).collect()
    }
    assert scrambled == {k: m["content_xor"] for k, m in base.items()}

    # swapping two documents' offsets within a shard must change it
    rows = packed.collect()
    same_shard = [r for r in rows if r["shard_id"] == rows[0]["shard_id"]][:2]
    a, b = same_shard[0]["doc_id"], same_shard[1]["doc_id"]
    off = {r["doc_id"]: r["start_offset"] for r in rows}
    swapped = packed.withColumn(
        "start_offset",
        F.when(F.col("doc_id") == a, F.lit(off[b]))
        .when(F.col("doc_id") == b, F.lit(off[a]))
        .otherwise(F.col("start_offset")),
    )
    tampered = {
        r["shard_id"]: r["content_xor"]
        for r in shard_manifest(swapped, docs, "doc_id", "text").collect()
    }
    sid = same_shard[0]["shard_id"]
    assert tampered[sid] != base[sid]["content_xor"]
    assert all(tampered[k] == base[k]["content_xor"] for k in base if k != sid)

    # editing one text flips exactly that doc's shard
    edited = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == a, F.lit("tampered")).otherwise(F.col("text")),
    )
    ed = {
        r["shard_id"]: r["content_xor"]
        for r in shard_manifest(packed, edited, "doc_id", "text").collect()
    }
    assert ed[sid] != base[sid]["content_xor"]
    packed.unpersist()


class TestBudgetSelection:
    """Greedy token-budget selection pinned against the naive ordered
    prefix computed in plain Python, partition-count independent."""

    def test_matches_naive_and_overshoot_bound(self, spark):
        from clawrag_spark.operators import packing as PK

        rows = [(i, (i * 37) % 100 + 1, float((i * 61) % 50)) for i in range(60)]
        df = spark.createDataFrame(rows, ["id", "toks", "score"])
        out = {
            r["id"]: (r["cum_before"], r["selected"])
            for r in PK.budget_selection(
                df,
                "id",
                "toks",
                [F.col("score").desc(), F.col("id")],
                token_budget=500,
                num_partitions=7,
            ).collect()
        }
        naive = sorted(rows, key=lambda r: (-r[2], r[0]))
        cum = 0
        picked_mass = 0
        for i, toks, _ in naive:
            assert out[i] == (cum, cum < 500), (i, out[i], cum)
            if cum < 500:
                picked_mass += toks
            cum += toks
        # greedy prefix: overshoot bounded by one doc
        assert picked_mass < 500 + max(t for _, t, _ in rows)
        # and independent of partitioning
        out3 = {
            r["id"]: (r["cum_before"], r["selected"])
            for r in PK.budget_selection(
                df,
                "id",
                "toks",
                [F.col("score").desc(), F.col("id")],
                token_budget=500,
                num_partitions=2,
            ).collect()
        }
        assert out3 == out

    def test_rejects_bad_budget(self, spark):
        from clawrag_spark.operators import packing as PK

        df = spark.createDataFrame([(1, 5)], ["id", "toks"])
        with pytest.raises(ValueError, match="positive"):
            PK.budget_selection(df, "id", "toks", [F.col("id")], 0)

"""Retrieval operators against planted fixtures with known answers
(FIXTURES.md §5): an exact-phrase hit for BM25, a paraphrase-ish
vector hit for cosine, fused rankings, and the reference's §-aware
tokenizer parity between UDF and oracle paths."""

import pytest
from pyspark.sql import functions as F

from clawrag_spark.core.bm25_tokenize import tokenize as oracle_tokenize
from clawrag_spark.operators.retrieval import (
    bm25_scores,
    cosine_topk,
    hybrid_minmax,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (0, "the solar panel subsidy act § 230 defines rebate tiers for households"),
        (1, "cats and dogs and other household pets need regular veterinary care"),
        (2, "solar energy adoption grows while panel prices keep falling yearly"),
        (3, "the weather yesterday was rainy with a chance of thunderstorms"),
        (4, "subsidy programs for solar panel installations expanded in § 230 rules"),
        (5, "completely unrelated text about cooking pasta with tomato sauce"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBm25Planted:
    def test_exact_phrase_wins(self, spark, planted):
        scored = bm25_scores(planted, "doc_id", "text", ["solar", "panel", "subsidy"])
        top = scored.orderBy(F.desc("bm25_score"), "doc_id").first()
        assert top["doc_id"] in (0, 4)  # both contain all three terms
        ids = {r["doc_id"] for r in scored.collect()}
        assert 3 not in ids and 5 not in ids  # no term overlap → no score

    def test_scores_positive_only(self, spark, planted):
        scored = bm25_scores(planted, "doc_id", "text", ["solar"])
        for r in scored.collect():
            assert r["bm25_score"] > 0


class TestCosinePlanted:
    def test_identical_vector_is_top(self, spark):
        from clawrag_spark.core.embedder import embed_text

        texts = {
            10: "solar panel subsidy",
            11: "solar panel subsidy",   # exact duplicate embedding
            12: "pasta tomato sauce recipe",
        }
        rows = [(k, embed_text(v, 64)) for k, v in texts.items()]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        qv = embed_text("solar panel subsidy", 64)
        top = cosine_topk(emb, "vec_id", "embedding", qv, 2).collect()
        assert [r["vec_id"] for r in top] == [10, 11]
        assert abs(top[0]["cos_sim"] - 1.0) < 1e-6


class TestFusionPlanted:
    def test_hybrid_minmax_degenerate_branch(self, spark):
        # single-row result sets exercise the max==min → (score>0 → 1.0)
        # branch (query.py:294-305)
        vec = spark.createDataFrame([(1, 0.8)], "doc_id long, vec_score double")
        bm = spark.createDataFrame([(2, 3.0)], "doc_id long, bm25_score double")
        fused = {r["doc_id"]: r["relevance_score"] for r in
                 hybrid_minmax(vec, bm, "doc_id", 10).collect()}
        # doc 1: vec present (max==min, >0 → 1.0), bm25 0 (max 3>min 0 → 0)
        assert abs(fused[1] - 0.5) < 1e-9
        assert abs(fused[2] - 0.5) < 1e-9

    def test_rrf_weights_and_rank_base(self, spark):
        r1 = spark.createDataFrame([(1, 9.0), (2, 8.0)], "doc_id long, score double")
        r2 = spark.createDataFrame([(2, 5.0), (3, 4.0)], "doc_id long, score double")
        fused = {r["doc_id"]: r["rrf_score"] for r in
                 rrf_fuse([(r1, 0.7), (r2, 0.3)], "doc_id", "score", 10).collect()}
        # 0-based ranks, k=60 (enhanced_hybrid_retriever.py:125)
        assert abs(fused[1] - 0.7 / 60) < 1e-12
        assert abs(fused[2] - (0.7 / 61 + 0.3 / 60)) < 1e-12
        assert abs(fused[3] - 0.3 / 61) < 1e-12


class TestTokenizerParity:
    def test_udf_matches_oracle(self, spark):
        from clawrag_spark.udfs import bm25_tokens

        texts = [
            "See § 230 and §42 now",
            "Room 205 on floor 3",
            "Hello World!",
            "",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [r["toks"] for r in
               df.select(bm25_tokens(F.col("text")).alias("toks")).collect()]
        assert got == [oracle_tokenize(t) for t in texts]


class TestCompatAndAdaptiveK:
    def test_embedding_compat_gate(self):
        from clawrag_spark.operators.retrieval import check_embedding_compat

        # same model modulo :latest tag normalization → ok
        check_embedding_compat("nomic-embed-text", 768, "nomic-embed-text:latest", 768)
        with pytest.raises(ValueError, match="model mismatch"):
            check_embedding_compat("nomic-embed-text:latest", 768, "mxbai:latest", 768)
        with pytest.raises(ValueError, match="dim mismatch"):
            check_embedding_compat("m:latest", 768, "m:latest", 64)

    def test_adaptive_collection_k(self):
        from clawrag_spark.operators.retrieval import adaptive_collection_k

        assert adaptive_collection_k(1) == 100
        assert adaptive_collection_k(4) == 25
        assert adaptive_collection_k(50) == 10   # floor
        assert adaptive_collection_k(0) == 100   # guard


# ------------------------------------------------- positional phrase


def test_phrase_match_counts_and_overlap(spark):
    from clawrag_spark.operators.retrieval import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "hash join beats sort merge; a hash join wins again"),
            (2, "hash then join later"),            # not adjacent
            (3, "the join hash order is reversed"),  # wrong order
            (4, "a a a"),                            # overlapping occurrences
        ],
        ["doc_id", "text"],
    )
    post = positional_postings(docs, "doc_id", "text")
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(post, "doc_id", "hash join").collect()
    }
    assert out == {1: 2}
    # repeated-term phrase: "a a" occurs at pos 0-1 and 1-2 (overlap ok)
    rep = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(post, "doc_id", "a a").collect()
    }
    assert rep == {4: 2}


def test_phrase_match_three_terms_and_validation(spark):
    from clawrag_spark.operators.retrieval import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [(1, "broadcast hash join plan"), (2, "broadcast join hash plan")],
        ["doc_id", "text"],
    )
    post = positional_postings(docs, "doc_id", "text")
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(post, "doc_id", "broadcast hash join").collect()
    }
    assert out == {1: 1}
    with pytest.raises(ValueError, match="phrase needs"):
        phrase_match(post, "doc_id", "solo")


def test_postings_gap_stats_exact_varint_math(spark):
    """Hand-computed gaps on a controlled posting list: term 'a' in
    docs {0, 1, 200} -> gaps (1, 1, 199) -> varint bytes (1, 1, 2);
    term 'b' in doc {16383} -> gap 16384 -> 15 bits -> 3 bytes."""
    from clawrag_spark.operators.retrieval import postings_gap_stats

    docs = spark.createDataFrame(
        [(0, "a"), (1, "a"), (200, "a"), (16383, "b")],
        ["doc_id", "text"],
    )
    rows = {r["df_magnitude"]: r.asDict() for r in
            postings_gap_stats(docs, "doc_id", "text").collect()}
    # df=3 -> magnitude 0; df=1 -> magnitude 0: both land in bucket 0
    assert list(rows) == [0]
    m = rows[0]
    assert m["n_terms"] == 2 and m["n_postings"] == 4
    assert m["est_bytes"] == (1 + 1 + 2) + 3
    assert m["avg_bytes_per_posting"] == round(7 / 4, 6)


def test_postings_gap_compression_curve(spark):
    """The economics the rollup exists to show: a dense (stopword-like)
    term costs fewer bytes per posting than sparse terms, because
    sorted-docid gaps shrink as df grows."""
    from clawrag_spark.operators.retrieval import postings_gap_stats

    rows = [(i, "dense" + (" rare" if i % 157 == 0 else "")) for i in range(3000)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["df_magnitude"]: r for r in
           postings_gap_stats(docs, "doc_id", "text").collect()}
    dense_mag, rare_mag = 3, 1  # df 3000 vs df 20
    assert out[dense_mag]["avg_bytes_per_posting"] < out[rare_mag]["avg_bytes_per_posting"]
    assert out[dense_mag]["avg_bytes_per_posting"] == 1.0  # gap 1 everywhere


# ------------------------------------------------------------ BM25F


def test_bm25f_title_hit_outranks_body_hit(spark):
    """Same term, same tf: a title occurrence (w=2, short field) must
    outscore a body occurrence (w=1, long field)."""
    from clawrag_spark.operators.retrieval import bm25f_scores

    docs = spark.createDataFrame(
        [
            (1, "solar power", "grid statistics and other market notes here"),
            (2, "market notes", "solar adoption keeps growing across regions"),
            (3, "cooking pasta", "tomato sauce recipes and kitchen techniques"),
        ],
        ["doc_id", "title", "body"],
    )
    fields = [("title", F.col("title"), 2.0, 0.5), ("body", F.col("body"), 1.0, 0.75)]
    out = {
        r["doc_id"]: r["bm25f_score"]
        for r in bm25f_scores(docs, "doc_id", fields, ["solar"]).collect()
    }
    assert out[1] > out[2]
    assert 3 not in out  # no hit → filtered by the positive-score gate


def test_bm25f_single_saturation_not_per_field_sum(spark):
    """The defining BM25F property (Robertson & Zaragoza 2009 §9): the
    pseudo-frequency saturates ONCE.  A doc with the term in both
    fields must score strictly less than the sum of two independent
    per-field saturations would give."""
    import math

    from clawrag_spark.operators.retrieval import bm25f_scores

    docs = spark.createDataFrame(
        [(1, "alpha", "alpha beta"), (2, "gamma", "delta beta")],
        ["doc_id", "title", "body"],
    )
    fields = [("title", F.col("title"), 1.0, 0.0), ("body", F.col("body"), 1.0, 0.0)]
    out = {
        r["doc_id"]: r["bm25f_score"]
        for r in bm25f_scores(docs, "doc_id", fields, ["alpha"], k1=1.5).collect()
    }
    # b=0 kills length normalization: tfq = 1 (title) + 1 (body) = 2.
    # N=2, df=1 → idf = ln(1 + 1.5/1.5) = ln 2.
    expect_single = math.log(2) * 2 / (1.5 + 2)
    per_field_sum = 2 * (math.log(2) * 1 / (1.5 + 1))
    assert out[1] == pytest.approx(expect_single)
    assert out[1] < per_field_sum


def test_bm25f_plan_no_cartesian_no_python(spark):
    from clawrag_spark.operators.retrieval import bm25f_scores

    docs = spark.createDataFrame(
        [(1, "t one", "b one two"), (2, "t two", "b two three")],
        ["doc_id", "title", "body"],
    )
    fields = [("title", F.col("title"), 2.0, 0.5), ("body", F.col("body"), 1.0, 0.75)]
    plan = bm25f_scores(docs, "doc_id", fields, ["one"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestProximityWindows:
    def _brute_min_cover(self, text, terms):
        import itertools, re as _re
        toks = [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]
        best = None
        for i in range(len(toks)):
            for j in range(i, len(toks)):
                win = toks[i:j + 1]
                if all(t in win for t in terms):
                    best = min(best or 10**9, j - i + 1)
                    break
        return best

    def test_matches_brute_force_min_cover(self, spark):
        from clawrag_spark.operators import retrieval as R

        docs = [
            (1, "alpha hash beta join gamma stream delta"),
            (2, "hash join stream"),
            (3, "stream x x x hash x x join x stream hash join"),
            (4, "hash only here with join but no third"),
            (5, "no terms at all"),
            (6, "hash hash hash join stream"),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        post = R.positional_postings(df, "doc_id", "text")
        terms = ["hash", "join", "stream"]
        got = {
            r.doc_id: (r.min_window, r.score)
            for r in R.proximity_windows(post, "doc_id", terms).collect()
        }
        for doc_id, text in docs:
            expect = self._brute_min_cover(text, terms)
            if expect is None:
                assert doc_id not in got
            else:
                assert got[doc_id][0] == expect, (doc_id, got.get(doc_id))
        # adjacent-packed terms score exactly 1.0
        assert got[2] == (3, 1.0)

    def test_duplicate_and_short_term_lists(self, spark):
        import pytest as _pytest

        from clawrag_spark.operators import retrieval as R

        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        post = R.positional_postings(df, "doc_id", "text")
        with _pytest.raises(ValueError):
            R.proximity_windows(post, "doc_id", ["a", "a"])

    def test_single_shuffle_no_python(self, spark):
        from clawrag_spark.operators import retrieval as R

        df = spark.createDataFrame([(1, "hash join stream")], ["doc_id", "text"])
        post = R.positional_postings(df, "doc_id", "text")
        plan = (
            R.proximity_windows(post, "doc_id", ["hash", "join"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        # window pass and final agg hash-partition on the same key: the
        # agg reuses the window's exchange, leaving ONE doc-id shuffle
        assert plan.count("Exchange hashpartitioning") <= 2


class TestDirichletQL:
    def test_matches_hand_computation(self, spark):
        import math

        from clawrag_spark.operators import retrieval as R

        docs = [
            (1, "hash join hash"),
            (2, "join stream other other"),
            (3, "other other other"),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r.doc_id: (r.doc_len, r.ql_score)
            for r in R.lm_dirichlet_scores(
                df, "doc_id", "text", ["hash", "join"], mu=10.0
            ).collect()
        }
        c_len = 10
        ctf = {"hash": 2, "join": 2}
        tfs = {
            1: {"hash": 2, "join": 1},
            2: {"hash": 0, "join": 1},
            3: {"hash": 0, "join": 0},
        }
        dls = {1: 3, 2: 4, 3: 3}
        for d in (1, 2, 3):
            exp = sum(
                math.log(
                    (tfs[d][t] + 10.0 * ctf[t] / c_len) / (dls[d] + 10.0)
                )
                for t in ("hash", "join")
            )
            assert got[d][0] == dls[d]
            assert abs(got[d][1] - round(exp, 6)) < 1e-6
        # the doc containing both terms outranks the partial match,
        # which outranks the smoothing-only doc
        assert got[1][1] > got[2][1] > got[3][1]

    def test_plan_no_python_no_cartesian(self, spark):
        from clawrag_spark.operators import retrieval as R

        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        plan = (
            R.lm_dirichlet_scores(df, "doc_id", "text", ["a"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan  # 1-row stats side broadcasts


class TestBestSnippetWindows:
    def test_picks_smallest_earliest_window(self, spark):
        from clawrag_spark.operators import retrieval as R

        docs = [
            # min cover is the trailing "hash join" + stream at pos 9:
            # window [8..10]; the leading spread-out cover is larger
            (1, "hash a b join c d stream e hash join stream"),
            (2, "join stream hash"),              # whole doc, len 3
            (3, "hash x join"),                   # missing stream
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        post = R.positional_postings(df, "doc_id", "text")
        got = {
            r.doc_id: (r.start_pos, r.end_pos, r.window_len)
            for r in R.best_snippet_windows(
                post, "doc_id", ["hash", "join", "stream"]
            ).collect()
        }
        assert got[1] == (8, 10, 3)
        assert got[2] == (0, 2, 3)
        assert 3 not in got
        # the span really contains all terms
        toks = docs[0][1].split()
        s, e, _ = got[1]
        assert {"hash", "join", "stream"} <= set(toks[s:e + 1])

    def test_tie_breaks_to_earliest_start(self, spark):
        from clawrag_spark.operators import retrieval as R

        df = spark.createDataFrame(
            [(1, "hash join x x hash join")], ["doc_id", "text"]
        )
        post = R.positional_postings(df, "doc_id", "text")
        r = R.best_snippet_windows(post, "doc_id", ["hash", "join"]).collect()
        assert (r[0].start_pos, r[0].end_pos) == (0, 1)


class TestRM3:
    """RM3 pseudo-relevance feedback: expansion distribution properties
    and the Indri-decomposition rerank pinned against the naive
    full-formula weighted QL computed in plain Python."""

    Q = ["solar", "panel"]

    def _fixture(self, spark):
        rows = [
            (0, "solar panel subsidy rebate solar panel grid inverter"),
            (1, "solar panel installation rooftop inverter grid battery"),
            (2, "cats dogs pets veterinary care grooming"),
            (3, "solar subsidy policy grid expansion rebate"),
            (4, "pasta tomato sauce cooking recipe dinner"),
            (5, "panel grid battery storage inverter rooftop"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_terms_distribution(self, spark):
        from clawrag_spark.operators.retrieval import rm3_expansion

        docs = self._fixture(spark)
        ex = rm3_expansion(
            docs, "doc_id", "text", self.Q, mu=10.0, fb_docs=3, fb_terms=5,
            alpha=0.5,
        )
        terms = {r["term"]: r["p_w"] for r in ex["terms"].collect()}
        # a proper distribution: alpha·1 + (1-alpha)·1
        assert abs(sum(terms.values()) - 1.0) < 1e-9
        # original terms keep at least their interpolated query mass
        for t in self.Q:
            assert terms[t] >= 0.5 / len(self.Q) - 1e-12
        # expansion picked feedback-doc vocabulary, not the cats/pasta docs
        assert "grid" in terms or "inverter" in terms or "rebate" in terms
        assert "cats" not in terms and "pasta" not in terms
        fb_ids = [r["doc_id"] for r in ex["feedback"].collect()]
        assert set(fb_ids) <= {0, 1, 3, 5} and len(fb_ids) == 3

    def test_rerank_matches_naive_formula(self, spark):
        import math

        from clawrag_spark.operators.retrieval import (
            rm3_expansion,
            rm3_rerank,
            sql_tokens,  # noqa: F401  (tokenizer contract shared below)
        )

        docs = self._fixture(spark)
        mu = 10.0
        ex = rm3_expansion(
            docs, "doc_id", "text", self.Q, mu=mu, fb_docs=3, fb_terms=5,
            alpha=0.5,
        )
        got = {
            r["doc_id"]: r["rm3_score"]
            for r in rm3_rerank(docs, "doc_id", "text", ex["terms"], mu=mu, k=10).collect()
        }
        p_w = {r["term"]: r["p_w"] for r in ex["terms"].collect()}
        import re

        toks = {
            i: [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
            for i, txt in [(r["doc_id"], r["text"]) for r in docs.collect()]
        }
        c_len = sum(len(v) for v in toks.values())
        ctf = {
            w: sum(ts.count(w) for ts in toks.values()) for w in p_w
        }
        for d, ts in toks.items():
            naive = sum(
                pw
                * math.log((ts.count(w) + mu * ctf[w] / c_len) / (len(ts) + mu))
                for w, pw in p_w.items()
            )
            assert abs(got[d] - naive) < 1e-5, (d, got[d], naive)
        # and the matched-terms docs outrank the no-overlap docs
        assert got[4] < min(got[0], got[1], got[3], got[5])

    def test_rerank_plan_no_python_no_cartesian(self, spark):
        from clawrag_spark.operators.retrieval import rm3_expansion, rm3_rerank

        docs = self._fixture(spark)
        ex = rm3_expansion(docs, "doc_id", "text", self.Q, mu=10.0, fb_docs=3)
        plan = rm3_rerank(
            docs, "doc_id", "text", ex["terms"], mu=10.0
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestPL2:
    """PL2 DFR scoring pinned against a plain-Python computation of the
    Poisson/Laplace/H2 formula on a tiny corpus."""

    def test_matches_hand_formula(self, spark):
        import math
        import re

        from clawrag_spark.operators.retrieval import (
            bm25_build_index,
            pl2_scores,
        )

        rows = [
            (0, "solar panel solar grid"),
            (1, "solar rooftop battery storage grid inverter"),
            (2, "cats dogs pets"),
            (3, "panel panel panel grid"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        idx = bm25_build_index(docs, "doc_id", "text")
        got = {
            r["doc_id"]: r["pl2_score"]
            for r in pl2_scores(idx, "doc_id", ["solar", "panel"], c=1.0).collect()
        }
        toks = {i: re.split(r"\s+", t) for i, t in rows}
        n = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n
        for d, ts in toks.items():
            s = 0.0
            for term in ("solar", "panel"):
                tf = ts.count(term)
                if tf == 0:
                    continue
                tfn = tf * math.log2(1.0 + avgdl / len(ts))
                lam = sum(v.count(term) for v in toks.values()) / n
                s += (
                    tfn * math.log2(tfn / lam)
                    + (lam - tfn) * math.log2(math.e)
                    + 0.5 * math.log2(2 * math.pi * tfn)
                ) / (tfn + 1.0)
            if d == 2:
                assert d not in got  # no match -> absent
            else:
                assert abs(got[d] - s) < 1e-5, (d, got[d], s)

    def test_plan_matched_only_no_python(self, spark):
        from clawrag_spark.operators.retrieval import (
            bm25_build_index,
            pl2_scores,
        )

        docs = spark.createDataFrame(
            [(0, "a b"), (1, "b c")], "doc_id long, text string"
        )
        idx = bm25_build_index(docs, "doc_id", "text")
        plan = (
            pl2_scores(idx, "doc_id", ["b"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestQueryClarity:
    """Clarity (KL of relevance vs collection model) separates a
    focused query from a background-shaped one."""

    def test_focused_beats_diffuse(self, spark):
        from clawrag_spark.operators.retrieval import query_clarity

        rows = [
            (0, "quantum entanglement qubit decoherence quantum qubit"),
            (1, "quantum qubit superposition entanglement gate"),
            (2, "the cat sat on the mat and the dog sat too"),
            (3, "the rain in spain falls mainly on the plain"),
            (4, "the the the cat dog mat rain plain gate"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        focused = sum(
            r["clarity_bits"]
            for r in query_clarity(
                docs, "doc_id", "text", ["quantum"], mu=5.0, fb_docs=2,
                fb_terms=5,
            ).collect()
        )
        diffuse = sum(
            r["clarity_bits"]
            for r in query_clarity(
                docs, "doc_id", "text", ["the"], mu=5.0, fb_docs=2,
                fb_terms=5,
            ).collect()
        )
        assert focused > diffuse

    def test_kl_nonnegative_terms_sum(self, spark):
        from clawrag_spark.operators.retrieval import query_clarity

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma{i} delta epsilon") for i in range(6)],
            "doc_id long, text string",
        )
        out = query_clarity(
            docs, "doc_id", "text", ["alpha", "beta"], mu=5.0, fb_docs=3,
            fb_terms=4,
        ).collect()
        assert 1 <= len(out) <= 4
        # p_rm is a (truncated, renormalized) distribution
        assert abs(sum(r["p_rm"] for r in out) - 1.0) < 1e-4
        # terms the model concentrates on have p_rm > p_coll -> positive KL
        assert sum(r["clarity_bits"] for r in out) > 0


class TestMMR:
    """MMR rerank: numpy-reference equality and the diversity story a
    planted near-duplicate cluster tells."""

    def _cands(self, spark):
        # 1 and 2 are near-identical top hits; 3 is diverse but a bit
        # less relevant; 4 is diverse and weak
        rows = [
            (1, 0.95, [1.0, 0.0, 0.0, 0.0]),
            (2, 0.94, [0.999, 0.01, 0.0, 0.0]),
            (3, 0.80, [0.0, 1.0, 0.0, 0.0]),
            (4, 0.40, [0.0, 0.0, 1.0, 0.0]),
        ]
        return spark.createDataFrame(
            rows, "vec_id long, cos_sim double, embedding array<double>"
        )

    def test_diversity_beats_redundancy(self, spark):
        from clawrag_spark.operators.retrieval import mmr_rerank

        picks = [
            r["vec_id"]
            for r in mmr_rerank(
                self._cands(spark), "vec_id", "cos_sim", "embedding",
                k=3, lam=0.5,
            ).orderBy("mmr_rank").collect()
        ]
        # raw order would be [1, 2, 3]; MMR demotes the near-dup 2
        assert picks[0] == 1
        assert picks[1] == 3
        assert picks[2] in (2, 4)

    def test_lambda_one_is_pure_relevance(self, spark):
        from clawrag_spark.operators.retrieval import mmr_rerank

        picks = [
            r["vec_id"]
            for r in mmr_rerank(
                self._cands(spark), "vec_id", "cos_sim", "embedding",
                k=4, lam=1.0,
            ).orderBy("mmr_rank").collect()
        ]
        assert picks == [1, 2, 3, 4]

    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from clawrag_spark.operators.retrieval import mmr_rerank

        rng_rows = [
            (i, float((i * 37 % 19) / 19.0), [float((i * j) % 7 - 3) for j in range(1, 6)])
            for i in range(1, 21)
        ]
        df = spark.createDataFrame(
            rng_rows, "vec_id long, cos_sim double, embedding array<double>"
        )
        lam = 0.6
        got = [
            (r["vec_id"], r["mmr_score"])
            for r in mmr_rerank(df, "vec_id", "cos_sim", "embedding", k=8, lam=lam)
            .orderBy("mmr_rank").collect()
        ]
        ids = [r[0] for r in rng_rows]
        rel = np.array([r[1] for r in rng_rows])
        mat = np.array([r[2] for r in rng_rows])
        n = np.linalg.norm(mat, axis=1)
        unit = np.divide(mat, n[:, None], out=np.zeros_like(mat), where=n[:, None] > 0)
        sims = unit @ unit.T
        order = sorted(range(len(ids)), key=lambda i: (-rel[i], ids[i]))
        rel, sims = rel[order], sims[np.ix_(order, order)]
        ids = [ids[i] for i in order]
        sel, rem, want = [], list(range(len(ids))), []
        for _ in range(8):
            pen = sims[np.ix_(rem, sel)].max(axis=1) if sel else np.zeros(len(rem))
            sc = lam * rel[rem] - (1 - lam) * pen
            b = int(np.argmax(sc))
            want.append((ids[rem[b]], float(sc[b])))
            sel.append(rem[b]); rem.pop(b)
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gi, gs), (wi, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-12

    def test_empty_and_zero_vectors(self, spark):
        from clawrag_spark.operators.retrieval import mmr_rerank

        empty = spark.createDataFrame(
            [], "vec_id long, cos_sim double, embedding array<double>"
        )
        assert mmr_rerank(empty, "vec_id", "cos_sim", "embedding").count() == 0
        zed = spark.createDataFrame(
            [(1, 0.5, [0.0, 0.0]), (2, 0.4, [1.0, 0.0])],
            "vec_id long, cos_sim double, embedding array<double>",
        )
        out = mmr_rerank(zed, "vec_id", "cos_sim", "embedding", k=2)
        assert out.count() == 2  # zero vector scores sim 0, no NaN

    def test_max_candidates_guard(self, spark):
        """The top-N contract is ENFORCED: an over-size frame raises
        (the kernel builds an N x N matrix) instead of OOMing the
        driver; an explicit override admits it."""
        from clawrag_spark.operators.retrieval import mmr_rerank

        cands = self._cands(spark)  # 4 rows
        with pytest.raises(ValueError, match="max_candidates"):
            mmr_rerank(
                cands, "vec_id", "cos_sim", "embedding", k=2,
                max_candidates=3,
            )
        assert (
            mmr_rerank(
                cands, "vec_id", "cos_sim", "embedding", k=2,
                max_candidates=4,
            ).count()
            == 2
        )

    def test_per_cell_union_equals_per_cell_driver_runs(self, spark):
        """mmr_per_cell (one applyInPandas pass) ≡ the driver kernel
        run cell by cell and unioned."""
        from clawrag_spark.operators.retrieval import (
            mmr_per_cell,
            mmr_rerank,
        )

        rows = [
            (i, i % 3, float((i * 37 % 19) / 19.0),
             [float((i * j) % 7 - 3) for j in range(1, 6)])
            for i in range(1, 25)
        ]
        df = spark.createDataFrame(
            rows,
            "vec_id long, cell int, cos_sim double, embedding array<double>",
        )
        got = sorted(
            (r["cell"], r["vec_id"], r["mmr_rank"],
             round(r["rel"], 9), round(r["mmr_score"], 9))
            for r in mmr_per_cell(
                df, "cell", "vec_id", "cos_sim", "embedding", k=4, lam=0.6
            ).collect()
        )
        want = []
        for cell in (0, 1, 2):
            sub = df.filter(F.col("cell") == cell)
            for r in mmr_rerank(
                sub, "vec_id", "cos_sim", "embedding", k=4, lam=0.6
            ).collect():
                want.append(
                    (cell, r["vec_id"], r["mmr_rank"],
                     round(r["rel"], 9), round(r["mmr_score"], 9))
                )
        assert got == sorted(want)

    def test_per_cell_cell_size_guard(self, spark):
        from clawrag_spark.operators.retrieval import mmr_per_cell

        df = self._cands(spark).withColumn("cell", F.lit(0))
        with pytest.raises(Exception, match="max_cell_rows"):
            mmr_per_cell(
                df, "cell", "vec_id", "cos_sim", "embedding", k=2,
                max_cell_rows=2,
            ).collect()


class TestLtrPairwise:
    """Linear RankNet: the distributed pair-staged GD is pinned against
    full-batch numpy on the same pairs, and the learned scorer must
    rank a separable synthetic feature set by relevance."""

    @staticmethod
    def _fixture(spark):
        # two queries, graded labels; feature[0] correlates with label,
        # feature[1] is an anti-signal, feature[2] is constant noise
        rows = []
        for qid in (0, 1):
            for i, label in enumerate([3, 2, 2, 1, 0, 0]):
                rows.append(
                    (
                        qid,
                        qid * 10 + i,
                        label,
                        [
                            0.2 * label + 0.01 * i,
                            0.1 * (3 - label),
                            0.5,
                        ],
                    )
                )
        return spark.createDataFrame(
            rows, "qid int, doc_id int, label int, features array<double>"
        )

    def test_weights_match_numpy_full_batch(self, spark):
        import numpy as np

        from clawrag_spark.operators.retrieval import fit_ltr_pairwise

        feats = self._fixture(spark)
        got = np.array(
            fit_ltr_pairwise(
                feats, "qid", "label", "features", n_iters=20, lr=0.5
            )
        )
        rows = feats.collect()
        diffs = []
        for a in rows:
            for b in rows:
                if a["qid"] == b["qid"] and a["label"] > b["label"]:
                    diffs.append(
                        np.array(a["features"]) - np.array(b["features"])
                    )
        M = np.array(diffs)
        w = np.zeros(3)
        for _ in range(20):
            coef = -1.0 / (1.0 + np.exp(M @ w))
            g = M.T @ coef
            w = w - 0.5 * (g / len(M) + 1e-4 * w)
        np.testing.assert_allclose(got, w, atol=1e-9)
        # learned direction: positive on the label-correlated feature,
        # negative on the anti-signal
        assert got[0] > 0 and got[1] < 0

    def test_scorer_ranks_by_relevance(self, spark):
        import pyspark.sql.functions as F

        from clawrag_spark.operators.retrieval import (
            fit_ltr_pairwise,
            score_ltr,
        )

        feats = self._fixture(spark)
        w = fit_ltr_pairwise(feats, "qid", "label", "features", n_iters=40)
        scored = feats.select(
            "qid", "label", score_ltr("features", w).alias("s")
        ).collect()
        by_q = {}
        for r in scored:
            by_q.setdefault(r["qid"], []).append((r["s"], r["label"]))
        for q, pairs in by_q.items():
            ranked = [lab for _, lab in sorted(pairs, reverse=True)]
            assert ranked == sorted(ranked, reverse=True), (q, ranked)

    def test_no_orderable_pairs_raises(self, spark):
        import pytest

        from clawrag_spark.operators.retrieval import fit_ltr_pairwise

        flat = spark.createDataFrame(
            [(0, 1, [1.0]), (0, 1, [2.0])],
            "qid int, label int, features array<double>",
        )
        with pytest.raises(ValueError, match="no orderable pairs"):
            fit_ltr_pairwise(flat, "qid", "label", "features")


def test_combmnz_consensus_outranks_single_list(spark):
    """A doc returned by BOTH lists beats a doc with the same summed
    normalized score from one list (the MNZ multiplier), and the
    degenerate all-equal list contributes 1.0 for positive scores."""
    from clawrag_spark.operators.retrieval import combmnz_fuse
    import pyspark.sql.functions as F

    a = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(1, 3.0), (4, 3.0)], "doc_id long, score double"  # degenerate
    )
    out = {r["doc_id"]: r for r in
           combmnz_fuse([a, b], "doc_id", "score", 10).collect()}
    # doc 1: list a norm 1.0 + list b degenerate-positive 1.0, MNZ x2
    assert out[1]["n_lists"] == 2 and out[1]["combmnz_score"] == 4.0
    # doc 4: only the degenerate list -> 1.0 * 1
    assert out[4]["n_lists"] == 1 and out[4]["combmnz_score"] == 1.0
    assert out[2]["combmnz_score"] == 0.5 and out[3]["combmnz_score"] == 0.0

"""Tokenizer-fitting and model-in-the-loop operators.

The distributed BPE trainer is pinned byte-for-byte against a pure-
Python reference (same tie-break, same stop rule); the LR quality
classifier is pinned against a numpy reference within float tolerance
(distributed sums are order-dependent); vocab coverage gets property
checks (its cross-engine hash oracle lives in test_entry_oracle).
"""

import math

import pytest
from pyspark.sql import functions as F

from clawrag_spark.operators import tokenizer as TK

CORPUS = [
    "the cat sat on the mat the cat",
    "low lower lowest slowest slow slow",
    "new newer newest news knew",
    "the the the banana bandana ban",
    "widget widgets widgetry wide widely",
    "123 456 123 123 ... !!",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )


def test_fit_bpe_matches_reference_exactly(spark, docs):
    wc = TK.word_counts(docs, "text")
    freq = {r["word"]: r["freq"] for r in wc.collect()}
    got = TK.fit_bpe(wc, n_merges=25)  # capped-head production path
    got_rounds = TK.fit_bpe_rounds(wc, n_merges=25)  # distributed loop
    want = TK.fit_bpe_reference(freq, n_merges=25)
    assert got == want
    assert got_rounds == want
    assert len(got) >= 10  # non-vacuous: this corpus supports many merges
    # ranks are dense and ordered
    assert [m["rank"] for m in got] == list(range(len(got)))
    # pair frequencies never increase out of order with the argmax rule
    # (they CAN go back up after unrelated merges, so only sanity-check > 1)
    assert all(m["pair_freq"] > 1 for m in got)


def test_fit_bpe_tie_break_is_lexicographic(spark):
    # two pairs with identical frequency: ("ab" in "abq" vs "ac" in "acq")
    docs = spark.createDataFrame(
        [(0, "abq abq acq acq")], "doc_id int, text string"
    )
    wc = TK.word_counts(docs, "text")
    merges = TK.fit_bpe(wc, n_merges=1)
    # both (a,b) and (a,c) appear twice (plus space-prefixed variants);
    # lexicographic order must pick the same winner as the reference
    ref = TK.fit_bpe_reference({r["word"]: r["freq"] for r in wc.collect()}, 1)
    assert merges == ref


def test_encode_bpe_counts_shrink_with_merges(spark, docs):
    wc = TK.word_counts(docs, "text")
    merges = TK.fit_bpe(wc, n_merges=20)
    no_merge = {
        r["doc_id"]: r["n_tokens"]
        for r in TK.encode_bpe(docs, "doc_id", "text", []).collect()
    }
    merged = {
        r["doc_id"]: r["n_tokens"]
        for r in TK.encode_bpe(docs, "doc_id", "text", merges).collect()
    }
    assert set(no_merge) == set(merged)
    assert all(merged[i] <= no_merge[i] for i in no_merge)
    assert sum(merged.values()) < sum(no_merge.values())
    # zero merges == symbol count == total chars of the pre-tokens
    row = docs.select(
        F.aggregate(
            F.regexp_extract_all(
                F.lower("text"), F.lit(TK.PRETOKEN_RE), 0
            ),
            F.lit(0),
            lambda a, x: a + F.length(x),
        ).alias("n"),
        "doc_id",
    ).collect()
    for r in row:
        assert no_merge[r["doc_id"]] == r["n"]


def test_encode_bpe_matches_reference_apply(spark, docs):
    """Applying the learned merges IN RANK ORDER with the reference's
    fold must give the same token count as the rank-dict encoder —
    the two standard algorithms agree when every merge was learned
    from this corpus (no adoption of out-of-corpus merge order)."""
    wc = TK.word_counts(docs, "text")
    merges = TK.fit_bpe(wc, n_merges=15)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in TK.encode_bpe(docs, "doc_id", "text", merges).collect()
    }
    import re

    pat = re.compile(TK.PRETOKEN_RE)
    for i, text in enumerate(CORPUS):
        n = 0
        for word in pat.findall(text.lower()):
            sym = list(word)
            for m in merges:
                out = []
                for x in sym:
                    if out and out[-1] == m["left"] and x == m["right"]:
                        out[-1] = m["merged"]
                    else:
                        out.append(x)
                sym = out
            n += len(sym)
        assert got[i] == n, f"doc {i}"


def _lr_reference(rows, n_features, n_iters, lr, l2):
    """Numpy-free pure-Python LR identical to fit_quality_classifier's
    update rule (full-batch GD, binary hashed features)."""
    w = [0.0] * n_features
    bias = 0.0
    n = len(rows)
    for _ in range(n_iters):
        g = [0.0] * n_features
        gb = 0.0
        for feats, y in rows:
            m = sum(w[f] for f in feats) + bias
            e = 1.0 / (1.0 + math.exp(-m)) - y
            for f in feats:
                g[f] += e
            gb += e
        w = [wi - lr * (gi / n + l2 * wi) for wi, gi in zip(w, g)]
        bias -= lr * gb / n
    return w, bias


def test_quality_classifier_matches_reference(spark):
    texts = [
        (0, "good clean prose with many real words here", 1),
        (1, "xx zz qq junk junk junk spam spam", 0),
        (2, "another wholesome sentence of text quality", 1),
        (3, "zzzz qqqq click here spam buy now", 0),
        (4, "words flow nicely in this document body", 1),
        (5, "qq zz xx yy spam junk click buy", 0),
    ]
    docs = spark.createDataFrame(texts, "doc_id int, text string, label int")
    d, iters, lr, l2 = 64, 10, 0.5, 1e-4
    got = TK.fit_quality_classifier(
        docs, "doc_id", "text", "label",
        n_features=d, n_iters=iters, lr=lr, l2=l2,
    )
    # reference rows: same hashing as _hashed_features (Spark murmur3) —
    # pull the hashed features out of Spark itself so only the GD math
    # is under test here
    feat_rows = (
        TK._hashed_features(docs, "doc_id", "text", d)
        .groupBy("__id").agg(F.collect_set("feat").alias("fs")).collect()
    )
    fmap = {r["__id"]: sorted(r["fs"]) for r in feat_rows}
    rows = [(fmap.get(i, []), y) for i, _, y in texts]
    w_ref, b_ref = _lr_reference(rows, d, iters, lr, l2)
    assert got[d] == pytest.approx(b_ref, rel=1e-9, abs=1e-12)
    for i in range(d):
        assert got[i] == pytest.approx(w_ref[i], rel=1e-9, abs=1e-12), i
    # and the classifier actually separates the weak labels
    scored = {
        r["doc_id"]: r["quality_pred"]
        for r in TK.score_quality(docs, "doc_id", "text", got).collect()
    }
    assert scored == {i: y for i, _, y in texts}


def test_vocab_coverage_properties(spark, docs):
    full = TK.vocab_coverage(docs, "doc_id", "text", vocab_size=10_000)
    assert all(r["oov_rate"] == 0.0 for r in full.collect())
    tight = {
        r["doc_id"]: r["oov_rate"]
        for r in TK.vocab_coverage(docs, "doc_id", "text", vocab_size=2).collect()
    }
    assert any(v > 0 for v in tight.values())
    assert all(0.0 <= v <= 1.0 for v in tight.values())


# ------------------------------------------------------------- unigram


def test_viterbi_is_optimal_vs_brute_force():
    """The DP must return the max-log-prob segmentation for every word
    over a random-ish piece set — checked against brute-force
    enumeration of ALL segmentations."""
    import itertools

    logp = {
        "a": -2.0, "b": -2.1, "c": -2.2, "ab": -1.5, "bc": -1.4,
        "abc": -3.9, "abca": -4.0, "ca": -1.6,
    }

    def brute(word):
        best = None
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            seg = [word[pos[k]: pos[k + 1]] for k in range(len(pos) - 1)]
            if any(p not in logp for p in seg):
                continue
            score = sum(logp[p] for p in seg)
            # same tie-break as the DP: longer last piece wins on ties,
            # applied right-to-left (larger final split point first)
            key = (score,)
            if best is None or key > best[0]:
                best = (key, seg)
        return best

    for word in ["abc", "abca", "abcabc", "cab", "aabbcc", "abcbcab"]:
        got = TK._viterbi_segment(word, logp, max_piece_len=4)
        want = brute(word)
        if want is None:
            assert got is None
            continue
        got_score = sum(logp[p] for p in got)
        assert got_score == pytest.approx(want[0][0], abs=1e-12), word


def test_fit_unigram_deterministic_and_covering(spark, docs):
    words = TK.word_counts(docs, "text")
    p1 = TK.fit_unigram(words, vocab_size=60, seed_size=200, n_iters=3)
    p2 = TK.fit_unigram(words, vocab_size=60, seed_size=200, n_iters=3)
    assert p1 == p2, "EM must be bit-deterministic"
    pieces = {d["piece"] for d in p1}
    # coverage guarantee: every single char of the corpus pre-tokens
    import re

    chars = set()
    for (t,) in docs.select("text").collect():
        for w in re.findall(TK.PRETOKEN_RE, (t or "").lower()):
            chars |= set(w)
    assert chars <= pieces
    # compression: multi-char pieces exist and logprobs are finite
    assert any(len(p) > 1 for p in pieces)
    assert all(math.isfinite(d["logprob"]) for d in p1)


def test_encode_unigram_beats_chars_and_is_exact(spark, docs):
    words = TK.word_counts(docs, "text")
    pieces = TK.fit_unigram(words, vocab_size=80, seed_size=200, n_iters=3)
    out = {
        r["doc_id"]: r
        for r in TK.encode_unigram(docs, "doc_id", "text", pieces).collect()
    }
    logp = {d["piece"]: d["logprob"] for d in pieces}
    import re

    for doc_id, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
        want = sum(
            len(TK._viterbi_segment(w, logp, 8) or w)
            for w in re.findall(TK.PRETOKEN_RE, (text or "").lower())
        )
        assert out[doc_id]["n_tokens"] == want
        # unigram tokens never exceed character count
        n_chars_tok = sum(
            len(w) for w in re.findall(TK.PRETOKEN_RE, (text or "").lower())
        )
        assert out[doc_id]["n_tokens"] <= n_chars_tok

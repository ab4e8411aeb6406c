"""C4 semantic splitter: breakpoint semantics, span fidelity, fallback,
plus the chunker-guard fixes (fixed-window overlap validation,
separator-cascade span fidelity for non-borrowed chunks)."""

import numpy as np
import pytest

from clawrag_spark.core import chunkers
from clawrag_spark.core.chunkers import (
    Chunk,
    fixed_window_chunks,
    semantic_chunks,
    sentence_chunks,
    separator_cascade_chunks,
)

TOPIC_A = "Alpha beta gamma delta epsilon words about botany and flowers. "
TOPIC_B = "Zebra quartz xylophone jukebox vortex machinery gears pistons. "


def _topic_text(seed=5, n_per_topic=12):
    import random

    rng = random.Random(seed)
    a_words = "alpha beta gamma delta flower petal stem leaf botany garden".split()
    b_words = "zebra quartz xylophone jukebox vortex machine gear piston engine metal".split()

    def sent(words, i):
        return " ".join(rng.choice(words) for _ in range(8)) + f" tag{i}. "

    sents = [sent(a_words, i) for i in range(n_per_topic)] + [
        sent(b_words, i + 100) for i in range(n_per_topic)
    ]
    return "".join(sents), sum(len(s) for s in sents[:n_per_topic])


def test_splits_near_topic_boundary():
    text, boundary = _topic_text()
    out = semantic_chunks(text)
    assert len(out) >= 2
    # a break lands within one sentence (~60 chars) of the topic edge
    assert any(abs(c.char_end - boundary) <= 60 for c in out[:-1])


def test_spans_exact_and_cover_text():
    text = TOPIC_A * 5 + TOPIC_B * 5
    out = semantic_chunks(text)
    for c in out:
        assert text[c.char_start:c.char_end].strip() == c.text
    # groups are contiguous and ordered
    for a, b in zip(out, out[1:]):
        assert a.char_end <= b.char_start + 1


def test_uniform_distances_give_single_chunk():
    # identical sentences → all distances 0 → nothing exceeds the
    # 95th percentile (strict >) → one chunk
    text = "The same sentence again. " * 10
    out = semantic_chunks(text)
    assert len(out) == 1
    assert out[0].text == text.strip()


def test_deterministic():
    text = TOPIC_A * 6 + TOPIC_B * 6 + TOPIC_A * 3
    assert semantic_chunks(text) == semantic_chunks(text)


def test_single_sentence_and_empty():
    assert semantic_chunks("") == []
    out = semantic_chunks("One lonely sentence.")
    assert out == [Chunk("One lonely sentence.", 0, 20)]


def test_fallback_to_sentence_splitter(monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("embedder down")

    monkeypatch.setattr("clawrag_spark.core.embedder.embed_many_np", boom)
    text = TOPIC_A * 8 + TOPIC_B * 8
    assert semantic_chunks(text, fallback_size=30, fallback_overlap=5) == (
        sentence_chunks(text, 30, 5)
    )


def test_breakpoints_match_independent_recomputation():
    # recompute windows/distances/threshold independently (numpy linear-
    # interpolation percentile, strict >, split-after semantics — the
    # LlamaIndex algorithm) and require identical chunk boundaries
    from clawrag_spark.core.chunkers import _SENT_RE
    from clawrag_spark.core.embedder import embed_many_np

    text, _ = _topic_text(seed=9, n_per_topic=15)
    sents = [
        (m.group(0), m.start(), m.end())
        for m in _SENT_RE.finditer(text)
        if m.group(0).strip()
    ]
    windows = [
        "".join(s[0] for s in sents[max(0, i - 1): i + 2])
        for i in range(len(sents))
    ]
    emb = embed_many_np(windows, 64).astype(np.float64)
    dist = 1.0 - (emb[:-1] * emb[1:]).sum(axis=1)
    thr = np.percentile(dist, 95)
    expect_break_ends = [
        sents[i][2] for i in range(len(sents) - 1) if dist[i] > thr
    ]
    assert expect_break_ends, "fixture produced no breakpoints"
    got = semantic_chunks(text)
    assert [c.char_end for c in got[:-1]] == expect_break_ends


def test_fixed_window_rejects_degenerate_overlap():
    with pytest.raises(ValueError):
        fixed_window_chunks("x" * 100, chunk_size=10, overlap=10)
    with pytest.raises(ValueError):
        fixed_window_chunks("x" * 100, chunk_size=10, overlap=20)


def test_separator_cascade_nonborrowed_span_fidelity():
    text = "para one here.\n\npara two words.\n\npara three again.\n\nmore."
    out = separator_cascade_chunks(text, chunk_size=20, chunk_overlap=0)
    # with zero overlap no chunk borrows: spans must be exact
    for c in out:
        assert text[c.char_start:c.char_end].strip() == c.text


class TestTopicChunks:
    """TextTiling (Hearst 1997) spec pins: span exactness, coverage,
    determinism, and the true topic boundary on a two-topic text."""

    TWO_TOPIC = (
        "The cat sat on the mat. The cat likes the mat. A cat and a mat. "
        "The cat purred on the mat. Cats love mats. The mat suits the cat. "
        "Stocks fell sharply today. The market dropped on rate fears. "
        "Traders sold stocks fast. The index closed lower. Rates hurt "
        "stocks. Bond yields rose again."
    )

    def test_spans_exact_and_ordered(self):
        from clawrag_spark.core.chunkers import topic_chunks

        cs = topic_chunks(self.TWO_TOPIC)
        assert cs  # non-vacuous
        last_end = 0
        for c in cs:
            assert self.TWO_TOPIC[c.char_start:c.char_end].strip() == c.text
            assert c.char_start >= last_end - 1  # family strip convention
            last_end = c.char_end
        assert cs[-1].char_end == len(self.TWO_TOPIC)

    def test_true_boundary_found(self):
        from clawrag_spark.core.chunkers import topic_chunks

        cs = topic_chunks(self.TWO_TOPIC)
        shift = self.TWO_TOPIC.index("Stocks fell")
        assert any(c.char_start == shift for c in cs)

    def test_deterministic_and_edges(self):
        from clawrag_spark.core.chunkers import topic_chunks

        assert topic_chunks("") == []
        assert len(topic_chunks("One. Two.")) == 1  # below 2*block_size
        a = topic_chunks(self.TWO_TOPIC)
        b = topic_chunks(self.TWO_TOPIC)
        assert a == b

    def test_expected_parquet_matches_live_chunker(self):
        """The committed content-addressed parquet must equal the live
        chunker's output for the 'topic' rows (oracle-drift guard,
        same contract as the semantic rows)."""
        import hashlib

        import pyarrow.parquet as pq

        from clawrag_spark.core.chunkers import topic_chunks

        t = pq.read_table(
            "/root/repo/data/expected_chunkers.parquet"
        ).to_pylist()
        rows = [r for r in t if r["chunker"] == "topic"]
        assert rows
        by_md5: dict = {}
        for r in rows:
            by_md5.setdefault(r["text_md5"], []).append(r)
        checked = 0
        for md5, grp in list(by_md5.items())[:20]:
            # recover a text with this md5 from the sf0.001 documents
            import duckdb

            hit = duckdb.sql(
                "SELECT text FROM read_parquet("
                "'/root/testdata/sf0.001/documents.parquet') "
                f"WHERE md5(text) = '{md5}' LIMIT 1"
            ).fetchall()
            if not hit:
                continue
            text = hit[0][0]
            live = [
                (i, c.char_start, c.char_end)
                for i, c in enumerate(topic_chunks(text))
            ]
            exp = sorted(
                (r["chunk_index"], r["char_start"], r["char_end"])
                for r in grp
            )
            assert live == exp
            checked += 1
        assert checked > 0

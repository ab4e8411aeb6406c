"""Deterministic chunkers, bug-for-bug with the reference where noted.

Every chunker maps ``text -> list[Chunk]`` where ``Chunk = (text,
char_start, char_end)``; spans index into the *extracted* text.  The same
functions run inside the Spark pandas UDF (then ``posexplode``) and in
the single-process oracle.

Reference implementations:
- C1 fixed-window:      backend/src/services/ingest_v2/pipeline.py:141-154
- C2 separator-cascade: backend/src/core/indexing_service.py:576-612
- C3 sentence splitter: LlamaIndex SentenceSplitter behavior, re-specified
                        deterministically (see ``sentence_chunks``)
- C5 code splitter:     backend/src/services/code_loader.py:192-289
- C6 parent-child:      backend/src/core/indexing_service.py:373-506
"""

from __future__ import annotations

import re
from typing import NamedTuple


class Chunk(NamedTuple):
    text: str
    char_start: int
    char_end: int


# Separator cascade order — indexing_service.py:43.
DEFAULT_SEPARATORS = ("\n\n", "\n", ". ", " ", "")


def fixed_window_chunks(text: str, chunk_size: int = 512, overlap: int = 128) -> list[Chunk]:
    """C1: ``text[start:start+size]`` windows, ``start += size - overlap``.

    Bug-for-bug with ingest_v2/pipeline.py:141-154 including its end
    guard (``start >= len-overlap and end >= len`` breaks the loop), which
    can emit a final short chunk overlapping the previous one.
    """
    if overlap >= chunk_size:
        # start = end - overlap would never advance → unbounded loop
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_size ({chunk_size})"
        )
    if not text:
        return []
    chunks: list[Chunk] = []
    start = 0
    n = len(text)
    while start < n:
        end = start + chunk_size
        chunks.append(Chunk(text[start:end], start, min(end, n)))
        start = end - overlap
        if start >= n - overlap and end >= n:
            break
    return chunks


def separator_cascade_chunks(
    text: str,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
) -> list[Chunk]:
    """C2: greedy fill on the *first* matching separator.

    Bug-for-bug with indexing_service.py:576-612:

    - only the first separator present in the text is used (the reference
      ``break``s after one cascade level — not a true recursive splitter),
    - the size check ignores the separator's own length,
    - every split gets the separator re-appended (including the last),
    - each emitted chunk is ``strip()``-ed,
    - overlap is the last ``chunk_overlap`` chars of the previously
      *emitted (stripped)* chunk.

    Divergence (documented): the reference's separator list ends with
    ``""`` and ``"" in text`` is always true, so a text containing none
    of the other separators reaches ``text.split("")`` which *raises
    ValueError* in CPython.  We instead treat ``""`` as a split into
    single characters, which is the only sensible total extension.

    Spans: ``char_start``/``char_end`` cover the chunk's source segments
    in the input text; the overlap prefix borrowed from the previous
    chunk extends ``char_start`` left by the borrowed length.  For
    borrowed-overlap chunks the spans are therefore APPROXIMATE (the
    borrowed prefix is taken from the previous chunk's *stripped* text,
    whose characters need not sit at exactly ``char_start..``): they
    bound the source region but ``text[char_start:char_end]`` is not
    guaranteed to equal ``chunk.text``.  Chunks that borrowed nothing
    satisfy ``text[char_start:char_end].strip() == chunk.text``
    (pinned by test_core_units).  Downstream consumers that need exact
    source slices should use the non-overlap chunkers or the sentence
    splitter, whose spans are exact.
    """
    if not text:
        return []

    sep = None
    for candidate in separators:
        if candidate and candidate in text:
            sep = candidate
            break
        if candidate == "":
            sep = ""
            break
    if sep is None:
        return [Chunk(text.strip(), 0, len(text))]

    if sep == "":
        splits = list(text)
        positions = list(range(len(text)))
        sep_len = 0
    else:
        splits = text.split(sep)
        sep_len = len(sep)
        positions = []
        pos = 0
        for s in splits:
            positions.append(pos)
            pos += len(s) + sep_len

    out: list[Chunk] = []
    cur = ""
    cur_start = 0          # span start of current chunk in source text
    cur_end = 0            # span end (exclusive)
    cur_has_content = False

    def emit() -> None:
        nonlocal cur
        stripped = cur.strip()
        out.append(Chunk(stripped, cur_start, min(cur_end, len(text))))

    for i, split in enumerate(splits):
        seg_start = positions[i]
        seg_end = min(seg_start + len(split) + sep_len, len(text))
        if len(cur) + len(split) <= chunk_size:
            if not cur_has_content:
                cur_start = seg_start
                cur_has_content = True
            cur += split + sep
            cur_end = seg_end
        else:
            if cur:
                emit()
            if out and chunk_overlap > 0:
                overlap_text = out[-1].text[-chunk_overlap:]
                cur = overlap_text + split + sep
                cur_start = max(0, seg_start - len(overlap_text))
            else:
                cur = split + sep
                cur_start = seg_start
            cur_end = seg_end
            cur_has_content = True

    if cur:
        emit()
    if not out:
        return [Chunk(text, 0, len(text))]
    return out


_SENT_RE = re.compile(r"[^.!?\n]*[.!?]+(?:[\"')\]]+)?\s*|[^.!?\n]+\n*|\n+")
_TOKEN_RE = re.compile(r"\S+")


def sentence_chunks(text: str, chunk_size: int = 512, overlap: int = 50) -> list[Chunk]:
    """C3: deterministic sentence splitter (LlamaIndex-equivalent shape).

    ``chunk_size``/``overlap`` are in whitespace tokens (the reference
    counts model tokens; we pin whitespace tokens as the documented,
    reproducible rule — SURVEY.md §7.0).  Sentences are merged greedily
    up to the token budget; overlap carries whole trailing sentences of
    the previous chunk whose combined token count is ≤ ``overlap``.
    """
    if not text:
        return []

    sentences: list[tuple[str, int, int]] = []  # (sentence, start, end)
    for m in _SENT_RE.finditer(text):
        s = m.group(0)
        if s.strip():
            sentences.append((s, m.start(), m.end()))
    if not sentences:
        return [Chunk(text.strip(), 0, len(text))]

    def ntok(s: str) -> int:
        return len(_TOKEN_RE.findall(s))

    out: list[Chunk] = []
    cur: list[tuple[str, int, int]] = []
    cur_tokens = 0

    def emit() -> None:
        start = cur[0][1]
        end = cur[-1][2]
        out.append(Chunk(text[start:end].strip(), start, end))

    i = 0
    while i < len(sentences):
        sent, s_start, s_end = sentences[i]
        t = ntok(sent)
        if cur and cur_tokens + t > chunk_size:
            emit()
            # carry trailing sentences within the overlap token budget
            carried: list[tuple[str, int, int]] = []
            carried_tokens = 0
            for prev in reversed(cur):
                pt = ntok(prev[0])
                if carried_tokens + pt > overlap:
                    break
                carried.insert(0, prev)
                carried_tokens += pt
            cur = carried
            cur_tokens = carried_tokens
        cur.append(sentences[i])
        cur_tokens += t
        i += 1
    if cur:
        emit()
    return out


_CODE_DECL_RES = {
    "python": re.compile(r"^(?:async\s+)?(?:def|class)\s+\w+", re.MULTILINE),
    "javascript": re.compile(
        r"^(?:export\s+)?(?:async\s+)?(?:function|class)\s+\w+|^const\s+\w+\s*=\s*(?:async\s*)?\(",
        re.MULTILINE,
    ),
    "generic": re.compile(
        r"^\s*(?:(?:pub\s+)?(?:fn|struct|impl|trait|mod)|func|class|def|interface|type)\s+\w+",
        re.MULTILINE,
    ),
}


def code_chunks(text: str, language: str = "generic") -> list[Chunk]:
    """C5: split code at top-level declaration boundaries.

    Mirrors code_loader.py:192-289's line-regex structure detection:
    each chunk spans from one declaration to the next; a preamble before
    the first declaration is its own chunk.
    """
    if not text:
        return []
    pattern = _CODE_DECL_RES.get(language, _CODE_DECL_RES["generic"])
    starts = [m.start() for m in pattern.finditer(text)]
    if not starts:
        return [Chunk(text, 0, len(text))]
    bounds = ([0] if starts[0] > 0 else []) + starts + [len(text)]
    out = []
    for a, b in zip(bounds, bounds[1:]):
        seg = text[a:b]
        if seg.strip():
            out.append(Chunk(seg, a, b))
    return out


def row_chunks(
    text: str, rows_per_chunk: int = 50, include_header: bool = True
) -> list[Chunk]:
    """C7: row-based chunking for delimited/tabular text.

    The reference routes STRUCTURED_TABLE files to a pandas agent and
    has no row chunker (documented gap — SURVEY §2.9); this closes it
    with the obvious semantics: groups of ``rows_per_chunk`` data rows,
    each chunk prefixed with the header row so every chunk is a valid
    standalone table slice.  Spans cover the data-row region in the
    source (the repeated header is a prefix, not a source slice).
    """
    if not text:
        return []
    # keepends=True so source offsets are exact for ANY terminator —
    # len(line)+1 arithmetic drifts one char per preceding line on CRLF
    # (the RFC 4180 default) and on \x0b/\x0c/U+2028, all of which
    # splitlines() treats as line breaks
    lines_kept = text.splitlines(keepends=True)
    if not lines_kept:
        return []
    offsets = []
    lines = []
    pos = 0
    for lk in lines_kept:
        offsets.append(pos)
        pos += len(lk)
        body = lk.splitlines()
        lines.append(body[0] if body else "")
    header = lines[0] if include_header else None
    data_start = 1 if include_header else 0
    data = lines[data_start:]
    if not data:
        return [Chunk(text.strip(), 0, len(text))]
    out: list[Chunk] = []
    for i in range(0, len(data), rows_per_chunk):
        rows = data[i: i + rows_per_chunk]
        body = "\n".join(rows)
        chunk_text = f"{header}\n{body}" if header is not None else body
        a = offsets[data_start + i]
        # end = last row's true source offset + its body length (a+len(body)
        # undercounts whenever the source terminator is wider than \n)
        last = data_start + i + len(rows) - 1
        b = min(offsets[last] + len(lines[last]), len(text))
        out.append(Chunk(chunk_text, a, b))
    return out


def semantic_chunks(
    text: str,
    buffer_size: int = 1,
    breakpoint_percentile: float = 95.0,
    embed_dim: int = 64,
    fallback_size: int = 512,
    fallback_overlap: int = 50,
) -> list[Chunk]:
    """C4: semantic splitter — embedding-distance breakpoints.

    Mirrors the reference's ``BatchSemanticSplitter``
    (resource_manager.py:43-110), which delegates to LlamaIndex's
    ``SemanticSplitterNodeParser`` with
    ``breakpoint_percentile_threshold=95`` (:62) and falls back to the
    sentence splitter on failure (:108-110, indexing_service.py:300-313).
    The splitter semantics (public LlamaIndex algorithm):

    1. segment into sentences,
    2. each sentence's *combined window* = itself ± ``buffer_size``
       neighbour sentences, embedded (here: the deterministic
       hashing-trick embedder instead of a network model),
    3. distance[i] = 1 − cosine(window_i, window_{i+1}),
    4. threshold = ``numpy.percentile(distances, 95)`` (linear
       interpolation, as LlamaIndex uses),
    5. split AFTER every sentence whose distance exceeds the threshold;
       chunks are the sentence groups between splits.

    Spans are exact: chunk = ``text[start:end].strip()`` over the
    group's sentence extent (same convention as ``sentence_chunks``).
    Any internal failure falls back to C3 (reference behavior).
    """
    if not text:
        return []
    try:
        import numpy as np

        from .embedder import embed_many_np

        sentences: list[tuple[str, int, int]] = []
        for m in _SENT_RE.finditer(text):
            if m.group(0).strip():
                sentences.append((m.group(0), m.start(), m.end()))
        if not sentences:
            return [Chunk(text.strip(), 0, len(text))]
        if len(sentences) == 1:
            s, a, b = sentences[0]
            return [Chunk(text[a:b].strip(), a, b)]

        n = len(sentences)
        windows = [
            "".join(
                s[0]
                for s in sentences[max(0, i - buffer_size): i + 1 + buffer_size]
            )
            for i in range(n)
        ]
        emb = embed_many_np(windows, embed_dim).astype(np.float64)
        # rows are L2-normalized by the embedder; zero rows stay zero
        sims = (emb[:-1] * emb[1:]).sum(axis=1)
        distances = 1.0 - sims
        threshold = float(np.percentile(distances, breakpoint_percentile))
        out: list[Chunk] = []
        group_start = 0
        for i in range(n - 1):
            if distances[i] > threshold:
                a = sentences[group_start][1]
                b = sentences[i][2]
                out.append(Chunk(text[a:b].strip(), a, b))
                group_start = i + 1
        a = sentences[group_start][1]
        b = sentences[-1][2]
        out.append(Chunk(text[a:b].strip(), a, b))
        return out
    except Exception:
        return sentence_chunks(text, fallback_size, fallback_overlap)


def parent_child_chunks(
    text: str,
    child_size: int = 200,
    child_overlap: int = 20,
) -> tuple[str, list[Chunk]]:
    """C6: parent = whole doc, children = sentence chunks of it.

    Mirrors indexing_service.py:373-506 (parent id ``parent_<sha16>`` is
    stamped by the caller; children use size 200 / overlap 20 —
    indexing_service.py:409-416).
    """
    return text, sentence_chunks(text, child_size, child_overlap)


_WORD_RE = re.compile(r"[a-z]+")


def topic_chunks(
    text: str,
    block_size: int = 3,
    cutoff_sigma: float = 0.5,
) -> list[Chunk]:
    """Topic-segmentation splitter — TextTiling (Hearst 1997): split
    where the lexical cohesion between adjacent sentence blocks dips.

    1. segment into sentences (same ``_SENT_RE`` convention as C3/C4),
    2. at every sentence gap, cosine similarity of the term-count
       vectors of the ``block_size`` sentences on each side,
    3. depth score at a gap = (left hill peak − sim) + (right hill
       peak − sim), hill-climbing while similarity rises,
    4. boundaries where depth ≥ mean(depth) − cutoff_sigma·std(depth)
       and depth > 0 (Hearst's μ − σ/2 cutoff),
    5. chunks are the sentence groups between boundaries, spans
       ``text[a:b].strip()`` (the family convention).

    Pure-Python floats over exact integer counts — deterministic, no
    numpy, no model; the driver oracle is the committed content-
    addressed expected-spans parquet (core/expected.py) like the rest
    of the chunker family.
    """
    if not text:
        return []
    sentences: list[tuple[str, int, int]] = []
    for m in _SENT_RE.finditer(text):
        if m.group(0).strip():
            sentences.append((m.group(0), m.start(), m.end()))
    if not sentences:
        return [Chunk(text.strip(), 0, len(text))]
    n = len(sentences)
    if n <= 2 * block_size:
        a, b = sentences[0][1], sentences[-1][2]
        return [Chunk(text[a:b].strip(), a, b)]

    counts = [
        {}
        for _ in range(n)
    ]
    for i, (s, _, _) in enumerate(sentences):
        for w in _WORD_RE.findall(s.lower()):
            counts[i][w] = counts[i].get(w, 0) + 1

    def _block(lo: int, hi: int) -> dict:
        out: dict = {}
        for i in range(max(0, lo), min(n, hi)):
            for w, c in counts[i].items():
                out[w] = out.get(w, 0) + c
        return out

    def _cos(a: dict, b: dict) -> float:
        if not a or not b:
            return 0.0
        dot = sum(c * b.get(w, 0) for w, c in a.items())
        na = sum(c * c for c in a.values()) ** 0.5
        nb = sum(c * c for c in b.values()) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    sims = [
        _cos(_block(i - block_size + 1, i + 1), _block(i + 1, i + 1 + block_size))
        for i in range(n - 1)
    ]
    depths = []
    for i in range(n - 1):
        l = i
        while l > 0 and sims[l - 1] >= sims[l]:
            l -= 1
        r = i
        while r < n - 2 and sims[r + 1] >= sims[r]:
            r += 1
        depths.append((sims[l] - sims[i]) + (sims[r] - sims[i]))
    mean = sum(depths) / len(depths)
    var = sum((d - mean) ** 2 for d in depths) / len(depths)
    cutoff = mean - cutoff_sigma * (var ** 0.5)
    out: list[Chunk] = []
    group_start = 0
    for i in range(n - 1):
        if depths[i] > 0 and depths[i] >= cutoff:
            a = sentences[group_start][1]
            b = sentences[i][2]
            out.append(Chunk(text[a:b].strip(), a, b))
            group_start = i + 1
    a = sentences[group_start][1]
    b = sentences[-1][2]
    out.append(Chunk(text[a:b].strip(), a, b))
    return out

"""Precomputed expected outputs for operators whose semantics are not
SQL-expressible (C4 semantic splitter: hashing-trick embeddings + numpy
percentile breakpoints — resource_manager.py:43-110).

The driver's correctness gate runs each query's oracle SQL in DuckDB
over the same parquet inputs.  For C4 the oracle is a parquet of
expected chunk spans computed here — single-process, pyarrow-only, no
Spark — by the same deterministic chunker the Spark query distributes.
The table is CONTENT-ADDRESSED: rows are keyed by ``md5(text)``, not by
(sf, doc_id), so one committed file serves every scale factor — the
oracle SQL joins it against the ``documents`` view on ``md5(d.text)``.
This turns the round-2 rows-only check into a full rows+schema+hash
comparison; the independent-semantics pin lives in
tests/test_semantic_chunker.py, which recomputes the splitter from its
spec.  Regenerate with ``python -m clawrag_spark.core.expected`` after
any intentional chunker change; tests/test_entry_oracle.py fails if the
committed parquet drifts from the live chunker.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .chunkers import (
    code_chunks,
    fixed_window_chunks,
    parent_child_chunks,
    semantic_chunks,
    sentence_chunks,
    topic_chunks,
)

SEMANTIC_MAX_DOC_ID = 120
_DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
)
EXPECTED_SEMANTIC_PATH = os.path.join(_DATA_DIR, "expected_semantic.parquet")
EXPECTED_CHUNKERS_PATH = os.path.join(_DATA_DIR, "expected_chunkers.parquet")
TESTDATA_SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

# the driver-checked chunker family: name → span function.  C2/C7 have
# direct SQL oracles; these four are the ones whose span math (regex
# sentence segmentation, embedding percentiles, declaration regexes,
# bug-for-bug end guards) is not worth re-deriving in SQL.
CHUNKER_FNS = {
    "fixed_window": lambda t: fixed_window_chunks(t, 512, 128),   # C1
    "sentence": lambda t: sentence_chunks(t, 128, 20),            # C3
    "semantic": lambda t: semantic_chunks(t),                     # C4
    "code": lambda t: code_chunks(t, "generic"),                  # C5
    "parent_child_children": lambda t: parent_child_chunks(t)[1],  # C6 (200/20)
    "topic": lambda t: topic_chunks(t),      # TextTiling (Hearst 1997)
}


def expected_semantic_rows(text: str) -> list[tuple[int, int, int]]:
    """(chunk_index, char_start, char_end) for one document text."""
    return [
        (i, c.char_start, c.char_end)
        for i, c in enumerate(semantic_chunks(text or ""))
    ]


def _distinct_texts(sf_dirs, max_doc_id: int) -> dict[str, str]:
    seen: dict[str, str] = {}
    for sf_dir in sf_dirs:
        path = os.path.join(sf_dir, "documents.parquet")
        if not os.path.exists(path):
            continue
        docs = pq.read_table(path, columns=["doc_id", "text"])
        for doc_id, text in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist()
        ):
            if doc_id >= max_doc_id or text is None:
                continue
            seen.setdefault(hashlib.md5(text.encode("utf-8")).hexdigest(), text)
    return seen


def expected_semantic_table(
    sf_dirs=TESTDATA_SFS, max_doc_id: int = SEMANTIC_MAX_DOC_ID
) -> pa.Table:
    """Expected C4 spans for every distinct document text (doc_id <
    ``max_doc_id``) across the given sf dirs, keyed by md5(text)."""
    seen = _distinct_texts(sf_dirs, max_doc_id)
    keys, idxs, starts, ends = [], [], [], []
    for key in sorted(seen):
        for i, a, b in expected_semantic_rows(seen[key]):
            keys.append(key)
            idxs.append(i)
            starts.append(a)
            ends.append(b)
    return pa.table(
        {
            "text_md5": pa.array(keys, pa.string()),
            "chunk_index": pa.array(idxs, pa.int64()),
            "char_start": pa.array(starts, pa.int64()),
            "char_end": pa.array(ends, pa.int64()),
        }
    )


def expected_chunkers_table(
    sf_dirs=TESTDATA_SFS, max_doc_id: int = SEMANTIC_MAX_DOC_ID
) -> pa.Table:
    """Expected spans for the whole CHUNKER_FNS family, keyed by
    (chunker, md5(text)) — one committed parquet serves every sf."""
    seen = _distinct_texts(sf_dirs, max_doc_id)
    names, keys, idxs, starts, ends = [], [], [], [], []
    for chunker in sorted(CHUNKER_FNS):
        fn = CHUNKER_FNS[chunker]
        for key in sorted(seen):
            for i, c in enumerate(fn(seen[key] or "")):
                names.append(chunker)
                keys.append(key)
                idxs.append(i)
                starts.append(c.char_start)
                ends.append(c.char_end)
    return pa.table(
        {
            "chunker": pa.array(names, pa.string()),
            "text_md5": pa.array(keys, pa.string()),
            "chunk_index": pa.array(idxs, pa.int64()),
            "char_start": pa.array(starts, pa.int64()),
            "char_end": pa.array(ends, pa.int64()),
        }
    )


def write_expected_semantic() -> str:
    os.makedirs(_DATA_DIR, exist_ok=True)
    pq.write_table(expected_semantic_table(), EXPECTED_SEMANTIC_PATH)
    return EXPECTED_SEMANTIC_PATH


def write_expected_chunkers() -> str:
    os.makedirs(_DATA_DIR, exist_ok=True)
    pq.write_table(expected_chunkers_table(), EXPECTED_CHUNKERS_PATH)
    return EXPECTED_CHUNKERS_PATH


if __name__ == "__main__":
    for path in (write_expected_semantic(), write_expected_chunkers()):
        print(path, pq.read_metadata(path).num_rows, "rows")

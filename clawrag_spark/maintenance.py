"""Table maintenance: small-file compaction.

Every incremental writer in this engine (batch resume appends,
streaming micro-batch deltas, BM25 postings per-run dirs) trades write
latency for file count — at 10^12-document scale an un-compacted table
decays into millions of KB-sized files whose open/footer costs dominate
scans.  ``compact_parquet_dir`` is the maintenance pass: bin-pack a
parquet directory into ~``target_file_bytes`` files and swap the result
in atomically.  It is layout-preserving (all columns, including lineage
``run_id``), so manifest-gated readers (``read_chunks``,
``bm25_query_index``) are unaffected.

Production note: on Iceberg this is ``rewrite_data_files`` — the swap
is a snapshot commit and readers never observe an intermediate state.
On a plain filesystem the swap is two renames; the sub-millisecond
window where the directory is mid-rename is the price of the parquet
stand-in (same caveat as every non-transactional table layout).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for the parquet files under path."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Rewrite ``path`` into ~``target_file_bytes``-sized files.

    No-op (returns stats, touches nothing) when the directory already
    has fewer than ``min_files`` data files or doesn't exist.  The
    rewrite goes to a sibling temp dir and swaps in with two renames.
    Row-level content is preserved exactly (pinned by tests); only the
    file layout changes.
    """
    if not os.path.isdir(path):
        return {"compacted": False, "reason": "missing"}
    files_before, total_bytes = dir_stats(path)
    if files_before < min_files:
        return {
            "compacted": False,
            "reason": "already_compact",
            "files_before": files_before,
            "bytes": total_bytes,
        }
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    if n_out >= files_before:
        return {
            "compacted": False,
            "reason": "already_compact",
            "files_before": files_before,
            "bytes": total_bytes,
        }
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact_tmp"
    old = path.rstrip("/") + ".compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    # coalesce, not repartition: bin-packing needs no shuffle — each
    # output task concatenates whole input files
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    files_after, bytes_after = dir_stats(path)
    return {
        "compacted": True,
        "files_before": files_before,
        "files_after": files_after,
        "bytes": bytes_after,
    }


def compact_pipeline_output(
    spark: SparkSession,
    out_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compact every append-accumulating table of a pipeline out_dir
    (extracted, chunks, audit, metrics — NOT the BM25 per-run delta
    dirs, whose run_id partition structure is the index's merge unit)."""
    results = {}
    for sub in ("extracted", "chunks", "dedup_audit", "metrics"):
        results[sub] = compact_parquet_dir(
            spark, os.path.join(out_dir, sub), target_file_bytes
        )
    return results

"""Manifest file lists + per-file column stats (zone maps) — the
plain-parquet stand-in for Iceberg's manifest-level data skipping.

Iceberg manifests record, for every data file, the file's row count and
per-column lower/upper bounds; the scan planner prunes files against the
query predicate BEFORE any file is opened (reference parity point: the
reference keys its Docling result cache by content sha and never
re-lists the store — ``docling_service.py:127-133`` — the same
metadata-not-data discipline applied here to the table layer).  At
10^12 documents the committed chunks table is millions of files; the
win is twofold:

- **commit gating becomes metadata-only.**  ``read_chunks`` previously
  listed the whole directory and filtered ``run_id isin(committed)`` —
  correct, but it OPENS every orphan file a crashed run left behind.
  With the manifest file lists the committed view is the union of the
  committed manifests' file lists: orphans are never listed, never
  opened, and time travel (``as_of_run``) reads exactly that snapshot's
  files.
- **predicate pruning without footers.**  A ``where`` on a stat column
  (``run_id``, ``url_bucket``, ``warc_ts``) drops every file whose
  [min, max] cannot satisfy it — before Spark ever sees the path.
  Parquet row-group stats still apply inside kept files; this layer
  removes the file listing + footer reads for files that cannot match.

Safety model: pruning is an OPTIMIZATION, never the guarantee — callers
always re-apply the real filter on the returned frame.  The planner
falls back to the full-directory read whenever it cannot PROVE the file
list is complete: a committed manifest without a ``files`` entry
(pre-feature runs), or any listed file missing on disk (a compaction /
expiration rewrote the table; maintenance also invalidates the lists
explicitly — the existence check is the belt to that suspender).
"""

from __future__ import annotations

import datetime
import json
import os
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# per-table columns whose bounds are worth carrying in the manifest.
# Honest selection: doc/chunk ids are uniform hashes (bounds span
# everything — dead weight), text is huge; run_id is constant per file
# (min == max → exact pruning), warc_ts clusters by crawl window.
STAT_COLS = {
    "extracted": ("run_id", "url_bucket", "warc_ts", "host"),
    "chunks": ("run_id", "url_bucket", "chunk_index"),
}

_OPS = ("==", "<", "<=", ">", ">=")


def snapshot_files(table_dir: str) -> set[str]:
    """Basenames of the data files currently in a flat parquet dir."""
    if not os.path.isdir(table_dir):
        return set()
    return {f for f in os.listdir(table_dir) if f.endswith(".parquet")}


def _encode_stat(v):
    if isinstance(v, datetime.datetime):
        return {"__ts__": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"__ts__": v.isoformat()}
    if isinstance(v, bytes):
        return None  # binary bounds not worth carrying
    return v


def _decode_stat(v):
    if isinstance(v, dict) and "__ts__" in v:
        return datetime.datetime.fromisoformat(v["__ts__"])
    return v


def collect_file_stats(
    table_dir: str, new_files: set[str], table: str
) -> list[dict]:
    """Footer-derived per-file stats for freshly written files.

    Reads only parquet FOOTERS (pyarrow metadata) — no Spark job, no
    data pages; this is where Iceberg collects the same numbers (at
    write, from the writer's own accumulated stats).  A column whose
    stats are absent in any row group is recorded as null bounds
    (conservative: never prunable).
    """
    import pyarrow.parquet as pq

    cols = STAT_COLS.get(table, ())
    out = []
    for name in sorted(new_files):
        path = os.path.join(table_dir, name)
        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, dict] = {}
        for col in cols:
            if col not in idx:
                continue
            lo = hi = None
            nulls = 0
            ok = True
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx[col]).statistics
                if s is None or not s.has_min_max:
                    ok = False
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
                if s.null_count is not None:
                    nulls += s.null_count
            enc_lo, enc_hi = _encode_stat(lo), _encode_stat(hi)
            if not ok or enc_lo is None or enc_hi is None:
                stats[col] = {"min": None, "max": None}
            else:
                stats[col] = {"min": enc_lo, "max": enc_hi, "nulls": nulls}
        out.append(
            {
                "path": name,
                "rows": md.num_rows,
                "bytes": os.path.getsize(path),
                "stats": stats,
            }
        )
    return out


def _file_can_match(entry: dict, predicates) -> bool:
    """Interval test: can this file contain a row satisfying ALL
    predicates?  Missing / null bounds ⇒ assume yes (conservative)."""
    stats = entry.get("stats") or {}
    for col, op, val in predicates:
        s = stats.get(col)
        if not s or s.get("min") is None or s.get("max") is None:
            continue
        lo, hi = _decode_stat(s["min"]), _decode_stat(s["max"])
        try:
            if op == "==" and not (lo <= val <= hi):
                return False
            if op == "<" and not (lo < val):
                return False
            if op == "<=" and not (lo <= val):
                return False
            if op == ">" and not (hi > val):
                return False
            if op == ">=" and not (hi >= val):
                return False
        except TypeError:
            continue  # incomparable literal — keep the file
    return True


def where_expr(predicates) -> Column:
    """The real filter for a predicate list — ALWAYS applied on top of
    pruning, so pruning bugs can only cost speed, never rows."""
    expr = F.lit(True)
    for col, op, val in predicates:
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op {op!r}")
        c = F.col(col)
        term = {
            "==": c == F.lit(val),
            "<": c < F.lit(val),
            "<=": c <= F.lit(val),
            ">": c > F.lit(val),
            ">=": c >= F.lit(val),
        }[op]
        expr = expr & term
    return expr


@dataclass
class ScanPlan:
    paths: list[str] | None  # None ⇒ fall back to the full-dir read
    files_committed: int = 0  # files listed by committed manifests
    files_kept: int = 0  # after predicate pruning
    fallback_reason: str | None = None


def plan_scan(
    out_dir: str,
    table: str,
    done_runs: list[str],
    predicates=None,
) -> ScanPlan:
    """File-level scan plan for the committed view of ``table``.

    Returns absolute paths of the files to read, or ``paths=None`` when
    the manifests cannot prove completeness (pre-feature manifest, or a
    listed file rewritten away by compaction/expiration).
    """
    manifest_dir = os.path.join(out_dir, "manifest")
    table_dir = os.path.join(out_dir, table)
    entries: list[dict] = []
    for rid in done_runs:
        mpath = os.path.join(manifest_dir, f"run_{rid}.json")
        try:
            with open(mpath) as fh:
                manifest = json.load(fh)
        except (OSError, json.JSONDecodeError):
            return ScanPlan(None, fallback_reason=f"unreadable manifest {rid}")
        files = (manifest.get("files") or {}).get(table)
        if files is None:
            return ScanPlan(None, fallback_reason=f"no file list in run {rid}")
        entries.extend(files)
    # completeness check against disk: a rewrite (compaction/expire)
    # invalidates every per-run list for the table
    for e in entries:
        if not os.path.exists(os.path.join(table_dir, e["path"])):
            return ScanPlan(None, fallback_reason=f"missing file {e['path']}")
    kept = entries
    if predicates:
        kept = [e for e in entries if _file_can_match(e, predicates)]
    return ScanPlan(
        paths=[os.path.join(table_dir, e["path"]) for e in kept],
        files_committed=len(entries),
        files_kept=len(kept),
    )


def invalidate_file_lists(out_dir: str, tables) -> int:
    """Drop the per-run file lists for rewritten tables (maintenance
    calls this after a compaction/expiration swap — Iceberg's
    ``rewrite_manifests`` moment).  Readers then take the full-dir
    fallback until new runs re-establish lists.  Returns the number of
    manifests rewritten."""
    manifest_dir = os.path.join(out_dir, "manifest")
    if not os.path.isdir(manifest_dir):
        return 0
    n = 0
    for name in sorted(os.listdir(manifest_dir)):
        if not (name.startswith("run_") and name.endswith(".json")):
            continue
        path = os.path.join(manifest_dir, name)
        try:
            with open(path) as fh:
                manifest = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        files = manifest.get("files")
        if not files:
            continue
        changed = False
        for t in tables:
            if t in files:
                del files[t]
                changed = True
        if not changed:
            continue
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, path)
        n += 1
    return n


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton / Z-order interleave of two non-negative ints (bit i of
    ``a`` → bit 2i, bit i of ``b`` → bit 2i+1) — the multi-dimensional
    clustering key Iceberg's ``rewrite_data_files`` sorts by so the
    per-file zone maps above prune on EVERY interleaved dimension, not
    just the leading sort column.  Pure bit arithmetic (shift/and),
    expression-only, reproducible bit-for-bit in the DuckDB oracle."""
    out = None
    for i in range(bits):
        ta = F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        tb = F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        term = ta + tb  # disjoint bit positions: + == bitwise OR
        out = term if out is None else out + term
    return out


def layout_pruning_report(
    df,
    a_col: str,
    b_col: str,
    rows_per_file: int = 50,
    bits: int = 16,
):
    """Measured zone-map effectiveness of linear vs Z-order file
    layout: assign rows to fixed-size files under each sort order,
    collect per-file [min, max] bounds of BOTH dimensions, and report
    the expected number of files a point query on each dimension must
    scan (mean over the dimension's distinct values of files whose
    bounds cover the value).

    The number this surfaces is the 100 TB layout decision: a linear
    ``ORDER BY a, b`` layout prunes perfectly on ``a`` and scans ~all
    files for a ``b`` predicate; the Z-order layout prunes well on
    both.  File ranking uses the repo's distributed two-phase prefix
    core (range partition + per-partition window + P-row offsets),
    never a single-partition global window; the per-value coverage
    probe joins the distinct values against the (tiny, broadcast)
    file-stats frame.

    Returns (layout, dim, n_files, avg_files_scanned, scan_frac).
    """
    from pyspark.sql import functions as SF

    from .operators.packing import _exclusive_prefix

    spark = df.sparkSession
    base = df.select(
        F.col(a_col).cast("long").alias("a"),
        F.col(b_col).cast("long").alias("b"),
    ).withColumn("z", zorder_key(F.col("a"), F.col("b"), bits))
    rows = []
    for layout, order in (
        ("linear", [F.col("a").asc(), F.col("b").asc(), F.col("z").asc()]),
        ("zorder", [F.col("z").asc(), F.col("a").asc(), F.col("b").asc()]),
    ):
        pref = _exclusive_prefix(
            base.withColumn("__w", F.lit(1)), order, "__w", with_rank=True
        )
        files = (
            pref.withColumn(
                "file_id",
                ((F.col("__rank") - 1) / rows_per_file).cast("long"),
            )
            .groupBy("file_id")
            .agg(
                F.min("a").alias("min_a"),
                F.max("a").alias("max_a"),
                F.min("b").alias("min_b"),
                F.max("b").alias("max_b"),
            )
        )
        for dim, lo, hi in (("a", "min_a", "max_a"), ("b", "min_b", "max_b")):
            vals = base.select(F.col(dim).alias("v")).distinct()
            cover = vals.join(
                SF.broadcast(files),
                (F.col("v") >= F.col(lo)) & (F.col("v") <= F.col(hi)),
            ).groupBy("v").agg(F.count(F.lit(1)).alias("nf"))
            agg = files.agg(F.count(F.lit(1)).alias("n_files")).crossJoin(
                cover.agg(F.avg("nf").alias("avg_files"))
            ).first()
            rows.append(
                (
                    layout,
                    {"a": a_col, "b": b_col}[dim],
                    int(agg["n_files"]),
                    round(float(agg["avg_files"]), 6),
                    round(float(agg["avg_files"]) / agg["n_files"], 6),
                )
            )
    return spark.createDataFrame(
        rows,
        "layout string, dim string, n_files long, "
        "avg_files_scanned double, scan_frac double",
    )

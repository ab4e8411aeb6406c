"""Iceberg-style schema evolution for the committed tables.

Iceberg evolves a table's schema as METADATA: add / rename / widen /
drop are entries in the table's schema log, applied on READ — no data
file is ever rewritten, and every snapshot (including time travel into
history written before the change) presents the table's CURRENT
schema.  This module is that mechanism for the engine's parquet
stand-in tables:

- ``evolve_schema(out_dir, table, ops)`` appends a schema version to
  the table's log with the same single-commit-point discipline as the
  run manifests (write tmp, one atomic rename — a crash leaves either
  the old log or the new one, never a torn file).
- ``apply_to_frame(df, log)`` replays the log on a committed-view
  frame: renames map old physical names to current ones, adds
  materialize missing columns with their default, widens cast in-place
  (safe promotions only — the Iceberg rule), drops hide columns.
  Files written BEFORE and AFTER an evolution read back identically
  because every op is conditional on the physical shape (rename fires
  only when the old name is present, add only when missing).
- ``physical_predicates(where, log)`` maps a predicate list written
  against the CURRENT schema back to physical column names so the
  manifest zone maps (``zonemaps.plan_scan``) keep pruning files whose
  stats were recorded under pre-rename names.  Predicates on added
  columns keep their name; files with no stats for a column are kept
  conservatively (zonemaps' existing rule), so pruning stays
  correctness-neutral.

Reference parity: ClawRag migrates its store with Alembic revisions
(backend/alembic/versions/) — rewrite-in-place DDL on a live database.
At 10^12 rows a rewrite is off the table; metadata evolution is the
Spark/Iceberg answer to the same lifecycle problem.

Scale notes: the log is O(versions) JSON read once per query plan;
``apply_to_frame`` is a projection — Catalyst folds the renames/casts
into the scan, so evolution costs nothing at runtime.  Column
*defaults* for added columns are materialized in the projection (not
stored), exactly like Iceberg v2 default values.

Lineage-critical columns are guarded: ``run_id`` (the commit gate) and
``url`` (the merge-on-read delete key) can be neither renamed nor
dropped — evolving them would silently break snapshot isolation and
takedown masking, so the log refuses the op at commit time.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: columns the read machinery itself keys on — immutable by evolution
PROTECTED = {"run_id", "url"}

#: Iceberg-safe type promotions (physical readback stays lossless)
SAFE_WIDENINGS = {
    ("int", "bigint"),
    ("int", "double"),
    ("bigint", "double"),
    ("float", "double"),
    ("smallint", "int"),
    ("smallint", "bigint"),
}

_VALID_OPS = {"add", "rename", "widen", "drop"}


def _log_path(out_dir: str, table: str) -> str:
    return os.path.join(out_dir, "schema_log", f"{table}.json")


def read_schema_log(out_dir: str, table: str) -> list[dict]:
    """The table's committed schema versions, oldest first.  Missing or
    torn log (mid-crash tmp never renamed) reads as 'no evolution'."""
    try:
        with open(_log_path(out_dir, table)) as fh:
            log = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return []
    return log if isinstance(log, list) else []


def _validate(op: dict, current_names: set[str] | None) -> None:
    kind = op.get("op")
    if kind not in _VALID_OPS:
        raise ValueError(f"unknown schema op {kind!r}")
    if kind == "rename":
        old, new = op.get("old"), op.get("new")
        if not old or not new:
            raise ValueError("rename needs 'old' and 'new'")
        if old in PROTECTED or new in PROTECTED:
            raise ValueError(
                f"cannot rename {old!r} -> {new!r}: "
                f"{PROTECTED} are lineage-critical (commit gate / "
                "delete key) and immutable"
            )
    elif kind == "drop":
        if op.get("name") in PROTECTED:
            raise ValueError(
                f"cannot drop lineage-critical column {op.get('name')!r}"
            )
        if not op.get("name"):
            raise ValueError("drop needs 'name'")
    elif kind == "add":
        if not op.get("name") or not op.get("type"):
            raise ValueError("add needs 'name' and 'type'")
        if op.get("name") in PROTECTED:
            raise ValueError(f"cannot shadow protected column {op['name']!r}")
    elif kind == "widen":
        frm, to = op.get("from"), op.get("to")
        if not op.get("name") or not frm or not to:
            raise ValueError("widen needs 'name', 'from' and 'to'")
        if (frm, to) not in SAFE_WIDENINGS:
            raise ValueError(
                f"unsafe widening {frm!r} -> {to!r}; allowed: "
                f"{sorted(SAFE_WIDENINGS)}"
            )


def evolve_schema(out_dir: str, table: str, ops: list[dict]) -> dict:
    """Commit a new schema version for ``table``.

    ``ops`` is a list of dicts::

        {"op": "add",    "name": c, "type": t, "default": v}   # v optional
        {"op": "rename", "old": a, "new": b}
        {"op": "widen",  "name": c, "from": t0, "to": t1}      # safe only
        {"op": "drop",   "name": c}

    Validation happens BEFORE any write; the log append is
    tmp-write + one atomic rename (the manifest commit discipline),
    so readers only ever see a fully-committed log.
    """
    if not ops:
        raise ValueError("need at least one op")
    for op in ops:
        _validate(op, None)
    log = read_schema_log(out_dir, table)
    version = {
        "version": (log[-1]["version"] + 1) if log else 1,
        "ops": ops,
        "committed_at": time.time(),
    }
    new_log = log + [version]
    path = _log_path(out_dir, table)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(new_log, fh, indent=2)
    os.rename(tmp, path)  # the single commit point
    return version


def apply_to_frame(df: DataFrame, log: list[dict]) -> DataFrame:
    """Replay the schema log on a physical-schema frame.

    Every op is conditional on the frame's actual shape, so one code
    path serves files written at ANY schema version: a rename fires
    only while the old name is present; an add materializes only when
    the column is missing (files written after a later engine version
    started writing it physically pass through); widen casts only an
    existing column; drop hides the column if present.
    """
    for version in log:
        for op in version.get("ops", []):
            kind = op["op"]
            cols = set(df.columns)
            if kind == "rename" and op["old"] in cols:
                df = df.withColumnRenamed(op["old"], op["new"])
            elif kind == "add" and op["name"] not in cols:
                default = op.get("default")
                df = df.withColumn(
                    op["name"], F.lit(default).cast(op["type"])
                )
            elif kind == "widen" and op["name"] in cols:
                df = df.withColumn(
                    op["name"], F.col(op["name"]).cast(op["to"])
                )
            elif kind == "drop" and op["name"] in cols:
                df = df.drop(op["name"])
    return df


def physical_predicates(where, log: list[dict]):
    """Map a current-schema predicate list back to physical column
    names for manifest zone-map pruning.

    Renames are reversed newest-to-oldest so a chained rename
    (a -> b -> c) maps c back to a — the name under which the oldest
    files recorded their stats.  Files written post-rename carry stats
    under the NEW physical name; their entries simply have no stats
    for the old name and are kept conservatively, so pruning never
    drops a matching file.  Predicates on added or widened columns
    pass through unchanged.
    """
    if not where or not log:
        return where
    mapped = []
    for col, op, val in where:
        name = col
        for version in reversed(log):
            for o in reversed(version.get("ops", [])):
                if o["op"] == "rename" and o["new"] == name:
                    name = o["old"]
        mapped.append((name, op, val))
    return mapped

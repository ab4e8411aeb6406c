"""Dolma-style attribute sidecars: tag once, filter cheaply.

The pattern behind AI2's Dolma toolkit (and most production curation
stacks): taggers write their per-document signals to SIDECAR tables
keyed by document id, separate from the (immutable, expensive-to-scan)
text.  Filter experiments then iterate over the small attribute tables
— joining two longs per doc instead of re-reading 100 TB of text per
threshold sweep.

Scale shape:
- every sidecar carries ``id_bucket = pmod(xxhash64(id), n_buckets)``
  as a column, mirroring the pipeline sinks' bucket convention
  (``pipeline.py``: plain parquet + bucket column; an Iceberg bucket
  transform owns physical layout in prod) — co-bucketed sidecars join
  the main table without a shuffle on a bucketed warehouse,
- ALL taggers of one run execute in a single corpus scan (one cached
  projection, per-tagger writes read the cache), because at 100 TB the
  scan is the cost and a Dolma-style one-process-per-tagger layout
  would pay it per tagger,
- ``filter_by_attributes`` joins only the requested sidecars, so a
  threshold sweep touches kilobytes per doc, never the text column.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_attributes", "update_attributes", "load_attributes", "filter_by_attributes"]

_MANIFEST = "_attribute_manifest.json"


def _bucketed(df: DataFrame, id_col: str, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "id_bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    )


def _combined_projection(
    docs: DataFrame,
    taggers: dict[str, dict[str, Column]],
    id_col: str,
    n_buckets: int,
) -> DataFrame:
    """One corpus scan computing every tagger's attributes, columns
    namespaced ``tagger__attr`` — the single layout both the initial
    write and incremental appends derive sidecars from."""
    all_cols = [F.col(id_col)]
    for tname, attrs in taggers.items():
        for aname, col in attrs.items():
            all_cols.append(col.alias(f"{tname}__{aname}"))
    return _bucketed(docs.select(*all_cols), id_col, n_buckets)


def _tagger_sidecar(combined: DataFrame, tname: str, attrs, id_col: str) -> DataFrame:
    return combined.select(
        id_col,
        "id_bucket",
        *[F.col(f"{tname}__{a}").alias(a) for a in attrs],
    )


def write_attributes(
    docs: DataFrame,
    out_dir: str,
    taggers: dict[str, dict[str, Column]],
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> dict:
    """Run every tagger in ONE corpus scan and write one parquet sidecar
    per tagger under ``out_dir/attributes/<tagger>/``.

    ``taggers`` maps tagger name → {attribute column name → Column
    expression over the docs frame}.  Returns the manifest dict (also
    written as JSON next to the sidecars): tagger → attribute names.
    The combined projection is persisted so the text scan happens once;
    each tagger's write reads the cache.
    """
    base = os.path.join(out_dir, "attributes")
    os.makedirs(base, exist_ok=True)
    combined = _combined_projection(docs, taggers, id_col, n_buckets).persist()
    combined.count()  # materialize: every tagger write reads warm cache
    manifest = {}
    for tname, attrs in taggers.items():
        _tagger_sidecar(combined, tname, attrs, id_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, tname))
        manifest[tname] = sorted(attrs)
    combined.unpersist()
    with open(os.path.join(base, _MANIFEST), "w") as fh:
        json.dump({"id_col": id_col, "taggers": manifest}, fh, indent=2)
    return manifest


def update_attributes(
    docs: DataFrame,
    out_dir: str,
    taggers: dict[str, dict[str, Column]],
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> dict:
    """Incremental tagging: run the taggers ONLY over docs whose id is
    not yet in the sidecars and append the new rows — the
    continuously-fed counterpart of :func:`write_attributes`, same
    shape as the pipeline's doc-hash resume anti-join.  Tagger names
    and attribute sets must match the committed manifest (attributes
    are per-tagger columns; a schema change is a new tagger, not an
    update).  Returns ``{"n_new": int}``.
    """
    base = os.path.join(out_dir, "attributes")
    with open(os.path.join(base, _MANIFEST)) as fh:
        manifest = json.load(fh)
    want = {t: sorted(attrs) for t, attrs in taggers.items()}
    if want != manifest["taggers"] or id_col != manifest["id_col"]:
        raise ValueError(
            f"tagger set {want} does not match committed manifest "
            f"{manifest['taggers']} (id {manifest['id_col']})"
        )
    spark = docs.sparkSession
    # Per-tagger resume: the appends below are not one atomic commit
    # (plain parquet, one directory per tagger), so a crash between
    # appends leaves sidecars at different frontiers.  Each tagger
    # therefore anti-joins its OWN committed ids — a rerun appends only
    # what that sidecar is missing, never duplicates, and the sidecars
    # reconverge instead of silently diverging forever.
    seen = {
        t: spark.read.parquet(os.path.join(base, t)).select(id_col)
        for t in taggers
    }
    # one scan over only the docs at least one sidecar is missing
    need_any = None
    for t in taggers:
        missing = docs.select(id_col).join(seen[t], id_col, "left_anti")
        need_any = missing if need_any is None else need_any.union(missing)
    need_ids = need_any.distinct()
    fresh = docs.join(need_ids, id_col, "left_semi")
    combined = _combined_projection(fresh, taggers, id_col, n_buckets).persist()
    n_new = combined.count()
    per_tagger: dict[str, int] = {}
    if n_new:
        for tname, attrs in taggers.items():
            part = _tagger_sidecar(combined, tname, attrs, id_col).join(
                seen[tname], id_col, "left_anti"
            )
            cnt = part.count()
            per_tagger[tname] = int(cnt)
            if cnt:
                part.write.mode("append").parquet(os.path.join(base, tname))
    else:
        per_tagger = {t: 0 for t in taggers}
    combined.unpersist()
    return {"n_new": int(n_new), "per_tagger": per_tagger}


def load_attributes(
    spark: SparkSession, out_dir: str, taggers: list[str] | None = None
) -> DataFrame:
    """Join the requested sidecars (all by default) into one attribute
    frame keyed by the manifest's id column.  Joins are id-equi-joins
    between co-bucketed tables — shuffle-free on a bucketed warehouse."""
    base = os.path.join(out_dir, "attributes")
    with open(os.path.join(base, _MANIFEST)) as fh:
        manifest = json.load(fh)
    id_col = manifest["id_col"]
    names = taggers if taggers is not None else sorted(manifest["taggers"])
    if not names:
        raise ValueError("no taggers to load (empty list)")
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate tagger names in {names}")
    out = None
    for tname in names:
        if tname not in manifest["taggers"]:
            raise KeyError(f"unknown tagger {tname!r}; manifest has "
                           f"{sorted(manifest['taggers'])}")
        part = spark.read.parquet(os.path.join(base, tname))
        if out is None:
            out = part
        else:
            out = out.join(part.drop("id_bucket"), id_col)
    return out


def filter_by_attributes(
    docs: DataFrame,
    attrs: DataFrame,
    predicate: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the docs whose attribute row satisfies ``predicate`` — the
    filter-sweep step of the sidecar pattern.  The predicate evaluates
    on the attribute table BEFORE the join, so only surviving ids reach
    the text table (semi-join shape: the text column never rides the
    shuffle)."""
    keep = attrs.filter(predicate).select(id_col)
    return docs.join(keep, id_col, "left_semi")

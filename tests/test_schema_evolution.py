"""Iceberg-style schema evolution: metadata-only add/rename/widen/drop
applied on read across committed snapshots — no data file rewritten,
time travel presents the current schema, zone-map pruning survives
renames, lineage-critical columns are immutable."""

import json
import os

import pytest

from clawrag_spark import schema_evolution as SE
from clawrag_spark.pipeline import read_extracted, run_pipeline


@pytest.fixture(scope="module")
def evolved_out(spark, pages_path, tmp_path_factory):
    """One committed run at the physical schema, then an evolution:
    rename lang -> language, add quality_tier (default 'unknown'),
    widen n_pages int -> bigint, drop detected_mime; then a SECOND run
    written (physically) at the old schema after the evolution."""
    out = str(tmp_path_factory.mktemp("evo"))
    pages = spark.read.parquet(pages_path)
    run_pipeline(spark, pages.limit(200), out, run_id="r1")
    SE.evolve_schema(
        out,
        "extracted",
        [
            {"op": "rename", "old": "lang", "new": "language"},
            {
                "op": "add",
                "name": "quality_tier",
                "type": "string",
                "default": "unknown",
            },
        ],
    )
    # a second, separately-committed version (chained evolution)
    SE.evolve_schema(
        out,
        "extracted",
        [{"op": "rename", "old": "language", "new": "doc_language"}],
    )
    run_pipeline(spark, pages.limit(400), out, run_id="r2")
    return out


def test_current_schema_everywhere(spark, evolved_out):
    df = read_extracted(spark, evolved_out)
    cols = set(df.columns)
    assert "doc_language" in cols and "lang" not in cols
    assert "language" not in cols  # chained rename resolves to the tip
    assert "quality_tier" in cols
    # default materialized on rows from BOTH physical-schema runs
    tiers = {r["quality_tier"] for r in df.select("quality_tier").distinct().collect()}
    assert tiers == {"unknown"}
    # values under the renamed column are the original lang values
    langs = {
        r["doc_language"] for r in df.select("doc_language").distinct().collect()
    }
    assert "en" in langs


def test_time_travel_presents_current_schema(spark, evolved_out):
    old = read_extracted(spark, evolved_out, as_of_run="r1")
    assert "doc_language" in old.columns and "lang" not in old.columns
    assert old.count() > 0


def test_row_counts_and_resume_unaffected(spark, evolved_out, pages_path):
    pages = spark.read.parquet(pages_path)
    n = read_extracted(spark, evolved_out).count()
    m = run_pipeline(spark, pages.limit(400), evolved_out, run_id="r3")
    assert m["n_skipped_resume"] == m["n_input"]  # resume keys untouched
    assert read_extracted(spark, evolved_out).count() == n


def test_predicate_on_renamed_column_filters_and_prunes(spark, evolved_out):
    df = read_extracted(
        spark, evolved_out, where=[("doc_language", "==", "en")]
    )
    assert df.count() > 0
    vals = {r["doc_language"] for r in df.select("doc_language").distinct().collect()}
    assert vals == {"en"}
    # the pruning layer sees the PHYSICAL name through the rename chain
    log = SE.read_schema_log(evolved_out, "extracted")
    mapped = SE.physical_predicates([("doc_language", "==", "en")], log)
    assert mapped == [("lang", "==", "en")]


def test_widen_and_drop(spark, pages_path, tmp_path):
    out = str(tmp_path / "evo2")
    pages = spark.read.parquet(pages_path)
    run_pipeline(spark, pages.limit(120), out, run_id="r1")
    base = read_extracted(spark, out)
    int_cols = [
        f.name for f in base.schema.fields if f.dataType.simpleString() == "int"
    ]
    assert int_cols, "fixture needs an int column to widen"
    target = int_cols[0]
    drop_candidates = [
        c
        for c in base.columns
        if c not in SE.PROTECTED and c != target
    ]
    SE.evolve_schema(
        out,
        "extracted",
        [
            {"op": "widen", "name": target, "from": "int", "to": "bigint"},
            {"op": "drop", "name": drop_candidates[0]},
        ],
    )
    df = read_extracted(spark, out)
    got = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    assert got[target] == "bigint"
    assert drop_candidates[0] not in got


def test_guards(tmp_path):
    out = str(tmp_path)
    with pytest.raises(ValueError, match="lineage-critical"):
        SE.evolve_schema(out, "extracted", [{"op": "rename", "old": "url", "new": "u"}])
    with pytest.raises(ValueError, match="lineage-critical"):
        SE.evolve_schema(out, "extracted", [{"op": "drop", "name": "run_id"}])
    with pytest.raises(ValueError, match="unsafe widening"):
        SE.evolve_schema(
            out,
            "extracted",
            [{"op": "widen", "name": "x", "from": "bigint", "to": "int"}],
        )
    with pytest.raises(ValueError, match="unknown schema op"):
        SE.evolve_schema(out, "extracted", [{"op": "zap", "name": "x"}])
    # nothing was committed by any refused op
    assert SE.read_schema_log(out, "extracted") == []


def test_torn_log_reads_as_no_evolution(tmp_path):
    out = str(tmp_path)
    SE.evolve_schema(
        out, "extracted", [{"op": "add", "name": "c", "type": "string"}]
    )
    path = os.path.join(out, "schema_log", "extracted.json")
    # a crash mid-write leaves only the tmp file: readers see the last
    # committed log (here: the one version), never a torn file
    with open(path + ".tmp", "w") as fh:
        fh.write('[{"version": 2, "ops": [{"op"')  # torn
    assert len(SE.read_schema_log(out, "extracted")) == 1
    # and a torn MAIN file degrades to no-evolution rather than a crash
    with open(path, "w") as fh:
        fh.write("{not json")
    assert SE.read_schema_log(out, "extracted") == []


def test_versions_append_and_are_ordered(tmp_path):
    out = str(tmp_path)
    v1 = SE.evolve_schema(
        out, "t", [{"op": "add", "name": "a", "type": "int"}]
    )
    v2 = SE.evolve_schema(out, "t", [{"op": "rename", "old": "a", "new": "b"}])
    assert (v1["version"], v2["version"]) == (1, 2)
    log = SE.read_schema_log(out, "t")
    assert [v["version"] for v in log] == [1, 2]
    assert json.dumps(log)  # round-trippable

"""Manifest file lists + zone-map pruning (clawrag_spark/zonemaps.py).

The contract under test: pruning is an optimization layered UNDER an
always-applied real filter — every pruned read must return exactly the
rows of the unpruned read, while demonstrably opening fewer files
(``df.inputFiles()``), and every invalidation path (pre-feature
manifest, compaction rewrite, orphan files) must fall back to the full
read without changing results.
"""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clawrag_spark import zonemaps
from clawrag_spark.pipeline import (
    completed_run_ids,
    read_chunks,
    read_extracted,
    run_pipeline,
)


@pytest.fixture(scope="module")
def two_run_out(spark, tmp_path_factory):
    """Two committed runs over disjoint page slices + one orphan file."""
    from clawrag_spark.corpus import write_pages_parquet

    tmp = tmp_path_factory.mktemp("zonemap_pages")
    p1 = os.path.join(str(tmp), "a.parquet")
    p2 = os.path.join(str(tmp), "b.parquet")
    write_pages_parquet(p1, 120, seed=1)
    write_pages_parquet(p2, 120, seed=2)
    out = str(tmp_path_factory.mktemp("zonemap_out"))
    m1 = run_pipeline(spark, spark.read.parquet(p1), out, run_id="runone")
    m2 = run_pipeline(spark, spark.read.parquet(p2), out, run_id="runtwo")

    # orphan: a crashed third run appended extracted+chunks rows but
    # died before its manifest — simulated by copying a committed file
    # under a new name and rewriting run_id via parquet
    for table in ("extracted", "chunks"):
        tdir = os.path.join(out, table)
        src = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))[0]
        t = pq.read_table(os.path.join(tdir, src))
        if t.num_rows:
            n = t.num_rows
            t = t.set_column(
                t.schema.get_field_index("run_id"),
                "run_id",
                pa.array(["orphanrun"] * n, pa.string()),
            )
            pq.write_table(t, os.path.join(tdir, "part-orphan.parquet"))
    return out, m1, m2


class TestManifestFileLists:
    def test_manifest_carries_file_stats(self, two_run_out):
        out, m1, _ = two_run_out
        files = m1["files"]
        assert files["extracted"] and files["chunks"]
        for entry in files["extracted"]:
            st = entry["stats"]
            # run_id is constant per file: exact bounds
            assert st["run_id"]["min"] == st["run_id"]["max"] == "runone"
            assert entry["rows"] > 0 and entry["bytes"] > 0
            assert 0 <= st["url_bucket"]["min"] <= st["url_bucket"]["max"]

    def test_committed_read_skips_orphan_files(self, spark, two_run_out):
        out, _, _ = two_run_out
        df = read_chunks(spark, out)
        opened = {os.path.basename(p) for p in df.inputFiles()}
        assert "part-orphan.parquet" not in opened
        # and the rows are exactly the committed rows
        full = (
            spark.read.parquet(os.path.join(out, "chunks"))
            .filter(F.col("run_id").isin(["runone", "runtwo"]))
        )
        assert df.count() == full.count()

    def test_time_travel_reads_only_snapshot_files(self, spark, two_run_out):
        out, m1, _ = two_run_out
        df = read_extracted(spark, out, as_of_run="runone")
        opened = {os.path.basename(p) for p in df.inputFiles()}
        listed = {e["path"] for e in m1["files"]["extracted"]}
        assert opened == listed
        assert df.select("run_id").distinct().collect()[0][0] == "runone"

    def test_where_prunes_files_and_matches_unpruned(self, spark, two_run_out):
        out, _, _ = two_run_out
        preds = [("run_id", "==", "runtwo")]
        pruned = read_extracted(spark, out, where=preds)
        baseline = read_extracted(spark, out).filter(F.col("run_id") == "runtwo")
        assert sorted(r["url"] for r in pruned.select("url").collect()) == sorted(
            r["url"] for r in baseline.select("url").collect()
        )
        done = completed_run_ids(out)
        plan = zonemaps.plan_scan(out, "extracted", done, preds)
        assert plan.paths is not None
        assert 0 < plan.files_kept < plan.files_committed
        assert len(pruned.inputFiles()) == plan.files_kept

    def test_range_predicate_on_url_bucket(self, spark, two_run_out):
        out, _, _ = two_run_out
        preds = [("url_bucket", "<=", 3)]
        pruned = read_chunks(spark, out, where=preds)
        baseline = read_chunks(spark, out).filter(F.col("url_bucket") <= 3)
        assert pruned.count() == baseline.count()
        # bucket spans every file (repartition by url) — pruning keeps
        # all files, but the filter still applies
        assert pruned.filter(F.col("url_bucket") > 3).count() == 0


class TestFallbacks:
    def test_legacy_manifest_falls_back_full_read(self, spark, two_run_out, tmp_path):
        out, _, _ = two_run_out
        legacy = str(tmp_path / "legacy")
        shutil.copytree(out, legacy)
        mpath = os.path.join(legacy, "manifest", "run_runone.json")
        with open(mpath) as fh:
            m = json.load(fh)
        del m["files"]
        with open(mpath, "w") as fh:
            json.dump(m, fh)
        plan = zonemaps.plan_scan(legacy, "chunks", completed_run_ids(legacy))
        assert plan.paths is None and "no file list" in plan.fallback_reason
        df = read_chunks(spark, legacy)
        ref = read_chunks(spark, out)
        assert df.count() == ref.count()

    def test_missing_listed_file_falls_back(self, spark, two_run_out, tmp_path):
        out, _, _ = two_run_out
        broken = str(tmp_path / "broken")
        shutil.copytree(out, broken)
        mpath = os.path.join(broken, "manifest", "run_runone.json")
        with open(mpath) as fh:
            m = json.load(fh)
        m["files"]["chunks"][0]["path"] = "part-gone.parquet"
        with open(mpath, "w") as fh:
            json.dump(m, fh)
        plan = zonemaps.plan_scan(broken, "chunks", completed_run_ids(broken))
        assert plan.paths is None and "missing file" in plan.fallback_reason
        assert read_chunks(spark, broken).count() == read_chunks(spark, out).count()

    def test_compaction_invalidates_lists_and_preserves_rows(
        self, spark, two_run_out, tmp_path
    ):
        from clawrag_spark.maintenance import compact_parquet_dir

        out, _, _ = two_run_out
        comp = str(tmp_path / "comp")
        shutil.copytree(out, comp)
        before = read_chunks(spark, comp).count()
        res = compact_parquet_dir(
            spark, os.path.join(comp, "chunks"), target_file_bytes=1 << 30
        )
        assert res["compacted"]
        with open(os.path.join(comp, "manifest", "run_runone.json")) as fh:
            m = json.load(fh)
        assert "chunks" not in m["files"]  # invalidated
        assert "extracted" in m["files"]  # untouched table keeps its list
        plan = zonemaps.plan_scan(comp, "chunks", completed_run_ids(comp))
        assert plan.paths is None
        assert read_chunks(spark, comp).count() == before

    def test_all_pruned_selection_returns_empty(self, spark, two_run_out):
        out, _, _ = two_run_out
        df = read_extracted(spark, out, where=[("run_id", "==", "nosuchrun")])
        assert df.count() == 0


class TestPredicateSemantics:
    def test_interval_tests(self):
        entry = {"stats": {"x": {"min": 10, "max": 20}}}
        assert zonemaps._file_can_match(entry, [("x", "==", 15)])
        assert not zonemaps._file_can_match(entry, [("x", "==", 9)])
        assert not zonemaps._file_can_match(entry, [("x", "<", 10)])
        assert zonemaps._file_can_match(entry, [("x", "<", 11)])
        assert zonemaps._file_can_match(entry, [("x", "<=", 10)])
        assert not zonemaps._file_can_match(entry, [("x", ">", 20)])
        assert zonemaps._file_can_match(entry, [("x", ">=", 20)])
        # null / missing bounds are never prunable
        assert zonemaps._file_can_match(
            {"stats": {"x": {"min": None, "max": None}}}, [("x", "==", 9)]
        )
        assert zonemaps._file_can_match({"stats": {}}, [("x", "==", 9)])
        # incomparable literal: conservative keep
        assert zonemaps._file_can_match(entry, [("x", "==", "a-string")])

    def test_where_expr_rejects_bad_op(self):
        with pytest.raises(ValueError):
            zonemaps.where_expr([("x", "!=", 1)])


class TestOrphanVacuum:
    def test_vacuum_removes_only_aged_orphans(self, spark, two_run_out, tmp_path):
        from clawrag_spark.maintenance import remove_orphan_files

        out, _, _ = two_run_out
        vac = str(tmp_path / "vac")
        shutil.copytree(out, vac)
        before = read_chunks(spark, vac).count()
        # grace period: fresh orphans survive
        rep = remove_orphan_files(vac, min_age_sec=3600)
        assert rep["deleted"] == 0
        assert rep["tables"]["chunks"]["skipped_young"] == 1
        assert os.path.exists(os.path.join(vac, "chunks", "part-orphan.parquet"))
        # aged out: orphans (one per table) deleted, committed rows intact
        rep = remove_orphan_files(vac, min_age_sec=0)
        assert rep["deleted"] == 2 and rep["bytes_reclaimed"] > 0
        assert not os.path.exists(os.path.join(vac, "chunks", "part-orphan.parquet"))
        assert not os.path.exists(os.path.join(vac, "extracted", "part-orphan.parquet"))
        assert read_chunks(spark, vac).count() == before
        # second pass: nothing left
        assert remove_orphan_files(vac, min_age_sec=0)["deleted"] == 0

    def test_vacuum_dry_run_touches_nothing(self, spark, two_run_out, tmp_path):
        from clawrag_spark.maintenance import remove_orphan_files

        out, _, _ = two_run_out
        vac = str(tmp_path / "dry")
        shutil.copytree(out, vac)
        rep = remove_orphan_files(vac, min_age_sec=0, dry_run=True)
        assert rep["deleted"] == 2 and rep["dry_run"]
        assert os.path.exists(os.path.join(vac, "chunks", "part-orphan.parquet"))

    def test_vacuum_refuses_incomplete_file_lists(self, spark, two_run_out, tmp_path):
        from clawrag_spark.maintenance import remove_orphan_files

        out, _, _ = two_run_out
        vac = str(tmp_path / "nolist")
        shutil.copytree(out, vac)
        mpath = os.path.join(vac, "manifest", "run_runone.json")
        with open(mpath) as fh:
            m = json.load(fh)
        del m["files"]
        with open(mpath, "w") as fh:
            json.dump(m, fh)
        rep = remove_orphan_files(vac, min_age_sec=0)
        assert rep["deleted"] == 0
        assert rep["tables"]["chunks"]["skipped"] == "incomplete_file_lists"
        assert os.path.exists(os.path.join(vac, "chunks", "part-orphan.parquet"))


class TestZorderLayout:
    def test_morton_interleave_known_values(self, spark):
        from clawrag_spark import zonemaps as Z

        df = spark.createDataFrame(
            [(0, 0), (3, 1), (1, 3), (255, 0), (0, 255)], ["a", "b"]
        )
        got = [
            r.z
            for r in df.select(
                Z.zorder_key(F.col("a"), F.col("b"), bits=8).alias("z")
            ).collect()
        ]

        def morton(a, b):
            out = 0
            for i in range(8):
                out |= ((a >> i) & 1) << (2 * i)
                out |= ((b >> i) & 1) << (2 * i + 1)
            return out

        assert got == [morton(a, b) for a, b in
                       [(0, 0), (3, 1), (1, 3), (255, 0), (0, 255)]]
        # locality sanity: z is monotone along each axis from origin
        assert morton(3, 1) == 0b0111

    def test_zorder_balances_pruning_across_dims(self, spark):
        from clawrag_spark import zonemaps as Z

        # a 16x16 grid: linear layout sorts a-major, so b-point queries
        # touch every file; z-order keeps both dims clustered
        rows = [(a, b) for a in range(16) for b in range(16)]
        df = spark.createDataFrame(rows, ["x", "y"])
        rep = {
            (r.layout, r.dim): r
            for r in Z.layout_pruning_report(
                df, "x", "y", rows_per_file=16, bits=4
            ).collect()
        }
        lin_y = rep[("linear", "y")].scan_frac
        zor_y = rep[("zorder", "y")].scan_frac
        zor_x = rep[("zorder", "x")].scan_frac
        assert lin_y == 1.0            # a-major layout: y never prunes
        assert zor_y < 0.5 and zor_x < 0.5  # Morton prunes both dims
        assert rep[("linear", "x")].scan_frac < 0.15

"""Merge-on-read equality deletes (URL takedown): commit protocol,
read masking (incl. time travel), copy-on-write materialization,
idempotent/crash-safe re-runs, and resume interaction."""

import os

import pytest

from clawrag_spark import deletes as D
from clawrag_spark.pipeline import read_chunks, read_extracted, run_pipeline


@pytest.fixture(scope="class")
def takedown_out(spark, pages_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("takedown") / "out")
    pages = spark.read.parquet(pages_path)
    run_pipeline(spark, pages.limit(120), out, run_id="r1")
    run_pipeline(spark, pages.limit(200), out, run_id="r2")
    return out


def _urls(df):
    return {r.url for r in df.select("url").distinct().collect()}


class TestTakedown:
    def test_record_and_mask(self, spark, takedown_out):
        out = takedown_out
        all_urls = sorted(_urls(read_extracted(spark, out)))
        # victims must have chunk rows too (malformed corpus pages
        # extract with an error and produce no chunks)
        chunked = sorted(_urls(read_chunks(spark, out)))
        victims = chunked[:3] + chunked[-2:]

        # pre-delete: victims visible in both tables
        assert set(victims) <= _urls(read_extracted(spark, out))
        assert set(victims) <= _urls(read_chunks(spark, out))

        info = D.record_takedown(out, victims, reason="dmca")
        assert info["n_urls"] == 5 and info["seq"] == 1
        assert os.path.basename(info["path"]).startswith("del_000001_")

        # merge-on-read: victims invisible everywhere, others untouched
        ext = read_extracted(spark, out)
        assert _urls(ext) == set(all_urls) - set(victims)
        assert not (set(victims) & _urls(read_chunks(spark, out)))
        # the raw files still hold the rows (no rewrite happened)
        raw = spark.read.parquet(os.path.join(out, "extracted"))
        assert set(victims) <= _urls(raw)

        # retroactive across time travel: the earlier snapshot is
        # masked too (takedown semantics, not Iceberg snapshot scoping)
        tt = read_extracted(spark, out, as_of_run="r1")
        assert not (set(victims) & _urls(tt))
        # opt-out restores the unmasked committed view
        unmasked = read_extracted(spark, out, apply_deletes=False)
        assert set(victims) <= _urls(unmasked)

    def test_report_appends_and_dedup(self, spark, takedown_out):
        out = takedown_out
        chunked = sorted(_urls(read_chunks(spark, out, apply_deletes=False)))
        # second file re-names an already-deleted url + one new one
        D.record_takedown(out, [chunked[0], chunked[7]], reason="optout")
        rep = D.takedown_report(spark, out)
        assert rep["n_delete_files"] == 2
        assert rep["n_deleted_urls"] == 6  # 5 + 1 overlap-collapsed
        assert rep["masked"]["extracted"] == 6
        assert rep["masked"]["chunks"] > 0
        with pytest.raises(ValueError):
            D.record_takedown(out, [])

    def test_materialize_then_resume(self, spark, takedown_out, pages_path):
        out = takedown_out
        masked_before = _urls(read_extracted(spark, out))
        rep = D.materialize_deletes(spark, out)
        assert rep["applied"] and rep["retired_delete_files"] == 2
        assert rep["tables"]["extracted"]["rows_removed"] == 6
        assert rep["tables"]["chunks"]["rows_removed"] > 0

        # data files no longer hold the rows; committed view unchanged
        raw = spark.read.parquet(os.path.join(out, "extracted"))
        assert _urls(raw) == masked_before
        assert _urls(read_extracted(spark, out)) == masked_before
        assert D.deleted_urls(spark, out) is None  # retired

        # idempotent re-run: nothing to do
        again = D.materialize_deletes(spark, out)
        assert again == {"applied": False, "reason": "no_deletes"}

        # seq keeps increasing past applied files (audit ordering)
        nxt = D.record_takedown(out, [sorted(masked_before)[0]])
        assert nxt["seq"] == 3
        D.materialize_deletes(spark, out)

        # NOTE the resume contract: a materialized takedown removes the
        # url from the extracted table, so the next run REPROCESSES it
        # (resume keys off committed rows).  A takedown that must stay
        # gone needs the url dropped from the input too — pin the
        # current behavior so the contract is explicit.
        pages = spark.read.parquet(pages_path)
        m = run_pipeline(spark, pages.limit(200), out, run_id="r3")
        assert m["n_skipped_resume"] < m["n_input"]

    def test_crash_between_tables_never_resurrects(
        self, spark, pages_path, tmp_path
    ):
        """Simulate the crash window: extracted rewritten, chunks not,
        delete files not yet retired — reads stay masked; the re-run
        completes the fold without double-removing."""
        out = str(tmp_path / "out")
        pages = spark.read.parquet(pages_path)
        run_pipeline(spark, pages.limit(100), out, run_id="r1")
        victim = sorted(_urls(read_chunks(spark, out)))[0]
        D.record_takedown(out, [victim])

        # crash-sim: fold only the extracted table — a partial fold
        # must NOT retire the delete files (the un-folded chunks table
        # would unmask)
        rep1 = D.materialize_deletes(spark, out, tables=("extracted",))
        assert rep1["tables"]["extracted"]["rows_removed"] == 1
        assert rep1["retired_delete_files"] == 0

        # chunks still masked by the live delete file
        assert victim not in _urls(read_chunks(spark, out))
        # completing the fold is safe: extracted anti-join is a no-op
        rep2 = D.materialize_deletes(spark, out)
        assert rep2["tables"]["extracted"]["rows_removed"] == 0
        assert rep2["tables"]["chunks"]["rows_removed"] > 0
        assert victim not in _urls(read_chunks(spark, out))
        assert victim not in _urls(
            spark.read.parquet(os.path.join(out, "chunks"))
        )

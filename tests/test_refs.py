"""Snapshot refs (Iceberg tags/branches for the parquet stand-in):
named pointers to committed runs, immutable tags vs movable branches,
atomic commits, loud failure on stale targets."""

import os

import pytest

from clawrag_spark import maintenance as M
from clawrag_spark.pipeline import read_extracted, run_pipeline


@pytest.fixture(scope="module")
def two_runs(spark, pages_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("refs"))
    pages = spark.read.parquet(pages_path)
    run_pipeline(spark, pages.limit(150), out, run_id="r1")
    run_pipeline(spark, pages.limit(300), out, run_id="r2")
    return out


def test_tag_reads_exact_snapshot(spark, two_runs):
    M.set_ref(two_runs, "eval-corpus", "r1", kind="tag")
    by_ref = read_extracted(spark, two_runs, as_of_ref="eval-corpus")
    by_run = read_extracted(spark, two_runs, as_of_run="r1")
    assert by_ref.count() == by_run.count()
    runs = {r["run_id"] for r in by_ref.select("run_id").distinct().collect()}
    assert runs == {"r1"}


def test_tag_immutable_branch_moves(spark, two_runs):
    M.set_ref(two_runs, "v1", "r1", kind="tag")
    with pytest.raises(ValueError, match="immutable"):
        M.set_ref(two_runs, "v1", "r2", kind="tag")
    M.set_ref(two_runs, "v1", "r2", kind="tag", force=True)  # explicit escape
    M.set_ref(two_runs, "prod", "r1", kind="branch")
    M.set_ref(two_runs, "prod", "r2", kind="branch")  # fast-forward, no force
    assert M.resolve_ref(two_runs, "prod") == "r2"
    refs = M.list_refs(two_runs)
    assert refs["prod"]["type"] == "branch"
    assert refs["prod"]["created_at"] <= refs["prod"]["updated_at"]


def test_uncommitted_target_and_unknown_ref(two_runs):
    with pytest.raises(ValueError, match="not a committed snapshot"):
        M.set_ref(two_runs, "bad", "no-such-run")
    with pytest.raises(ValueError, match="no ref"):
        M.resolve_ref(two_runs, "ghost")
    with pytest.raises(ValueError, match="no ref"):
        M.drop_ref(two_runs, "ghost")


def test_both_pins_rejected(spark, two_runs):
    M.set_ref(two_runs, "pin", "r1", kind="tag", force=True)
    with pytest.raises(ValueError, match="not both"):
        read_extracted(spark, two_runs, as_of_run="r1", as_of_ref="pin")


def test_stale_ref_fails_loudly_after_expiry(spark, pages_path, tmp_path):
    out = str(tmp_path / "exp")
    pages = spark.read.parquet(pages_path)
    run_pipeline(spark, pages.limit(100), out, run_id="a1")
    run_pipeline(spark, pages.limit(200), out, run_id="a2")
    run_pipeline(spark, pages.limit(300), out, run_id="a3")
    M.set_ref(out, "old", "a1", kind="tag")
    M.expire_runs(spark, out, keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        M.resolve_ref(out, "old")


def test_torn_refs_file_reads_empty(two_runs, tmp_path):
    out = str(tmp_path)
    with open(os.path.join(out, "refs.json"), "w") as fh:
        fh.write("{torn")
    assert M.list_refs(out) == {}
    # and a tmp left by a crashed writer is invisible
    M.set_ref(two_runs, "t1", "r1", kind="tag", force=True)
    with open(os.path.join(two_runs, "refs.json.tmp"), "w") as fh:
        fh.write("{torn")
    assert M.resolve_ref(two_runs, "t1") == "r1"


def test_drop_ref(two_runs):
    M.set_ref(two_runs, "gone", "r1", kind="branch")
    M.drop_ref(two_runs, "gone")
    assert "gone" not in M.list_refs(two_runs)

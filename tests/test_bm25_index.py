"""Persisted BM25 index (S15/A7): incremental maintenance across runs
must give the same scores as a from-scratch recompute over the committed
chunks, and the probe must touch only index tables (no corpus scan).
"""

import os

import pytest
from pyspark.sql import functions as F

from clawrag_spark.operators import retrieval as R
from clawrag_spark.pipeline import bm25_query_index, read_chunks, run_pipeline

TERMS = ["the", "data", "scale"]


@pytest.fixture(scope="module")
def indexed_out(spark, pages_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bm25_out"))
    pages = spark.read.parquet(pages_path)
    # two incremental runs: half the corpus, then the rest via resume
    run_pipeline(spark, pages.limit(300), out, run_id="runa", bm25_index=True)
    run_pipeline(spark, pages, out, run_id="runb", bm25_index=True)
    return out


def _scores_full_recompute(spark, out):
    chunks = read_chunks(spark, out).select("chunk_id", "text")
    return R.bm25_scores(chunks, "chunk_id", "text", TERMS)


def test_incremental_index_matches_full_recompute(spark, indexed_out):
    got = {
        r["chunk_id"]: r["bm25_score"]
        for r in bm25_query_index(spark, indexed_out, TERMS).collect()
    }
    want = {
        r["chunk_id"]: r["bm25_score"]
        for r in _scores_full_recompute(spark, indexed_out).collect()
    }
    assert len(want) > 0, "vacuous: no positive-score chunks in fixture"
    assert got.keys() == want.keys()
    for cid, score in want.items():
        assert got[cid] == pytest.approx(score, rel=1e-12)


def test_snapshot_pointer_and_deltas(spark, indexed_out):
    index_dir = os.path.join(indexed_out, "bm25_index")
    assert os.path.exists(os.path.join(index_dir, "_current.json"))
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    # both runs appended deltas
    runs = {r["run_id"] for r in postings.select("run_id").distinct().collect()}
    assert runs == {"runa", "runb"}
    # postings are per (chunk, term) — no duplicates across runs
    n = postings.count()
    assert n == postings.select("chunk_id", "term").distinct().count()


def test_probe_plan_has_no_corpus_scan(spark, indexed_out):
    plan = bm25_query_index(spark, indexed_out, TERMS)._jdf.queryExecution().executedPlan().toString()
    assert "/chunks" not in plan, "probe must not re-scan the corpus"
    # the query-term filter reaches the postings parquet scan
    assert "PushedFilters: [In(term" in plan, plan[:2000]

"""Mimics the driver's correctness gate: every ``queries()`` entry vs its
``oracle_sql()`` DuckDB twin — row count, column names, and
order-insensitive value comparison (rows sorted, columns sorted by name).

Runs at sf0.001 for speed; the driver runs the same contract at sf0.01.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 6)
    if isinstance(value, bool):
        return bool(value)
    if hasattr(value, "isoformat"):
        return value.isoformat()[:26]
    return value


def _rows_to_canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        tuple(_canon(row[i]) for i in order) for row in rows
    )


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # vacuity guard (round-2 verdict #10): a future corpus/term change
    # must not silently re-green a 0 == 0 comparison — every query has
    # to do real work at sf0.001 unless documented empty-by-design here
    EMPTY_BY_DESIGN: set[str] = set()
    if name not in EMPTY_BY_DESIGN:
        assert len(spark_rows) > 0, f"{name}: vacuous (0 Spark rows at sf0.001)"

    if sql is None:
        return

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _rows_to_canon(spark_rows, spark_cols)
    b = _rows_to_canon(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_expected_semantic_parquet_fresh():
    """The committed content-addressed expected-spans parquet must match
    a live recomputation by the chunker — catches a chunker change
    without a regenerated oracle file (and vice versa)."""
    import pyarrow.parquet as pq

    from clawrag_spark.core.expected import (
        EXPECTED_SEMANTIC_PATH,
        expected_semantic_table,
    )

    committed = pq.read_table(EXPECTED_SEMANTIC_PATH)
    live = expected_semantic_table()
    assert committed.equals(live), (
        "data/expected_semantic.parquet is stale — regenerate with "
        "`python -m clawrag_spark.core.expected`"
    )

    from clawrag_spark.core.expected import (
        EXPECTED_CHUNKERS_PATH,
        expected_chunkers_table,
    )

    committed = pq.read_table(EXPECTED_CHUNKERS_PATH)
    live = expected_chunkers_table()
    assert committed.equals(live), (
        "data/expected_chunkers.parquet is stale — regenerate with "
        "`python -m clawrag_spark.core.expected`"
    )


def test_pipeline_demo_rebuild_reproducible(spark, tmp_path):
    """The committed demo artifacts (data/pipeline_demo) must be exactly
    reproducible from scratch: same seeded corpus -> same pipeline run ->
    identical chunks and BM25 postings.  Guards the hybrid_pipeline_topk
    oracle against drift between the committed parquet and the live
    pipeline code."""
    from clawrag_spark.corpus import write_pages_parquet
    from clawrag_spark.pipeline import run_pipeline

    pages_path = write_pages_parquet(
        str(tmp_path / "pages.parquet"), entry_mod._DEMO_N_PAGES
    )
    out = str(tmp_path / "out")
    run_pipeline(
        spark,
        spark.read.parquet(pages_path),
        out,
        embed_dim=entry_mod._DEMO_EMBED_DIM,
        run_id="demo",
        bm25_index=True,
    )

    def rows(base, sub, cols, key):
        df = spark.read.parquet(os.path.join(base, sub)).select(*cols)
        return sorted([tuple(r) for r in df.collect()], key=lambda t: t[: len(key)])

    chunk_cols = ["chunk_id", "url", "chunk_index", "text", "char_start",
                  "char_end", "embedding"]
    assert rows(out, "chunks", chunk_cols, ["chunk_id"]) == rows(
        entry_mod._DEMO_OUT, "chunks", chunk_cols, ["chunk_id"]
    )
    post_cols = ["chunk_id", "term", "tf"]
    assert rows(out, "bm25_index/postings", post_cols, ["chunk_id", "term"]) == rows(
        entry_mod._DEMO_OUT, "bm25_index/postings", post_cols, ["chunk_id", "term"]
    )

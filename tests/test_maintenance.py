"""Small-file compaction: layout changes, content doesn't; gated
readers and resume survive a compaction pass."""

import os

from clawrag_spark.maintenance import compact_parquet_dir, compact_pipeline_output, dir_stats
from clawrag_spark.pipeline import read_chunks, run_pipeline


def _rows(spark, path, key_cols):
    df = spark.read.parquet(path)
    return sorted(
        [tuple(r) for r in df.select(*sorted(df.columns)).collect()],
        key=lambda t: t[: len(key_cols)],
    )


def test_compaction_preserves_content_and_readers(spark, pages_path, tmp_path):
    out = str(tmp_path / "out")
    pages = spark.read.parquet(pages_path)
    # two runs -> appended files; high partition count -> many small files
    run_pipeline(spark, pages.limit(200), out, run_id="r1", num_partitions=24)
    run_pipeline(spark, pages.limit(400), out, run_id="r2", num_partitions=24)

    chunks_dir = os.path.join(out, "chunks")
    before_rows = _rows(spark, chunks_dir, ["chunk_id"])
    files_before, _ = dir_stats(chunks_dir)
    assert files_before > 4, "fixture failed to produce small files"

    res = compact_pipeline_output(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert res["chunks"]["compacted"] is True
    assert res["chunks"]["files_after"] < files_before

    assert _rows(spark, chunks_dir, ["chunk_id"]) == before_rows
    # manifest-gated reader still sees both committed runs
    gated = read_chunks(spark, out)
    runs = {r["run_id"] for r in gated.select("run_id").distinct().collect()}
    assert runs == {"r1", "r2"}

    # resume over compacted output: nothing reprocessed
    m = run_pipeline(spark, pages.limit(400), out, run_id="r3")
    assert m["n_skipped_resume"] == m["n_input"]


def test_compaction_noop_paths(spark, tmp_path):
    missing = compact_parquet_dir(spark, str(tmp_path / "nope"))
    assert missing == {"compacted": False, "reason": "missing"}
    one = str(tmp_path / "one")
    spark.range(10).coalesce(1).write.parquet(one)
    res = compact_parquet_dir(spark, one)
    assert res["compacted"] is False and res["reason"] == "already_compact"

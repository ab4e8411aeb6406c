"""Incremental ingestion via Structured Streaming.

The reference has NO streaming operators — ingestion is request-driven
batch with a task queue (SURVEY.md §2.12; grep over backend/src shows no
watermarks/windows/state).  The equivalent *incremental* semantics in
Spark is a ``readStream`` over the pages table with
``Trigger.AvailableNow``: each invocation processes exactly the files
not seen by the checkpoint, then stops — batch semantics, streaming
bookkeeping.  This replaces the reference's Docling JSON result cache
(docling_service.py:135-226) with engine-native exactly-once progress
tracking, complementing the snapshot anti-join resume in
``pipeline.py`` (S18).

Each micro-batch runs the same extract stage as the batch pipeline via
``foreachBatch`` — one code path for both modes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .pipeline import (
    _EXTRACT_OUT_SCHEMA,
    _extract_partitions,
    narrow_versioning,
    prepare_pages,
)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def incremental_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Process all currently-unseen page files, then stop.

    - source: file-stream over parquet (schema pinned — streaming
      requires it),
    - Trigger.AvailableNow: drains the backlog in rate-limited
      micro-batches and terminates (the batch-job-shaped streaming
      mode),
    - checkpoint: file-source offsets → exactly-once per input file
      across invocations,
    - sink: same bucketed parquet layout as the batch pipeline.
    """
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(pages_dir)

    extracted_path = os.path.join(out_dir, "extracted_stream")

    def process_batch(batch_df, batch_id: int) -> None:
        prepared = prepare_pages(batch_df)
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        versions = narrow_versioning(prepared)
        distributed = (
            prepared.repartition(n_parts, "url")
            .join(F.broadcast(versions), "url", "left")
        )
        extract_in = distributed.select(
            "url", "warc_ts", "host", "url_bucket", "version", "is_active",
            "html", "lang"
        )
        extracted = extract_in.mapInPandas(_extract_partitions, _EXTRACT_OUT_SCHEMA)
        extracted = extracted.withColumn(
            "run_id", F.lit(f"stream_batch_{batch_id}")
        )
        (extracted.write.mode("append")
         .parquet(extracted_path))

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

"""Bucketed-table sinks: shuffle-free co-located joins.

At 10^12-document scale the chunks/parents/postings tables are joined
on their keys constantly (parent resolution J4, BM25 scoring J8, audit
J5).  Writing both sides bucketed on the join key with the same bucket
count lets Spark's bucketed-scan rule prove the partitioning
requirement is already satisfied — the sort-merge join runs with NO
Exchange on either side (pinned by tests/test_plans.py).  This is the
plain-Spark stand-in for the Iceberg ``bucket(N, key)`` partition
transform the production tables use; the pipeline's ``url_bucket``
column is the same idea carried as data (see pipeline.py sink notes).

Bucket-count discipline: both sides must use the SAME ``n_buckets`` —
mismatched counts fall back to a shuffle on one side.  Sorting within
buckets (``sortBy``) additionally removes the Sort before the merge
join for sorted scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted)
    on ``bucket_col`` — the co-location contract later joins rely on."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With both
    sides bucketed on ``on`` with equal bucket counts the planner emits
    a sort-merge join with zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), on)

"""Statistics / rollup operators (A1-A9 of SURVEY.md §2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collection_counts(df: DataFrame, collection_col: str) -> DataFrame:
    """A1: per-collection counts (collection_manager.py:236)."""
    return df.groupBy(collection_col).agg(F.count("*").alias("n_docs"))


def collection_stats(
    df: DataFrame, collection_col: str, dims: int = 768
) -> DataFrame:
    """A2: count + estimated size_mb = count·dims·4/2^20
    (collection_manager.py:241-244)."""
    return df.groupBy(collection_col).agg(
        F.count("*").alias("n_docs"),
        (F.count("*") * dims * 4 / 1048576.0).alias("size_mb"),
    )


def daily_counts_zero_filled(
    df: DataFrame, ts_col: str, start: str, end: str
) -> DataFrame:
    """A5: GROUP BY date + zero-fill missing days via a date spine
    (statistics_service.py:71-139).

    The spine is a ``sequence()`` of dates left-joined to the counts —
    the reference fills gaps in Python; here it's one generated relation.
    """
    spine = df.sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
            )
        ).alias("day")
    )
    counts = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count("*").alias("n")
    )
    return (
        spine.join(counts, "day", "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .orderBy("day")
    )


def dashboard_counts(df: DataFrame, type_col: str, value_col: str) -> DataFrame:
    """A6: conditional counts + a conversion-rate style ratio
    (statistics_service.py:15-69)."""
    return df.agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col(type_col) == "click", 1)).alias("n_clicks"),
        F.count(F.when(F.col(type_col) == "view", 1)).alias("n_views"),
        F.count(F.when(F.col(type_col) == "error", 1)).alias("n_errors"),
        F.round(
            F.count(F.when(F.col(type_col) == "click", 1))
            / F.nullif(F.count(F.when(F.col(type_col) == "view", 1)), F.lit(0)),
            6,
        ).alias("click_through_rate"),
        F.round(F.avg(value_col), 6).alias("avg_value"),
    )


def chunk_stats(chunks: DataFrame, text_col: str = "text") -> DataFrame:
    """A9: avg chunk size (chunking_comparison.py:88-95)."""
    return chunks.agg(
        F.count("*").alias("n_chunks"),
        F.round(F.avg(F.length(text_col)), 4).alias("avg_chunk_chars"),
    )

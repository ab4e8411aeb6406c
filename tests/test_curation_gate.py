"""Pin the Arrow-batch Gopher gate (`_gopher_frac_ok`) to the JVM
expression it replaces inside `_curation_cached`.

The pandas kernel re-implements ``top_ngram_char_frac(text) <= 0.12``
(ASCII ``\\s+`` split after lower, code-point bigram sort, strictly-
greater first-to-reach-max mode, integer*integer/length compare).  Any
divergence — tokenizer class, case mapping, sort order, tie-break —
flips curation_funnel / drop_reasons counts, so equality is pinned
per-document over the corpus fixture plus crafted edge cases.
"""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clawrag_spark.operators import webtext as WT

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _mismatches(spark, df):
    jvm = df.select(
        "doc_id", (WT.top_ngram_char_frac(F.col("text")) <= 0.12).alias("j")
    )
    py = df.select("doc_id", entry._gopher_frac_ok("text").alias("p"))
    return (
        jvm.join(py, "doc_id")
        .filter(
            F.col("j").eqNullSafe(F.col("p")) == False  # noqa: E712
        )
        .count()
    )


def test_gate_matches_jvm_on_corpus(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    assert _mismatches(spark, docs.select("doc_id", "text")) == 0


@pytest.mark.parametrize(
    "text",
    [
        "",
        " ",
        "one",
        "one two",
        "a b a b a b a b a b a b a b a b a b a b a b a b",  # dominant bigram
        "x " * 200,
        "tab\tand\nnewline  runs",
        "Ünïcode CASE Mapping ÉÉ éé ß ss İ i",
        " nbsp is not ascii whitespace here",
        "同じ 言葉 同じ 言葉 同じ 言葉 ascii too",
        "ties aa bb aa bb cc cc",  # equal runs -> smallest gram wins
    ],
)
def test_gate_matches_jvm_edge_cases(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    assert _mismatches(spark, df) == 0

"""Skew handling: salted two-phase aggregation and AQE skew joins.

Web corpora are Zipf-skewed — a handful of hosts own half the rows
(the synthetic corpus reproduces this, FIXTURES.md §1).  A plain
``groupBy(host)`` ships every row of a hot key to one reducer; that
task runs as long as the key is big, and 999 executors idle behind it.

Two engine-native answers, both used here:

- **Salted aggregation** (this module): for ALGEBRAIC aggregates
  (count/sum/min/max), split each key into ``n_salts`` sub-keys,
  partially aggregate ``(key, salt)``, then combine partials per key.
  The hot key's work spreads over ``n_salts`` tasks; the second stage
  shuffles only ``n_keys × n_salts`` partial rows.  (Spark's map-side
  partial aggregation already does this when upstream partitioning is
  random; explicit salting is the fix when the input arrives
  PRE-PARTITIONED by the hot key — e.g. reading a table bucketed or
  range-partitioned on host — where map-side combine can no longer
  spread a key across tasks.)
- **AQE skew-join** (tests/test_plans.py): joins re-planned at runtime
  split oversized partitions; ``spark.sql.adaptive.skewJoin`` is on in
  the session factory and the plan test pins the ``isSkew=true`` split
  actually firing on a Zipf join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {count, sum, min, max} — the algebraic aggregates whose partials
    combine exactly (count/sum recombine with sum; min/max with
    min/max).  ``salt_expr`` defaults to a uniform random-ish salt from
    a full-cardinality column hash when provided, else
    ``monotonically_increasing_id() % n_salts`` (uniform within
    partitions, deterministic per task layout; results are
    salt-placement independent either way — pinned by tests).
    """
    combiner = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for out, (_col, fn) in aggs.items():
        if fn not in combiner:
            raise ValueError(
                f"{out}: '{fn}' is not algebraic — salting cannot recombine it "
                "(use two-level distinct-style rewrites for avg/countDistinct)"
            )
    salt = (
        salt_expr
        if salt_expr is not None
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial_aggs = [
        getattr(F, fn)(col).alias(f"__p_{out}")
        for out, (col, fn) in aggs.items()
    ]
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*partial_aggs)
    )
    final_aggs = [
        getattr(F, combiner[fn])(f"__p_{out}").alias(out)
        for out, (_col, fn) in aggs.items()
    ]
    return partial.groupBy(*key_cols).agg(*final_aggs)

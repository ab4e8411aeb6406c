"""Training-shard sequence packing: a distributed prefix sum.

LLM training runs concatenate the (shuffled) token stream of the whole
corpus and chop it into fixed-size shards/sequences ("concat-and-chunk",
the layout GPT-2/3-style dataloaders consume).  The reference's chunker
family (``backend/src/core/chunker.py``) splits one document at a time;
this operator is the corpus-level counterpart a 10^12-document pipeline
needs: every document gets a deterministic position in a pseudorandom
global order and a shard id = floor(start_offset / shard_tokens), where
start_offset is the exclusive prefix sum of token counts in that order.

Scale design — the naive plan is a single global window
(``SUM(tokens) OVER (ORDER BY key)``), which Spark executes as a
one-partition sort: a 10^12-row stream through one task.  Instead this
runs the classic two-phase parallel prefix sum:

1. range-partition by the order key (so partition p holds a contiguous
   key range, sorted within),
2. per-partition *local* prefix sums via a partition-local window,
3. per-partition totals (one tiny row per partition) are collected,
   cumulated on the driver — P values, not P rows of data — and added
   back as broadcast offsets.

The result is independent of the number of partitions and of where the
range sampler places the boundaries (the order key is unique), so the
oracle — a plain global-window SQL — matches bit-for-bit while the
physical plan stays fully parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "shuffle_order_key",
    "pack_training_shards",
    "shard_manifest",
    "pack_sequences",
    "global_rank",
]


def shuffle_order_key(id_col: Column, salt: str = "pack") -> Column:
    """Deterministic pseudorandom global order: md5 of the salted id.

    This is the corpus 'global shuffle' step — engine-portable (md5 is
    identical everywhere), reproducible across reruns, and a different
    ``salt`` draws an independent permutation.  Ties are impossible for
    unique ids, which is what makes the packed layout well-defined.
    """
    return F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string")))


def pack_training_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    shard_tokens: int,
    salt: str = "pack",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document to a fixed-token-budget training shard.

    Returns (id, tokens, start_offset, shard_id): documents laid out in
    ``shuffle_order_key`` order, ``start_offset`` the exclusive prefix
    sum of ``tokens_col``, ``shard_id = start_offset div shard_tokens``
    (integer division on BIGINT — no float rounding at 10^12-token
    offsets).  A document straddling a boundary belongs to the shard its
    first token lands in, matching the usual dataloader convention.

    Physical plan: repartitionByRange + in-partition window for the
    local prefix sums, a P-row aggregate for the partition totals, and a
    broadcast join of the P cumulated offsets — no global sort, no
    single-partition window, shuffle volume O(rows · 16 B).
    """
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    return _exclusive_prefix_sum(
        df, id_col, tokens_col, salt, num_partitions
    ).withColumn("shard_id", F.expr(f"start_offset div {int(shard_tokens)}"))


def _exclusive_prefix(
    df: DataFrame,
    order_cols: list,
    weight_col: str,
    num_partitions: int | None = None,
    with_rank: bool = False,
) -> DataFrame:
    """The shared two-phase scaffolding: the input plus ``__pfx`` — the
    exclusive prefix sum of ``weight_col`` under the total order
    ``order_cols``.  Core of :func:`pack_training_shards`,
    :func:`pack_sequences` (weight = token counts, order = the shuffle
    key) and :func:`global_rank` (weight = 1, order = caller's score).
    ``with_rank=True`` additionally emits ``__rank`` (the 1-based global
    row number under the same order) from the SAME window pass and the
    SAME P-row offsets job — callers needing both (water-filling
    allocation) pay one shuffle, not two.

    Pins the sampled range boundaries before the plan forks:
    RangePartitioner samples its bounds per-RDD, so the totals job and
    the window job could otherwise each draw DIFFERENT partition splits
    and the pid-keyed offsets would not describe the rows they are
    added to.  Eager persist (the codebase's lazy-persist race rule)
    makes both branches read the same materialized partitioning.  The
    result is nonetheless partition-count-independent — the order is
    total, so the global prefix sum is well-defined regardless of where
    the sampled boundaries fall.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    parted.count()
    # Partition-local prefix sum: each window group IS a range
    # partition, so group sizes stay the range partitioner's balanced
    # splits.
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parted.withColumn(
        "__loc", F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    )
    if with_rank:
        wr = Window.partitionBy("__pid").orderBy(*order_cols)
        local = local.withColumn("__locn", F.row_number().over(wr))
    # Exclusive running total of the P per-partition sums: P rows (one
    # per partition, not per document) through a single-partition window
    # — metadata-sized by construction — then broadcast back.
    wp = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        parted.groupBy("__pid")
        .agg(F.sum(weight_col).alias("__t"), F.count("*").alias("__c"))
        .withColumn("__off", F.coalesce(F.sum("__t").over(wp), F.lit(0)))
        .withColumn("__offn", F.coalesce(F.sum("__c").over(wp), F.lit(0)))
        .select("__pid", "__off", "__offn")
    )
    out = (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("__pfx", F.col("__loc") + F.col("__off"))
    )
    if with_rank:
        out = out.withColumn(
            "__rank", (F.col("__offn") + F.col("__locn")).cast("long")
        ).drop("__locn")
    return out.drop("__pid", "__loc", "__off", "__offn")


def _exclusive_prefix_sum(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    salt: str = "pack",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, tokens, start_offset) in ``shuffle_order_key`` order via the
    two-phase parallel prefix sum described in the module docstring —
    the shared core of :func:`pack_training_shards` and
    :func:`pack_sequences`."""
    keyed = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("__tok"),
        shuffle_order_key(F.col(id_col), salt).alias("__ok"),
    )
    pref = _exclusive_prefix(
        keyed, [F.col("__ok")], "__tok", num_partitions
    )
    return pref.select(
        F.col(id_col),
        F.col("__tok").alias(tokens_col),
        F.col("__pfx").alias("start_offset"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    ctx_tokens: int,
    eos_tokens: int = 1,
    salt: str = "pack",
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk the corpus token stream into fixed-context
    training sequences — the GPT-style dataloader layout where a
    document CROSSES sequence boundaries and contributes a span to each
    sequence it touches (unlike :func:`pack_training_shards`, which
    assigns whole documents by their first token).

    Every document occupies ``tokens + eos_tokens`` positions in the
    deterministic pseudorandom global order (the EOS separator the
    dataloaders append between documents); with ``start`` the exclusive
    prefix sum and ``end = start + n``, the doc spans sequences
    ``start div ctx .. (end-1) div ctx``.  One row per (sequence, doc)
    span: ``tok_start``/``tok_end`` are the span's WITHIN-SEQUENCE
    offsets (end exclusive), ``n_span`` its length, so a trainer can
    materialize any sequence by slicing exactly the listed spans.

    Scale shape: the two-phase distributed prefix sum (no global
    window), then a per-row ``sequence()`` explode whose length is
    ``1 + n div ctx`` — bounded by the doc/ctx ratio, ~1-2 rows per doc.
    All arithmetic is BIGINT integer division: bit-identical on any
    engine at 10^12-token offsets, no float boundaries.
    """
    if ctx_tokens <= 0:
        raise ValueError(f"ctx_tokens must be positive, got {ctx_tokens}")
    if eos_tokens < 0:
        raise ValueError(f"eos_tokens must be >= 0, got {eos_tokens}")
    ctx = int(ctx_tokens)
    occupied = df.select(
        F.col(id_col),
        (F.col(tokens_col).cast("long") + F.lit(int(eos_tokens))).alias(
            "__n"
        ),
    ).filter(F.col("__n") > 0)  # zero-width docs pack nowhere
    pre = _exclusive_prefix_sum(
        occupied, id_col, "__n", salt, num_partitions
    ).select(
        F.col(id_col),
        F.col("__n"),
        F.col("start_offset").alias("__s"),
        (F.col("start_offset") + F.col("__n")).alias("__e"),
    )
    seq = pre.select(
        F.col(id_col),
        "__s",
        "__e",
        F.explode(
            F.sequence(
                F.expr(f"__s div {ctx}"), F.expr(f"(__e - 1) div {ctx}")
            )
        ).alias("seq_id"),
    )
    span_start = F.greatest(F.col("__s"), F.col("seq_id") * ctx)
    span_end = F.least(F.col("__e"), (F.col("seq_id") + 1) * ctx)
    return seq.select(
        "seq_id",
        F.col(id_col),
        (span_start - F.col("seq_id") * ctx).alias("tok_start"),
        (span_end - F.col("seq_id") * ctx).alias("tok_end"),
        (span_end - span_start).alias("n_span"),
    )


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense global 1-based rank under a TOTAL order — the curriculum
    primitive (order the corpus by quality/difficulty score for staged
    training) without the naive plan's single-partition global sort.

    ``order_cols`` are Column expressions (``F.col("score").desc()``,
    tiebreakers included — the order must be total, or ranks of tied
    rows are partition-dependent).  Same two-phase shape as the prefix
    sums above: range-partition by the order expressions (contiguous
    rank ranges per partition), per-partition ``row_number``, P
    per-partition counts cumulated on the driver and broadcast back.
    Wall-clock is one range shuffle; the naive
    ``row_number() OVER (ORDER BY ...)`` — which IS the oracle — sorts
    the full corpus through one task.
    """
    # rank = exclusive prefix count of 1s under the total order, + 1 —
    # the same two-phase scaffolding as the token prefix sums
    pref = _exclusive_prefix(
        df.withColumn("__one", F.lit(1).cast("long")),
        order_cols,
        "__one",
        num_partitions,
    )
    return (
        pref.withColumn(rank_col, (F.col("__pfx") + 1).cast("long"))
        .drop("__one", "__pfx")
    )


def shard_manifest(
    packed: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Release-integrity manifest over packed training shards: the
    per-shard table a corpus release ships next to the data files so a
    consumer can verify a shard without re-reading the whole release
    (n docs, token mass, starting global offset, and a content
    checksum binding every document to its id AND its layout
    position).

    The checksum is the XOR of per-document 60-bit md5 digests of
    ``start_offset | id : text`` — XOR is commutative (the aggregate
    is order-independent and map-side combinable) while the offset
    inside the hash makes the VALUE order-sensitive in exactly the
    right way: any permutation, drop, duplication, or edit of the
    packed layout changes the checksum, but the verifier can stream
    the shard in any partition order.

    Scale shape: one equi-join of the packed layout onto the content
    on the shared id key (both sides naturally keyed by it), then one
    groupBy(shard_id) with algebraic aggregates — the map-side partial
    xor/sums mean only per-(partition, shard) partials shuffle, 8-byte
    checksums rather than text.
    """
    layout = packed.select(
        F.col(id_col), F.col(tokens_col), "start_offset", "shard_id"
    )
    joined = layout.join(docs.select(F.col(id_col), F.col(text_col)), id_col)
    digest = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("start_offset").cast("string"),
                    F.lit("|"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col(text_col),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        joined.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(tokens_col).cast("long").alias("n_tokens"),
            F.min("start_offset").alias("start_offset"),
            F.bit_xor(digest).alias("content_xor"),
        )
    )


def budget_selection(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    order_cols: list,
    token_budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy corpus selection under a global token budget: order the
    corpus by the caller's value-density score (``order_cols`` — a
    TOTAL order, tiebreakers included) and keep every document whose
    EXCLUSIVE prefix of token mass is still under ``token_budget`` —
    "spend the 10B-token budget on the best data first", the
    quality-ranked selection step of DsDm/QuRating-style pipelines.
    The greedy prefix cut is the standard knapsack relaxation: the
    overshoot is bounded by one document.

    Returns the input columns plus ``cum_before`` (tokens admitted
    before this doc under the order) and ``selected``.

    Scale shape: the same two-phase distributed prefix sum as
    ``pack_sequences`` (range partition on the order, partition-local
    window, P broadcast offsets) — never a single-partition global
    window; the oracle IS that naive window.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    keyed = df.withColumn("__tok", F.col(tokens_col).cast("long"))
    pref = _exclusive_prefix(keyed, order_cols, "__tok", num_partitions)
    return (
        pref.withColumn("cum_before", F.col("__pfx").cast("long"))
        .withColumn("selected", F.col("__pfx") < F.lit(int(token_budget)))
        .drop("__tok", "__pfx")
    )

"""Cardinality sketches — deterministic HyperLogLog over DataFrames.

At 10^12 documents "how many distinct hosts / users / urls per group"
is a sketch problem: exact count-distinct shuffles every distinct value
(one row per (group, value)) while an HLL register file is a fixed
``m``-integer summary per group that merges with ``max`` — the shuffle
carries at most ``m`` rows per group no matter the cardinality, and
partial aggregation (map-side ``max`` per register) does most of the
work before the exchange.

Spark's built-in ``approx_count_distinct`` is exactly this (HLL++),
but its register hash is engine-private — no other system can verify
the estimate.  This implementation pins every bit: the hash is
``md5`` (first 15 hex chars → a 60-bit integer), the register index is
the low ``b`` bits, rho is the leading-zero count of the remaining
``60-b`` bits, and the estimator is the canonical Flajolet et al. 2007
formula with the small-range (linear-counting) correction.  The
register sum is computed in EXACT integer arithmetic
(``sum(1 << (maxrho_cap - M_j))``) so engines cannot diverge on float
summation order; the only float ops are one division and one ``ln``,
absorbed by the final ``round(…, 4)``.  The same math re-expressed in
ANSI SQL is the driver query's DuckDB oracle — a cross-engine-verified
sketch.

Reference parity note: the reference has no sketch layer (its
collection counts are exact SELECT COUNTs — backend/src/services/
collection_service.py); this operator is part of the beyond-reference
large-scale pipeline family, next to dedup and ANN.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_sketch",
    "kmv_estimate_distinct",
    "kmv_jaccard",
    "HLL_ALPHA_LITERAL",
    "hll_distinct",
    "bloom_build",
    "bloom_probe",
    "cms_build",
    "cms_estimate",
]


def _alpha(m: int) -> float:
    """Canonical HLL bias constant alpha_m (Flajolet et al. 2007 §4)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


#: repr() of alpha for the default b=6 (m=64) — embed this exact literal
#: in any SQL twin so both engines multiply by the same double.
HLL_ALPHA_LITERAL = repr(_alpha(64))


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 6,
) -> DataFrame:
    """Per-group distinct-count estimate via a deterministic HLL sketch.

    Returns one row per group: ``(*group_cols, hll_estimate: double,
    n_registers: long)``.  ``b`` register-index bits → ``m = 2**b``
    registers; standard error ≈ 1.04/sqrt(m) (13% at the default b=6 —
    chosen small so the driver-scale fixtures exercise BOTH estimator
    branches; production would run b=12..14).

    Scale shape: one groupBy on (group, register) with a map-side
    ``max`` partial — the exchange carries ≤ m rows per group — then a
    groupBy on the group keys over ≤ m rows.  No row-per-distinct-value
    shuffle at any point, which is the entire reason sketches exist at
    10^12 rows.

    Determinism: 60-bit md5 hash, exact integer register sum
    (``1 << (cap − M)``), float only in the final division / ``ln`` /
    ``round(…, 4)`` — bit-reproducible across engines, runs, and
    partitionings (register max and integer sum are order-free).
    """
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    m = 1 << b
    alpha = _alpha(m)
    # 60-bit hash: 15 hex chars of md5 — fits a signed BIGINT on every
    # engine (the 16th char would push past 2^63 and flip signs
    # differently per engine).
    h: Column = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    wbits = 60 - b  # bits left for the rho scan
    cap = wbits + 1  # rho when the remaining bits are all zero
    # h >> b MUST stay integral: float division would round past 2^53
    w = F.shiftright(h, b)
    rho = F.when(w == 0, F.lit(cap)).otherwise(F.lit(cap) - F.length(F.bin(w)))
    regs = (
        df.select(*group_cols, (h % m).alias("__j"), rho.alias("__rho"))
        .groupBy(*group_cols, "__j")
        .agg(F.max("__rho").alias("__M"))
    )
    # Exact integer Z-sum: sum over PRESENT registers of 2^(cap - M)
    # (M in [1, cap] → terms in [1, 2^(cap-1)]); absent registers
    # contribute 2^cap each, added from the zero count below.  With
    # b >= 4 the total stays under 2^63 for every supported b.
    summed = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(1L, {cap} - __M)")).alias("__s"),
        F.count("*").alias("n_registers"),
    )
    zeros = F.lit(m) - F.col("n_registers")
    s_total = F.col("__s") + zeros * F.lit(1 << cap).cast("long")
    # E_raw = alpha * m^2 / sum(2^-M_j)  ==  alpha * m^2 * 2^cap / s_total
    e_raw = F.lit(alpha * m * m * float(1 << cap)) / s_total
    # small-range correction: linear counting when registers are sparse
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(e_raw)
    return summed.select(
        *group_cols,
        F.round(est, 4).alias("hll_estimate"),
        F.col("n_registers").cast("long").alias("n_registers"),
    )


def _bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for a key: position_i = the i-th 8-hex-
    char window of md5(key) read as an integer, mod m_bits.  Pure
    expressions, and bit-identical in the DuckDB twin
    (``CAST('0x' || substr(md5(key), i*8-7, 8) AS BIGINT) % m``).
    md5 yields 32 hex chars, so k ≤ 4 independent 32-bit windows."""
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in [1, 4] (md5 has 4 32-bit windows), got {k}")
    h = F.md5(key)
    return F.array(
        *[
            (
                F.conv(F.substring(h, i * 8 + 1, 8), 16, 10).cast("long")
                % F.lit(m_bits)
            )
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 2048, k: int = 3
) -> DataFrame:
    """Distributed Bloom filter build: returns the filter as SPARSE
    (word_idx, bits) rows — at most ``m_bits/32`` rows total.

    Each key sets k md5-derived bit positions; positions explode to
    (word_idx = pos div 32, mask = 1 << (pos % 32)) rows and the filter
    is one ``bit_or`` hash aggregation — map-side partials collapse
    almost all traffic, so the shuffle carries O(m_bits/32) rows per
    partition regardless of input cardinality.  This is the URL-seen /
    dedup pre-filter shape: at 10^12 urls the filter is built per
    url-hash bucket (one independent small filter per bucket, exactly
    like the sink's bucketed layout) and probes broadcast against it.
    """
    pos = F.explode(_bloom_positions(F.col(key_col), m_bits, k)).alias("pos")
    # 32-bit words: the max shift is 31, so masks stay positive in
    # BIGINT on every engine (a 1<<63 sign bit would force both sides
    # into unsigned-compare gymnastics for zero benefit)
    rows = df.select(pos).select(
        F.expr("pos div 32").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("mask"),
    )
    return rows.groupBy("word_idx").agg(F.expr("bit_or(mask)").alias("bits"))


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 2048,
    k: int = 3,
) -> DataFrame:
    """Membership test: (key, in_bloom) — true iff ALL k positions are
    set.  The filter side is tiny (≤ m_bits/32 rows) and broadcasts;
    the probe side pays one explode + one per-key aggregation.  False
    positives at the standard (1 − e^{−kn/m})^k rate; no false
    negatives (pinned by pytest).
    """
    pos = F.explode(_bloom_positions(F.col(key_col), m_bits, k)).alias("pos")
    need = probes.select(F.col(key_col), pos).select(
        F.col(key_col),
        F.expr("pos div 32").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("mask"),
    )
    hit = (
        need.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            F.col(key_col),
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                == F.col("mask")
            ).alias("set_"),
        )
    )
    return hit.groupBy(key_col).agg(
        F.min(F.col("set_").cast("int")).cast("boolean").alias("in_bloom")
    )


def _cms_cells(key: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` (row, col) cell structs for a key, one per
    independent 32-bit md5 window (the same window trick as
    :func:`_bloom_positions`): ``col_i = window_i mod width``.  Pure
    expressions; the DuckDB twin is
    ``('0x' || substr(md5(key), i*8+1, 8))::BIGINT % width``."""
    if not 1 <= depth <= 4:
        raise ValueError(f"depth must be in [1, 4] (md5 has 4 windows), got {depth}")
    h = F.md5(key)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (
                    F.conv(F.substring(h, i * 8 + 1, 8), 16, 10).cast("long")
                    % F.lit(width)
                ).alias("col"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-min sketch build (Cormode & Muthukrishnan 2005): returns
    the sketch as SPARSE ``(row_i, col, cnt)`` rows — at most
    ``depth × width`` rows total, regardless of input cardinality.

    Each input row increments ``depth`` cells; cells explode and the
    sketch is one hash aggregation with map-side partial sums, so the
    exchange carries O(depth × width) rows per partition.  Sketches
    merge by cell-wise ``+`` (union two builds with a further sum),
    which is what makes them the per-bucket / per-day frequency summary
    at 10^12 rows: the exact (key, count) table shuffles one row per
    distinct key, the sketch never exceeds a few KB.

    Determinism: cells are md5-window arithmetic on integers and the
    counts are integer sums — bit-identical across engines, runs, and
    partitionings.
    """
    cell = F.explode(_cms_cells(F.col(key_col).cast("string"), depth, width))
    return (
        df.select(cell.alias("c"))
        .groupBy(F.col("c.row_i").alias("row_i"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-frequency estimate: ``(key, cms_est)`` with
    ``cms_est = min over rows of sketch[row, h_row(key)]`` (absent cell
    → 0).  The classic one-sided guarantee holds exactly: the estimate
    never undercounts, and overshoots by more than ``2N/width`` with
    probability ≤ 2^-depth.  The sketch side is tiny and broadcasts;
    probes pay one explode + one per-key min aggregation.
    """
    cell = F.explode(_cms_cells(F.col(key_col).cast("string"), depth, width))
    need = probes.select(F.col(key_col), cell.alias("c")).select(
        F.col(key_col),
        F.col("c.row_i").alias("row_i"),
        F.col("c.col").alias("col"),
    )
    return (
        need.join(F.broadcast(sketch), ["row_i", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


# ------------------------------------------------- KMV (K-minimum values)

def kmv_sketch(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest md5 hashes of the
    group's distinct keys (Bar-Yossef et al. 2002 / the DataSketches
    theta family).  Unlike HLL, a KMV sketch supports SET OPERATIONS —
    the k smallest of a union is computable from two sketches alone —
    which is what makes cross-snapshot overlap estimation possible
    without touching the raw data twice.

    Returns (group, hashes array<string> ascending, n_keys_seen).
    Scale shape: distinct → one (group, hash) shuffle (16-byte rows),
    then ``slice(array_sort(collect_set(...)))`` per group — the
    sketch is a fixed k-string summary per group no matter the
    cardinality.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.md5(F.col(key_col).cast("string"))
    per = (
        df.select(F.col(group_col).alias("grp"), h.alias("h"))
        .distinct()
    )
    return per.groupBy("grp").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hashes"),
        F.count("*").alias("n_keys_seen"),
    )


def _hash_frac(hex_col: Column) -> Column:
    """First 15 hex chars → fraction of the hash space in [0, 1)."""
    return F.conv(F.substring(hex_col, 1, 15), 16, 10).cast("double") / float(
        16**15
    )


def kmv_estimate_distinct(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate per group: (k-1)/h_k with h_k the k-th
    smallest hash as a fraction of the hash space; groups with fewer
    than k keys are exact (the sketch holds every hash)."""
    n = F.size("hashes")
    kth = _hash_frac(F.element_at("hashes", n))
    est = F.when(n < k, n.cast("double")).otherwise((F.lit(k - 1)) / kth)
    return sketch.select(
        "grp", F.round(est, 2).alias("est_distinct"), "n_keys_seen"
    )


def kmv_jaccard(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Cross-group overlap from sketches ALONE: for each (group_a,
    group_b) pair, merge the two hash arrays, take the k smallest of
    the union, and estimate Jaccard as |both ∩ union_k| / |union_k|
    (the standard KMV intersection estimator).  At 10^12 docs this
    estimates cross-snapshot duplication from two k-string summaries —
    no join against raw data, no shuffle beyond the tiny sketch rows.

    Inputs are ``kmv_sketch`` outputs; the pair table is
    |groups_a|×|groups_b| — sketch-sized, broadcast-friendly.
    """
    aa = a.select(
        F.col("grp").alias("grp_a"), F.col("hashes").alias("ha")
    )
    bb = b.select(
        F.col("grp").alias("grp_b"), F.col("hashes").alias("hb")
    )
    both = F.array_intersect(F.col("ha"), F.col("hb"))
    union_k = F.slice(
        F.array_sort(F.array_union(F.col("ha"), F.col("hb"))), 1, k
    )
    inter_in_k = F.size(F.array_intersect(union_k, both))
    return (
        aa.crossJoin(bb)
        .select(
            "grp_a",
            "grp_b",
            F.size(union_k).alias("union_k"),
            inter_in_k.alias("inter_k"),
            F.round(
                inter_in_k / F.greatest(F.size(union_k), F.lit(1)), 6
            ).alias("jaccard_est"),
        )
    )


def bottomk_quantiles(
    df: DataFrame,
    id_col: str,
    value_col: str,
    *,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    k: int = 1024,
    salt: str = "qsk1",
) -> DataFrame:
    """Bottom-k sample quantile estimator — the KMV trick (bottom-k
    rows by ``md5(salt|id)``) turned into a mergeable quantile sketch:
    the k smallest hashes form a DETERMINISTIC uniform sample that is
    independent of partitioning and merge order (unlike reservoir /
    GK / t-digest whose state depends on arrival order, which breaks
    cross-engine value parity), and the q-quantile estimate is the
    value at rank ``ceil(q·k)`` of the value-sorted sample.

    For the error report the exact quantile is computed under the SAME
    rank definition over the full table; at production scale the exact
    column is the thing this sketch replaces (drop it and only the
    top-k-by-hash scan remains — a TakeOrderedAndProject, no global
    sort).  Ties break by id on both paths.  Returns
    (q, est, exact, abs_err, k_used, n_rows).
    """
    from clawrag_spark.operators import packing as PK

    h = F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    sample = (
        df.select(F.col(id_col).alias("id"), F.col(value_col).alias("v"),
                  h.alias("h"))
        .orderBy("h")
        .limit(k)
    )
    wk = Window.partitionBy(F.lit(1))
    ws = Window.partitionBy(F.lit(1)).orderBy("v", "id")
    ranked_s = sample.select(
        "v",
        F.row_number().over(ws).alias("r"),
        F.count("*").over(wk).alias("ku"),
    )
    spine = None
    for q in qs:
        row = F.lit(float(q)).alias("q")
        spine = (
            ranked_s.sparkSession.range(1).select(row)
            if spine is None
            else spine.union(ranked_s.sparkSession.range(1).select(row))
        )
    est = spine.join(
        ranked_s,
        F.col("r") == F.ceil(F.col("q") * F.col("ku")).cast("int"),
    ).select("q", F.col("v").alias("est"), F.col("ku").alias("k_used"))
    full = PK.global_rank(
        df.select(F.col(id_col).alias("id"), F.col(value_col).alias("v")),
        [F.col("v").asc(), F.col("id").asc()],
        rank_col="r",
    )
    n = full.agg(F.count("*").alias("n"))
    exact = (
        spine.withColumnRenamed("q", "q2")
        .crossJoin(F.broadcast(n))
        .join(
            full,
            F.col("r") == F.ceil(F.col("q2") * F.col("n")).cast("long"),
        )
        .select(F.col("q2").alias("q"), F.col("v").alias("exact"),
                F.col("n").alias("n_rows"))
    )
    return (
        est.join(exact, "q")
        .select(
            "q",
            "est",
            "exact",
            F.round(F.abs(F.col("est") - F.col("exact")), 6).alias("abs_err"),
            "k_used",
            "n_rows",
        )
    )

"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (SURVEY.md §2), these are the ops a
100 TB web-text corpus pipeline needs: near-duplicate detection at
several fidelity levels, approximate nearest-neighbour search, and text
quality signals.  Everything SQL-expressible is built-in expressions;
SimHash is the one vectorized pandas UDF (bit manipulation).

Scale design:
- exact dedup: hash groupBy — one shuffle on the 64-hex digest,
- MinHash-LSH: shingle → per-band min-hash → band-bucket equi-join;
  the self-join key is (band, signature) so candidate generation never
  compares all pairs,
- SimHash: 64-bit fingerprints; hamming-ball probing via b-bit band
  keys (split fingerprint into 4×16-bit bands; near-dups share ≥1 band
  for hamming distance ≤ 3 by pigeonhole),
- ANN: brute-force cosine is the exact baseline; the IVF variant
  probes only the nearest coarse cell(s) — at 10^12 scale the cells
  are Iceberg partitions and probing prunes the scan.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .retrieval import cosine, sql_tokens


def exact_dedup_keep_first(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: keep the lowest-id doc per sha256(text)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(id_col)
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def shingle_array(text_col, n: int = 3):
    """n-token shingles of a text column as an array expression."""
    toks = sql_tokens(text_col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )


def minhash_band_signatures(
    docs: DataFrame, id_col: str, text_col: str, n_bands: int = 4
) -> DataFrame:
    """Per-(doc, band) min-md5 signature over distinct 3-shingles.

    min(md5(band || shingle)) is a proper min-hash per band (md5 is a
    fixed random permutation of the shingle space; lexicographic min of
    hex strings is order-isomorphic to numeric min).
    """
    shingles = (
        docs.select(F.col(id_col), F.explode(shingle_array(F.col(text_col))).alias("shingle"))
        .distinct()
    )
    bands = docs.sparkSession.range(n_bands).select(
        F.col("id").cast("int").alias("band")
    )
    return (
        shingles.crossJoin(F.broadcast(bands))
        .groupBy(id_col, "band")
        .agg(
            F.min(
                F.md5(F.concat(F.col("band").cast("string"), F.lit("|"), F.col("shingle")))
            ).alias("sig")
        )
    )


def minhash_candidate_pairs(
    docs: DataFrame, id_col: str, text_col: str, n_bands: int = 4
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band signature."""
    sigs = minhash_band_signatures(docs, id_col, text_col, n_bands)
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


# ------------------------------------------------------------- SimHash

@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash fingerprint (vectorized pandas UDF).

    Per doc: md5(token) → 64-bit value; each bit contributes ±1 to its
    position; fingerprint bit = sign of the sum.  Deterministic across
    processes (md5-based, no salted hashes).
    """
    import re

    token_re = re.compile(r"[a-z0-9]+")

    def one(t: str | None) -> int:
        if not t:
            return 0
        acc = [0] * 64
        for tok in token_re.findall(t.lower()):
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
            )
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        out = 0
        for bit in range(64):
            if acc[bit] > 0:
                out |= 1 << bit
        # two's-complement into signed 64-bit for Spark LongType
        return out - (1 << 64) if out >= (1 << 63) else out

    return pd.Series([one(t) for t in text], dtype="int64")


def simhash_bands(df: DataFrame, hash_col: str = "simhash") -> DataFrame:
    """Split a 64-bit SimHash into 4×16-bit band keys: fingerprints at
    hamming distance ≤ 3 share at least one band (pigeonhole), so a
    band-bucket self-join finds all near-dups without O(n²) compares."""
    out = df
    for band in range(4):
        out = out.withColumn(
            f"band_{band}",
            F.shiftright(F.col(hash_col), band * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out


def hamming64(col_a, col_b):
    """Hamming distance between two signed-64-bit fingerprint columns."""
    return F.bit_count(col_a.bitwiseXOR(col_b))


def simhash_near_dups(
    docs: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: fingerprint → band join → hamming verify."""
    hashed = simhash_bands(
        docs.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
    )
    pairs = None
    for band in range(4):
        a = hashed.select(
            F.col(id_col).alias("doc_a"),
            F.col("simhash").alias("sh_a"),
            F.col(f"band_{band}").alias("bk"),
        )
        b = hashed.select(
            F.col(id_col).alias("doc_b"),
            F.col("simhash").alias("sh_b"),
            F.col(f"band_{band}").alias("bk"),
        )
        cand = a.join(b, "bk").filter(F.col("doc_a") < F.col("doc_b"))
        pairs = cand if pairs is None else pairs.unionByName(cand)
    return (
        pairs.select("doc_a", "doc_b", hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------------------------ ANN

def ivf_centroids(emb: DataFrame, id_col: str, vec_col: str, cell_col: str) -> DataFrame:
    """Element-wise mean vector per coarse cell (IVF codebook).

    Built-in only: posexplode → groupBy(cell, pos) → avg → re-assemble
    ordered with array_agg over a sorted struct.
    """
    exploded = emb.select(
        F.col(cell_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    means = exploded.groupBy(cell_col, "pos").agg(F.avg("val").alias("m"))
    return (
        means.groupBy(cell_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )


def ann_ivf_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    query_vec: list[float],
    k: int,
    n_probe: int = 1,
) -> DataFrame:
    """IVF ANN: rank coarse cells by centroid cosine, search only the
    top ``n_probe`` cells.  At warehouse scale the cell is a partition
    key, so the probe prunes the scan to n_probe partitions."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    cents = ivf_centroids(emb, id_col, vec_col, cell_col)
    best_cells = (
        cents.select(
            F.col(cell_col),
            cosine(F.col("centroid"), qlit).alias("cell_sim"),
        )
        .orderBy(F.desc("cell_sim"), F.col(cell_col))
        .limit(n_probe)
        .select(cell_col)
    )
    return (
        emb.join(F.broadcast(best_cells), cell_col)
        .select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), qlit).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dups(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force baseline).

    The scale path buckets by sign-projection first (see
    ``__spark_entry__.q_embedding_sign_buckets``) and only compares
    within buckets; this exact variant is the correctness oracle.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") > threshold)
    )


# ----------------------------------------------------- quality signals

_STOPWORDS = (
    "the and of to in is that it for on with as was at by this have from "
    "or be are not but had his which they you were her she all".split()
)


def text_quality_signals(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality signals for training-data filtering: token
    count, mean token length, stopword ratio, punctuation ratio,
    uppercase ratio — all built-in expressions."""
    toks = sql_tokens(F.col(text_col))
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(_STOPWORDS)))
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    return docs.select(
        F.col(id_col),
        n_toks.cast("long").alias("n_tokens"),
        F.round(
            F.when(
                n_toks > 0,
                F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / n_toks,
            ).otherwise(0.0),
            6,
        ).alias("mean_token_len"),
        F.round(
            F.when(n_toks > 0, stop_hits / n_toks).otherwise(0.0), 6
        ).alias("stopword_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_upper / F.greatest(n_chars, F.lit(1)), 6).alias("upper_ratio"),
    )

"""The end-to-end training-corpus curation pipeline as a library API.

Composes the curation operators (operators/webtext.py, operators/
dataset.py) into the standard funnel a web-scale training-data run
ships: quality gate → near-dedup → benchmark decontamination →
stratified language mix, with a per-(stage, language) survivor report.

Each stage is optional and the intermediate frames are persisted so a
stage feeds both its own report row and the next stage without
recompute.  The whole funnel is deterministic: same input → same
output rows on any engine (the driver query `curation_funnel` pins it
against a composed DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import dataset as DS
from .operators import webtext as WT


def curate_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    *,
    min_chars: int = 100,
    max_top_bigram_frac: float = 0.12,
    pair_fn=None,
    benchmark: DataFrame | None = None,
    decontaminate_n: int = 8,
    mix_rates: dict[str, float] | None = None,
    mix_default_rate: float = 0.0,
    mix_salt: str = "mix",
    chars_col: str | None = None,
) -> dict:
    """Run the curation funnel over ``docs``.

    Returns ``{"curated": DataFrame, "stages": [(name, DataFrame)]}`` —
    ``stages`` holds each stage's surviving frame in order, for
    reporting via :func:`funnel_report`.

    - quality: length >= min_chars and Gopher top-bigram char fraction
      <= max_top_bigram_frac (both inline expressions, scan-side),
    - near-dedup: ``pair_fn(quality_frame)`` must return verified
      near-dup pairs (doc_a, doc_b) — e.g. MinHash candidates + a
      Jaccard verify — computed on the quality survivors; their
      connected components drop every non-representative member;
      skipped when None,
    - decontamination: drop docs sharing any ``decontaminate_n``-token
      shingle with ``benchmark``; skipped when None,
    - mix: stratified per-language sampling; skipped when rates None.
    """
    length_expr = (
        F.length(F.col(text_col)) if chars_col is None else F.col(chars_col)
    )
    stages: list[tuple[str, DataFrame]] = [("input", docs)]

    quality = (
        docs.withColumn(
            "top_ngram_char_frac", WT.top_ngram_char_frac(F.col(text_col))
        )
        .filter(
            (length_expr >= min_chars)
            & (F.col("top_ngram_char_frac") <= max_top_bigram_frac)
        )
        .persist()
    )
    stages.append(("quality", quality))
    current = quality

    if pair_fn is not None:
        cc = DS.connected_components(pair_fn(current), "doc_a", "doc_b")
        drop_ids = cc.filter(F.col("n") != F.col("cluster")).select(
            F.col("n").alias(id_col)
        )
        current = current.join(drop_ids, id_col, "left_anti").persist()
        stages.append(("near_dedup", current))

    if benchmark is not None:
        flagged = WT.decontaminate(
            current, benchmark, id_col, text_col, n=decontaminate_n
        ).select(id_col)
        current = current.join(flagged, id_col, "left_anti").persist()
        stages.append(("decontaminated", current))

    if mix_rates is not None:
        current = WT.stratified_sample(
            current, lang_col, mix_rates, id_col,
            salt=mix_salt, default_rate=mix_default_rate,
        )
        stages.append(("training_mix", current))

    return {"curated": current, "stages": stages}


def funnel_report(stages: list[tuple[str, DataFrame]], lang_col: str) -> DataFrame:
    """Per-(stage, language) survivor counts as one unioned DataFrame —
    the funnel report a curation run ships."""
    out = None
    for idx, (name, df) in enumerate(stages):
        part = df.groupBy(lang_col).agg(F.count("*").alias("n_docs")).select(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(lang_col).alias("lang"),
            "n_docs",
        )
        out = part if out is None else out.unionByName(part)
    return out

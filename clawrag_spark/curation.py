"""The end-to-end training-corpus curation pipeline as a library API.

Composes the curation operators (operators/webtext.py, operators/
dataset.py) into the standard funnel a web-scale training-data run
ships: quality gate → near-dedup → benchmark decontamination →
stratified language mix, with a per-(stage, language) survivor report.

Each stage is persisted and MATERIALIZED exactly once: the stage's
per-language survivor counts are collected as the materializing job
(warming the cache for the next stage), and the previous stage's cache
is released as soon as its successor is warm — so a funnel run pays
one pass per stage, never recomputes a stage for the report, and does
not accumulate cached partitions across calls.  The whole funnel is
deterministic: same input → same output rows on any engine (the driver
query `curation_funnel` pins it against a composed DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import dataset as DS
from .operators import webtext as WT


def _lang_counts(df: DataFrame, lang_col: str) -> list[tuple[str, int]]:
    """Per-language row counts, collected.  Running this right after a
    ``persist()`` doubles as the cache-warming job: the count scans
    every partition, so downstream stages read warm cache."""
    return [
        (r[0], r[1])
        for r in df.groupBy(lang_col).agg(F.count("*").alias("n")).collect()
    ]


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

    Returns ``{"curated": DataFrame, "stages": [(name, DataFrame)],
    "report_rows": [(stage_idx, stage, lang, n_docs)]}`` — the report
    rows are collected as each stage materializes, so
    :func:`funnel_report` costs zero extra jobs.  Only the FINAL stage
    stays persisted (it is the returned ``curated`` frame);
    intermediate caches are released once their successor is warm, so
    repeated funnel calls don't accumulate cached partitions.

    - quality: length >= min_chars and Gopher top-bigram char fraction
      <= max_top_bigram_frac (both inline expressions, scan-side; the
      helper score column does NOT leak into the output schema),
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
    report_rows: list[tuple[int, str, str, int]] = [
        (0, "input", lang, n) for lang, n in _lang_counts(docs, lang_col)
    ]
    prev_cached: DataFrame | None = None

    def advance(name: str, frame: DataFrame) -> DataFrame:
        """Persist + materialize a stage (collecting its report row as
        the warming job), then release the previous stage's cache."""
        nonlocal prev_cached
        cached = frame.persist()
        idx = len(stages)
        report_rows.extend(
            (idx, name, lang, n) for lang, n in _lang_counts(cached, lang_col)
        )
        stages.append((name, cached))
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = cached
        return cached

    current = advance(
        "quality",
        docs.filter(
            (length_expr >= min_chars)
            & (WT.top_ngram_char_frac(F.col(text_col)) <= max_top_bigram_frac)
        ),
    )

    if pair_fn is not None:
        cc = DS.connected_components(pair_fn(current), "doc_a", "doc_b")
        drop_ids = cc.filter(F.col("n") != F.col("cluster")).select(
            F.col("n").alias(id_col)
        )
        current = advance("near_dedup", current.join(drop_ids, id_col, "left_anti"))

    if benchmark is not None:
        flagged = WT.decontaminate(
            current, benchmark, id_col, text_col, n=decontaminate_n
        ).select(id_col)
        current = advance(
            "decontaminated", current.join(flagged, id_col, "left_anti")
        )

    if mix_rates is not None:
        current = advance(
            "training_mix",
            WT.stratified_sample(
                current, lang_col, mix_rates, id_col,
                salt=mix_salt, default_rate=mix_default_rate,
            ),
        )

    return {"curated": current, "stages": stages, "report_rows": report_rows}


def funnel_report(res, lang_col: str) -> DataFrame:
    """Per-(stage, language) survivor counts as one DataFrame — the
    funnel report a curation run ships.

    Pass the :func:`curate_corpus` result dict: the report is built
    from the counts already collected while the stages materialized —
    ZERO extra Spark jobs.  A plain ``[(name, df)]`` stage list is also
    accepted (legacy path: one groupBy job per stage).
    """
    if isinstance(res, dict):
        spark = res["curated"].sparkSession
        return spark.createDataFrame(
            res["report_rows"],
            schema="stage_idx long, stage string, lang string, n_docs long",
        ).select("stage_idx", "stage", F.col("lang"), "n_docs")
    out = None
    for idx, (name, df) in enumerate(res):
        part = df.groupBy(lang_col).agg(F.count("*").alias("n_docs")).select(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(lang_col).alias("lang"),
            "n_docs",
        )
        out = part if out is None else out.unionByName(part)
    return out


def label_drop_reasons(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    *,
    min_chars: int = 100,
    max_top_bigram_frac: float = 0.12,
    pair_fn=None,
    mix_rates: dict[str, float] | None = None,
    mix_default_rate: float = 0.0,
    mix_salt: str = "mix",
    chars_col: str | None = None,
) -> DataFrame:
    """Per-document funnel provenance: WHICH stage dropped each doc —
    the debugging view :func:`curate_corpus` (which returns survivor
    counts) doesn't give.  "Why did my document disappear?" is the
    first question every curation-run postmortem asks; this answers it
    in one labeled pass with the exact same gate expressions, so
    label==''  ⇔  the doc survives ``curate_corpus`` with the same
    arguments.

    Returns (id, lang, drop_stage, kept): ``drop_stage`` is the FIRST
    stage that rejects the doc ('quality', 'near_dedup',
    'training_mix') or '' when kept.  Stages are evaluated on the same
    survivor populations as the funnel (near-dup clusters on quality
    survivors only), so the labels compose: counting '' per lang
    reproduces the funnel's final-stage report row.
    """
    from .operators.webtext import stratified_keep_expr

    length_expr = (
        F.length(F.col(text_col)) if chars_col is None else F.col(chars_col)
    )
    qual_flag = (length_expr >= min_chars) & (
        WT.top_ngram_char_frac(F.col(text_col)) <= max_top_bigram_frac
    )
    labeled = docs.select(
        F.col(id_col), F.col(lang_col), qual_flag.alias("__qual")
    )
    if pair_fn is not None:
        qual = docs.filter(qual_flag)
        cc = DS.connected_components(pair_fn(qual), "doc_a", "doc_b")
        drops = cc.filter(F.col("n") != F.col("cluster")).select(
            F.col("n").alias(id_col), F.lit(True).alias("__dup")
        )
        labeled = labeled.join(drops, id_col, "left")
    else:
        labeled = labeled.withColumn("__dup", F.lit(None).cast("boolean"))
    mix_keep = (
        stratified_keep_expr(
            lang_col, mix_rates, id_col, mix_salt, mix_default_rate
        )
        if mix_rates is not None
        else F.lit(True)
    )
    stage = (
        F.when(~F.col("__qual"), "quality")
        .when(F.coalesce(F.col("__dup"), F.lit(False)), "near_dedup")
        .when(~mix_keep, "training_mix")
        .otherwise("")
    )
    return labeled.select(
        F.col(id_col),
        F.col(lang_col),
        stage.alias("drop_stage"),
        (stage == "").alias("kept"),
    )

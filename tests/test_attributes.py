"""Dolma-style attribute sidecars: round-trip, manifest, co-bucketing,
and filter equivalence with a direct predicate."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from clawrag_spark.attributes import (
    filter_by_attributes,
    load_attributes,
    write_attributes,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, "word " * (i % 30 + 1), ["en", "de", "fr"][i % 3]) for i in range(90)],
        "doc_id long, text string, lang string",
    )


@pytest.fixture(scope="module")
def sidecars(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("attrs"))
    manifest = write_attributes(
        docs,
        out,
        {
            "shape": {
                "n_tokens": F.size(F.split(F.trim("text"), " ")).cast("long"),
                "n_chars": F.length("text").cast("long"),
            },
            "langid": {"lang": F.col("lang")},
        },
    )
    return out, manifest


class TestAttributeSidecars:
    def test_manifest_and_layout(self, sidecars):
        out, manifest = sidecars
        assert manifest == {"shape": ["n_chars", "n_tokens"], "langid": ["lang"]}
        with open(os.path.join(out, "attributes", "_attribute_manifest.json")) as fh:
            disk = json.load(fh)
        assert disk["id_col"] == "doc_id"
        assert set(disk["taggers"]) == {"shape", "langid"}
        for t in ("shape", "langid"):
            assert os.path.isdir(os.path.join(out, "attributes", t))

    def test_round_trip_values_and_bucket(self, spark, docs, sidecars):
        out, _ = sidecars
        attrs = load_attributes(spark, out)
        rows = {r["doc_id"]: r for r in attrs.collect()}
        assert len(rows) == 90
        for r in docs.collect():
            a = rows[r["doc_id"]]
            assert a["n_tokens"] == r["doc_id"] % 30 + 1
            assert a["n_chars"] == len(r["text"])
            assert a["lang"] == r["lang"]
        # the sidecar carries the pipeline sinks' bucket convention
        bucket = attrs.select(
            (
                F.col("id_bucket")
                == F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int")
            ).alias("ok")
        )
        assert bucket.filter(~F.col("ok")).count() == 0

    def test_partial_load_and_unknown_tagger(self, spark, sidecars):
        out, _ = sidecars
        only = load_attributes(spark, out, ["shape"])
        assert sorted(only.columns) == ["doc_id", "id_bucket", "n_chars", "n_tokens"]
        with pytest.raises(KeyError):
            load_attributes(spark, out, ["nope"])

    def test_filter_matches_direct_predicate(self, spark, docs, sidecars):
        out, _ = sidecars
        attrs = load_attributes(spark, out)
        got = sorted(
            r["doc_id"]
            for r in filter_by_attributes(
                docs, attrs, (F.col("n_tokens") >= 10) & (F.col("lang") == "en")
            ).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in docs.filter(
                (F.size(F.split(F.trim("text"), " ")) >= 10)
                & (F.col("lang") == "en")
            ).collect()
        )
        assert got == want and len(got) > 0

    def test_filter_is_semi_join_without_text(self, spark, docs, sidecars):
        """The text column must not cross the join: the plan is a
        LeftSemi with only the id on the probe side."""
        out, _ = sidecars
        attrs = load_attributes(spark, out)
        kept = filter_by_attributes(docs, attrs, F.col("n_tokens") >= 10)
        plan = kept._sc._jvm.PythonSQLUtils.explainString(
            kept._jdf.queryExecution(), "formatted"
        )
        assert "LeftSemi" in plan

    def test_incremental_update_tags_only_new_docs(self, spark, tmp_path):
        from clawrag_spark.attributes import update_attributes

        out = str(tmp_path / "inc")
        taggers = {
            "shape": {"n_chars": F.length("text").cast("long")},
        }
        first = spark.createDataFrame(
            [(i, "x" * (i + 1)) for i in range(50)], "doc_id long, text string"
        )
        write_attributes(first, out, taggers)
        grown = spark.createDataFrame(
            [(i, "x" * (i + 1)) for i in range(70)], "doc_id long, text string"
        )
        res = update_attributes(grown, out, taggers)
        assert res["n_new"] == 20 and res["per_tagger"] == {"shape": 20}
        attrs = load_attributes(spark, out)
        rows = {r["doc_id"]: r["n_chars"] for r in attrs.collect()}
        assert len(rows) == 70 and rows[65] == 66 and rows[3] == 4
        # idempotent: nothing new on a rerun
        assert update_attributes(grown, out, taggers)["n_new"] == 0
        assert load_attributes(spark, out).count() == 70

    def test_incremental_update_rejects_schema_drift(self, spark, tmp_path):
        from clawrag_spark.attributes import update_attributes

        out = str(tmp_path / "drift")
        write_attributes(
            spark.createDataFrame([(1, "a")], "doc_id long, text string"),
            out,
            {"shape": {"n_chars": F.length("text").cast("long")}},
        )
        with pytest.raises(ValueError):
            update_attributes(
                spark.createDataFrame([(2, "b")], "doc_id long, text string"),
                out,
                {"shape": {"n_tokens": F.lit(1)}},
            )

    def test_incremental_update_recovers_partial_append(self, spark, tmp_path):
        """A crash between per-tagger appends must reconverge on rerun:
        each sidecar anti-joins its OWN committed ids."""
        import os
        import shutil

        from clawrag_spark.attributes import update_attributes

        out = str(tmp_path / "partial")
        taggers = {
            "aa_shape": {"n_chars": F.length("text").cast("long")},
            "zz_lang": {"first": F.substring("text", 1, 1)},
        }
        first = spark.createDataFrame(
            [(i, "x" * (i + 1)) for i in range(20)], "doc_id long, text string"
        )
        write_attributes(first, out, taggers)
        grown = spark.createDataFrame(
            [(i, "x" * (i + 1)) for i in range(30)], "doc_id long, text string"
        )
        # simulate the crash: run a full update, then roll ONE sidecar
        # back to its pre-update state (as if its append never ran)
        snap = str(tmp_path / "snap")
        shutil.copytree(os.path.join(out, "attributes", "zz_lang"), snap)
        update_attributes(grown, out, taggers)
        shutil.rmtree(os.path.join(out, "attributes", "zz_lang"))
        shutil.copytree(snap, os.path.join(out, "attributes", "zz_lang"))
        assert spark.read.parquet(
            os.path.join(out, "attributes", "zz_lang")
        ).count() == 20  # diverged frontier, the failure mode under test
        # rerun completes ONLY the lagging sidecar, no duplicates anywhere
        res = update_attributes(grown, out, taggers)
        assert res["per_tagger"] == {"aa_shape": 0, "zz_lang": 10}
        attrs = load_attributes(spark, out)
        assert attrs.count() == 30
        assert attrs.select("doc_id").distinct().count() == 30

    def test_load_attributes_rejects_empty_and_duplicates(self, spark, sidecars):
        out, _ = sidecars
        with pytest.raises(ValueError):
            load_attributes(spark, out, [])
        with pytest.raises(ValueError):
            load_attributes(spark, out, ["shape", "shape"])

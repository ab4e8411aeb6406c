"""North-rule deployment surface: the job really runs via
``spark-submit --py-files clawrag_spark.zip`` in a fresh JVM with the
package imported FROM THE ZIP (not the repo checkout)."""

import json
import os
import subprocess
import sys

from clawrag_spark.submit import build_pyfiles_zip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """
import json, sys
from pyspark.sql import SparkSession
import clawrag_spark
assert "clawrag_spark.zip" in clawrag_spark.__file__, clawrag_spark.__file__
from clawrag_spark.pipeline import run_pipeline
spark = (SparkSession.builder.appName("submit-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(sys.argv[1])
manifest = run_pipeline(spark, pages, sys.argv[2])
print("SUBMIT_RESULT " + json.dumps(manifest))
spark.stop()
"""


def test_spark_submit_pyfiles_zip(tmp_path):
    from clawrag_spark.corpus import write_pages_parquet

    zip_path = str(tmp_path / "clawrag_spark.zip")
    build_pyfiles_zip(zip_path)
    pages = write_pages_parquet(str(tmp_path / "pages.parquet"), 60)
    job = tmp_path / "job.py"
    job.write_text(_JOB)
    out = str(tmp_path / "out")

    env = dict(os.environ)
    # the zip must be the ONLY import source for the package
    env["PYTHONPATH"] = ""
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.sql.adaptive.enabled=true",
            str(job), pages, out,
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    result = None
    for line in proc.stdout.splitlines():
        if line.startswith("SUBMIT_RESULT "):
            result = json.loads(line[len("SUBMIT_RESULT "):])
    assert result is not None, f"no result line\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    assert result["n_processed"] == 60
    assert result["n_chunks"] > 0
    assert os.path.isdir(os.path.join(out, "chunks"))


def test_submit_cli_main(tmp_path):
    """python -m clawrag_spark.submit end-to-end (local driver mode)."""
    from clawrag_spark.corpus import write_pages_parquet

    pages = write_pages_parquet(str(tmp_path / "pages.parquet"), 40)
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [sys.executable, "-m", "clawrag_spark.submit",
         "--pages", pages, "--out", out, "--run-id", "cli1"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no manifest printed\n{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}"
    manifest = json.loads(lines[-1])
    assert manifest["run_id"] == "cli1" and manifest["n_processed"] == 40

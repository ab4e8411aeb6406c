#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Two parts:
1. headline queries from ``__spark_entry__`` at ``$SPARK_GRAFT_SF_DIR``
   (default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``,
2. the north-rule extraction pipeline over the deterministic synthetic
   corpus — including the two-parallelism scaling evidence
   (``local[8]`` vs ``local[32]`` as the sandbox stand-in for N vs 4N
   executors).  Each parallelism level runs in its own JVM (subprocess)
   so executor-thread count is honestly varied.

Extra keys (documented, driver ignores them): ``extraction`` with
docs/sec at both levels and the scaling efficiency, written to
``BENCH/BASELINE.md`` as well.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_PAGES (corpus
rows, default 8000), BENCH_SKIP_SCALING=1 to skip part 2.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "40000"))
CONTENT_SCALE = int(os.environ.get("BENCH_CONTENT_SCALE", "8"))
N_FILES = int(os.environ.get("BENCH_CORPUS_FILES", "64"))

_WORKER = """
import json, os, sys, tempfile, shutil, time
sys.path.insert(0, {repo!r})
os.environ['SPARK_GRAFT_CPUS'] = str({cores})
from clawrag_spark.session import get_spark
from clawrag_spark.pipeline import run_pipeline
spark = get_spark('bench-extract-{cores}', master='local[{cores}]',
                  shuffle_partitions={cores})
spark.sparkContext.setLogLevel('ERROR')
pages = spark.read.parquet({pages_path!r})
out = tempfile.mkdtemp(prefix='bench_out_')
# warm up JIT/codegen/Arrow paths so steady-state throughput is measured
spark.range(1000).selectExpr('sum(id)').collect()
pages.limit(64).count()
t0 = time.monotonic()
m = run_pipeline(spark, pages, out, resume=False, num_partitions={cores})
wall = time.monotonic() - t0
print('BENCH_RESULT ' + json.dumps({{'cores': {cores}, 'wall_sec': wall,
      'docs_per_sec': m['n_processed'] / wall, 'n_docs': m['n_processed'],
      'n_chunks': m['n_chunks_total']}}))
shutil.rmtree(out, ignore_errors=True)
spark.stop()
"""


def run_extraction_at(cores: int, pages_path: str) -> dict:
    """Run the pipeline in a fresh JVM at the given core count."""
    code = _WORKER.format(repo=REPO, cores=cores, pages_path=pages_path)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800,
        cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    raise RuntimeError(
        f"extraction bench at {cores} cores failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    out = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()  # force full execution
        out[name] = round(time.monotonic() - t0, 4)
        assert n >= 0
    return out


def main() -> None:
    sys.path.insert(0, REPO)
    results: dict = {}

    # ---- part 1: headline queries at SF_DIR ----
    from clawrag_spark.session import get_spark

    spark = get_spark("bench-queries", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    queries = bench_queries(spark, SF_DIR)
    total = round(time.monotonic() - t0, 3)
    spark.stop()

    # ---- part 2: extraction throughput + scaling efficiency ----
    extraction = None
    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        from clawrag_spark.corpus import write_pages_parquet

        pages_path = os.path.join(
            REPO, "data", f"bench_pages_{N_PAGES}_s{CONTENT_SCALE}"
        )
        os.makedirs(os.path.dirname(pages_path), exist_ok=True)
        if not os.path.exists(pages_path):
            write_pages_parquet(
                pages_path, N_PAGES, n_files=N_FILES, content_scale=CONTENT_SCALE
            )

        lo = run_extraction_at(8, pages_path)
        hi = run_extraction_at(32, pages_path)
        efficiency = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (32 / 8)
        extraction = {
            "n_pages": N_PAGES,
            "content_scale": CONTENT_SCALE,
            "docs_per_sec_local8": round(lo["docs_per_sec"], 2),
            "docs_per_sec_local32": round(hi["docs_per_sec"], 2),
            "wall_sec_local8": round(lo["wall_sec"], 3),
            "wall_sec_local32": round(hi["wall_sec"], 3),
            "scaling_efficiency": round(efficiency, 3),
            "n_chunks": hi["n_chunks"],
        }
        _write_bench_md(extraction, queries, total)

    line = {
        "metric": "headline query wall time + extraction docs/sec scaling",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
    }
    if extraction:
        line["extraction"] = extraction
    print(json.dumps(line))


def _write_bench_md(extraction: dict, queries: dict, total: float) -> None:
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    eff = extraction["scaling_efficiency"]
    with open(path, "w") as fh:
        fh.write(f"""# BENCH — measured numbers

## Extraction throughput & scaling (north rule)

Same job, same {extraction['n_pages']}-page seeded corpus, two
parallelism levels in separate JVMs (sandbox stand-in for N vs 4N
executors):

| config | docs/sec | wall (s) |
|---|---|---|
| local[8]  | {extraction['docs_per_sec_local8']} | {extraction['wall_sec_local8']} |
| local[32] | {extraction['docs_per_sec_local32']} | {extraction['wall_sec_local32']} |

**Scaling efficiency = (docs/sec@32 / docs/sec@8) / (32/8) = {eff}**
(target ≥ 0.8 per BASELINE.json).

Chunks produced: {extraction['n_chunks']}.

## Headline queries (sf bench dir, total {total}s)

| query | sec |
|---|---|
""")
        for name, sec in sorted(queries.items()):
            fh.write(f"| {name} | {sec} |\n")


if __name__ == "__main__":
    main()

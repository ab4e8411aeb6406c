"""spark-submit packaging + job entry point.

Production deployment (north rule): the job ships as a zip via
``spark-submit --py-files clawrag_spark.zip job.py`` on a multi-executor
cluster.  ``build_pyfiles_zip`` produces that artifact; ``main`` is the
job script (argparse over input/output/config).

Local example:
    python -m clawrag_spark.submit --pages /data/pages --out /data/out

Cluster example:
    python -m clawrag_spark.submit --make-zip dist/clawrag_spark.zip
    spark-submit --master yarn --deploy-mode cluster \\
        --py-files dist/clawrag_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        job_driver.py --pages s3://bucket/pages --out s3://bucket/out
"""

from __future__ import annotations

import argparse
import os
import zipfile


def build_pyfiles_zip(out_path: str) -> str:
    """Zip the package for ``spark-submit --py-files``."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="clawrag_spark extraction job")
    parser.add_argument("--make-zip", help="write --py-files zip and exit")
    parser.add_argument("--pages", help="input pages parquet/Iceberg path")
    parser.add_argument("--out", help="output warehouse dir")
    parser.add_argument("--chunk-size", type=int, default=1000)
    parser.add_argument("--chunk-overlap", type=int, default=200)
    parser.add_argument("--embed-dim", type=int, default=64)
    parser.add_argument("--policy", default="VERSION", choices=["VERSION", "SKIP"])
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--run-id", default=None)
    args = parser.parse_args(argv)

    if args.make_zip:
        path = build_pyfiles_zip(args.make_zip)
        print(f"wrote {path}")
        return

    if not args.pages or not args.out:
        parser.error("--pages and --out are required (or use --make-zip)")

    from .pipeline import run_pipeline
    from .session import get_spark

    spark = get_spark("clawrag-extract")
    pages = spark.read.parquet(args.pages)
    manifest = run_pipeline(
        spark,
        pages,
        args.out,
        chunk_size=args.chunk_size,
        chunk_overlap=args.chunk_overlap,
        embed_dim=args.embed_dim,
        policy=args.policy,
        resume=not args.no_resume,
        run_id=args.run_id,
    )
    import json

    print(json.dumps(manifest))


if __name__ == "__main__":
    main()

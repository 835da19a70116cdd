"""spark-submit entry point: build (or resume) the inverted index on a
cluster, then optionally serve a smoke query — the deployment shape the
north rule names (multi-executor, ``--py-files``).

Usage (cluster):

    spark-submit \
        --master yarn --deploy-mode cluster \
        --num-executors 1000 --executor-cores 8 --executor-memory 32g \
        --py-files apache___solr_spark.zip \
        scripts/submit_index_build.py \
        --pages warehouse.crawl.pages --out hdfs:///indexes/crawl \
        --query "web data"

Build the zip with
``python -c "from apache___solr_spark.session import build_pyfiles_zip;
print(build_pyfiles_zip('apache___solr_spark.zip'))"``.

The script takes its master/executors from spark-submit (no local[]
hardcoding); session-level knobs (AQE, Arrow, shuffle partitions) come
from --conf or cluster defaults.  It prints ONE JSON line of build
metrics (docs, wall seconds, docs/sec, per-stage manifest summary) so a
scheduler can scrape throughput, and exits nonzero on failure.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True,
                   help="pages source: parquet path or Iceberg table name")
    p.add_argument("--format", default="auto",
                   choices=["auto", "parquet", "iceberg"])
    p.add_argument("--out", required=True, help="index output directory")
    p.add_argument("--analyzer", default="standard",
                   choices=["standard", "simple", "standard_porter"])
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing stage checkpoints")
    p.add_argument("--query", default=None,
                   help="optional smoke query to run against the built index")
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from apache___solr_spark.config import DEFAULT_CONFIG, IndexConfig
    from apache___solr_spark.index.builder import build_index
    from apache___solr_spark.sources.loaders import read_pages

    # master/deploy-mode/executors come from spark-submit; only app-level
    # settings here
    spark = SparkSession.builder.appName("index-build").getOrCreate()

    cfg = (
        DEFAULT_CONFIG
        if args.analyzer == DEFAULT_CONFIG.analyzer
        else IndexConfig(analyzer=args.analyzer)
    )
    pages = read_pages(spark, args.pages, fmt=args.format)
    t0 = time.time()
    paths = build_index(
        spark, pages, args.out, cfg=cfg, resume=not args.no_resume
    )
    wall = time.time() - t0
    with open(paths.stats) as f:
        stats = json.load(f)
    metrics = {
        "event": "index_build_complete",
        "out": args.out,
        "n_docs": stats["N"],
        "avgdl": stats["avgdl"],
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(stats["N"] / wall, 1) if wall > 0 else None,
    }
    if args.query:
        from apache___solr_spark.query.engine import SearchEngine

        hits = SearchEngine(spark, args.out, cfg=cfg).search(
            args.query, k=args.k
        )
        metrics["query"] = args.query
        metrics["hits"] = [
            {"rank": r["rank"], "doc_id": r["doc_id"], "score": float(r["score"])}
            for r in hits.collect()
        ]
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())

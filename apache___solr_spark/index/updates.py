"""Incremental index updates: add / delete / commit.

Reference surface (the /update path, solr/core/src/java/org/apache/solr/
update/DirectUpdateHandler2.java:407-513):
- deleteById -> Lucene tombstones (liveDocs): deleted docs stay in the
  postings but are filtered from every search until a merge drops them.
- add -> new documents buffer into a NEW segment; existing segments are
  immutable (SolrIndexConfig ramBuffer->flush semantics).
- commit -> makes the update durable and visible.

Spark-first mapping:
- deletes: an append-only parquet of tombstone doc_ids under
  <index>/deletes/; SearchEngine anti-joins the final score aggregation
  against it (the liveDocs mask), so every query path (terms, phrases,
  expansions, rerank) honors deletions without touching postings.
- add_docs: analyzes the new pages with the index's own config, assigns
  doc_ids monotonically after the current N (so salt ranges keep extending
  and never collide), encodes segment rows with the SAME map-side encoder
  as the full build, and APPENDS to the bucket-partitioned postings plus
  the docs table and per-term dictionary rows.  The term dictionary may
  then hold several rows per term; SearchEngine._term_meta sums them.
- stats: N and total_len are updated; avgdl stays FROZEN at its value from
  the initial build, because the stored per-block max_impact values were
  computed against it — refreshing avgdl would make scores exceed their
  pruning upper bounds.  A full rebuild (the merge/optimize analog)
  re-baselines avgdl exactly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache___solr_spark.config import DEFAULT_CONFIG, IndexConfig
from apache___solr_spark.index.builder import (
    SEGMENT_SCHEMA,
    IndexPaths,
    _analyze_raw,
    _segment_encode,
    _norm_byte_udf,
)


def _deletes_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes")


def load_deletes(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Tombstoned doc_ids, or None when nothing was ever deleted."""
    p = _deletes_path(index_dir)
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p).select("doc_id").distinct()


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    doc_ids: list[int] | None = None,
    urls: list[str] | None = None,
) -> int:
    """deleteById capability: tombstone documents by doc_id or url.
    Returns the number of tombstones written."""
    paths = IndexPaths(index_dir)
    ids: list[int] = [int(d) for d in (doc_ids or [])]
    if urls:
        rows = (
            spark.read.parquet(paths.docs)
            .filter(F.col("url").isin(list(urls)))
            .select("doc_id")
            .collect()
        )
        ids.extend(int(r["doc_id"]) for r in rows)
    if not ids:
        return 0
    spark.createDataFrame([(i,) for i in sorted(set(ids))], "doc_id long").write.mode(
        "append"
    ).parquet(_deletes_path(index_dir))
    return len(set(ids))


def add_docs(
    spark: SparkSession,
    index_dir: str,
    pages: DataFrame,
    cfg: IndexConfig = DEFAULT_CONFIG,
) -> int:
    """Append new documents as a fresh segment.  Returns docs added.

    New doc_ids are assigned monotonically after the current N in url
    order (deterministic given the batch).  At 100 TB scale each add batch
    is one narrow job over the new docs only — existing postings are never
    rewritten (segment immutability, exactly the reference's model)."""
    paths = IndexPaths(index_dir)
    with open(paths.stats) as f:
        stats = json.load(f)
    base_n = int(stats["N"])

    analyzed_new = _analyze_raw(pages, cfg)
    w = F.row_number().over(Window.orderBy("url"))
    analyzed = analyzed_new.withColumn(
        "doc_id", (w + F.lit(base_n - 1)).cast("long")
    ).select("url", "doc_id", "terms", "tfs", "positions", "doclen")

    # docs table rows
    docs = analyzed.select("url", "doc_id", "doclen").withColumn(
        "norm_byte", _norm_byte_udf(F.col("doclen"))
    )
    docs.write.mode("append").parquet(paths.docs)

    # new segment rows (same map-side encoder as the full build), appended
    # into the bucket-partitioned postings layout
    segments = analyzed.select(
        "doc_id", "doclen", "terms", "tfs", "positions"
    ).mapInArrow(_segment_encode(cfg, stats["avgdl"]), schema=SEGMENT_SCHEMA)
    bucket_expr = F.pmod(F.xxhash64("term"), F.lit(cfg.n_buckets)).cast("int")
    segments.withColumn("bucket", bucket_expr).write.mode("append").partitionBy(
        "bucket"
    ).parquet(paths.postings)

    # per-term dictionary rows for the new segment (summed at read time)
    seg = spark.read.parquet(paths.postings)
    # cheaper: aggregate only the new doc range
    new_dict = (
        seg.filter(F.col("first_doc") >= base_n)
        .groupBy("term")
        .agg(
            F.sum("n_docs").alias("df"),
            F.sum("sum_tf").alias("cf"),
            F.max("max_impact").alias("max_impact"),
            F.first("bucket").alias("bucket"),
        )
    )
    new_dict.write.mode("append").parquet(paths.dictionary)

    agg = analyzed.agg(
        F.count("*").alias("n"), F.sum("doclen").alias("total")
    ).collect()[0]
    n_new, len_new = int(agg["n"]), int(agg["total"] or 0)
    stats["N"] = base_n + n_new
    stats["total_len"] = int(stats["total_len"]) + len_new
    # avgdl intentionally NOT refreshed (see module docstring) — record both
    stats["avgdl_current"] = (
        stats["total_len"] / stats["N"] if stats["N"] else 0.0
    )
    tmp = paths.stats + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, paths.stats)
    return n_new

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
  pruning upper bounds.  optimize() (the forceMerge/expungeDeletes analog)
  physically drops tombstones, folds segments, and re-baselines avgdl with
  freshly-computed impacts.
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


def optimize(
    spark: SparkSession,
    index_dir: str,
    cfg: IndexConfig = DEFAULT_CONFIG,
) -> dict:
    """forceMerge/expungeDeletes equivalent: physically drop tombstoned docs
    from the postings, fold per-segment dictionary rows into one row per
    term, and re-baseline exact stats (N, avgdl) — after which impacts are
    recomputed against the fresh avgdl, so pruning bounds are tight again.

    One distributed pass over the postings (decode -> filter -> re-encode
    inside Arrow batches, grouped re-shuffle only to fold (term, salt)
    fragments), plus narrow rewrites of docs/dictionary.  Returns the new
    stats dict.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    from apache___solr_spark.index.builder import (
        _Scorer,
        _encode_group_row,
        _undelta_positions,
    )
    from apache___solr_spark.index.codec import decode_vbyte, delta_decode

    paths = IndexPaths(index_dir)
    deletes = load_deletes(spark, index_dir)
    del_ids = (
        {int(r["doc_id"]) for r in deletes.collect()} if deletes is not None else set()
    )

    # fresh exact stats over the LIVE docs
    docs = spark.read.parquet(paths.docs)
    live_docs = (
        docs.join(deletes, "doc_id", "left_anti") if deletes is not None else docs
    )
    agg = live_docs.agg(
        F.count("*").alias("n"), F.sum("doclen").alias("total")
    ).collect()[0]
    n_docs, total = int(agg["n"]), int(agg["total"] or 0)
    avgdl = (total / n_docs) if n_docs else 0.0
    b_dels = spark.sparkContext.broadcast(del_ids)
    scorer = _Scorer(cfg, avgdl)
    salt_range = cfg.salt_range

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dels = b_dels.value
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                base = int(row["salt"]) * salt_range
                n = int(row["n_docs"])
                ids = delta_decode(
                    decode_vbyte(bytes(row["doc_gaps"]), n).astype(np.int64), base
                )
                tfs = decode_vbyte(bytes(row["tfs"]), n).astype(np.int64)
                norms = np.frombuffer(bytes(row["norms"]), dtype=np.uint8)
                pos_bin = bytes(row["positions"])
                keep = (
                    ~np.isin(ids, list(dels))
                    if dels
                    else np.ones(n, dtype=bool)
                )
                if not keep.any():
                    continue
                g_pos = None
                if pos_bin:
                    pos_abs = _undelta_positions(
                        decode_vbyte(pos_bin, int(row["sum_tf"])).astype(np.int64),
                        tfs,
                    )
                    if keep.all():
                        g_pos = pos_abs
                    else:
                        starts = np.cumsum(tfs) - tfs
                        sel = np.flatnonzero(keep)
                        g_pos = np.concatenate(
                            [pos_abs[starts[i] : starts[i] + tfs[i]] for i in sel]
                        )
                out = _encode_group_row(
                    cfg,
                    scorer,
                    row["term"],
                    int(row["salt"]),
                    ids[keep],
                    tfs[keep],
                    norms[keep],
                    g_pos,
                )
                out_rows.append(out)
            if out_rows:
                yield pd.DataFrame(out_rows)

    postings = spark.read.parquet(paths.postings)
    # fold same-(term, salt) fragments from appended segments: group-shuffle
    # then rewrite each group as ONE row (merge_region semantics are covered
    # by re-encoding from the decoded union)
    from apache___solr_spark.index.builder import SEGMENT_SCHEMA, _merge_segments

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bucket_expr = F.pmod(F.xxhash64("term"), F.lit(cfg.n_buckets)).cast("int")
    merged = (
        postings.drop("bucket")
        .repartition(n_parts, bucket_expr, F.col("salt"))
        .sortWithinPartitions("term", "salt", "first_doc")
        .mapInPandas(_merge_segments(cfg, avgdl), schema=SEGMENT_SCHEMA)
        .mapInPandas(rewrite, schema=SEGMENT_SCHEMA)
        .withColumn("bucket", bucket_expr)
    )
    tmp_postings = paths.postings + ".opt"
    merged.write.mode("overwrite").partitionBy("bucket").parquet(tmp_postings)
    import shutil

    shutil.rmtree(paths.postings)
    os.replace(tmp_postings, paths.postings)

    # rebuild the dictionary from the clean postings (one row per term)
    postings2 = spark.read.parquet(paths.postings)
    dictionary = postings2.groupBy("term").agg(
        F.sum("n_docs").alias("df"),
        F.sum("sum_tf").alias("cf"),
        F.max("max_impact").alias("max_impact"),
        F.first("bucket").alias("bucket"),
    )
    tmp_dict = paths.dictionary + ".opt"
    dictionary.write.mode("overwrite").parquet(tmp_dict)
    shutil.rmtree(paths.dictionary)
    os.replace(tmp_dict, paths.dictionary)

    # rewrite docs without tombstones, clear the tombstone dir
    tmp_docs = paths.docs + ".opt"
    live_docs.write.mode("overwrite").parquet(tmp_docs)
    shutil.rmtree(paths.docs)
    os.replace(tmp_docs, paths.docs)
    dp = _deletes_path(index_dir)
    if os.path.isdir(dp):
        shutil.rmtree(dp)

    with open(paths.stats) as f:
        stats = json.load(f)
    stats.update({"N": n_docs, "total_len": total, "avgdl": avgdl})
    stats.pop("avgdl_current", None)
    tmp = paths.stats + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, paths.stats)
    return stats

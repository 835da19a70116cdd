"""Distributed inverted-index build.

Pipeline (reference parity: the /update indexing path,
solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:407-513 +
DocumentBuilder.toDocument:99-123, re-expressed Spark-first):

  pages ──extract_text/analyze (Arrow UDFs)──► analyzed(url, terms[], tfs[], doclen)
        ──global url sort + dense doc_id──►   docs(url, doc_id, doclen, norm_byte)
        ──explode──►                          (term, doc_id, tf, norm_byte)
        ──repartition by (term, doc-range salt) + encode──► postings blocks
        ──block metadata agg──►               dictionary(term, df, cf, max_impact)
        plus scalar stats(N, avgdl).

Key scale decisions:
- doc_id is the global rank of url (deterministic, partitioning-invariant):
  computed with a range repartition + per-partition offsets — two passes,
  no single-partition window.  Mirrors Lucene's stable per-segment docIDs
  while staying reproducible under any input split.
- postings blocks are aligned on fixed doc_id ranges (block_id =
  doc_id // block_range) so multi-term block-max pruning is sound; blocks
  carry max_impact = max over the block of the BM25 tf/(tf+K*dl-norm)
  factor — Lucene's per-block impacts, adapted (Lucene101PostingsFormat
  semantics).
- the encode groupBy key is (term, doc_id // salt_range), NOT bare term:
  head terms (>30% of docs) are encoded by many tasks (north_rule skew
  handling — salted repartition + split posting blocks).  Because
  salt_range is a multiple of block_range, blocks never straddle salts and
  the union over salts is exactly the per-term block list.
- the postings table is written partitioned by pmod(xxhash64(term),
  n_buckets): a query's scan prunes to the buckets of its terms (stands in
  for the term-dictionary seek of a local index).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache___solr_spark.analysis.udfs import extract_text_udf, term_freqs_udf
from apache___solr_spark.config import DEFAULT_CONFIG, IndexConfig
from apache___solr_spark.index import checkpoint as ckpt
from apache___solr_spark.index.codec import delta_encode, encode_vbyte
from apache___solr_spark.index.smallfloat import NORM_TABLE, int_to_byte4_np

POSTINGS_SCHEMA = (
    "term string, block_id long, n_docs int, first_doc long, last_doc long, "
    "doc_gaps binary, tfs binary, norms binary, sum_tf long, max_tf int, "
    "max_impact float"
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def analyzed(self) -> str:
        return os.path.join(self.root, "analyzed")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def dictionary(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")


def _input_digest(pages: DataFrame, source: str | None) -> str:
    # cheap fingerprint: source path + schema; row count comes via manifests
    return f"{source or 'df'}::{','.join(pages.columns)}"


def _analyze_stage(pages: DataFrame) -> DataFrame:
    tf = term_freqs_udf(F.col("_text"))
    return (
        pages.withColumn("_text", extract_text_udf(F.col("html"), F.col("text")))
        .select("url", tf.alias("_tf"))
        .select(
            "url",
            F.col("_tf.terms").alias("terms"),
            F.col("_tf.tfs").alias("tfs"),
            F.col("_tf.doclen").alias("doclen"),
        )
    )


def _assign_doc_ids(spark: SparkSession, analyzed: DataFrame, n_parts: int) -> DataFrame:
    """doc_id = global rank of url: range-partition, count, offset, number.

    Two narrow passes; no global window.  Deterministic for a given input
    set regardless of how the input was partitioned (the sort is total).
    """
    ranged = analyzed.repartitionByRange(n_parts, "url").sortWithinPartitions("url")
    ranged = ranged.persist()
    counts = (
        ranged.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r["pid"]] = acc
        acc += r["count"]
    b_offsets = spark.sparkContext.broadcast(offsets)

    schema = (
        "url string, terms array<string>, tfs array<int>, doclen int, doc_id long"
    )

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = b_offsets.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["doc_id"] = np.arange(base + seen, base + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    out = ranged.mapInPandas(number, schema=schema)
    return out, ranged


def _encode_group(cfg_block_range: int, k1: float, b: float, avgdl: float):
    """Returns the applyInPandas function encoding one (term, salt) group."""
    norm_table_f32 = NORM_TABLE.astype(np.float32)
    k1f = np.float32(k1)
    one_minus_b = np.float32(1.0 - b)
    bf = np.float32(b)
    avgdlf = np.float32(avgdl)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        norms = pdf["norm_byte"].to_numpy()[order].astype(np.uint8)

        block_ids = doc_ids // cfg_block_range
        # contiguous runs of equal block_id
        boundaries = np.flatnonzero(np.diff(block_ids)) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [doc_ids.size]))

        # BM25 impact per posting: tf / (tf + k1*((1-b) + b*dl/avgdl)),
        # float32 throughout (matches the query-time scorer bit-for-bit).
        dl = norm_table_f32[norms]
        tf_f = tfs.astype(np.float32)
        cache = k1f * (one_minus_b + bf * dl / avgdlf)
        impact = tf_f / (tf_f + cache)

        rows = []
        for s, e in zip(starts, ends):
            bid = int(block_ids[s])
            base = bid * cfg_block_range
            ids = doc_ids[s:e]
            rows.append(
                {
                    "term": term,
                    "block_id": bid,
                    "n_docs": int(e - s),
                    "first_doc": int(ids[0]),
                    "last_doc": int(ids[-1]),
                    "doc_gaps": encode_vbyte(delta_encode(ids, base)),
                    "tfs": encode_vbyte(tfs[s:e]),
                    "norms": norms[s:e].tobytes(),
                    "sum_tf": int(tfs[s:e].sum()),
                    "max_tf": int(tfs[s:e].max()),
                    "max_impact": np.float32(impact[s:e].max()),
                }
            )
        return pd.DataFrame(rows)

    return encode


def build_index(
    spark: SparkSession,
    pages: DataFrame | str,
    out_dir: str,
    cfg: IndexConfig = DEFAULT_CONFIG,
    resume: bool = True,
    n_parts: int | None = None,
) -> IndexPaths:
    """Build (or resume) the full index under ``out_dir``."""
    source = pages if isinstance(pages, str) else None
    if isinstance(pages, str):
        pages = spark.read.parquet(pages)
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    cfg_digest = cfg.digest()
    in_digest = _input_digest(pages, source)

    # ---- stage 1: analyze + doc ids -> docs + analyzed ------------------
    t0 = time.time()
    if not (resume and ckpt.stage_complete(paths.analyzed, cfg_digest, in_digest)):
        analyzed, ranged = _assign_doc_ids(spark, _analyze_stage(pages), n_parts)
        analyzed.write.mode("overwrite").parquet(paths.analyzed)
        ranged.unpersist()
        adf = spark.read.parquet(paths.analyzed)
        lineage = ckpt.partition_lineage(adf)
        ckpt.publish_manifest(
            paths.analyzed,
            stage="analyzed",
            config_digest=cfg_digest,
            input_digest=in_digest,
            rows=sum(p["rows"] for p in lineage),
            partitions=lineage,
            started_at=t0,
        )
    analyzed = spark.read.parquet(paths.analyzed)

    t0 = time.time()
    if not (resume and ckpt.stage_complete(paths.docs, cfg_digest, in_digest)):
        docs = analyzed.select("url", "doc_id", "doclen").withColumn(
            "norm_byte", _norm_byte_udf(F.col("doclen"))
        )
        docs.write.mode("overwrite").parquet(paths.docs)
        ddf = spark.read.parquet(paths.docs)
        lineage = ckpt.partition_lineage(ddf)
        ckpt.publish_manifest(
            paths.docs,
            stage="docs",
            config_digest=cfg_digest,
            input_digest=in_digest,
            rows=sum(p["rows"] for p in lineage),
            partitions=lineage,
            started_at=t0,
        )
    docs = spark.read.parquet(paths.docs)

    # ---- stage 2: global stats (exact — ExactStatsCache semantics, ------
    # solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java)
    if not (resume and os.path.exists(paths.stats)):
        agg = docs.agg(
            F.count("*").alias("n"), F.sum("doclen").alias("total_len")
        ).collect()[0]
        n_docs, total = agg["n"], int(agg["total_len"] or 0)
        stats = {
            "N": n_docs,
            "total_len": total,
            "avgdl": (total / n_docs) if n_docs else 0.0,
            "config_digest": cfg_digest,
        }
        tmp = paths.stats + ".tmp"
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, paths.stats)
    with open(paths.stats) as f:
        stats = json.load(f)

    # ---- stage 3: postings blocks ---------------------------------------
    t0 = time.time()
    if not (resume and ckpt.stage_complete(paths.postings, cfg_digest, in_digest)):
        exploded = (
            analyzed.withColumn("norm_byte", _norm_byte_udf(F.col("doclen")))
            .select(
                "doc_id",
                "norm_byte",
                F.explode(F.arrays_zip("terms", "tfs")).alias("z"),
            )
            .select(
                F.col("z.terms").alias("term"),
                "doc_id",
                F.col("z.tfs").alias("tf"),
                "norm_byte",
            )
        )
        salted = exploded.withColumn(
            "salt", (F.col("doc_id") / F.lit(cfg.salt_range)).cast("long")
        )
        encode = _encode_group(cfg.block_range, cfg.bm25_k1, cfg.bm25_b, stats["avgdl"])
        blocks = salted.groupBy("term", "salt").applyInPandas(
            encode, schema=POSTINGS_SCHEMA
        )
        blocks = blocks.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.n_buckets)).cast("int")
        )
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(paths.postings)
        pdf_blocks = spark.read.parquet(paths.postings)
        lineage = ckpt.partition_lineage(pdf_blocks)
        ckpt.publish_manifest(
            paths.postings,
            stage="postings",
            config_digest=cfg_digest,
            input_digest=in_digest,
            rows=sum(p["rows"] for p in lineage),
            partitions=lineage,
            started_at=t0,
            extra={"avgdl": stats["avgdl"], "N": stats["N"]},
        )
    postings = spark.read.parquet(paths.postings)

    # ---- stage 4: dictionary (term -> df, cf, global max impact) --------
    t0 = time.time()
    if not (resume and ckpt.stage_complete(paths.dictionary, cfg_digest, in_digest)):
        dictionary = postings.groupBy("term").agg(
            F.sum("n_docs").alias("df"),
            F.sum("sum_tf").alias("cf"),
            F.max("max_impact").alias("max_impact"),
            F.first("bucket").alias("bucket"),
        )
        dictionary.write.mode("overwrite").parquet(paths.dictionary)
        dd = spark.read.parquet(paths.dictionary)
        lineage = ckpt.partition_lineage(dd)
        ckpt.publish_manifest(
            paths.dictionary,
            stage="dictionary",
            config_digest=cfg_digest,
            input_digest=in_digest,
            rows=sum(p["rows"] for p in lineage),
            partitions=lineage,
            started_at=t0,
        )
    return paths


@F.pandas_udf(T.IntegerType())
def _norm_byte_udf(doclen: pd.Series) -> pd.Series:
    return pd.Series(
        int_to_byte4_np(doclen.to_numpy(dtype=np.int64)).astype(np.int32)
    )

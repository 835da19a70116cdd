"""Distributed inverted-index build.

Pipeline (reference parity: the /update indexing path,
solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:407-513 +
DocumentBuilder.toDocument:99-123, re-expressed Spark-first):

  pages ──repartitionByRange(url) + sort──► url-ordered partitions
        ──fused mapInPandas: dense doc_id + extract_text + analyze──►
          analyzed(url, doc_id, terms[], tfs[], doclen)           [1 UDF pass]
        ──explode──► (term, doc_id, tf, norm_byte)
        ──repartition(term, salt) + sorted streaming encode──► postings rows
        ──metadata agg──► dictionary(term, df, cf, max_impact)
        plus scalar stats(N, avgdl).

Scale decisions (each one exists because the naive version measurably
failed — see BENCH/BASELINE.md history):

- doc_id = global rank of url: range-shuffle on the raw pages FIRST, then
  run the (expensive) analysis UDF exactly once on the shuffled partitions.
  Analyzing before the range shuffle runs the UDF twice (the range
  partitioner's sampling pass re-executes its child) and an unshuffled
  single-file corpus would analyze on one task.
- postings rows are keyed (term, salt) with salt = doc_id // salt_range:
  head terms (>30% of docs) are encoded by many tasks (north_rule skew
  handling), and because salt ranges are doc-aligned ACROSS terms, the
  block-max pruning ub(salt) = sum_t idf_t * max_impact(t, salt) is sound.
- one row per (term, salt), not per 128-doc block: rare terms cost one row
  instead of df rows.  Inside the row, postings are delta-gap varbyte with
  128-POSTING skip blocks (block_first_docs / block_n / block_max_impacts
  array columns = skip pointers + per-block max-score, Lucene
  Lucene101PostingsFormat impact semantics).
- encoding is a per-PARTITION streaming pass over rows sorted by
  (term, salt, doc_id) — groups are delimited with numpy, never one pandas
  call per group (applyInPandas per (term,salt) group was ~2ms overhead x
  #groups = the build bottleneck).
- the postings table is written partitioned by pmod(xxhash64(term),
  n_buckets): a query prunes its scan to the buckets of its terms (the
  term-dictionary-seek analog).
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

from apache___solr_spark.analysis.chain import analyze, extract_text
from apache___solr_spark.config import DEFAULT_CONFIG, IndexConfig
from apache___solr_spark.index import checkpoint as ckpt
from apache___solr_spark.index.codec import delta_encode, encode_vbyte
from apache___solr_spark.index.smallfloat import NORM_TABLE, int_to_byte4_np

ANALYZED_SCHEMA = (
    "url string, doc_id long, terms array<string>, tfs array<int>, doclen int"
)

POSTINGS_SCHEMA = (
    "term string, salt long, n_docs int, first_doc long, last_doc long, "
    "doc_gaps binary, tfs binary, norms binary, sum_tf long, max_tf int, "
    "max_impact float, block_first_docs array<long>, block_n array<int>, "
    "block_max_impacts array<float>, bucket int"
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


def _analyze_and_number(spark: SparkSession, pages: DataFrame, n_parts: int):
    """Analysis UDF on the INPUT partitions (html never crosses a shuffle),
    then a range shuffle of the narrow analyzed rows to assign the dense
    global doc_id = rank of url.

    Ordering matters at scale: shuffling raw pages first moves the whole
    html payload through the exchange (plus the range sampler's extra pass),
    which measurably dominated the build; analyzed rows are ~5x narrower.
    Both intermediates are persisted so the UDF runs exactly once and the
    range sampler reads from cache.

    doc_id is deterministic and invariant to input partitioning (mirrors
    Lucene's stable docIDs; control-vs-distributed tests depend on it).
    """
    max_token_len = DEFAULT_CONFIG.max_token_len

    def analyze_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms_col: list[list[str]] = []
            tfs_col: list[list[int]] = []
            lens: list[int] = []
            for h, t in zip(pdf["html"], pdf["text"]):
                toks = analyze(extract_text(h, t), max_token_len=max_token_len)
                counts_: dict[str, int] = {}
                for tok in toks:
                    counts_[tok] = counts_.get(tok, 0) + 1
                items = sorted(counts_.items())
                terms_col.append([k for k, _ in items])
                tfs_col.append([v for _, v in items])
                lens.append(len(toks))
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "terms": terms_col,
                    "tfs": tfs_col,
                    "doclen": lens,
                }
            )

    raw = pages.select("url", "html", "text").mapInPandas(
        analyze_batch,
        schema="url string, terms array<string>, tfs array<int>, doclen int",
    )
    raw = raw.persist()
    ranged = (
        raw.repartitionByRange(n_parts, "url").sortWithinPartitions("url").persist()
    )
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

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = b_offsets.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "doc_id": np.arange(base + seen, base + seen + n, dtype=np.int64),
                    "terms": pdf["terms"],
                    "tfs": pdf["tfs"],
                    "doclen": pdf["doclen"],
                }
            )
            seen += n
            yield out

    numbered = ranged.mapInPandas(number, schema=ANALYZED_SCHEMA)
    return numbered, (raw, ranged)


def _encode_partition(cfg: IndexConfig, avgdl: float):
    """Streaming encoder over a partition sorted by (term, salt, doc_id):
    emits one postings row per (term, salt) group, batching across Arrow
    batch boundaries (a group may span batches — the tail group is carried).
    """
    norm_table_f32 = NORM_TABLE.astype(np.float32)
    k1f = np.float32(cfg.bm25_k1)
    one_minus_b = np.float32(1.0 - cfg.bm25_b)
    bf = np.float32(cfg.bm25_b)
    avgdlf = np.float32(avgdl)
    block = cfg.block_range
    salt_range = cfg.salt_range

    def encode_region(region: pd.DataFrame) -> pd.DataFrame:
        terms = region["term"].to_numpy()
        salts = region["salt"].to_numpy()
        buckets = region["bucket"].to_numpy()
        ids = region["doc_id"].to_numpy().astype(np.int64)
        tfs = region["tf"].to_numpy().astype(np.int64)
        norms = region["norm_byte"].to_numpy().astype(np.uint8)

        dl = norm_table_f32[norms]
        tf_f = tfs.astype(np.float32)
        impact = tf_f / (tf_f + k1f * (one_minus_b + bf * dl / avgdlf))

        change = np.flatnonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(region)]))
        rows = []
        for s, e in zip(starts, ends):
            g_ids = ids[s:e]
            g_tfs = tfs[s:e]
            g_norms = norms[s:e]
            g_imp = impact[s:e]
            n = int(e - s)
            base = int(salts[s]) * salt_range
            bl_starts = np.arange(0, n, block)
            rows.append(
                {
                    "term": terms[s],
                    "salt": int(salts[s]),
                    "n_docs": n,
                    "first_doc": int(g_ids[0]),
                    "last_doc": int(g_ids[-1]),
                    "doc_gaps": encode_vbyte(delta_encode(g_ids, base)),
                    "tfs": encode_vbyte(g_tfs),
                    "norms": g_norms.tobytes(),
                    "sum_tf": int(g_tfs.sum()),
                    "max_tf": int(g_tfs.max()),
                    "max_impact": np.float32(g_imp.max()),
                    "block_first_docs": g_ids[bl_starts].tolist(),
                    "block_n": np.diff(np.append(bl_starts, n)).astype(np.int32).tolist(),
                    "block_max_impacts": np.maximum.reduceat(g_imp, bl_starts).tolist(),
                    "bucket": int(buckets[s]),
                }
            )
        return pd.DataFrame(rows)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            terms = pdf["term"].to_numpy()
            salts = pdf["salt"].to_numpy()
            last_t, last_s = terms[-1], salts[-1]
            eq_last = (terms == last_t) & (salts == last_s)
            # length of the trailing run belonging to the last (term, salt)
            tail_len = int(np.argmin(eq_last[::-1])) if not eq_last.all() else len(pdf)
            if tail_len == len(pdf):
                carry = pdf  # whole batch is one group; may continue
                continue
            cut = len(pdf) - tail_len
            carry = pdf.iloc[cut:]
            out = encode_region(pdf.iloc[:cut])
            if not out.empty:
                yield out
        if carry is not None and not carry.empty:
            yield encode_region(carry)

    return run


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

    # ---- stage 1: range shuffle + fused doc_id/analysis pass -------------
    t0 = time.time()
    if not (resume and ckpt.stage_complete(paths.analyzed, cfg_digest, in_digest)):
        analyzed, cached = _analyze_and_number(spark, pages, n_parts)
        analyzed.write.mode("overwrite").parquet(paths.analyzed)
        for c in cached:
            c.unpersist()
        lineage = ckpt.parquet_lineage(paths.analyzed)
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
        lineage = ckpt.parquet_lineage(paths.docs)
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

    # ---- stage 3: postings (salted repartition + streaming encode) ------
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
            .withColumn(
                "salt", (F.col("doc_id") / F.lit(cfg.salt_range)).cast("long")
            )
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64("term"), F.lit(cfg.n_buckets)).cast("int"),
            )
        )
        encode = _encode_partition(cfg, stats["avgdl"])
        # shuffle key (bucket, salt), NOT bare term: (a) head terms split
        # across salts (skew), (b) each task holds few buckets, so the
        # bucket-partitioned write emits few files per task instead of
        # tasks x buckets tiny files.  Sorting by (term, salt, doc_id) keeps
        # encode groups contiguous (bucket is a function of term).
        blocks = (
            exploded.repartition(n_parts, "bucket", "salt")
            .sortWithinPartitions("bucket", "term", "salt", "doc_id")
            .mapInPandas(encode, schema=POSTINGS_SCHEMA)
        )
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(paths.postings)
        lineage = ckpt.parquet_lineage(paths.postings)
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
        lineage = ckpt.parquet_lineage(paths.dictionary)
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

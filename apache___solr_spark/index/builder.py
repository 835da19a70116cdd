"""Distributed inverted-index build.

Pipeline (reference parity: the /update indexing path,
solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:407-513 +
DocumentBuilder.toDocument:99-123, re-expressed Spark-first):

  pages ──analysis UDF──► analyzed_raw checkpoint                [1 UDF pass]
        ──repartitionByRange(url) + sort + persist──► url-ordered partitions
          (executor MEMORY_AND_DISK; counts collect ⇒ offsets + stats)
        ──mapInArrow──► numbered(url, doc_id, terms[], tfs[], positions,
          doclen) — consumed STRAIGHT from the persisted frame by BOTH the
          docs write and the segment encoder (no intermediate parquet hop;
          cfg.checkpoint_numbered=True restores one)
        ──numpy segment encode──► packed (term, salt) rows
        ──repartition(bucket, salt) + sorted streaming merge──► postings
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

from apache___solr_spark.analysis.chain import analyzer_fn, extract_text
from apache___solr_spark.config import DEFAULT_CONFIG, IndexConfig
from apache___solr_spark.index import checkpoint as ckpt
from apache___solr_spark.index.codec import (
    decode_vbyte,
    delta_decode,
    delta_encode,
    encode_vbyte,
    encode_vbyte_packed,
)
from apache___solr_spark.index.smallfloat import NORM_TABLE, int_to_byte4_np
from apache___solr_spark.sources.loaders import read_pages

# Analyzed-row layout (analysis output AND, +doc_id, the numbered table):
# tfs / positions are vbyte-packed binaries, NOT int arrays — the doc-id
# numbering range-shuffle moves every analyzed row through an exchange, and
# packed bytes cut that payload ~4x vs UnsafeRow int arrays (measured: the
# numbering stage was the #2 cost of the build after positions landed).
# tfs holds one count per term (term-major); positions holds doclen raw
# position values (term-major, ascending within term).

# positions: one vbyte stream per (term, salt) row — for each posting, tf
# position values (first raw, rest delta-gapped), indices into the
# post-filter token stream.  Empty when store_positions=False.
SEGMENT_SCHEMA = (
    "term string, salt long, n_docs int, first_doc long, last_doc long, "
    "doc_gaps binary, tfs binary, norms binary, positions binary, "
    "sum_tf long, max_tf int, "
    "max_impact float, block_first_docs array<long>, block_n array<int>, "
    "block_max_impacts array<float>"
)

POSTINGS_SCHEMA = SEGMENT_SCHEMA + ", bucket int"


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def analyzed_raw(self) -> str:
        return os.path.join(self.root, "analyzed_raw")

    @property
    def analyzed(self) -> str:
        # optional durable checkpoint of the numbered analyzed table
        # (cfg.checkpoint_numbered=True, or any pre-fusion build); the
        # default fused build keeps these rows in executor persist()
        # storage only and this directory is never written
        return os.path.join(self.root, "analyzed")

    @property
    def numbering(self) -> str:
        # metrics-only manifest dir for the fused numbering pass (wall
        # time + per-range-partition row lineage); holds no data
        return os.path.join(self.root, "numbering")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def dictionary(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")

    @property
    def payloads(self) -> str:
        # optional per-doc payload side table (whitespace_payload indexes):
        # (doc_id, n, payloads vbyte of float32 bits) aligned to positions
        return os.path.join(self.root, "payloads")

    @property
    def stored(self) -> str:
        # optional stored-fields store (Lucene .fdt analog) — written by
        # store_fields() / add_docs(store_fields=True), read by realtime_get
        return os.path.join(self.root, "stored")


def _input_digest(pages: DataFrame, source: str | None) -> str:
    # cheap fingerprint: source path + schema; row count comes via manifests
    return f"{source or 'df'}::{','.join(pages.columns)}"


def _analyze_raw(pages: DataFrame, cfg: IndexConfig = DEFAULT_CONFIG) -> DataFrame:
    """Analysis UDF on the INPUT partitions: html never crosses a shuffle
    (raw pages through the exchange measurably dominated the build; analyzed
    rows are ~5x narrower), and the expensive UDF pass checkpoints on its
    own before any id assignment."""
    max_token_len = cfg.max_token_len
    analyze_ = analyzer_fn(cfg.analyzer)
    store_positions = cfg.store_positions

    def analyze_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms_col: list[list[str]] = []
            tfs_flat: list[int] = []
            pos_flat: list[int] = []
            tf_starts: list[int] = [0]
            pos_starts: list[int] = [0]
            lens: list[int] = []
            for h, t in zip(pdf["html"], pdf["text"]):
                toks = analyze_(extract_text(h, t), max_token_len=max_token_len)
                occ: dict[str, list[int]] = {}
                for i, tok in enumerate(toks):
                    occ.setdefault(tok, []).append(i)
                items = sorted(occ.items())
                terms_col.append([k for k, _ in items])
                tfs_flat.extend(len(v) for _, v in items)
                tf_starts.append(len(tfs_flat))
                if store_positions:
                    # flat, term-major (ascending within each term)
                    pos_flat.extend(p for _, v in items for p in v)
                pos_starts.append(len(pos_flat))
                lens.append(len(toks))
            # ONE vectorized vbyte pass per batch, sliced per doc (a per-doc
            # encode_vbyte call costs ~20us fixed -> minutes at 10^6 docs)
            tf_buf, tf_bounds = encode_vbyte_packed(
                np.asarray(tfs_flat, dtype=np.int64),
                np.asarray(tf_starts[:-1], dtype=np.int64),
            )
            pos_buf, pos_bounds = encode_vbyte_packed(
                np.asarray(pos_flat, dtype=np.int64),
                np.asarray(pos_starts[:-1], dtype=np.int64),
            )
            tf_raw, pos_raw = tf_buf.tobytes(), pos_buf.tobytes()
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "terms": terms_col,
                    "tfs": [
                        tf_raw[int(tf_bounds[i]) : int(tf_bounds[i + 1])]
                        for i in range(len(lens))
                    ],
                    "positions": [
                        pos_raw[int(pos_bounds[i]) : int(pos_bounds[i + 1])]
                        for i in range(len(lens))
                    ],
                    "doclen": lens,
                }
            )

    return pages.select("url", "html", "text").mapInPandas(
        analyze_batch,
        schema=(
            "url string, terms array<string>, tfs binary, "
            "positions binary, doclen int"
        ),
    )


def _range_parts(rows: int | None, shuffle_parts: int, parallelism: int) -> int:
    """Range-partition count for the numbering shuffle (which also sets the
    parallelism of every downstream pass over the persisted analyzed rows —
    the docs write and the heavy segment-encode UDF).  Target ~25k docs per
    partition so the python-heavy stages run in MULTIPLE WAVES per core
    (straggler smoothing: one slow task in a single wave of exactly
    #cores tasks sets the whole stage's wall), clamped to
    [shuffle_parts, 4*parallelism] so tiny builds don't pay per-task
    overhead and huge builds don't explode the task count.

    The count is then rounded UP to a whole number of waves: a count like
    60 on 32 cores runs as 1.875 waves — the second wave leaves half the
    cores idle while the stage wall waits on it (r5 stage-wall sessions
    P1/P2 measured the postings map side at 0.75 efficiency against a 0.94
    same-session hardware ceiling; wave quantization was the largest
    attributable slice)."""
    lo = shuffle_parts
    hi = max(shuffle_parts, 4 * parallelism)
    if not rows:
        n = max(lo, 2 * parallelism)
    else:
        n = int(min(max(lo, -(-rows // 25_000)), hi))
    return -(-n // parallelism) * parallelism


def _number_docs(
    spark: SparkSession, raw: DataFrame, n_parts: int
) -> tuple[DataFrame, int, int, DataFrame, list]:
    """Range shuffle of the narrow analyzed rows to assign the dense global
    doc_id = rank of url — deterministic and invariant to input partitioning
    (mirrors Lucene's stable docIDs; control-vs-distributed tests depend on
    it, and the fused build's resume path depends on a RE-computation
    yielding identical ids, which rank-of-url guarantees).  Returns
    (numbered_df, n_docs, total_len, ranged_df, per_partition_counts): the
    offsets pass already scans every row, so corpus stats and the numbering
    manifest's lineage ride along for free.  ``ranged_df`` is the persisted
    frame the caller must unpersist once downstream stages are done.

    The ranged frame is persisted so the offsets pass and the numbering pass
    see the SAME partition boundaries — a separate url-only shuffle was
    tried and produced different range-sampler boundaries (caught by
    the permutation check in build_index, which stays as a permanent
    guard).

    doc_id is a PURE JVM PROJECTION over the persisted frame:
    ``offset[spark_partition_id] + (monotonically_increasing_id & 2^33-1)``
    — mono ids are ``pid<<33 | row-index-in-partition``, so subtracting the
    pid bits yields the row's dense rank within its url-sorted partition,
    and adding the collected per-partition offset makes it the global url
    rank.  Rounds 1-3 did this with a mapInArrow pass; that blocked column
    pruning for every consumer (mapInArrow consumes all columns), so the
    narrow docs write decoded the full terms/tfs/positions payload through
    Python once per consumer.  As a projection, consumers prune: the docs
    write touches only (url, doclen) cache columns and no Python worker at
    all; the permutation check on the docs write remains the guard that
    the recomputed row order is the same dense rank."""
    # Sort key is a TOTAL order over the row (url is the de-facto uniqueKey,
    # but duplicate-url inputs exist in the wild): under a bare url sort,
    # equal-url rows have nondeterministic tie order across shuffle
    # refetch, so a postings-only resume or cache-partition loss could
    # renumber them relative to the already-written docs table — and the
    # dense-permutation check cannot see a swap.  The extra keys cost
    # nothing on unique urls (comparator short-circuits on the first key)
    # and make recompute identity unconditional; rows identical in every
    # column are interchangeable, so their tie order is immaterial.
    ranged = (
        raw.repartitionByRange(n_parts, "url")
        .sortWithinPartitions("url", "doclen", "terms", "tfs", "positions")
        .persist()
    )
    counts = (
        ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("count"), F.sum("doclen").alias("dl"))
        .orderBy("pid")
        .collect()
    )
    offsets = {}
    acc = 0
    total_len = 0
    for r in counts:
        offsets[r["pid"]] = acc
        acc += r["count"]
        total_len += int(r["dl"] or 0)
    off_arr = F.array(
        *[F.lit(int(offsets.get(i, 0))) for i in range(n_parts)]
    )
    pid = F.spark_partition_id()
    doc_id = (
        F.element_at(off_arr, pid + F.lit(1)).cast("long")
        + F.monotonically_increasing_id()
        - F.shiftleft(pid.cast("long"), 33)
    ).alias("doc_id")
    numbered = ranged.select(
        "url", doc_id, "terms", "tfs", "positions", "doclen"
    )
    part_counts = [
        {"partition": int(r["pid"]), "rows": int(r["count"])} for r in counts
    ]
    return numbered, acc, total_len, ranged, part_counts


def _permutation_metrics() -> tuple:
    """(count, max, sum, sumsq) jointly pin the multiset {0..n-1}; sum of
    doclen rides along for stats.  sumsq runs in decimal(38,0): at 10^12
    docs the long sum of doc_id^2 (~10^36) would wrap.  Built lazily —
    Column construction needs the JVM gateway, which executor-side module
    imports don't have."""
    return (
        F.count("doc_id").alias("n"),
        F.max("doc_id").alias("mx"),
        F.sum("doc_id").alias("s"),
        F.sum(
            F.col("doc_id").cast("decimal(38,0)")
            * F.col("doc_id").cast("decimal(38,0)")
        ).alias("sq"),
        F.sum("doclen").alias("tl"),
    )


def _assert_doc_id_permutation(m: dict) -> None:
    """Assert doc_id is exactly {0..n-1} from the observed docs-write
    metrics; guards the shadow-shuffle offset assumption in _number_docs.
    Runs off :func:`_permutation_metrics` observed DURING the docs write —
    no extra scan."""
    n = int(m["n"])
    if n == 0:
        return
    want_s = n * (n - 1) // 2
    want_sq = (n - 1) * n * (2 * n - 1) // 6
    if not (
        int(m["mx"]) == n - 1 and int(m["s"]) == want_s and int(m["sq"]) == want_sq
    ):
        raise RuntimeError(
            "doc_id assignment is not a dense permutation — range boundary "
            f"mismatch between counts and shuffle passes (n={n}, max={m['mx']})"
        )


class _Scorer:
    """Shared float32 BM25 impact math (must match query/engine.py)."""

    def __init__(self, cfg: IndexConfig, avgdl: float) -> None:
        self.norm_table_f32 = NORM_TABLE.astype(np.float32)
        self.k1f = np.float32(cfg.bm25_k1)
        self.one_minus_b = np.float32(1.0 - cfg.bm25_b)
        self.bf = np.float32(cfg.bm25_b)
        self.avgdlf = np.float32(avgdl)

    def impact(self, tfs: np.ndarray, norms: np.ndarray) -> np.ndarray:
        dl = self.norm_table_f32[norms]
        tf_f = tfs.astype(np.float32)
        return tf_f / (
            tf_f + self.k1f * (self.one_minus_b + self.bf * dl / self.avgdlf)
        )


def _flat_binary(arr) -> np.ndarray:
    """Contiguous uint8 view over ALL values of an Arrow BinaryArray (no
    nulls): the concatenation of the per-row byte strings, zero-copy."""
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    lo = int(offs[arr.offset])
    hi = int(offs[arr.offset + len(arr)])
    return np.frombuffer(arr.buffers()[2], dtype=np.uint8)[lo:hi]


def _delta_positions(g_pos: np.ndarray, g_tfs: np.ndarray) -> np.ndarray:
    """Per-posting delta encoding of flat absolute positions: each posting's
    first position stays raw, the rest become gaps."""
    starts = np.concatenate(([0], np.cumsum(g_tfs)))[:-1]
    gaps = np.empty(g_pos.size, dtype=np.int64)
    if g_pos.size:
        gaps[1:] = g_pos[1:] - g_pos[:-1]
        gaps[starts] = g_pos[starts]
    return gaps


def _undelta_positions(gaps: np.ndarray, g_tfs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_delta_positions` (flat absolute positions)."""
    starts = np.concatenate(([0], np.cumsum(g_tfs)))[:-1].astype(np.int64)
    cs = np.cumsum(gaps.astype(np.int64))
    before = cs[starts] - gaps[starts]  # running total just before each posting
    tfs64 = np.asarray(g_tfs, dtype=np.int64)
    return cs - np.repeat(before, tfs64)


def _encode_group_row(
    cfg: IndexConfig,
    scorer: _Scorer,
    term,
    salt: int,
    g_ids: np.ndarray,
    g_tfs: np.ndarray,
    g_norms: np.ndarray,
    g_pos: np.ndarray | None = None,
) -> dict:
    """One postings row for one (term, salt) group (doc_ids ascending)."""
    n = g_ids.size
    base = salt * cfg.salt_range
    bl_starts = np.arange(0, n, cfg.block_range)
    g_imp = scorer.impact(g_tfs, g_norms)
    return {
        "term": term,
        "salt": int(salt),
        "n_docs": int(n),
        "first_doc": int(g_ids[0]),
        "last_doc": int(g_ids[-1]),
        "doc_gaps": encode_vbyte(delta_encode(g_ids, base)),
        "tfs": encode_vbyte(g_tfs),
        "norms": g_norms.tobytes(),
        "positions": (
            encode_vbyte(_delta_positions(g_pos, g_tfs))
            if g_pos is not None and g_pos.size
            else b""
        ),
        "sum_tf": int(g_tfs.sum()),
        "max_tf": int(g_tfs.max()),
        "max_impact": np.float32(g_imp.max()),
        "block_first_docs": g_ids[bl_starts].tolist(),
        "block_n": np.diff(np.append(bl_starts, n)).astype(np.int32).tolist(),
        "block_max_impacts": np.maximum.reduceat(g_imp, bl_starts).tolist(),
    }


def _segment_encode(cfg: IndexConfig, avgdl: float):
    """MAP-SIDE segment build (the reference's per-segment index model,
    SolrIndexConfig ramBuffer->segment flush semantics): for one analyzed
    partition, explode to postings IN NUMPY (never through a JVM explode or
    a raw-posting shuffle), sort by (term, salt, doc_id), and emit packed
    segment rows with the SAME schema as the final index.

    Because stage-1 partitions are doc_id-contiguous, a (term, salt) group
    rarely spans partitions — the reduce-side merge mostly passes rows
    through untouched.  Shuffle bytes drop ~15x vs shuffling raw
    (term, doc_id, tf, norm) rows; this was the build bottleneck at 10^6
    docs and is the difference between shuffling ~2 bytes/posting and ~50.
    """
    scorer = _Scorer(cfg, avgdl)
    salt_range = cfg.salt_range
    block = cfg.block_range

    def _binary_from(buf: np.ndarray, bounds: np.ndarray) -> "pa.Array":
        import pyarrow as pa

        return pa.BinaryArray.from_buffers(
            pa.binary(),
            len(bounds) - 1,
            [None, pa.py_buffer(bounds.astype(np.int32).tobytes()), pa.py_buffer(buf.tobytes())],
        )

    def run(batches):  # Iterator[pa.RecordBatch] -> Iterator[pa.RecordBatch]
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            if rb.num_rows == 0:
                continue
            terms_col = rb.column(rb.schema.get_field_index("terms"))
            tfs_col = rb.column(rb.schema.get_field_index("tfs"))
            lens = pc.list_value_length(terms_col).to_numpy().astype(np.int64)
            if lens.sum() == 0:
                continue
            # flatten WITHOUT creating Python string objects: the term column
            # stays an Arrow StringArray; grouping runs on its C++-computed
            # dictionary codes.
            flat_terms = pc.list_flatten(terms_col)
            enc = pc.dictionary_encode(flat_terms)
            codes = enc.indices.to_numpy().astype(np.int64)
            uniques = enc.dictionary
            tfs = decode_vbyte(_flat_binary(tfs_col)).astype(np.int64)
            pos_flat = decode_vbyte(
                _flat_binary(rb.column(rb.schema.get_field_index("positions")))
            ).astype(np.int64)
            store_pos = pos_flat.size > 0
            doc_ids_col = rb.column(rb.schema.get_field_index("doc_id")).to_numpy()
            doclen_col = rb.column(rb.schema.get_field_index("doclen")).to_numpy()
            doc_ids = np.repeat(doc_ids_col, lens)
            norms = np.repeat(int_to_byte4_np(doclen_col.astype(np.int64)), lens)

            salts = doc_ids // salt_range
            order = np.lexsort((doc_ids, salts, codes))
            if store_pos:
                # flat position offsets of each posting BEFORE reordering
                pos_sel_starts = (np.cumsum(tfs) - tfs)[order]
            codes, salts, doc_ids, tfs, norms = (
                codes[order], salts[order], doc_ids[order], tfs[order], norms[order]
            )
            n = codes.size
            change = (
                np.flatnonzero((codes[1:] != codes[:-1]) | (salts[1:] != salts[:-1]))
                + 1
            )
            gstarts = np.concatenate(([0], change))
            gends = np.concatenate((change, [n]))
            glens = gends - gstarts

            # whole-batch vectorized math; outputs are zero-copy Arrow arrays
            imp = scorer.impact(tfs, norms)
            gaps = np.empty(n, dtype=np.int64)
            gaps[1:] = doc_ids[1:] - doc_ids[:-1]
            gaps[gstarts] = doc_ids[gstarts] - salts[gstarts] * salt_range
            gap_buf, gap_bounds = encode_vbyte_packed(gaps, gstarts)
            tf_buf, tf_bounds = encode_vbyte_packed(tfs, gstarts)
            norm_bounds = np.append(gstarts, n)
            # positions: gather occurrence groups into posting order, delta
            # per posting, pack per (term, salt) group — all vectorized
            if store_pos:
                new_starts = np.cumsum(tfs) - tfs
                within = np.arange(pos_flat.size, dtype=np.int64) - np.repeat(
                    new_starts, tfs
                )
                pos_sorted = pos_flat[np.repeat(pos_sel_starts, tfs) + within]
                pgaps = _delta_positions(pos_sorted, tfs)
                pos_buf, pos_bounds = encode_vbyte_packed(
                    pgaps, new_starts[gstarts]
                )
            else:
                pos_buf = np.empty(0, dtype=np.uint8)
                pos_bounds = np.zeros(gstarts.size + 1, dtype=np.int64)
            sum_tf = np.add.reduceat(tfs, gstarts)
            max_tf = np.maximum.reduceat(tfs, gstarts)
            max_imp = np.maximum.reduceat(imp, gstarts)

            # inner skip blocks across ALL groups at once
            idx_in_group = np.arange(n, dtype=np.int64) - np.repeat(gstarts, glens)
            bl_starts = np.flatnonzero(idx_in_group % block == 0)
            bl_counts = -(-glens // block)
            bl_offsets = np.concatenate(([0], np.cumsum(bl_counts)))
            bl_ends = np.minimum(bl_starts + block, np.repeat(gends, bl_counts))
            bl_first = doc_ids[bl_starts]
            bl_n = (bl_ends - bl_starts).astype(np.int32)
            bl_maximp = np.maximum.reduceat(imp, bl_starts)
            bl_offs32 = pa.array(bl_offsets.astype(np.int32))

            arrays = [
                pc.take(uniques, pa.array(codes[gstarts])),
                pa.array(salts[gstarts]),
                pa.array(glens.astype(np.int32)),
                pa.array(doc_ids[gstarts]),
                pa.array(doc_ids[gends - 1]),
                _binary_from(gap_buf, gap_bounds),
                _binary_from(tf_buf, tf_bounds),
                _binary_from(norms.astype(np.uint8), norm_bounds),
                _binary_from(pos_buf, pos_bounds),
                pa.array(sum_tf),
                pa.array(max_tf.astype(np.int32)),
                pa.array(max_imp.astype(np.float32)),
                pa.ListArray.from_arrays(bl_offs32, pa.array(bl_first)),
                pa.ListArray.from_arrays(bl_offs32, pa.array(bl_n)),
                pa.ListArray.from_arrays(
                    bl_offs32, pa.array(bl_maximp.astype(np.float32))
                ),
            ]
            names = [
                "term", "salt", "n_docs", "first_doc", "last_doc", "doc_gaps",
                "tfs", "norms", "positions", "sum_tf", "max_tf", "max_impact",
                "block_first_docs", "block_n", "block_max_impacts",
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return run


def _merge_segments(cfg: IndexConfig, avgdl: float):
    """REDUCE-SIDE merge over rows sorted by (term, salt, first_doc):
    single-fragment groups pass through without decode; multi-fragment
    groups (a salt range that straddled two input partitions) are decoded,
    concatenated in doc order (fragments never overlap), and re-encoded.
    The streaming carry handles groups spanning Arrow batches.
    """
    scorer = _Scorer(cfg, avgdl)
    salt_range = cfg.salt_range

    def merge_region(region: pd.DataFrame) -> pd.DataFrame:
        terms = region["term"].to_numpy()
        salts = region["salt"].to_numpy()
        change = (
            np.flatnonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])) + 1
        )
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(region)]))
        out_rows = []
        passthrough_idx = []
        for s, e in zip(starts, ends):
            if e - s == 1:
                passthrough_idx.append(s)
                continue
            base = int(salts[s]) * salt_range
            frags = region.iloc[s:e]
            ids = np.concatenate(
                [
                    delta_decode(
                        decode_vbyte(bytes(g), int(n)).astype(np.int64), base
                    )
                    for g, n in zip(frags["doc_gaps"], frags["n_docs"])
                ]
            )
            tf_arrays = [
                decode_vbyte(bytes(t), int(n)).astype(np.int64)
                for t, n in zip(frags["tfs"], frags["n_docs"])
            ]
            tfs = np.concatenate(tf_arrays)
            norms = np.concatenate(
                [np.frombuffer(bytes(x), dtype=np.uint8) for x in frags["norms"]]
            )
            order = np.argsort(ids, kind="stable")
            g_pos = None
            if any(len(bytes(p)) > 0 for p in frags["positions"]):
                # decode each fragment to absolute positions, concat in the
                # fragments' doc order, then gather occurrence groups into
                # the merged posting order
                pos_abs = np.concatenate(
                    [
                        _undelta_positions(
                            decode_vbyte(bytes(p), int(st)).astype(np.int64),
                            tfa,
                        )
                        for p, st, tfa in zip(
                            frags["positions"], frags["sum_tf"], tf_arrays
                        )
                    ]
                )
                sel = (np.cumsum(tfs) - tfs)[order]
                otfs = tfs[order]
                new_starts = np.cumsum(otfs) - otfs
                within = np.arange(pos_abs.size, dtype=np.int64) - np.repeat(
                    new_starts, otfs
                )
                g_pos = pos_abs[np.repeat(sel, otfs) + within]
            out_rows.append(
                _encode_group_row(
                    cfg, scorer, terms[s], int(salts[s]),
                    ids[order], tfs[order], norms[order], g_pos,
                )
            )
        frames = []
        if passthrough_idx:
            frames.append(region.iloc[passthrough_idx])
        if out_rows:
            frames.append(pd.DataFrame(out_rows))
        return pd.concat(frames, ignore_index=True) if frames else region.iloc[:0]

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
            eq_last = (terms == terms[-1]) & (salts == salts[-1])
            tail_len = int(np.argmin(eq_last[::-1])) if not eq_last.all() else len(pdf)
            if tail_len == len(pdf):
                carry = pdf
                continue
            cut = len(pdf) - tail_len
            carry = pdf.iloc[cut:].reset_index(drop=True)
            out = merge_region(pdf.iloc[:cut])
            if not out.empty:
                yield out
        if carry is not None and not carry.empty:
            yield merge_region(carry)

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
        # parquet path or Iceberg catalog table, auto-detected; Iceberg
        # additionally gives the resume path snapshot isolation (the
        # resumed read sees the same snapshot the manifests were cut from).
        pages = read_pages(spark, pages, validate=False)
    n_parts_explicit = n_parts is not None
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    cfg_digest = cfg.digest()
    in_digest = _input_digest(pages, source)

    # ---- stage 1a: analysis UDF -> analyzed_raw checkpoint ---------------
    t0 = time.time()
    if not (resume and ckpt.stage_complete(paths.analyzed_raw, cfg_digest, in_digest)):
        _analyze_raw(pages, cfg).write.mode("overwrite").parquet(paths.analyzed_raw)
        lineage = ckpt.parquet_lineage(paths.analyzed_raw)
        ckpt.publish_manifest(
            paths.analyzed_raw,
            stage="analyzed_raw",
            config_digest=cfg_digest,
            input_digest=in_digest,
            rows=sum(p["rows"] for p in lineage),
            partitions=lineage,
            started_at=t0,
        )

    def _write_stats(n_docs: int, total: int) -> None:
        stats = {
            "N": n_docs,
            "total_len": total,
            "avgdl": (total / n_docs) if n_docs else 0.0,
            "config_digest": cfg_digest,
            "input_digest": in_digest,
            # full config rides the stats file so readers (SearchEngine,
            # add_docs) can self-configure instead of trusting the caller
            # to re-supply the exact build cfg
            "config": cfg.to_dict(),
        }
        tmp = paths.stats + ".tmp"
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, paths.stats)

    def _stats_reusable() -> bool:
        # like every other stage, reuse is gated on config AND input digests:
        # a rebuild with a changed config (e.g. max_token_len changes doclens)
        # or different input must not bake a stale N/avgdl into the impacts.
        if not os.path.exists(paths.stats):
            return False
        try:
            with open(paths.stats) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            return False
        return (
            prev.get("config_digest") == cfg_digest
            and prev.get("input_digest") == in_digest
        )

    # ---- stage plan ------------------------------------------------------
    # Decide up front which stages need (re)building: the fused pipeline
    # materializes the numbered analyzed rows only when some consumer stage
    # actually runs (a fully-resumed build does zero numbering work).
    need_docs = not (resume and ckpt.stage_complete(paths.docs, cfg_digest, in_digest))
    need_postings = not (
        resume and ckpt.stage_complete(paths.postings, cfg_digest, in_digest)
    )

    # ---- stage 1b: dense doc_id assignment (fused — no parquet hop) ------
    # The numbered rows feed the docs write and the segment encoder straight
    # from executor persist() storage (MEMORY_AND_DISK).  Rounds 1-3 wrote
    # them to parquet and re-read them twice; that full-corpus write + two
    # reads and their stage barriers were pure fixed cost at the 4N level
    # (BENCH/BASELINE.md session-C stage walls: the numbering stage scaled
    # 1.66x against a 3.31x ceiling).  cfg.checkpoint_numbered=True restores
    # the durable hop; a pre-fusion index with a valid analyzed checkpoint
    # is still consumed (legacy resume).
    analyzed = None
    ranged = None
    stats_fresh = False
    try:
        if need_docs or need_postings:
            t0 = time.time()
            if resume and ckpt.stage_complete(paths.analyzed, cfg_digest, in_digest):
                analyzed = spark.read.parquet(paths.analyzed)
            else:
                raw = spark.read.parquet(paths.analyzed_raw)
                raw_rows = (ckpt.load_manifest(paths.analyzed_raw) or {}).get("rows")
                n_range = (
                    n_parts
                    if n_parts_explicit
                    else _range_parts(
                        raw_rows, n_parts, spark.sparkContext.defaultParallelism
                    )
                )
                analyzed, n_docs_, total_len_, ranged, part_counts = _number_docs(
                    spark, raw, n_range
                )
                if not _stats_reusable():
                    _write_stats(n_docs_, total_len_)
                    stats_fresh = True
                os.makedirs(paths.numbering, exist_ok=True)
                ckpt.publish_manifest(
                    paths.numbering,
                    stage="numbering",
                    config_digest=cfg_digest,
                    input_digest=in_digest,
                    rows=n_docs_,
                    partitions=part_counts,
                    started_at=t0,
                    extra={"materialized": bool(cfg.checkpoint_numbered)},
                )
                if cfg.checkpoint_numbered:
                    t1 = time.time()
                    analyzed.write.mode("overwrite").parquet(paths.analyzed)
                    lineage = ckpt.parquet_lineage(paths.analyzed)
                    ckpt.publish_manifest(
                        paths.analyzed,
                        stage="analyzed",
                        config_digest=cfg_digest,
                        input_digest=in_digest,
                        rows=sum(p["rows"] for p in lineage),
                        partitions=lineage,
                        started_at=t1,
                    )
                    ranged.unpersist()
                    ranged = None
                    analyzed = spark.read.parquet(paths.analyzed)

        # ---- stage 1c: docs table (+ observed stats & permutation check) -----
        # The permutation guard and the global stats (exact — ExactStatsCache
        # semantics, solr/core/.../search/stats/ExactStatsCache.java) both ride
        # the docs write via df.observe(): zero extra Spark jobs.
        t0 = time.time()
        if need_docs:
            from pyspark.sql import Observation

            obs = Observation("docs_metrics")
            docs = (
                analyzed.select("url", "doc_id", "doclen")
                .observe(obs, *_permutation_metrics())
                .withColumn("norm_byte", _norm_byte_udf(F.col("doclen")))
            )
            docs.write.mode("overwrite").parquet(paths.docs)
            m = obs.get
            _assert_doc_id_permutation(m)
            _write_stats(int(m["n"]), int(m["tl"] or 0))
            stats_fresh = True
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

        # ---- stage 2: stats fallback (resume path where both stage-1 outputs
        # were reused but stats.json is missing/stale) -------------------------
        if not stats_fresh and not _stats_reusable():
            agg = docs.agg(
                F.count("*").alias("n"), F.sum("doclen").alias("total_len")
            ).collect()[0]
            _write_stats(agg["n"], int(agg["total_len"] or 0))
        with open(paths.stats) as f:
            stats = json.load(f)

        # ---- stage 3: postings (map-side segments -> salted merge) ----------
        t0 = time.time()
        if need_postings:
            # segments: numpy explode+sort+encode inside the UDF — raw postings
            # never cross the JVM or a shuffle
            segments = analyzed.select(
                "doc_id", "doclen", "terms", "tfs", "positions"
            ).mapInArrow(_segment_encode(cfg, stats["avgdl"]), schema=SEGMENT_SCHEMA)
            # merge shuffle moves only packed rows; key (term-bucket, salt) so
            # head terms split across salts (skew) and each task writes into few
            # bucket dirs.  first_doc in the sort keeps fragments in doc order.
            # The reduce side gets a wave-aligned >=2-waves partition count:
            # bare spark.sql.shuffle.partitions (= core count in our session
            # factory) is exactly ONE wave, so a single straggling merge task
            # sets the whole stage wall — measurably worse the more cores
            # there are (r5 scaling sessions P1/P2).  Group integrity is
            # unaffected: (bucket, salt) hash-routes every fragment of a
            # (term, salt) group to one partition at any partition count.
            if n_parts_explicit:
                merge_parts = n_parts
            else:
                par = max(1, spark.sparkContext.defaultParallelism)
                merge_parts = -(-max(n_parts, 2 * par) // par) * par
            bucket_expr = F.pmod(F.xxhash64("term"), F.lit(cfg.n_buckets)).cast("int")
            blocks = (
                segments.repartition(merge_parts, bucket_expr, F.col("salt"))
                .sortWithinPartitions("term", "salt", "first_doc")
                .mapInPandas(_merge_segments(cfg, stats["avgdl"]), schema=SEGMENT_SCHEMA)
                .withColumn("bucket", bucket_expr)
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
    finally:
        # unpersist the MEMORY_AND_DISK full corpus on EVERY exit:
        # a failed docs/postings write or a tripped permutation check
        # must not leak the cache for the life of the Spark session.
        if ranged is not None:
            ranged.unpersist()
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

    # ---- stage 5: per-doc payload side table (payload analyzers only) ---
    # Positions index the post-analysis token stream, so payloads[pos]
    # recovers any occurrence's payload — the PayloadScoreQuery /
    # PayloadCheckQuery data path (DelimitedPayloadTokenFilter.java)
    # without a postings-format change.  One extra pass over the raw
    # text, paid only by payload indexes.
    if cfg.analyzer == "whitespace_payload":
        t0 = time.time()
        if not (
            resume and ckpt.stage_complete(paths.payloads, cfg_digest, in_digest)
        ):
            docs_map = spark.read.parquet(paths.docs).select("url", "doc_id")
            (
                _payload_arrays(pages)
                .join(docs_map, "url")
                .select("doc_id", "n", "payloads")
                .repartitionByRange(n_parts, "doc_id")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(paths.payloads)
            )
            lineage = ckpt.parquet_lineage(paths.payloads)
            ckpt.publish_manifest(
                paths.payloads,
                stage="payloads",
                config_digest=cfg_digest,
                input_digest=in_digest,
                rows=sum(p["rows"] for p in lineage),
                partitions=lineage,
                started_at=t0,
            )
    return paths


def _payload_arrays(pages: DataFrame) -> DataFrame:
    """(url, n, payloads vbyte) — the position-aligned float32 payload
    stream per doc (analysis/payloads.py), batched through one
    encode_vbyte_packed pass like the analysis stage."""
    from apache___solr_spark.analysis.payloads import (
        encode_payloads,
        payload_values,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals: list[np.ndarray] = []
            for h, t in zip(pdf["html"], pdf["text"]):
                vals.append(
                    encode_payloads(payload_values(extract_text(h, t)))
                )
            ns = np.asarray([len(v) for v in vals], dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
            flat = (
                np.concatenate(vals).astype(np.int64)
                if vals and ns.sum()
                else np.empty(0, dtype=np.int64)
            )
            buf, bounds = encode_vbyte_packed(flat, starts)
            raw = buf.tobytes()
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "n": ns,
                    "payloads": [
                        raw[int(bounds[i]) : int(bounds[i + 1])]
                        for i in range(len(ns))
                    ],
                }
            )

    return pages.select("url", "html", "text").mapInPandas(
        run, schema="url string, n long, payloads binary"
    )


@F.pandas_udf(T.IntegerType())
def _norm_byte_udf(doclen: pd.Series) -> pd.Series:
    return pd.Series(
        int_to_byte4_np(doclen.to_numpy(dtype=np.int64)).astype(np.int32)
    )

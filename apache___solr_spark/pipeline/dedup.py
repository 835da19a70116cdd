"""Deduplication operators for large-scale training-data pipelines.

The reference ships exact signature dedup
(solr/core/src/java/org/apache/solr/update/processor/
SignatureUpdateProcessorFactory.java + Lookup3Signature/TextProfileSignature);
the near-dup family (MinHash+LSH, SimHash, n-gram Jaccard) extends that
capability the way a 100 TB corpus pipeline needs it.  All hot paths are
built-in column expressions or numpy inside Arrow batches — no per-row
Python.

Design at scale:
- exact: groupBy on a content hash — one shuffle of (hash, id), AQE handles
  the empty-doc hash skew.
- MinHash+LSH: shingles -> K permuted min-hashes -> B bands; candidate pairs
  only materialize per band bucket (self-join within buckets, never a full
  cross join).
- SimHash: 64-bit fingerprint; candidates = equal fingerprints per rotated
  band (Hamming-adjacent docs collide in >=1 of the 4 16-bit bands).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed 64-bit mix constants (splitmix64 finalizer) — deterministic across
# runs and machines, defined here so both Spark and any oracle agree.
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups by content hash; keeps the min id as canonical.

    Returns (id, canonical_id, is_duplicate).  Hashing is JVM-side
    (xxhash64 + full text equality is overkill at 64-bit collision rates we
    accept for dedup; the reference's Lookup3Signature is likewise 64-bit).
    """
    h = F.xxhash64(F.col(text_col)).alias("_sig")
    sigs = df.select(F.col(id_col).alias("id"), h)
    canon = sigs.groupBy("_sig").agg(F.min("id").alias("canonical_id"))
    return (
        sigs.join(canon, "_sig")
        .select(
            "id",
            "canonical_id",
            (F.col("id") != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


def _shingle_hash_frame(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, hs: array<long>) — 64-bit hash of each DISTINCT n-token shingle.

    Tokenization ([a-z0-9]+ lowercase — the same stream ngram_jaccard_pairs
    uses), shingle construction, and hashing (xxhash64) all run as built-in
    JVM column expressions: the 100 TB per-doc hot loop never enters Python.
    Docs shorter than n tokens contribute their whole token stream as one
    shingle; empty docs hash the empty string (all empties collide — the
    degenerate bucket is handled by _cap_buckets downstream).
    """
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), "")
    t = df.select(F.col(id_col).alias("id"), toks.alias("_t"))
    n_sh = F.greatest(F.size("_t") - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n_sh)
    sh = F.transform(idx, lambda i: F.array_join(F.slice("_t", i, n), " "))
    hs = F.transform(F.array_distinct(sh), lambda s: F.xxhash64(s))
    return t.select("id", hs.alias("hs"))


def _concat_hash_arrays(col: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate per-doc hash arrays -> (all_hashes u64, start offsets,
    lengths).  Per-doc work is one asarray call; everything downstream is
    batch-level numpy."""
    arrs = [np.asarray(a, dtype=np.int64) for a in col]
    lens = np.array([a.size for a in arrs], dtype=np.int64)
    all_h = (
        np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
    ).view(np.uint64)
    starts = np.zeros(len(arrs), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return all_h, starts, lens


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 64, shingle_n: int = 3
) -> DataFrame:
    """(id, sig: array<bigint>) — K min-hashes over n-token shingles.

    Shingling + base hashing is JVM-side (:func:`_shingle_hash_frame`); the
    K-permutation family h_i(x) = splitmix64(x ^ seed_i) and the min-over-
    shingles reduction run as TWO batch-level numpy ops over the whole Arrow
    batch (outer-xor matrix + minimum.reduceat) — no per-doc inner loop.
    """
    seeds = _splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            all_h, starts, _lens = _concat_hash_arrays(pdf["hs"])
            mat = _splitmix64(all_h[:, None] ^ seeds[None, :])
            mins = np.minimum.reduceat(mat, starts, axis=0).astype(np.int64)
            yield pd.DataFrame({"id": pdf["id"], "sig": list(mins)})

    return _shingle_hash_frame(df, text_col, id_col, shingle_n).mapInPandas(
        run, schema="id long, sig array<long>"
    )


def _cap_buckets(
    banded: DataFrame, max_bucket_size: int | None
) -> DataFrame:
    """Drop degenerate LSH buckets (boilerplate / empty pages all hashing
    together): a bucket of B docs yields B^2/2 candidate pairs, so one bad
    bucket turns the band join quadratic.  Capping trades recall on
    pathological near-dup cliques for a bounded join — at 100 TB a capped
    clique is rediscovered transitively through its other bands/members.
    The count runs over the same (band, bucket) partitioning the self-join
    shuffles on anyway."""
    if not max_bucket_size:
        return banded
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    return (
        banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b.  Pairs sharing >=1
    full band collide; est_jaccard = fraction of matching minhashes.
    Scale shape: the only shuffle is groupBy(band_key); the self-join runs
    inside buckets, so a 100 TB corpus never sees a cross join, and buckets
    above ``max_bucket_size`` are dropped before the join (see
    :func:`_cap_buckets`).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.bucket")
    banded = _cap_buckets(banded, max_bucket_size)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(float(num_hashes))
    ).alias("est_jaccard")
    return pairs.select("id_a", "id_b", est)


def simhash_dedup_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 2,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """SimHash near-dup candidates: 64-bit fingerprints, candidates collide
    on at least one of four 16-bit bands (catches Hamming distance <= 3).
    Buckets above ``max_bucket_size`` are dropped (see :func:`_cap_buckets`)."""

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            all_h, starts, lens = _concat_hash_arrays(pdf["hs"])
            # batch-level bit votes: (total_shingles, 64) bit matrix, then
            # per-doc column sums via add.reduceat — no per-doc inner loop
            bits = ((all_h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            ones = np.add.reduceat(bits, starts, axis=0)
            votes_pos = (2 * ones) > lens[:, None]  # ones - zeros > 0
            fps = (
                (votes_pos.astype(np.uint64) << bit_idx[None, :])
                .sum(axis=1, dtype=np.uint64)
                .view(np.int64)
            )
            yield pd.DataFrame({"id": pdf["id"], "simhash": fps})

    fps = _shingle_hash_frame(df, text_col, id_col, shingle_n).mapInPandas(
        fingerprint, schema="id long, simhash long"
    )
    banded = fps.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.bucket")
    banded = _cap_buckets(banded, max_bucket_size)
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    left: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.0,
    right: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram (token shingle) Jaccard for candidate pairs.

    Without a candidate set this is O(n^2) — at scale, feed it the LSH
    candidates; standalone form kept for oracle-checkable correctness via
    an inverted shingle index (shuffle on shingle, not a cross join).
    """
    right = right if right is not None else left
    # shingles are built over the RAW token stream (standard shingle Jaccard;
    # matches the SQL oracle) — only the shingle SET is deduplicated below.
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), "")

    def shingled(df: DataFrame, side: str) -> DataFrame:
        t = df.select(F.col(id_col).alias(f"id_{side}"), toks.alias("_t"))
        # token n-grams via posexplode + slice on the token array
        n_sh = F.greatest(F.size("_t") - F.lit(n - 1), F.lit(1))
        idx = F.sequence(F.lit(1), n_sh)
        sh = F.transform(idx, lambda i: F.array_join(F.slice("_t", i, n), " "))
        return t.select(
            f"id_{side}",
            F.size(F.array_distinct(sh)).alias(f"n_{side}"),
            F.explode(F.array_distinct(sh)).alias("shingle"),
        )

    ls = shingled(left, "a")
    rs = shingled(right, "b")
    inter = (
        ls.join(rs, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias(
        "jaccard"
    )
    return inter.select("id_a", "id_b", jac).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# duplicate clusters: candidate pairs -> connected components -> canonical
# ---------------------------------------------------------------------------


def duplicate_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a candidate-pair edge list — the step
    that turns pairwise near-dup CANDIDATES (minhash/simhash/jaccard/
    embedding pairs) into duplicate GROUPS.  Distributed min-label
    propagation: every node repeatedly adopts the smallest id reachable
    through one more hop, converging in O(cluster diameter) rounds —
    near-dup clusters are shallow (dup rings around a source document),
    so a handful of rounds closes them.  Returns (doc_id, component)
    where component = min doc_id of the connected component; singletons
    (docs in no pair) are simply absent.

    Scale shape: each round is one groupBy(doc) min-agg + one join —
    both shuffle on the SAME key so AQE reuses the exchange; lineage is
    cut with localCheckpoint every 5 rounds (same pattern as graph BFS);
    convergence is detected with a count of changed labels (a scalar per
    round, no driver data)."""
    edges = (
        pairs.select(
            F.col(id_a).alias("src"), F.col(id_b).alias("dst")
        )
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    # label(v) starts as min(v, min neighbor) — one round for free
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("comp"))
        .select(F.col("src").alias("id"), "comp")
        .persist()
    )
    for it in range(max_iter):
        # candidate labels through one hop: neighbor's current label
        prop = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("comp").alias("n_comp"))
            .select(F.col("src").alias("id"), "n_comp")
        )
        nxt = (
            labels.join(prop, "id", "left")
            .select(
                "id",
                F.least(
                    "comp", F.coalesce("n_comp", F.col("comp"))
                ).alias("comp"),
                (F.coalesce("n_comp", F.col("comp")) < F.col("comp")).alias(
                    "_chg"
                ),
            )
            .persist()
        )
        changed = nxt.agg(F.sum(F.col("_chg").cast("long")).alias("c")).collect()[
            0
        ]["c"]
        labels.unpersist()
        labels = nxt.select("id", "comp")
        if (it + 1) % 5 == 0:
            labels = labels.localCheckpoint(eager=True)
        if not changed:
            break
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop near-duplicates, keeping ONE canonical doc per duplicate
    component (the smallest id — deterministic).  Docs that appear in no
    candidate pair pass through untouched.  This is the corpus-side
    finish of the dedup pipeline: pairs from any detector
    (minhash_lsh_candidates / simhash / ngram_jaccard_pairs /
    embedding_near_dup_pairs) plug in unchanged."""
    comps = duplicate_components(pairs, id_a=id_a, id_b=id_b)
    victims = comps.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(victims, id_col, "left_anti")


def remove_repeated_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_repeats: int = 3,
    min_line_chars: int = 10,
) -> DataFrame:
    """Corpus-level repeated-line removal — the C4/Gopher boilerplate pass:
    any line occurring in >= ``min_repeats`` distinct documents (cookie
    banners, nav bars, license footers) is deleted from every document.

    Returns (id, text, n_lines, n_removed) with ``text`` rebuilt from the
    surviving lines in original order.  Lines shorter than
    ``min_line_chars`` are exempt (blank lines / headings would otherwise
    always trip the threshold).

    Scale shape (100 TB): explode to (line_hash, id) — all JVM exprs,
    xxhash64 so the shuffle key is 8 bytes, never the line text; one
    groupBy(line_hash) with agg(count_distinct) for the boilerplate set;
    the boilerplate hashes (small relative to the corpus: only lines
    repeated >= k survive) join back against the exploded lines — AQE
    picks broadcast when the set fits, shuffle-hash otherwise (no explicit
    hint: at 10^12 docs the boilerplate set can exceed broadcast limits).
    Rebuild is a groupBy(id) over (pos, line) pairs — one shuffle keyed by
    doc id, no Python in any hot path.
    """
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn(
            "line_hash",
            F.when(
                F.length(F.trim(F.col("line"))) >= min_line_chars,
                F.xxhash64(F.trim(F.col("line"))),
            ),
        )
    )
    boiler = (
        lines.filter(F.col("line_hash").isNotNull())
        .groupBy("line_hash")
        .agg(F.count_distinct("id").alias("_ndocs"))
        .filter(F.col("_ndocs") >= min_repeats)
        .select("line_hash")
    )
    kept = lines.join(
        boiler.withColumn("_boiler", F.lit(True)), "line_hash", "left"
    )
    return (
        kept.groupBy("id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_boiler").isNull(),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("text"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("_boiler").isNotNull(), 1).otherwise(0)
            ).alias("n_removed"),
        )
        .select("id", "text", "n_lines", "n_removed")
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Cross-document exact substring dedup: maximal duplicated token spans.

    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better") remove exact substrings of >= ~50 tokens shared across
    documents, found with a monolithic suffix array.  A suffix array does
    not distribute; the same spans fall out of a k-gram inverted index —
    a token window of length L >= k is shared between documents iff ALL of
    its k-grams are shared, so: hash every k-token window, keep the hashes
    occurring in >= ``min_df`` distinct documents (one shuffle on the
    hash), and merge per document the consecutive window positions into
    maximal runs (a run of m consecutive duplicated windows covers
    m + k - 1 tokens).

    Returns ``(id, span_start, span_len, max_share)``: 0-based token offset,
    span length in tokens, and the largest per-window document count inside
    the span.  Shuffle shape at 100 TB: explode is map-side; one
    aggregation keyed by the 64-bit gram hash (AQE handles head-gram skew);
    one join back on the hash; the run merge shuffles only the duplicated
    positions, keyed by doc.  Windows are compared by xxhash64 — at 10^12
    grams the 64-bit collision rate makes a false shared-window ~1e-7 per
    pair, acceptable for a dedup gate (Lee et al. use the same argument
    for their Rabin-Karp variant).
    """
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("_t")).filter(
        F.size("_t") >= k
    )
    grams = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("_t") - F.lit(k - 1)),
                lambda i: F.xxhash64(F.array_join(F.slice("_t", i, k), " ")),
            )
        ).alias("pos", "gh"),
    )
    shared = (
        grams.groupBy("gh")
        .agg(F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_df)
    )
    dup_pos = grams.join(shared, "gh").select("id", "pos", "n_docs")
    # Maximal runs of consecutive positions: pos - row_number() is constant
    # within a run (the classic gaps-and-islands grouping key).
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    runs = dup_pos.withColumn(
        "_grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        runs.groupBy("id", "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.count(F.lit(1)) + F.lit(k - 1)).alias("span_len"),
            F.max("n_docs").alias("max_share"),
        )
        .select("id", "span_start", "span_len", "max_share")
    )


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 10,
    min_df: int = 2,
    min_span: int | None = None,
) -> DataFrame:
    """Remove duplicated spans from each document's token stream.

    ``min_span`` (tokens, default k) keeps short incidental repeats;
    only maximal spans of at least that many tokens are cut — the Lee et
    al. policy of deleting the duplicated substring rather than the whole
    document.  Output ``(id, text, n_removed_tokens)`` with ``text``
    rebuilt space-joined from the surviving tokens (the tokenizer is
    lossy about punctuation/case by design — this is a training-corpus
    cleaner, not a reversible transform).

    The span table from :func:`duplicate_spans` is tiny relative to the
    corpus (only duplicated regions), so it joins back keyed by doc and
    the cut happens in ONE projection: a token survives if no covering
    span exists (``exists`` over the doc's span array, bound once).
    """
    spans = duplicate_spans(df, text_col, id_col, k=k, min_df=min_df).filter(
        F.col("span_len") >= (k if min_span is None else min_span)
    )
    return _strip_spans(df, text_col, id_col, spans)


def _strip_spans(
    df: DataFrame, text_col: str, id_col: str, spans_df: DataFrame
) -> DataFrame:
    """Cut token spans ``(id, span_start, span_len)`` out of each doc's
    token stream; shared by :func:`strip_duplicate_spans` and
    :func:`decontaminate_spans`.  Returns ``(id, text,
    n_removed_tokens)`` for EVERY input doc (span-free docs pass through
    re-joined)."""
    from apache___solr_spark.functions.evaluators import let_bind

    spans = (
        spans_df.groupBy("id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").cast("long").alias("s"),
                    (F.col("span_start") + F.col("span_len"))
                    .cast("long")
                    .alias("e"),
                )
            ).alias("_spans")
        )
    )
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("_t"))
    joined = base.join(spans, "id", "left")

    def rebuild(spans_arr):
        def kept(t_arr):
            # Guard empty/NULL token arrays: sequence(0, size-1) would
            # otherwise produce a DESCENDING [0, -1] (Spark infers step -1)
            # and element_at would fault on the out-of-range index.
            idx = F.when(
                F.size(t_arr) > 0, F.sequence(F.lit(0), F.size(t_arr) - 1)
            ).otherwise(F.array().cast("array<int>"))
            surviving = F.filter(
                idx,
                lambda i: ~F.exists(
                    spans_arr, lambda sp: (i >= sp["s"]) & (i < sp["e"])
                ),
            )
            return F.transform(surviving, lambda i: F.element_at(t_arr, i + 1))
        return kept

    cleaned = let_bind(
        {
            "t": F.col("_t"),
            "sp": F.coalesce(
                F.col("_spans"),
                F.array().cast("array<struct<s:long,e:long>>"),
            ),
        },
        lambda t, sp: rebuild(sp)(t),
    )
    return joined.select(
        "id",
        F.array_join(cleaned, " ").alias("text"),
        # greatest(.., 0): size(NULL) is -1 for null-text docs
        (
            F.greatest(F.size("_t"), F.lit(0)) - F.size(cleaned)
        ).alias("n_removed_tokens"),
    )


def _word_tokens(col) -> "F.Column":
    """Decontamination token stream: lowercase, alnum runs only — the
    GPT-3 appendix-C normalization (case and punctuation removed before
    gram matching)."""
    return F.array_remove(F.split(F.lower(col), r"[^a-z0-9]+"), "")


def _gram_hashes(tcol, n: int) -> "F.Column":
    """xxhash64 of every ``n``-token window; a sequence shorter than
    ``n`` (but non-empty) contributes its whole token run as one gram."""
    full = F.transform(
        F.sequence(F.lit(1), F.size(tcol) - F.lit(n - 1)),
        lambda i: F.xxhash64(F.array_join(F.slice(tcol, i, n), " ")),
    )
    whole = F.array(F.xxhash64(F.array_join(tcol, " ")))
    return (
        F.when(F.size(tcol) >= n, full)
        .when(F.size(tcol) > 0, whole)
        .otherwise(F.array().cast("array<bigint>"))
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    eval_text_col: str = "text",
    n: int = 13,
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination: remove/flag training documents that share
    any ``n``-token gram with an evaluation set.

    The GPT-3 appendix-C / PaLM procedure: lowercase, strip punctuation,
    and treat a training document as contaminated if any of its ``n``-word
    windows (n=13 by convention) also occurs in a benchmark item.  Eval
    items shorter than ``n`` tokens contribute their whole token run as a
    single gram, so they still catch verbatim copies; catching a *short*
    eval item embedded inside a longer training doc needs a smaller per-
    dataset ``n`` — pass it explicitly per benchmark, as GPT-3 did.

    ``mode="flag"`` returns every training row as ``(id, n_hits,
    contaminated)`` — ``n_hits`` counts the doc's gram *positions* that
    match the eval set; ``mode="drop"`` returns the original ``df`` rows
    with contaminated documents removed.

    Scale shape (100 TB corpus, benchmark of 10^3..10^6 items): the eval
    side reduces to a distinct 8-byte hash set — tiny — and is explicitly
    ``broadcast()``; the training side's gram explode is map-side, the
    containment check is a broadcast hash join (no corpus shuffle), and
    the only shuffle is the per-doc hit count keyed by id (``drop`` mode
    anti-joins just the contaminated id set back — AQE broadcasts it when
    it fits, which it essentially always does for a benchmark overlap).
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    eval_grams = (
        eval_df.select(
            F.explode(_gram_hashes(_word_tokens(F.col(eval_text_col)), n)).alias(
                "gh"
            )
        )
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(_gram_hashes(_word_tokens(F.col(text_col)), n)).alias("gh"),
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    if mode == "drop":
        return df.join(
            hits.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_spans(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    eval_text_col: str = "text",
    n: int = 13,
    pad: int = 0,
) -> DataFrame:
    """Surgical decontamination: instead of dropping a contaminated
    document wholesale (:func:`decontaminate` ``mode="drop"``), cut only
    the token spans whose ``n``-gram windows hit the eval set — the GPT-3
    appendix-C policy of removing a window AROUND each collision and
    keeping the rest of the document.  ``pad`` widens every cut by that
    many context tokens on each side.

    Returns ``(id, text, n_removed_tokens)`` for every input doc, text
    rebuilt space-joined from surviving tokens (same lossy-normalization
    contract as :func:`strip_duplicate_spans`).  A doc shorter than ``n``
    tokens whose whole token run matches an eval item is cut entirely.

    Scale shape: like :func:`decontaminate` — broadcast eval-hash probe,
    no corpus shuffle to find hits; consecutive hit windows merge into
    maximal runs (gaps-and-islands keyed by doc, shuffling only the hit
    positions); the cut joins the tiny span table back and rewrites text
    in one projection.
    """
    eval_grams = (
        eval_df.select(
            F.explode(
                _gram_hashes(_word_tokens(F.col(eval_text_col)), n)
            ).alias("gh")
        )
        .distinct()
    )
    toks = _word_tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("_t"))
    win_hits = (
        base.filter(F.size("_t") >= n)
        .select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - F.lit(n - 1)),
                    lambda i: F.xxhash64(F.array_join(F.slice("_t", i, n), " ")),
                )
            ).alias("pos", "gh"),
        )
        .join(F.broadcast(eval_grams), "gh")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    runs = (
        win_hits.withColumn("_grp", F.col("pos") - F.row_number().over(w))
        .groupBy("id", "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.count(F.lit(1)) + F.lit(n - 1)).alias("span_len"),
        )
        .select("id", "span_start", "span_len")
    )
    short_hits = (
        base.filter((F.size("_t") > 0) & (F.size("_t") < n))
        .select(
            "id",
            F.xxhash64(F.array_join("_t", " ")).alias("gh"),
            F.size("_t").alias("span_len"),
        )
        .join(F.broadcast(eval_grams), "gh")
        .select("id", F.lit(0).alias("span_start"), "span_len")
    )
    spans = runs.unionByName(short_hits)
    if pad:
        # negative starts / past-end extents are harmless: the cut tests
        # token indexes that exist, so the pad self-clamps at doc edges
        spans = spans.select(
            "id",
            (F.col("span_start") - F.lit(pad)).alias("span_start"),
            (F.col("span_len") + F.lit(2 * pad)).alias("span_len"),
        )
    return _strip_spans(df, text_col, id_col, spans)

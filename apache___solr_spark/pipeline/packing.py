"""Training-batch assembly: deterministic stratified sampling and
fixed-length sequence packing (concat-and-chunk).

The reference has no analog — these are the operations that sit between a
cleaned web corpus and an LLM training run: pick a reproducible subset per
domain/quality stratum, fix a global (shuffled) document order, then chunk
the concatenated token stream into fixed-length training sequences, each
sequence described by the document slices that fill it.

Scale shape (100 TB): `stratified_sample` is one map-only projection (a
hash compare per row — no shuffle, no RNG state, rerunnable). For
`pack_sequences` the classic blocker is the GLOBAL running token offset —
a naive `Window.orderBy(...)` without a partition key is a single-task
scan. Here it is a distributed prefix sum: the order key is bucketed by
its high bits (a MONOTONE map, so bucket order == global order), bucket
token totals are aggregated (≤ `num_buckets` rows — the only collect),
their prefix sums are broadcast back, and each bucket computes its local
cumulative sum under `Window.partitionBy(bucket)` in parallel. Two
shuffles total (bucket totals + the windowed sort), both on a uniform
key; the chunk spans themselves are a map-side `explode(sequence(...))`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# order keys live in [0, ORD_SPACE): xxhash64 shifted into non-negative
# int64 territory so bucket arithmetic never overflows
ORD_SPACE = 1 << 63


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the hash of its
    id (with ``seed``) falls under its stratum's rate threshold.

    This is how corpus mixtures are drawn at scale (domain/quality
    up/down-weighting): hash-threshold sampling is exactly reproducible
    (same doc, same seed -> same decision, independent of partitioning or
    execution order), needs no RNG state, and composes — raising a rate
    strictly grows the kept set, so mixture adjustments reuse prior
    output. Map-only; no shuffle.

    ``rates`` maps stratum value -> keep fraction in [0, 1]; strata not
    listed get ``default_rate``.
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    scale = 1_000_000
    # uniform draw in [0, scale) from the id hash; seed shifts the draw
    draw = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(scale))
    thr = F.lit(int(round(default_rate * scale)))
    for s, r in rates.items():
        thr = F.when(F.col(strata_col) == F.lit(s), F.lit(int(round(r * scale)))).otherwise(thr)
    return df.filter(draw < thr)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    order_col: Column | None = None,
    seed: int = 0,
    num_buckets: int = 1024,
    persist: bool = True,
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay every document's tokens out
    on one global tape in a deterministic (seeded-shuffle) order, cut the
    tape into ``seq_len``-token training sequences, and return one row per
    (sequence, document-slice) overlap:

    ``(seq_id, <id_col>, seq_offset, doc_offset, n_toks)`` — tokens
    ``[doc_offset, doc_offset + n_toks)`` of the document fill positions
    ``[seq_offset, seq_offset + n_toks)`` of sequence ``seq_id``. A
    document longer than ``seq_len`` spans multiple sequences; a short
    one shares its sequence with its neighbors (no padding waste — the
    GPT-style packing objective). Zero-token documents are dropped.

    ``order_col`` overrides the tape order (must be a non-negative int64
    expression — e.g. a curriculum score or a hash both an engine and an
    oracle can compute); the default is ``xxhash64(id, seed)`` mapped into
    [0, 2^63), i.e. a reproducible global shuffle. Ties break by id.

    ``num_buckets`` sizes the distributed prefix sum (see module
    docstring); set it to ~the cluster's parallelism. Correctness does
    not depend on it: the bucket key is ``order // ceil(2^63/num_buckets)``
    — monotone in the order key — so (bucket, order) sorts identically to
    plain order and the bucket-offset + local-cumsum decomposition returns
    the exact global prefix sum.

    A prefix sum needs two passes (size, then emit); ``persist`` (default)
    caches the projected ``(id, n, order, bucket)`` frame between them —
    ~32 bytes/doc, MEMORY_AND_DISK — so when ``n_tokens_col`` is computed
    (e.g. ``token_count``'s regex over the full text) the corpus is
    scanned and tokenized ONCE, not once per pass. Pass ``persist=False``
    if the caller manages caching itself.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    ordc = (
        order_col
        if order_col is not None
        else F.shiftrightunsigned(F.xxhash64(F.col(id_col), F.lit(seed)), 1)
    )
    # clamp into int64: at num_buckets=1 the divisor 2^63+1 would overflow;
    # 2^63-1 keeps the map monotone (only the max key lands in bucket 1)
    step = min(ORD_SPACE // num_buckets + 1, ORD_SPACE - 1)
    d = (
        df.select(
            F.col(id_col),
            F.col(n_tokens_col).cast("long").alias("_n"),
            ordc.cast("long").alias("_ord"),
        )
        .filter(F.col("_n") > 0)
        .withColumn("_b", (F.col("_ord") / F.lit(step)).cast("long"))
    )
    if persist:
        from pyspark import StorageLevel

        d = d.persist(StorageLevel.MEMORY_AND_DISK)

    # distributed prefix sum: per-bucket totals (<= num_buckets rows) ->
    # driver-side running offsets -> broadcast join back
    totals = d.groupBy("_b").agg(F.sum("_n").alias("_t")).orderBy("_b").collect()
    offs, acc = [], 0
    for r in totals:
        offs.append((r["_b"], acc))
        acc += r["_t"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs, "_b long, _off long")

    w = Window.partitionBy("_b").orderBy("_ord", id_col)
    d = (
        d.join(F.broadcast(off_df), "_b")
        .withColumn("_start", F.col("_off") + F.sum("_n").over(w) - F.col("_n"))
    )

    L = F.lit(seq_len)
    first = (F.col("_start") / L).cast("long")
    last = ((F.col("_start") + F.col("_n") - 1) / L).cast("long")
    d = d.withColumn("seq_id", F.explode(F.sequence(first, last)))
    seq_base = F.col("seq_id") * L
    lo = F.greatest(F.col("_start"), seq_base)
    hi = F.least(F.col("_start") + F.col("_n"), seq_base + L)
    return d.select(
        "seq_id",
        id_col,
        (lo - seq_base).cast("long").alias("seq_offset"),
        (lo - F.col("_start")).cast("long").alias("doc_offset"),
        (hi - lo).cast("long").alias("n_toks"),
    )

"""Engine configuration.

BM25 constants match the Solr defaults
(solr/core/src/java/org/apache/solr/search/similarities/BM25SimilarityFactory.java:41-51:
k1=1.2, b=0.75, discountOverlaps=true).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    """Configuration for an index build + the query engine reading it.

    block_range: postings blocks are aligned on fixed doc_id ranges
        (block_id = doc_id // block_range).  Aligned blocks make block-max
        pruning sound for multi-term queries: a whole doc range can be
        skipped when the sum of per-term block max-scores is below the
        top-k threshold.  This replaces Lucene's per-list 128-doc blocks +
        impacts (Lucene101PostingsFormat semantics) with a layout that
        distributes: one DataFrame row per (term, block).
    salt_range: doc_id range per merge salt.  The postings merge groups by
        (term, doc_id // salt_range) instead of bare term so a head term
        appearing in 30%+ of docs is built by many tasks, not one
        (north_rule: explicit skew handling).  Must be a multiple of
        block_range so blocks never straddle salt boundaries.
    bm25_k1 / bm25_b: BM25Similarity parameters.
    max_token_len: StandardTokenizer maxTokenLen (Lucene default 255).
    n_buckets: the postings table is written partitioned by
        pmod(xxhash64(term), n_buckets) so a query touching T terms prunes
        the scan to <=T partitions (Catalyst partition pruning stands in
        for Solr's term-dictionary seek).
    """

    format_version: int = 4  # bump on any layout change (postings OR the
    # intermediate analyzed table): stale checkpoints then fail the manifest
    # digest check and rebuild instead of resuming with an incompatible
    # schema.  v3 added per-posting position streams (phrase queries /
    # highlighting); v4 vbyte-packed analyzed.tfs/positions (shuffle payload).
    block_range: int = 128
    salt_range: int = 8192
    bm25_k1: float = 1.2
    bm25_b: float = 0.75
    max_token_len: int = 255
    n_buckets: int = 64
    field: str = "text"
    # analyzer: "standard" = html_strip -> StandardTokenizer(UAX#29 approx)
    # -> stop -> lowercase (the reference text_general chain).  "simple" =
    # lowercase + [a-z0-9]+ regex, no stopwords — ANSI-SQL-expressible, so an
    # index built with it is value-checkable against a DuckDB oracle
    # end-to-end (the driver's correctness gate for BM25 itself).
    analyzer: str = "standard"
    # score_dtype: "float32" matches Lucene/Solr scoring exactly
    # (BM25Similarity computes in float); "float64" exists for the
    # SQL-oracle-checked configuration where DuckDB computes in double.
    score_dtype: str = "float32"
    # store_positions: per-posting position streams (third vbyte stream in
    # the postings row), enabling phrase queries — text fields index
    # positions by default in the reference (IndexOptions
    # DOCS_AND_FREQS_AND_POSITIONS, schema TextField default).  Positions are
    # indices in the POST-FILTER token stream: the standard chain drops
    # stopwords without leaving position gaps (documented divergence from
    # Lucene's posIncrement gaps; exact for analyzer="simple").
    store_positions: bool = True
    # checkpoint_numbered: when True the numbered analyzed table is ALSO
    # durably checkpointed to parquet (<index>/analyzed) between the
    # numbering shuffle and the postings build.  Default False: the fused
    # build keeps the range-shuffled analyzed rows in executor-local
    # persist() storage (MEMORY_AND_DISK — Spark re-derives lost partitions
    # from the analyzed_raw checkpoint via lineage) and feeds the docs and
    # postings stages straight from it, removing a full-corpus parquet
    # write + two re-reads and their stage barriers from every build.  A
    # driver failure between stages recomputes only the narrow numbering
    # shuffle from analyzed_raw; deployments that prefer durability over
    # that recompute set True.  Not part of the digest: it changes where
    # intermediate bytes live, never any output bit.
    checkpoint_numbered: bool = False

    def __post_init__(self) -> None:
        if self.salt_range % self.block_range != 0:
            raise ValueError("salt_range must be a multiple of block_range")
        if self.analyzer not in (
            "standard",
            "simple",
            "standard_porter",
            "standard_folding",
            "en_splitting",
            "icu_folding",
            "cjk",
            "min_hash",
            "whitespace_payload",
        ):
            raise ValueError(f"unknown analyzer {self.analyzer!r}")
        if self.score_dtype not in ("float32", "float64"):
            raise ValueError(f"unknown score_dtype {self.score_dtype!r}")

    def digest(self) -> str:
        """Stable digest used by checkpoint manifests to detect config drift.

        Knobs that cannot change any output bit (only where intermediates
        live) are excluded, so flipping them never invalidates a resumable
        index."""
        d = asdict(self)
        d.pop("checkpoint_numbered", None)
        payload = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "IndexConfig":
        """Rehydrate from a stats-file ``config`` record; unknown keys from
        a newer writer are ignored so older readers keep working."""
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})


DEFAULT_CONFIG = IndexConfig()

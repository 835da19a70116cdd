from apache___solr_spark.pipeline.dedup import (  # noqa: F401
    duplicate_spans,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_dedup_candidates,
    strip_duplicate_spans,
)
from apache___solr_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from apache___solr_spark.pipeline.textqual import (  # noqa: F401
    detect_language,
    document_fingerprint,
    quality_score,
    token_count,
)

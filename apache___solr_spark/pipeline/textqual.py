"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

The reference ships this capability as update processors (langid module
solr/modules/langid/, TextProfileSignature for fuzzy fingerprints); these
are the Spark-native equivalents, all built-in column expressions so they
stay JVM-side in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache___solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS

# deterministic, SQL-expressible tokenizer used by the pipeline layer
# (pipeline ops favor oracle-checkable arithmetic over full UAX#29)
def _simple_tokens(col: Column) -> Column:
    return F.array_remove(F.split(F.lower(col), r"[^a-z0-9]+"), "")


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace/punctuation token count + a BPE-ish subword estimate
    (chars/4 is the common heuristic for byte-pair tokenizers)."""
    toks = _simple_tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4)).cast("long").alias("n_subwords_est"),
    )


def detect_language(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-ratio language heuristic: English function words are so
    frequent that their share of tokens separates en from non-en reliably
    at corpus scale (langid-module capability, minus the shipped profiles).

    Returns (id, stopword_ratio, lang_pred)."""
    toks = _simple_tokens(F.col(text_col))
    stops = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    n_stop = F.size(F.array_intersect(toks, stops))
    # ratio over distinct tokens (array_intersect is set-wise)
    n_distinct = F.size(F.array_distinct(toks))
    ratio = F.when(n_distinct > 0, n_stop / n_distinct).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic document quality: length, mean word length, punctuation
    density, stopword presence — the standard cheap pre-filters a web-scale
    training pipeline applies before expensive model scoring.

    All integer/ratio arithmetic, exactly reproducible in ANSI SQL."""
    text = F.col(text_col)
    toks = _simple_tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stops = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    stop_ratio = F.when(
        n_tokens > 0, F.size(F.array_intersect(toks, stops)) / F.size(F.array_distinct(toks))
    ).otherwise(F.lit(0.0))
    mean_wordlen = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_tokens,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 20) & (n_tokens <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_wordlen >= 3) & (mean_wordlen <= 10), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(mean_wordlen, 6).alias("mean_wordlen"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 2).alias("quality"),
    )


def document_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit content fingerprint (order-sensitive): xxhash64 of the
    normalized token stream — the dedup-signature capability of
    SignatureUpdateProcessorFactory (Lookup3Signature semantics: hash of
    normalized content, not the raw bytes)."""
    toks = _simple_tokens(F.col(text_col))
    normalized = F.array_join(toks, " ")
    return df.select(
        F.col(id_col),
        F.xxhash64(normalized).alias("fingerprint"),
    )

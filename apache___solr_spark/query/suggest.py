"""Spellcheck / suggest over the term dictionary.

Reference surface:
- SpellCheckComponent (handler/component/SpellCheckComponent.java:90) with
  DirectSolrSpellChecker: candidate corrections straight from the term
  dictionary within a max edit distance, ranked by document frequency.
- SuggestComponent (handler/component/SuggestComponent.java): prefix
  completion from high-frequency dictionary entries.

Scale shape: both run on the (small, already-aggregated) dictionary table,
never the corpus.  The edit-distance scan is pre-pruned by the length band
|len(term) - len(q)| <= max_edits — a pushdownable column predicate — before
the quadratic levenshtein compare, mirroring DirectSpellChecker's FST
intersection pruning capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_terms(
    dictionary: DataFrame,
    query_term: str,
    term_col: str = "term",
    freq_col: str = "df",
    max_edits: int = 2,
    limit: int = 10,
) -> DataFrame:
    """Spelling corrections: dictionary terms within ``max_edits``
    levenshtein distance of ``query_term`` (the term itself excluded),
    ranked by (distance asc, frequency desc, term asc)."""
    q = str(query_term)
    return (
        dictionary.filter(
            F.abs(F.length(term_col) - F.lit(len(q))) <= max_edits
        )
        .select(
            F.col(term_col).alias("term"),
            F.col(freq_col).alias("freq"),
            F.levenshtein(F.col(term_col), F.lit(q)).alias("distance"),
        )
        .filter((F.col("distance") <= max_edits) & (F.col("term") != q))
        .orderBy(
            F.col("distance").asc(), F.col("freq").desc(), F.col("term").asc()
        )
        .limit(limit)
    )


def suggest_prefix(
    dictionary: DataFrame,
    prefix: str,
    term_col: str = "term",
    freq_col: str = "df",
    limit: int = 10,
) -> DataFrame:
    """Completion suggester: highest-frequency dictionary terms with the
    given prefix (SuggestComponent capability).  startswith pushes down to
    the dictionary scan."""
    return (
        dictionary.filter(F.col(term_col).startswith(prefix))
        .select(F.col(term_col).alias("term"), F.col(freq_col).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(limit)
    )

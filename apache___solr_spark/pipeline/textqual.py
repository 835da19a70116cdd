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


# GPT-2-style pre-tokenizer (public tokenizer regex), lookahead-free so the
# same pattern runs identically under Java regex (Spark) and RE2 (DuckDB
# oracle); the dropped `\s+(?!\S)` branch only changes how trailing
# whitespace runs group, not the count of content pre-tokens.
BPE_PRETOKEN_RE = r"""'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting, three granularities per doc: whitespace/punct word
    count, a BPE pre-token count (the GPT-2 pre-tokenizer regex — the unit
    byte-pair merges start from, the standard budget proxy for LLM
    training data), and the chars/4 subword heuristic."""
    toks = _simple_tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(text_col, F.lit(BPE_PRETOKEN_RE), F.lit(0))
        ).alias("n_pretokens"),
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


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, the standard
    web-scale pre-training quality gates), all as built-in column
    expressions — one projection, no shuffle, no UDF:

    - ``n_lines``, ``dup_line_frac``: fraction of non-empty lines that are
      repeats of an earlier-seen line (1 - distinct/total).
    - ``dup_line_char_frac``: characters in those repeat occurrences over
      total line characters (each distinct line's first occurrence is not
      counted as duplicate).
    - ``top_2gram_frac``: token share covered by the single most frequent
      2-gram (count * 2 / n_tokens; overlap between occurrences is not
      deducted — documented upper-bound variant of the paper's
      character-fraction).
    - ``dup_2gram_frac`` / ``dup_3gram_frac``: fraction of n-gram
      POSITIONS that are repeats of an earlier-seen n-gram
      (1 - distinct/total — position-fraction variant of the paper's
      character-fraction).

    The most-frequent-2-gram count is a max-run-length fold over the
    sorted 2-gram array (aggregate with a {prev, run, best} struct state),
    so the whole frame stays inside whole-stage codegen.
    """
    text = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    n_lines = F.size(lines)
    n_dlines = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, s: a + F.length(s)
    )
    dline_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda a, s: a + F.length(s),
    )
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - n_dlines) / n_lines
    ).otherwise(F.lit(0.0))
    dup_line_char_frac = F.when(
        line_chars > 0, (line_chars - dline_chars) / line_chars
    ).otherwise(F.lit(0.0))

    toks = _simple_tokens(text)
    n_tokens = F.size(toks)

    def ngrams(n: int) -> Column:
        # Bind the token array once: element_at(toks, ...) inside the
        # per-position lambda would re-run the split chain at every gram
        # position (O(len²) per doc — see functions.evaluators.let_bind).
        from apache___solr_spark.functions.evaluators import let_bind

        return let_bind(
            {"t": toks},
            # guard lives IN the positions array (empty when too short):
            # an outer CASE does not reliably shield the transform body
            # from evaluating on a descending sequence (see _seq1).
            lambda t: F.transform(
                F.when(
                    F.size(t) >= n, F.sequence(F.lit(0), F.size(t) - n)
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j + 1) for j in range(n)]
                ),
            ),
        )

    def dup_frac(grams: Column) -> Column:
        total = F.size(grams)
        return F.when(
            total > 0, (total - F.size(F.array_distinct(grams))) / total
        ).otherwise(F.lit(0.0))

    g2, g3 = ngrams(2), ngrams(3)
    # most-frequent-2-gram count: longest equal run in the sorted array
    run_state = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def run_step(s: Column, x: Column) -> Column:
        run2 = F.when(x == s["prev"], s["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.greatest(s["best"], run2).alias("best"),
        )

    top2_count = F.aggregate(
        F.array_sort(g2), run_state, run_step, lambda s: s["best"]
    )
    top_2gram_frac = F.when(
        n_tokens > 0, F.least(top2_count * 2 / n_tokens, F.lit(1.0))
    ).otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(dup_line_char_frac, 6).alias("dup_line_char_frac"),
        F.round(top_2gram_frac, 6).alias("top_2gram_frac"),
        F.round(dup_frac(g2), 6).alias("dup_2gram_frac"),
        F.round(dup_frac(g3), 6).alias("dup_3gram_frac"),
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


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (the DuckDB oracle): no lookaround, no backreferences, greedy
# leftmost-first in both engines.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+"
PII_IPV4_RE = (
    r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b"
)
# phone, two shapes tried leftmost-first (identical semantics in Java
# regex and RE2): (a) +CC then 2-4 loose chunks — the explicit '+' licenses
# looseness; (b) no +: area chunk of 3-4 digits plus 2-3 chunks of 2-4,
# minimum 7 digits total, so years / 6-digit ids never match (8-digit
# dates CAN — documented: a scrub pass errs aggressive).
PII_PHONE_RE = (
    r"\+\d{1,3}([-. ]?\(?\d{1,4}\)?){2,4}"
    r"|\(?\d{3,4}\)?([-. ]?\d{2,4}){2,3}\b"
)


def scrub_pii(
    df: DataFrame,
    text_col: str,
    id_col: str,
    email_token: str = "<EMAIL>",
    ip_token: str = "<IP>",
    phone_token: str = "<PHONE>",
) -> DataFrame:
    """PII redaction — the standard pre-training scrub pass (the shape of
    BigScience/BigCode `pii` pipelines): replace emails, IPv4 addresses,
    and phone-like digit runs with typed placeholder tokens, and report
    per-document hit counts.

    Returns (id, text, n_emails, n_ips, n_phones).  Scrub order matters
    and is fixed: emails first (their local part can contain digits that
    phone would eat), then IPs (dotted quads would otherwise match the
    phone pattern), then phones over the already-redacted text.

    Scale shape: three `regexp_replace` + three `regexp_count` column
    expressions — one projection, JVM-side, no shuffle, no Python; at
    100 TB this is a map-only pass that pipelines with any downstream op.
    """
    text = F.col(text_col)
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL_RE))
    t1 = F.regexp_replace(text, PII_EMAIL_RE, email_token)
    n_ips = F.regexp_count(t1, F.lit(PII_IPV4_RE))
    t2 = F.regexp_replace(t1, PII_IPV4_RE, ip_token)
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE_RE))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, phone_token)
    return df.select(
        F.col(id_col),
        t3.alias("text"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


# Function-word profiles for the multi-language classifier: the most
# frequent closed-class words of each language, restricted to forms that
# survive `_simple_tokens` (ascii-ish after its [^a-z0-9]+ split — accented
# characters split words, so profiles list the unaccented fragments too
# where they are distinctive, e.g. French "tre" from "être" is NOT listed,
# but "c" from "c'est" is).  Public linguistic knowledge, hand-curated for
# mutual distinctiveness (shared Romance words like "la"/"en" appear in
# several profiles and simply contribute to each).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was",
           "for", "with", "are", "this", "have", "not", "you", "his",
           "they", "from", "she", "which", "were", "been", "their"),
    "es": ("el", "la", "de", "que", "y", "los", "del", "las", "por",
           "con", "una", "para", "es", "su", "al", "lo", "como", "mas",
           "pero", "sus", "le", "ha", "este", "cuando"),
    "fr": ("le", "la", "les", "de", "des", "du", "et", "est", "en",
           "que", "une", "dans", "qui", "pour", "pas", "sur", "plus",
           "par", "avec", "ce", "il", "au", "se", "ne", "c", "d", "l"),
    "de": ("der", "die", "und", "den", "von", "zu", "das", "mit", "sich",
           "des", "auf", "ist", "im", "dem", "nicht", "ein", "eine",
           "als", "auch", "es", "an", "werden", "aus", "er", "hat"),
    "it": ("il", "di", "che", "la", "per", "un", "del", "una", "non",
           "sono", "le", "si", "con", "della", "nel", "da", "come",
           "anche", "ma", "gli", "pi", "questo", "alla", "lo"),
    "pt": ("de", "que", "em", "um", "para", "com", "uma", "os", "no",
           "se", "na", "por", "mais", "dos", "como", "mas", "foi",
           "ele", "das", "tem", "seu", "sua", "ao", "nao", "e", "o", "a"),
    "nl": ("de", "het", "een", "van", "en", "in", "is", "dat", "op",
           "te", "zijn", "met", "voor", "niet", "aan", "er", "om",
           "ook", "als", "maar", "bij", "naar", "dan", "uit", "ze"),
}


def detect_language_multi(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_ratio: float = 0.08,
) -> DataFrame:
    """Multi-language stopword-profile classifier (langid-module capability
    over the 7 highest-volume Latin-script web languages).  Per language:
    hits = count of token POSITIONS matching its profile (repeats count —
    function words repeat, that is the signal); the argmax language wins if
    its hit ratio clears ``min_ratio``, else ``und``.  Ties break to the
    lexicographically later code (deterministic, documented).

    Returns (id, lang_pred, lang_ratio).

    Scale shape: one map-only projection — per-language hit counts are
    `size(filter(tokens, array_contains(profile, t)))` over literal arrays,
    argmax is `array_max` over (hits, code) structs; everything stays in
    whole-stage codegen, no join, no shuffle, no Python."""
    toks = _simple_tokens(F.col(text_col))
    n_toks = F.size(toks)

    def _hits(words: tuple[str, ...]) -> Column:
        profile = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(profile, t)))

    scored = F.array(
        *[
            F.struct(_hits(words).alias("h"), F.lit(code).alias("l"))
            for code, words in sorted(LANG_PROFILES.items())
        ]
    )
    best = F.array_max(scored)
    ratio = F.when(n_toks > 0, best["h"] / n_toks).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.when(ratio >= min_ratio, best["l"]).otherwise(F.lit("und")).alias(
            "lang_pred"
        ),
        F.round(ratio, 6).alias("lang_ratio"),
    )


# ---------------------------------------------------------------------------
# Gopher quality rules / C4 line-level cleaning


GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, appendix A1.1)
    as one map-only projection: per-rule boolean columns plus the combined
    ``gopher_pass``.

    Rules (reject when violated): word count outside [50, 100000]; mean
    word length outside [3, 10]; symbol-to-word ratio > 0.1 for '#' or
    '...'; > 90% of lines starting with a bullet; > 30% of lines ending
    with an ellipsis; < 80% of words containing an alphabetic character;
    fewer than two distinct Gopher stop words present.

    All higher-order column expressions (split/filter/aggregate) — no UDF,
    no shuffle; composes with :func:`repetition_stats` (A1.1's repetition
    clauses) for the full Gopher pre-filter.
    """
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    words = F.filter(words, lambda w: w != "")
    n_words = F.size(words)
    lines = F.split(text, r"\n")
    n_lines = F.size(lines)
    mean_wordlen = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n_words,
    ).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = F.size(F.split(text, r"\.\.\.|…", -1)) - 1
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[•\-\*▪●]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]")))
    lower_words = F.transform(words, lambda w: F.lower(w))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(lower_words),
            F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS]),
        )
    )
    frac = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    ok_words = (F.lit(50) <= n_words) & (n_words <= F.lit(100000))
    ok_wordlen = (F.lit(3.0) <= mean_wordlen) & (mean_wordlen <= F.lit(10.0))
    ok_symbols = (frac(n_hash, n_words) <= 0.1) & (
        frac(n_ellipsis, n_words) <= 0.1
    )
    ok_bullets = frac(bullet_lines, n_lines) <= 0.9
    ok_ellipsis_lines = frac(ellipsis_lines, n_lines) <= 0.3
    ok_alpha = frac(alpha_words, n_words) >= 0.8
    ok_stops = n_stop >= 2
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wordlen, 6).alias("mean_wordlen"),
        ok_words.alias("ok_word_count"),
        ok_wordlen.alias("ok_mean_wordlen"),
        ok_symbols.alias("ok_symbol_ratio"),
        ok_bullets.alias("ok_bullet_lines"),
        ok_ellipsis_lines.alias("ok_ellipsis_lines"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stops.alias("ok_stop_words"),
        (
            ok_words
            & ok_wordlen
            & ok_symbols
            & ok_bullets
            & ok_ellipsis_lines
            & ok_alpha
            & ok_stops
        ).alias("gopher_pass"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words_per_line: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """The C4 cleaning procedure (Raffel et al. 2020, §2.2) as one map-only
    projection: line-level retention + page-level drops.

    Lines are kept only when they end in terminal punctuation (. ! ? ")
    and contain at least ``min_words_per_line`` words; lines containing
    the word "javascript" are dropped.  Pages are dropped (``c4_keep`` =
    false) when fewer than ``min_lines`` lines survive, when the page
    contains "lorem ipsum" or a curly brace.  Returns (id, text_clean,
    n_lines_kept, c4_keep) — ``text_clean`` is the newline-join of the
    surviving lines.  (C4's three-sentence-span dedup is corpus-level:
    see ``pipeline.dedup.duplicate_spans``; its bad-word list is a
    deployment-specific input, pass pre-filtered text if needed.)
    """
    text = F.col(text_col)
    lines = F.split(text, r"\n")
    kept = F.filter(
        lines,
        lambda ln: F.rtrim(ln).rlike(r'[.!?"]$')
        & (
            F.size(F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != ""))
            >= min_words_per_line
        )
        & ~F.lower(ln).rlike(r"javascript"),
    )
    n_kept = F.size(kept)
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{") | text.contains("}")
    keep = (n_kept >= min_lines) & ~has_lorem & ~has_brace
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("text_clean"),
        n_kept.alias("n_lines_kept"),
        keep.alias("c4_keep"),
    )

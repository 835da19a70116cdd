"""Character n-gram language-model perplexity filtering — the CCNet-style
quality gate (Wenzek et al. 2020: score web pages with a small LM trained
on trusted text; keep the low-perplexity tail).  The reference engine has
no LM stage; web-scale training pipelines need one, and its Spark shape is
instructive: training is ONE groupBy over exploded n-grams, scoring is a
broadcast join + one groupBy — nothing touches Python.

Model: add-k-smoothed conditional char n-gram probabilities over a fixed
normalized alphabet (lowercased, [^a-z0-9 ] folded to space, runs
collapsed), with ``n-1`` leading ``^`` boundary marks and one trailing
``$``:

    P(c | ctx) = (count(ctx·c) + k) / (count(ctx) + k·V),  V = 38
    (a-z, 0-9, space, $ — the predictable alphabet)

Unseen gram with seen context falls back to k / (count(ctx) + k·V);
wholly unseen context falls back to uniform 1/V.  Perplexity is
exp(-mean log P) over a document's grams.

Scale shape (100 TB): the model is bounded by the alphabet (≤ 39^(n-1)·38
grams — a few MB for n=3, broadcastable even for n=5 after the vocab cap),
so scoring is explode → TWO BROADCAST left joins (gram, then context) →
one groupBy(doc).  Training shuffles once on the gram.  `vocab_cap` keeps
the head of the distribution when a larger n would overflow the broadcast
budget — dropped grams degrade to the context fallback, never to an
error.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALPHABET_V = 38  # a-z, 0-9, space, $


class CharLM(NamedTuple):
    """(gram -> logp) plus (ctx -> log-prob of an unseen continuation)."""

    grams: DataFrame  # gram string, logp double
    contexts: DataFrame  # ctx string, log_unseen double
    n: int
    add_k: float


def _normalize(col: Column) -> Column:
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " {2,}", " "
        )
    )


def _gram_explode(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram) — one row per character n-gram of the padded normalized
    text.  All JVM: substr over a sequence of positions.

    The padded text is materialized behind its own projection FIRST, so the
    transform lambda references an attribute, not the normalize expression —
    inlined, codegen re-evaluates the regexp chain at every gram position
    (O(len^2) per doc; measured 22x slower at sf0.1)."""
    padded = df.select(
        F.col(id_col).alias("id"),
        F.concat(
            F.lit("^" * (n - 1)), _normalize(F.col(text_col)), F.lit("$")
        ).alias("_padded"),
    )
    return padded.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("_padded") - (n - 1)),
                lambda i: F.substr(F.col("_padded"), i, F.lit(n)),
            )
        ).alias("gram"),
    )


def train_char_lm(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    add_k: float = 0.1,
    vocab_cap: int | None = 2_000_000,
) -> CharLM:
    """Train the smoothed char n-gram LM on a (trusted) corpus.  One
    shuffle on the gram; context counts derive from the gram counts (no
    second pass over the text).  Both model tables are persisted — they
    are vocab_cap-bounded (a few MB) and every scoring call broadcasts
    them, so without the persist each broadcast build would re-run the
    whole training lineage."""
    counts = (
        _gram_explode(df, text_col, id_col, n)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if vocab_cap is not None:
        counts = counts.orderBy(F.desc("c"), "gram").limit(vocab_cap)
    counts = counts.persist()
    ctx = (
        counts.groupBy(F.substring("gram", 1, n - 1).alias("ctx"))
        .agg(F.sum("c").alias("cc"))
        .select(
            "ctx",
            "cc",
            F.log(F.lit(add_k) / (F.col("cc") + add_k * ALPHABET_V)).alias(
                "log_unseen"
            ),
        )
    )
    grams = (
        counts.join(ctx, F.substring(counts["gram"], 1, n - 1) == ctx["ctx"])
        .select(
            "gram",
            F.log(
                (F.col("c") + add_k) / (F.col("cc") + add_k * ALPHABET_V)
            ).alias("logp"),
        )
    )
    return CharLM(grams, ctx.select("ctx", "log_unseen"), n, add_k)


def score_perplexity(
    df: DataFrame, text_col: str, id_col: str, lm: CharLM
) -> DataFrame:
    """(id, ppl, n_grams) — document perplexity under the model.  Both
    model joins are broadcast (the model is alphabet-bounded); documents
    too short to form one gram never occur (padding guarantees >= 1), but
    NULL-text documents yield no grams and are absent from the output —
    so perplexity_filter drops them, the right quality-gate default for
    undecoded pages."""
    uniform = math.log(1.0 / ALPHABET_V)
    grams = _gram_explode(df, text_col, id_col, lm.n)
    scored = (
        grams.join(F.broadcast(lm.grams), "gram", "left")
        .withColumn("ctx", F.substring("gram", 1, lm.n - 1))
        .join(F.broadcast(lm.contexts), "ctx", "left")
        .select(
            "id",
            F.coalesce(
                F.col("logp"), F.col("log_unseen"), F.lit(uniform)
            ).alias("lp"),
        )
    )
    return scored.groupBy("id").agg(
        F.exp(-F.avg("lp")).alias("ppl"),
        F.count(F.lit(1)).alias("n_grams"),
    )


def perplexity_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lm: CharLM,
    max_ppl: float,
) -> DataFrame:
    """Keep documents whose perplexity under the trusted-corpus LM is at
    most ``max_ppl`` (the CCNet head/middle cut)."""
    keep = (
        score_perplexity(df, text_col, id_col, lm)
        .filter(F.col("ppl") <= max_ppl)
        .select(F.col("id").alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")

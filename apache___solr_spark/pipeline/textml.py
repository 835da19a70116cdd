"""Text-ML streams: information-gain feature selection + logistic regression.

Re-expresses the reference's text-classification streaming expressions as
distributed DataFrame jobs:

- ``features()`` / {!igain}:
  solr/core/src/java/org/apache/solr/search/IGainTermsQParserPlugin.java
  (collector at :108-216) and
  solrj-streaming/.../io/stream/FeaturesSelectionStream.java:375-386 (idf).
  Per term t over a labeled doc set: with xc = df(t) in the positive class,
  docFreq = df(t) overall,

      score(t) = H(P) - [ docFreq/N * H(xc/docFreq)
                          + (1 - docFreq/N) * H((numPos - xc)/(N - docFreq + 1)) ]

  where H is binary entropy and the ``+ 1`` denominator is the reference's
  own smoothing (IGainTermsQParserPlugin.java:184).  Output adds
  idf = ln(N / (docFreq + 1)) exactly as FeaturesSelectionStream emits it
  for the downstream train() step.

- ``train()`` / {!tlogit}:
  solr/core/src/java/org/apache/solr/search/TextLogisticRegressionQParserPlugin.java
  (collector at :150-260) and solrj-streaming/.../io/stream/TextLogitStream.java.
  Doc vectors are [1, idf_i * (1 + ln(tf_i))] over the selected feature
  terms (docs containing NO feature term are excluded, matching the
  reference's docVectors map); one logistic-regression epoch per iteration,
  emitting per-iteration weights, total |error| against the incoming
  weights, and the confusion-matrix evaluation at the given threshold.

  DOCUMENTED DIVERGENCE: the reference applies per-doc sequential updates
  inside an epoch in HashMap iteration order — nondeterministic and
  inherently serial.  This implementation does deterministic full-batch
  gradient descent with the MEAN per-doc gradient, one update per epoch:
  the distributed-friendly formulation, and the mean (not the reference's
  implicit sum-of-steps) keeps the step magnitude independent of corpus
  size — a summed gradient would make ``alpha`` meaningless at 10^12 docs.
  Same fixed points, different trajectory.

Everything is DataFrame ops: one explode + groupBy(term) shuffle for
feature selection; train pivots the sparse design matrix ONCE into
per-doc dense feature columns and caches them, so each GD epoch is a
single exchange-free whole-stage-codegen aggregation (one row to the
driver) — the tiny weight vector rides along as literals; no .collect()
of anything unbounded.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["select_features_igain", "train_text_logit", "term_vectors", "top_features"]

_TOKEN_SPLIT = "[^a-z0-9]+"


def _size_bytes(conf_val: str) -> int:
    """Parse a Spark byte-size conf string ('134217728b', '128m', '1g')."""
    s = conf_val.strip().lower()
    mult = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    for suffix in ("kb", "mb", "gb", "b", "k", "m", "g"):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)])) * mult[suffix[0]]
    return int(float(s))


def _spread(df: DataFrame) -> DataFrame:
    """Widen tiny inputs to the cluster's parallelism before CPU-bound
    tokenize stages: heavily-compressed small parquet can yield fewer
    splits than cores, capping the regex/explode stage far below the box.

    Decides from file-level stats only (``inputFiles()`` + local sizes vs
    ``spark.sql.files.maxPartitionBytes``) — never ``df.rdd``, which forces
    a physical-plan analysis barrier per call.  Conservative: any case the
    scan would already parallelize (>= target files, remote store, unknown
    size, or total bytes large enough to split to >= target partitions) is
    a no-op with no shuffle added."""
    import os
    from urllib.parse import urlparse

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            return df
        try:
            total += os.path.getsize(p.path)
        except OSError:
            return df
    max_part = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    if total >= max_part * target:
        return df
    return df.repartition(target)


def _doc_terms(df: DataFrame, text_col: str, distinct: bool) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT), lambda x: x != ""
    )
    if distinct:
        toks = F.array_distinct(toks)
    return df.withColumn("term", F.explode(toks))


def _binary_entropy(p):
    # IGainTermsQParserPlugin.java:211-214 (0 at p in {0,1})
    return F.when((p <= 0.0) | (p >= 1.0), F.lit(0.0)).otherwise(
        -p * F.log(p) - (F.lit(1.0) - p) * F.log(F.lit(1.0) - p)
    )


def select_features_igain(
    df: DataFrame,
    text_col: str,
    outcome_col: str,
    positive_label=1,
    num_terms: int = 20,
) -> DataFrame:
    """Top ``num_terms`` terms by information gain against a binary outcome.

    Returns (term, score, doc_freq, idf) sorted score desc, term asc.
    One explode + one groupBy(term) shuffle; the corpus-level totals ride
    in via a broadcast single-row cross join, so the plan is two stages
    regardless of corpus size.
    """
    labeled = _spread(df).select(
        F.col(text_col).alias("__text"),
        (F.col(outcome_col) == F.lit(positive_label))
        .cast("int")
        .alias("__pos"),
    )
    totals = labeled.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__pos").alias("n_pos"),
    )
    per_term = (
        _doc_terms(labeled, "__text", distinct=True)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("__pos").alias("xc"),
        )
    )
    j = per_term.crossJoin(F.broadcast(totals))
    n = F.col("n_docs").cast("double")
    npos = F.col("n_pos").cast("double")
    dfreq = F.col("doc_freq").cast("double")
    xc = F.col("xc").cast("double")
    entropy_c = _binary_entropy(npos / n)
    h_contains = _binary_entropy(xc / dfreq)
    h_not = _binary_entropy((npos - xc) / (n - dfreq + F.lit(1.0)))
    score = entropy_c - (
        (dfreq / n) * h_contains + (F.lit(1.0) - dfreq / n) * h_not
    )
    return (
        j.select(
            "term",
            score.alias("score"),
            "doc_freq",
            F.log(n / (dfreq + F.lit(1.0))).alias("idf"),
        )
        .orderBy(F.col("score").desc(), F.col("term"))
        .limit(int(num_terms))
    )


def _design_matrix(
    df: DataFrame,
    text_col: str,
    outcome_col: str,
    positive_label,
    features,
    id_col: str | None = None,
) -> DataFrame:
    """Sparse (doc_id, y, term, value) rows for docs containing >= 1
    feature term; value = idf * (1 + ln(tf)) per
    TextLogisticRegressionQParserPlugin.java:193."""
    idf_map = F.create_map(
        *[
            x
            for t, idf in features
            for x in (F.lit(t), F.lit(float(idf)))
        ]
    )
    feature_terms = [t for t, _ in features]
    doc_id = (
        F.col(id_col) if id_col else F.monotonically_increasing_id()
    )
    labeled = df.select(
        doc_id.alias("__doc"),
        F.col(text_col).alias("__text"),
        (F.col(outcome_col) == F.lit(positive_label))
        .cast("double")
        .alias("y"),
    )
    tf = (
        _doc_terms(labeled, "__text", distinct=False)
        .filter(F.col("term").isin(feature_terms))
        .groupBy("__doc", "y", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.select(
        "__doc",
        "y",
        "term",
        (
            idf_map[F.col("term")]
            * (F.lit(1.0) + F.log(F.col("tf").cast("double")))
        ).alias("value"),
    )


def train_text_logit(
    df: DataFrame,
    text_col: str,
    outcome_col: str,
    features: list,
    positive_label=1,
    iterations: int = 10,
    alpha: float = 0.01,
    threshold: float = 0.5,
    id_col: str | None = None,
) -> list:
    """Train logistic regression over feature-term vectors; ``features`` is
    [(term, idf), ...] (the output of :func:`select_features_igain`).

    Returns one dict per iteration: {iteration, weights (intercept-first),
    error, truePositive_i, trueNegative_i, falsePositive_i,
    falseNegative_i} — the TextLogitStream tuple shape.  Weights live on
    the driver (num_terms + 1 doubles).

    Epoch shape: the sparse design matrix pivots ONCE into per-doc DENSE
    feature columns (k = num_terms doubles per doc — the feature count is
    query-sized) and caches; each GD epoch is then a single whole-stage-
    codegen aggregation over that cache — sigmoid/error/gradient as
    column expressions, map-side partial aggregation, ONE row to the
    driver — with no window sort, no per-term shuffle, and no exchange at
    all.  Epochs stay one-job-each because batch GD is inherently
    sequential (epoch k's gradient is a nonlinear function of epoch
    k-1's aggregated weights — there is no per-partition sufficient
    statistic spanning two epochs), matching TextLogitStream's
    per-iteration tuple emission; the per-epoch cost is one narrow agg
    over cached columnar data, so 100 epochs = 100 sub-second jobs, not
    100 shuffles.
    """
    terms = [t for t, _ in features]
    k = len(terms)
    # dense per-doc feature columns built MAP-ONLY (no explode, no
    # groupBy): tf per feature term is one JVM array count each — the
    # feature count is query-sized — and value = idf * (1 + ln tf)
    # exactly as _design_matrix computes it; docs containing no feature
    # term drop out (the reference's docVectors exclusion)
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT), lambda x: x != ""
    ).alias("__toks")
    vcols = []
    for i, (t, idf) in enumerate(features):
        tf = F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(t)))
        vcols.append(
            F.when(
                tf > 0,
                F.lit(float(idf))
                * (F.lit(1.0) + F.log(tf.cast("double"))),
            )
            .otherwise(F.lit(0.0))
            .alias(f"v{i}")
        )
    wide = (
        _spread(df).select(
            (F.col(outcome_col) == F.lit(positive_label))
            .cast("double")
            .alias("y"),
            toks,
        )
        .select("y", *vcols)
        .filter(
            " OR ".join(f"v{i} != 0.0" for i in range(k)) if k else "true"
        )
        .persist()
    )
    try:
        weights = [0.0] * (k + 1)  # [intercept, w_term...]
        out = []
        for it in range(1, iterations + 1):
            dot = F.lit(float(weights[0]))
            for i in range(k):
                dot = dot + F.lit(float(weights[i + 1])) * F.col(f"v{i}")
            sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
            err = (sig - F.col("y")).alias("err")
            rows = wide.select(
                "y",
                *[F.col(f"v{i}") for i in range(k)],
                err,
                (sig >= F.lit(float(threshold))).cast("int").alias("pred"),
            )
            y1 = F.col("y") == 1.0
            p1 = F.col("pred") == 1
            e = F.col("err")
            row = rows.agg(
                *[
                    F.sum(e * F.col(f"v{i}")).alias(f"g{i}")
                    for i in range(k)
                ],
                F.sum(e).alias("gint"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.abs(e)).alias("total_err"),
                F.sum((y1 & p1).cast("long")).alias("tp"),
                F.sum((~y1 & ~p1).cast("long")).alias("tn"),
                F.sum((~y1 & p1).cast("long")).alias("fp"),
                F.sum((y1 & ~p1).cast("long")).alias("fn"),
            ).collect()[0]
            # mean gradient: step magnitude independent of corpus size
            n_docs = float(row["n_docs"]) or 1.0
            weights[0] -= alpha * float(row["gint"]) / n_docs
            for i in range(k):
                weights[i + 1] -= (
                    alpha * float(row[f"g{i}"] or 0.0) / n_docs
                )
            out.append(
                {
                    "iteration": it,
                    "weights": list(weights),
                    "error": float(row["total_err"]),
                    "truePositive_i": int(row["tp"]),
                    "trueNegative_i": int(row["tn"]),
                    "falsePositive_i": int(row["fp"]),
                    "falseNegative_i": int(row["fn"]),
                }
            )
        return out
    finally:
        wide.unpersist()


def predict_logit(
    df: DataFrame,
    text_col: str,
    features: list,
    weights: list,
    threshold: float = 0.5,
) -> DataFrame:
    """ClassifyStream (solrj-streaming/.../io/stream/ClassifyStream.java):
    score docs with a trained model.  Adds probability_d and prediction
    columns; docs with no feature term get sigmoid(intercept)."""
    df = _spread(df)
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT), lambda x: x != ""
    )
    # tf per feature term = one array count each (~num_terms JVM array
    # scans per row, no shuffle, no UDF):
    # dot = w0 + sum_t w_t * idf_t * (1 + ln(tf_t)) over terms with tf > 0
    dot = F.lit(float(weights[0]))
    for (term, idf), w in zip(features, weights[1:]):
        tf = F.size(F.filter(toks, lambda x: x == F.lit(term)))
        dot = dot + F.when(
            tf > 0,
            F.lit(float(w))
            * F.lit(float(idf))
            * (F.lit(1.0) + F.log(tf.cast("double"))),
        ).otherwise(F.lit(0.0))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
    return df.withColumn("probability_d", prob).withColumn(
        "prediction", (prob >= F.lit(float(threshold))).cast("int")
    )


def term_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_term_length: int = 3,
    min_doc_freq: float = 0.05,
    max_doc_freq: float = 0.5,
    excludes: list[str] | None = None,
):
    """TermVectorsEvaluator (io/eval/TermVectorsEvaluator.java): tf-idf
    doc-term matrix.  Feature vocabulary = terms of length >=
    ``min_term_length`` whose doc frequency lies in
    [int(N*min_doc_freq), int(N*max_doc_freq)] (the reference removes
    ``count < min || count > max`` at :139-147; defaults 3/.05/.5 per
    :37-39); weight = sqrt(tf) * (ln((N+1)/(df+1)) + 1) (:176).

    The reference materializes every tuple driver-side into a dense
    Commons-Math matrix with HashMap-ordered (nondeterministic) columns.
    Here both passes are distributed — docfreq via explode+groupBy, tf via
    the same explode against the pruned vocabulary — and features are
    sorted ALPHABETICALLY (deterministic; documented divergence).  Each
    doc's dense vector assembles from a per-doc (term -> weight) map
    against the broadcast feature list, so the shuffle carries only
    (doc, matched-term) pairs, never |docs| x |vocab|.

    Returns ``(vectors, features, doc_freqs)``: vectors is a DataFrame
    (id_col, vector array<double>) over ALL input docs (docs matching no
    feature get the zero vector), features the ordered vocabulary,
    doc_freqs {term: df}."""
    n_docs = df.count()
    lo = int(n_docs * min_doc_freq)
    hi = int(n_docs * max_doc_freq)
    terms = _doc_terms(df.select(id_col, text_col), text_col, distinct=False)
    ok = F.length("term") >= int(min_term_length)
    for ex in excludes or []:
        ok &= ~F.col("term").contains(ex)
    terms = terms.where(ok).select(id_col, "term")

    dfreq = (
        terms.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= lo) & (F.col("df") <= hi))
    )
    feat_rows = sorted(
        (r["term"], r["df"]) for r in dfreq.collect()
    )
    features = [t for t, _ in feat_rows]
    doc_freqs = dict(feat_rows)
    idf = {
        t: math.log((n_docs + 1) / (d + 1.0)) + 1.0 for t, d in feat_rows
    }

    tf = (
        terms.where(F.col("term").isin(features))  # vocab already collected
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf_map = F.create_map(
        *[x for t in features for x in (F.lit(t), F.lit(idf[t]))]
    )
    weighted = tf.select(
        id_col,
        "term",
        (F.sqrt(F.col("tf")) * idf_map[F.col("term")]).alias("w"),
    )
    wmap = weighted.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("term", "w"))
        ).alias("_wm")
    )
    feat_arr = F.array(*[F.lit(t) for t in features])
    vectors = (
        df.select(id_col)
        .join(wmap, id_col, "left")
        .select(
            id_col,
            F.transform(
                feat_arr,
                lambda t: F.coalesce(
                    F.try_element_at(F.col("_wm"), t), F.lit(0.0)
                ),
            ).alias("vector"),
        )
    )
    return vectors, features, doc_freqs


def top_features(
    vectors: DataFrame, features: list[str], k: int, vec_col: str = "vector"
) -> DataFrame:
    """TopFeaturesEvaluator (io/eval/TopFeaturesEvaluator.java): per doc,
    the k highest-weighted POSITIVE features of its term vector, ordered
    by descending weight — pure higher-order column expressions over the
    broadcast feature-name array.  Adds a ``top_features`` array<string>
    column."""
    names = F.array(*[F.lit(t) for t in features])
    idx = F.sequence(F.lit(1), F.size(F.col(vec_col)))
    pairs = F.filter(
        F.arrays_zip(
            F.col(vec_col).alias("w"), idx.alias("i")
        ),
        lambda s: s["w"] > 0,
    )
    ranked = F.array_sort(
        pairs,
        lambda a, b: F.when(a["w"] > b["w"], -1)
        .when(a["w"] < b["w"], 1)
        .otherwise(0),
    )
    return vectors.withColumn(
        "top_features",
        F.transform(
            F.slice(ranked, 1, int(k)),
            lambda s: F.element_at(names, s["i"].cast("int")),
        ),
    )

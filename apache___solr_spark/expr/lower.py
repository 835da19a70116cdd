"""Lower parsed streaming expressions to Spark DataFrame plans.

The reference evaluates expressions as a volcano pull-dataflow over sorted
tuple iterators (solr/solrj-streaming/.../io/stream/*.java, registry in
io/Lang.java:338-418).  Here each function name lowers to the matching
DataFrame combinator from :mod:`apache___solr_spark.operators.streams`, so
an expression string a reference user runs today becomes one lazy Catalyst
plan: joins pick broadcast/sort-merge physically, rollups get map-side
partial aggregation, ``top`` compiles to TakeOrderedAndProject.

Supported function surface (names as registered in Lang.java):

  search facet facet2D timeseries significantTerms stats
  rollup hashRollup having select sort top unique merge list null
  innerJoin leftOuterJoin fullOuterJoin hashJoin outerHashJoin
  intersect complement fetch cartesianProduct let get knnSearch
  update commit drill input features train classify
  metrics: sum min max avg count countDist std per
  boolean evaluators (having): eq gt gte lt lte and or not isNull notNull
  plus eval-passthroughs: plist parallel echo tuple

``search`` q-syntax over structured collections supports the common subset
(``*:*``, ``field:value``, quoted values, ``field:[a TO b]`` /
``{a TO b}`` ranges with ``*`` endpoints, ``field:(v1 v2)`` OR groups,
``AND``/whitespace conjunction, ``-`` negation).  Full-text collections
registered with a :class:`~apache___solr_spark.query.engine.SearchEngine`
route ``q`` through the real BM25 engine instead.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache___solr_spark.expr.parser import (
    NamedParam,
    StreamExpression,
    parse_expression,
)
from apache___solr_spark.operators import streams as S
from apache___solr_spark.query.structured import (
    coerce_literal as _coerce,
    structured_q_predicate,
)

_METRICS = {"sum", "min", "max", "avg", "count", "countDist", "std", "per"}
_BOOL_EVALS = {"eq", "gt", "gte", "lt", "lte", "and", "or", "not", "isNull", "notNull"}


def _sort_cols(spec: str) -> list:
    """``"a asc, b desc"`` -> [col(a).asc(), col(b).desc()].  Metric
    identifiers like ``sum(x)`` are plain column names here (the rollup
    aliased them so)."""
    cols = []
    for part in _split_commas_outside_parens(spec):
        part = part.strip()
        if not part:
            continue
        m = re.match(r"^(.*?)\s+(asc|desc|ASC|DESC)$", part)
        if m:
            name, direction = m.group(1).strip(), m.group(2).lower()
        else:
            name, direction = part, "asc"
        c = F.col(name)
        cols.append(c.asc() if direction == "asc" else c.desc())
    return cols


def _split_commas_outside_parens(s: str) -> list[str]:
    parts, depth, buf = [], 0, []
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
    parts.append("".join(buf))
    return parts


def _on_pairs(spec: str) -> list[tuple[str, str]]:
    """``"a=b, k"`` -> [(a, b), (k, k)] (JoinStream on-spec semantics)."""
    pairs = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            l, r = part.split("=", 1)
            pairs.append((l.strip(), r.strip()))
        else:
            pairs.append((part, part))
    return pairs


def _align_right(right: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Rename right-side join keys to the left-side names."""
    for l, r in pairs:
        if l != r:
            right = right.withColumnRenamed(r, l)
    return right


class StreamFactory:
    """Evaluate streaming-expression strings against named collections.

    ``tables`` maps collection name -> DataFrame (or use ``sf_dir`` to read
    ``<sf_dir>/<name>.parquet`` lazily).  ``engines`` maps collection name
    -> SearchEngine for full-text ``search()``.
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
        sf_dir: str | None = None,
        engines: dict | None = None,
        output_dir: str | None = None,
    ) -> None:
        self.spark = spark
        self.tables = dict(tables or {})
        self.sf_dir = sf_dir
        self.engines = dict(engines or {})
        self.output_dir = output_dir

    # -- public -----------------------------------------------------------

    def df(self, expression: str | StreamExpression) -> DataFrame:
        expr = (
            expression
            if isinstance(expression, StreamExpression)
            else parse_expression(expression)
        )
        return self._lower(expr)

    # -- collections ------------------------------------------------------

    def _collection(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.tables[name]
        if self.sf_dir is not None:
            import os

            path = os.path.join(self.sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                df = self.spark.read.parquet(path)
                self.tables[name] = df
                return df
        raise KeyError(f"unknown collection {name!r}")

    # -- search -----------------------------------------------------------

    def _search_base(self, expr: StreamExpression) -> DataFrame:
        """Shared collection + q/fq handling for search-rooted functions."""
        pos = expr.positionals()
        name = pos[0] if pos and isinstance(pos[0], str) else None
        if name is None:
            raise ValueError(f"{expr.name}() needs a collection name")
        q = expr.named("q", "*:*")
        if name in self.engines and isinstance(q, str) and q not in ("", "*:*"):
            k = int(expr.named("rows", 10))
            return self.engines[name].search(q, k=k)
        df = self._collection(name)
        pred = structured_q_predicate(q) if isinstance(q, str) else None
        if pred is not None:
            df = df.filter(pred)
        fq = expr.named("fq")
        if fq:
            fq_pred = structured_q_predicate(fq)
            if fq_pred is not None:
                df = df.filter(fq_pred)
        return df

    # -- metrics & boolean evaluators --------------------------------------

    def _metric(self, e: StreamExpression) -> tuple[str, object]:
        args = [p for p in e.params if isinstance(p, str)]
        ident = f"{e.name}({','.join(args)})"
        if e.name == "count":
            col = (
                F.count(F.lit(1))
                if not args or args[0] == "*"
                else F.count(F.col(args[0]))
            )
        elif e.name == "sum":
            col = F.sum(args[0])
        elif e.name == "min":
            col = F.min(args[0])
        elif e.name == "max":
            col = F.max(args[0])
        elif e.name == "avg":
            col = F.avg(args[0])
        elif e.name == "countDist":
            col = F.count_distinct(F.col(args[0]))
        elif e.name == "std":
            col = F.stddev_samp(args[0])
        elif e.name == "per":
            col = F.expr(f"percentile({args[0]}, {float(args[1]) / 100.0})")
        else:
            raise ValueError(f"unknown metric {e.name}")
        return ident, col

    def _metrics_of(self, expr: StreamExpression) -> dict:
        aggs = {}
        for p in expr.params:
            if isinstance(p, StreamExpression) and p.name in _METRICS:
                ident, col = self._metric(p)
                aggs[ident] = col
        return aggs

    def _operand_col(self, p):
        if isinstance(p, StreamExpression):
            if p.name in _METRICS:
                # a metric inside having() references the column the
                # upstream rollup aliased to the metric identifier
                ident, _ = self._metric(p)
                return F.col(ident)
            return self._bool_eval(p)
        v = _coerce(p)
        return F.lit(v) if isinstance(v, (int, float)) and not _looks_field(p) else F.col(p)

    def _bool_eval(self, e: StreamExpression):
        """HavingStream boolean evaluators (io/eval/, registry
        Lang.java:421+): eq/gt/... over fields, literals, nested ands."""
        n = e.name
        if n in ("and", "or"):
            cols = [self._bool_eval(p) for p in e.sub_expressions()]
            out = cols[0]
            for c in cols[1:]:
                out = (out & c) if n == "and" else (out | c)
            return out
        if n == "not":
            return ~self._bool_eval(e.sub_expressions()[0])
        if n in ("isNull", "notNull"):
            fldp = e.positionals()[0]
            c = F.col(fldp)
            return c.isNull() if n == "isNull" else c.isNotNull()
        if n in ("eq", "gt", "gte", "lt", "lte"):
            ops = e.params
            a, b = self._operand_col(ops[0]), self._operand_col(ops[1])
            return {
                "eq": a == b,
                "gt": a > b,
                "gte": a >= b,
                "lt": a < b,
                "lte": a <= b,
            }[n]
        raise ValueError(f"unknown boolean evaluator {n}")

    # -- lowering ----------------------------------------------------------

    def _streams_in(self, expr: StreamExpression) -> list[DataFrame]:
        return [
            self._lower(p)
            for p in expr.params
            if isinstance(p, StreamExpression)
            and p.name not in _METRICS
            and p.name not in _BOOL_EVALS
        ]

    def _lower(self, expr: StreamExpression) -> DataFrame:
        fn = _FUNCTIONS.get(expr.name)
        if fn is None:
            raise NotImplementedError(
                f"streaming function {expr.name!r} is not implemented; "
                f"supported: {sorted(_FUNCTIONS)}"
            )
        return fn(self, expr)


def _looks_field(s) -> bool:
    return isinstance(s, str) and bool(re.match(r"^[A-Za-z_][\w.]*$", s))


# ---- per-function lowerings --------------------------------------------------


def _fn_search(f: StreamFactory, e: StreamExpression) -> DataFrame:
    df = f._search_base(e)
    fl = e.named("fl")
    if fl:
        df = df.select(*[c.strip() for c in fl.split(",") if c.strip()])
    sort = e.named("sort")
    if sort:
        df = df.orderBy(*_sort_cols(sort))
    rows = e.named("rows")
    if rows is not None:
        df = df.limit(int(rows))
    return df


def _fn_rollup(f: StreamFactory, e: StreamExpression) -> DataFrame:
    (src,) = f._streams_in(e)
    over = [c.strip() for c in e.named("over", "").split(",") if c.strip()]
    return S.rollup(src, over, f._metrics_of(e))


def _fn_stats(f: StreamFactory, e: StreamExpression) -> DataFrame:
    srcs = f._streams_in(e)
    src = srcs[0] if srcs else f._search_base(e)
    return S.stats(src, f._metrics_of(e))


def _fn_facet(f: StreamFactory, e: StreamExpression) -> DataFrame:
    src = f._search_base(e)
    buckets = [c.strip() for c in e.named("buckets", "").split(",") if c.strip()]
    aggs = f._metrics_of(e)
    if not aggs:
        aggs = {"count(*)": F.count(F.lit(1))}
    out = src.groupBy(*buckets).agg(*[c.alias(n) for n, c in aggs.items()])
    sorts = e.named("bucketSorts", f"{next(iter(aggs))} desc")
    order = _sort_cols(sorts) + [F.col(b).asc() for b in buckets]
    limit = int(e.named("bucketSizeLimit", 10))
    return out.orderBy(*order).limit(limit)


def _fn_facet2d(f: StreamFactory, e: StreamExpression) -> DataFrame:
    src = f._search_base(e)
    dims = [int(d) for d in e.named("dimensions", "10,10").split(",")]
    aggs = f._metrics_of(e)
    agg = next(iter(aggs.values())) if aggs else None
    return S.facet2d(src, e.named("x"), e.named("y"), dims[0], dims[1], agg)


_GAP_RE = re.compile(r"^\+?(\d+)(SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|YEAR)S?$")


def _fn_timeseries(f: StreamFactory, e: StreamExpression) -> DataFrame:
    src = f._search_base(e)
    field = e.named("field")
    start, end = e.named("start"), e.named("end")
    c = F.col(field)
    if start:
        src = src.filter(c >= F.to_timestamp(F.lit(start)))
    if end:
        src = src.filter(c < F.to_timestamp(F.lit(end)))
    m = _GAP_RE.match(e.named("gap", "+1DAY").upper())
    if not m:
        raise ValueError(f"bad gap {e.named('gap')!r} (use +NDAY/+NHOUR/...)")
    n, unit = int(m.group(1)), m.group(2).lower()
    if unit in ("month", "year"):
        # Calendar units: window() can't express them.  +1MONTH/+1YEAR with
        # no anchor truncates to the calendar boundary; +nMONTH/+nYEAR
        # buckets step from start= by whole months (Solr's DateMathParser
        # gap arithmetic: month addition clamps the day-of-month, which is
        # exactly add_months/year-month-interval semantics).
        months = n * (12 if unit == "year" else 1)
        aggs = f._metrics_of(e)
        if months in (1, 12) and not start:
            src = src.withColumn("_w", F.date_trunc(unit, c))
        else:
            if not start:
                raise ValueError(
                    f"gap +{n}{unit.upper()}S needs start= to anchor buckets"
                )
            s = F.to_timestamp(F.lit(start))

            def bnd(i):  # boundary timestamp of bucket index i
                return s + F.make_interval(F.lit(0), i * F.lit(months))

            # months_between mis-estimates by <1 month near clamped
            # month-ends (start Jan 30 -> boundary Feb 29), so correct the
            # floor guess by +-1 against the real interval boundaries.
            guess = F.floor(
                F.months_between(c, s, roundOff=False) / months
            ).cast("int")
            idx = (
                F.when(c < bnd(guess), guess - 1)
                .when(c >= bnd(guess + 1), guess + 1)
                .otherwise(guess)
            )
            src = src.withColumn("_w", bnd(idx))
        return (
            src.groupBy(F.col("_w").alias("window_start"))
            .agg(*[col.alias(nme) for nme, col in aggs.items()])
            .orderBy("window_start")
        )
    return S.timeseries(src, field, f"{n} {unit}", f._metrics_of(e))


def _fn_significant(f: StreamFactory, e: StreamExpression) -> DataFrame:
    name = e.positionals()[0]
    bg = f._collection(name)
    fg = f._search_base(e)
    return S.significant_terms(
        fg,
        bg,
        e.named("field"),
        min_doc_freq=int(e.named("minDocFreq", 1)),
        limit=int(e.named("limit", 10)),
    )


def _join_fn(kind: str) -> Callable:
    def run(f: StreamFactory, e: StreamExpression) -> DataFrame:
        pairs = _on_pairs(e.named("on", ""))
        keys = [l for l, _ in pairs]
        if kind in ("hashJoin", "outerHashJoin"):
            hashed_expr = e.named("hashed")
            probes = f._streams_in(e)
            probe = probes[0]
            hashed = f.df(hashed_expr) if hashed_expr is not None else probes[1]
            hashed = _align_right(hashed, pairs)
            op = S.hash_join if kind == "hashJoin" else S.outer_hash_join
            return op(probe, hashed, keys)
        left, right = f._streams_in(e)
        right = _align_right(right, pairs)
        op = {
            "innerJoin": S.inner_join,
            "leftOuterJoin": S.left_outer_join,
            "fullOuterJoin": S.full_outer_join,
            "intersect": S.intersect,
            "complement": S.complement,
        }[kind]
        return op(left, right, keys)

    return run


def _fn_fetch(f: StreamFactory, e: StreamExpression) -> DataFrame:
    name = e.positionals()[0]
    lookup = f._collection(name)
    (src,) = f._streams_in(e)
    pairs = _on_pairs(e.named("on", ""))
    lookup = _align_right(lookup, pairs)
    fields = [c.strip() for c in e.named("fl", "").split(",") if c.strip()]
    return S.fetch(src, lookup, [l for l, _ in pairs], fields)


def _fn_having(f: StreamFactory, e: StreamExpression) -> DataFrame:
    (src,) = f._streams_in(e)
    evals = [
        p
        for p in e.params
        if isinstance(p, StreamExpression) and p.name in _BOOL_EVALS
    ]
    return S.having(src, f._bool_eval(evals[0]))


def _fn_select(f: StreamFactory, e: StreamExpression) -> DataFrame:
    (src,) = f._streams_in(e)
    cols = []
    for p in e.positionals():
        if not isinstance(p, str):
            continue
        m = re.match(r"^(.*?)\s+as\s+(\S+)$", p, re.IGNORECASE)
        if m:
            cols.append(F.col(m.group(1).strip()).alias(m.group(2)))
        else:
            cols.append(F.col(p))
    return src.select(*cols) if cols else src


def _fn_sort(f: StreamFactory, e: StreamExpression) -> DataFrame:
    (src,) = f._streams_in(e)
    return S.sort_stream(src, *_sort_cols(e.named("by", "")))


def _fn_top(f: StreamFactory, e: StreamExpression) -> DataFrame:
    (src,) = f._streams_in(e)
    return S.top(src, int(e.named("n", 10)), *_sort_cols(e.named("sort", "")))


def _fn_unique(f: StreamFactory, e: StreamExpression) -> DataFrame:
    (src,) = f._streams_in(e)
    over = [c.strip() for c in e.named("over", "").split(",") if c.strip()]
    return S.unique(src, over)


def _fn_merge(f: StreamFactory, e: StreamExpression) -> DataFrame:
    out = S.merge(*f._streams_in(e))
    on = e.named("on")
    return S.sort_stream(out, *_sort_cols(on)) if on else out


def _fn_list(f: StreamFactory, e: StreamExpression) -> DataFrame:
    dfs = f._streams_in(e)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def _fn_cartesian(f: StreamFactory, e: StreamExpression) -> DataFrame:
    (src,) = f._streams_in(e)
    field = next(p for p in e.positionals() if isinstance(p, str))
    return S.cartesian_product(src, field)


def _fn_null(f: StreamFactory, e: StreamExpression) -> DataFrame:
    (src,) = f._streams_in(e)
    return src.agg(F.count(F.lit(1)).alias("nullCount"))


def _fn_passthrough(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """parallel()/plist(): Spark owns partitioned execution, so these lower
    to their inner stream (ParallelStream.java:40-49 is scatter-gather
    plumbing a shuffle engine doesn't need)."""
    (src,) = f._streams_in(e)
    return src


def _fn_drill(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """drill() (DrillStream.java): run an aggregating expression over each
    shard's sorted /export stream, then merge partials.  Spark already
    executes the inner plan per-partition with map-side partial aggregation
    and one merge shuffle, so lowering = bind the export stream as the
    ``input()`` placeholder and evaluate the inner expression once."""
    src = f._search_base(e)
    fl = e.named("fl")
    if fl:
        src = src.select(*[c.strip() for c in fl.split(",") if c.strip()])
    sort = e.named("sort")
    if sort:
        src = src.orderBy(*_sort_cols(sort))
    f.tables["__drill_input__"] = src
    inner = [
        p
        for p in e.sub_expressions()
        if p.name not in _METRICS and p.name not in _BOOL_EVALS
    ]
    if not inner:
        return src
    return f._lower(inner[-1])


def _fn_input(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """input() — the drill() per-shard stream placeholder (DrillStream)."""
    if "__drill_input__" not in f.tables:
        raise ValueError("input() is only valid inside drill()")
    return f.tables["__drill_input__"]


def _fn_update(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """update() (UpdateStream.java): index the inner stream into the named
    destination collection.  The destination becomes a queryable collection
    in this factory; with ``output_dir`` set it is also written as parquet
    (the durable-sink analog of the reference's /update handler).  Returns
    the reference's tuple shape: one row with batchIndexed/totalIndexed."""
    dest = next(p for p in e.positionals() if isinstance(p, str))
    (src,) = f._streams_in(e)
    if f.output_dir is not None:
        import os

        path = os.path.join(f.output_dir, f"{dest}.parquet")
        src.write.mode("overwrite").parquet(path)
        out = f.spark.read.parquet(path)
    else:
        out = src.cache()
    f.tables[dest] = out
    n = out.count()
    return f.spark.createDataFrame(
        [(n, n)], "batchIndexed bigint, totalIndexed bigint"
    )


def _fn_commit(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """commit() (CommitStream.java): wraps an update() stream.  Parquet
    writes are atomic at job commit, so this passes its inner stream's
    result through (no separate fsync step exists to perform)."""
    (src,) = f._streams_in(e)
    return src


def _fn_let(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """let() (LetStream.java): bind named streams as variables, then
    evaluate the trailing stream — variables become named collections, so
    ``get(a)``/``search(a, ...)`` see them."""
    last = None
    for p in e.params:
        if isinstance(p, NamedParam) and isinstance(p.value, StreamExpression):
            f.tables[p.name] = f._lower(p.value)
        elif isinstance(p, StreamExpression):
            last = f._lower(p)
    if last is None:
        raise ValueError("let() needs a trailing stream to evaluate")
    return last


def _fn_get(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """get() (GetStream.java): read back a let()-bound variable."""
    return f._collection(e.positionals()[0])


def _fn_knn_search(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """knnSearch() (KnnStream.java / {!knn} dense-vector top-k): exact
    cosine top-k against a literal query vector — lowers to the scan ->
    project(cosine) -> TakeOrderedAndProject brute-force baseline."""
    from apache___solr_spark.pipeline.similarity import cosine_topk_bruteforce

    df = f._search_base(e)
    vec = [float(x) for x in e.named("vec", "").strip("[] ").split(",")]
    return cosine_topk_bruteforce(
        df,
        vec,
        k=int(e.named("k", 10)),
        vec_col=e.named("field", "embedding"),
        id_col=e.named("idField", "vec_id"),
    )


def _fn_features(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """features() (FeaturesSelectionStream.java:339-386 / {!igain},
    IGainTermsQParserPlugin.java): information-gain term selection over a
    labeled collection; tuple shape index_i/term_s/score_f/idf_d."""
    from apache___solr_spark.pipeline.textml import select_features_igain

    df = f._search_base(e)
    sel = select_features_igain(
        df,
        text_col=e.named("field", "text"),
        outcome_col=e.named("outcome", "out_i"),
        positive_label=_coerce(e.named("positiveLabel", "1")),
        num_terms=int(e.named("numTerms", 20)),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("term"))
    return sel.select(
        F.row_number().over(w).alias("index_i"),
        F.col("term").alias("term_s"),
        F.col("score").alias("score_f"),
        F.col("idf").alias("idf_d"),
        F.lit(e.named("featureSet", "fSet")).alias("featureSet_s"),
    )


def _fn_train(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """train() (TextLogitStream.java / {!tlogit}): logistic regression over
    feature-term vectors; one tuple per iteration with weights_ds/error_d/
    confusion counts (terms_ss/idfs_ds carried for classify())."""
    from apache___solr_spark.pipeline.textml import (
        select_features_igain,
        train_text_logit,
    )

    df = f._search_base(e)
    text_col = e.named("field", "text")
    outcome = e.named("outcome", "out_i")
    positive = _coerce(e.named("positiveLabel", "1"))
    feats_src = f._streams_in(e)
    if feats_src:
        frows = feats_src[0].collect()  # numTerms rows, driver-tiny
        feats = [(r["term_s"], r["idf_d"]) for r in frows]
    else:
        feats = [
            (r["term"], r["idf"])
            for r in select_features_igain(
                df, text_col, outcome, positive,
                num_terms=int(e.named("numTerms", 20)),
            ).collect()
        ]
    iters = train_text_logit(
        df,
        text_col,
        outcome,
        feats,
        positive_label=positive,
        iterations=int(e.named("maxIterations", 10)),
        alpha=float(e.named("alpha", 0.01)),
        threshold=float(e.named("threshold", 0.5)),
    )
    name = e.named("name", "model")
    rows = [
        (
            name,
            it["iteration"],
            [t for t, _ in feats],
            [i for _, i in feats],
            it["weights"],
            it["error"],
            it["truePositive_i"],
            it["trueNegative_i"],
            it["falsePositive_i"],
            it["falseNegative_i"],
        )
        for it in iters
    ]
    return f.spark.createDataFrame(
        rows,
        "name_s string, iteration_i int, terms_ss array<string>, "
        "idfs_ds array<double>, weights_ds array<double>, error_d double, "
        "truePositive_i int, trueNegative_i int, falsePositive_i int, "
        "falseNegative_i int",
    )


def _fn_classify(f: StreamFactory, e: StreamExpression) -> DataFrame:
    """classify() (ClassifyStream.java): score a doc stream with a trained
    model — substreams are (model, docs); the model's LAST iteration tuple
    supplies terms/idfs/weights.  Adds probability_d + prediction_i."""
    from apache___solr_spark.pipeline.textml import predict_logit

    subs = f._streams_in(e)
    if len(subs) != 2:
        raise ValueError("classify(model-stream, docs-stream) needs 2 streams")
    model_df, docs = subs
    last = model_df.orderBy(F.col("iteration_i").desc()).limit(1).collect()[0]
    feats = list(zip(last["terms_ss"], last["idfs_ds"]))
    scored = predict_logit(
        docs,
        e.named("field", "text"),
        feats,
        list(last["weights_ds"]),
        threshold=float(e.named("threshold", 0.5)),
    )
    return scored.withColumnRenamed("prediction", "prediction_i")


def _fn_echo(f: StreamFactory, e: StreamExpression) -> DataFrame:
    msg = e.positionals()[0]
    return f.spark.createDataFrame([(msg,)], "echo string")


def _fn_tuple(f: StreamFactory, e: StreamExpression) -> DataFrame:
    vals = {}
    for p in e.params:
        if isinstance(p, NamedParam) and isinstance(p.value, str):
            vals[p.name] = _coerce(p.value)
    fields = ", ".join(
        f"{k} {'double' if isinstance(v, float) else 'bigint' if isinstance(v, int) else 'string'}"
        for k, v in vals.items()
    )
    return f.spark.createDataFrame([tuple(vals.values())], fields)


_FUNCTIONS: dict[str, Callable] = {
    "search": _fn_search,
    "rollup": _fn_rollup,
    "hashRollup": _fn_rollup,
    "stats": _fn_stats,
    "facet": _fn_facet,
    "facet2D": _fn_facet2d,
    "timeseries": _fn_timeseries,
    "significantTerms": _fn_significant,
    "innerJoin": _join_fn("innerJoin"),
    "leftOuterJoin": _join_fn("leftOuterJoin"),
    "fullOuterJoin": _join_fn("fullOuterJoin"),
    "hashJoin": _join_fn("hashJoin"),
    "outerHashJoin": _join_fn("outerHashJoin"),
    "intersect": _join_fn("intersect"),
    "complement": _join_fn("complement"),
    "fetch": _fn_fetch,
    "having": _fn_having,
    "select": _fn_select,
    "sort": _fn_sort,
    "top": _fn_top,
    "unique": _fn_unique,
    "merge": _fn_merge,
    "list": _fn_list,
    "cartesianProduct": _fn_cartesian,
    "null": _fn_null,
    "parallel": _fn_passthrough,
    "plist": _fn_passthrough,
    "echo": _fn_echo,
    "tuple": _fn_tuple,
    "let": _fn_let,
    "get": _fn_get,
    "knnSearch": _fn_knn_search,
    "features": _fn_features,
    "train": _fn_train,
    "classify": _fn_classify,
    "update": _fn_update,
    "commit": _fn_commit,
    "drill": _fn_drill,
    "input": _fn_input,
}

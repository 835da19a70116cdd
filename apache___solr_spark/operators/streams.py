"""Relational dataflow operators: Solr streaming expressions as DataFrame
combinators.

The reference's "streaming expressions" (solr/solrj-streaming/src/java/org/
apache/solr/client/solrj/io/stream/) form a volcano-style pull dataflow over
sorted tuple iterators.  Spark's lazy DataFrames subsume the iterator model
(whole-stage codegen pipelines), so each operator here is a thin, documented
combinator that builds the equivalent logical plan and lets Catalyst pick
the physical strategy:

- merge joins (InnerJoinStream.java) -> sort-merge join
- hashJoin (HashJoinStream.java:46-291) -> broadcast hash join
- rollup/hashRollup (RollupStream.java:216, HashRollupStream.java) ->
  hash aggregate with partial (map-side) aggregation for free
- parallel() (ParallelStream.java:40-49) -> Spark's own partitioned
  execution; never re-implemented.

Keeping these as functions (not a class hierarchy) is deliberate: the
reference's open/read/close plumbing is runtime machinery Spark already has.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


# ---- projection / filtering -------------------------------------------------


def select_stream(df: DataFrame, *cols: Column | str, **renames: str) -> DataFrame:
    """select() stream: projection + rename (SelectStream.java, 369 LoC)."""
    out = df.select(*cols) if cols else df
    for new, old in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def having(df: DataFrame, predicate: Column | str) -> DataFrame:
    """having() stream: predicate over (usually aggregated) tuples
    (HavingStream.java, 184 LoC)."""
    return df.where(predicate)


# ---- joins ------------------------------------------------------------------


def inner_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """innerJoin() merge join (InnerJoinStream.java; base JoinStream.java:245).
    Catalyst picks sort-merge for large sides — the same algorithm the
    reference requires pre-sorted inputs for, minus the manual sorting."""
    return left.join(right, list(on), "inner")


def left_outer_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """leftOuterJoin() stream (LeftOuterJoinStream.java)."""
    return left.join(right, list(on), "left_outer")


def full_outer_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """fullOuterJoin() stream (FullOuterJoinStream.java)."""
    return left.join(right, list(on), "full_outer")


def hash_join(
    probe: DataFrame, hashed: DataFrame, on: Sequence[str]
) -> DataFrame:
    """hashJoin() stream (HashJoinStream.java:46,54,233-291): build a hash map
    on the ``hashed`` input, stream the probe side.  Spark-first: broadcast
    the hashed side so no shuffle touches the probe stream."""
    return probe.join(F.broadcast(hashed), list(on), "inner")


def outer_hash_join(
    probe: DataFrame, hashed: DataFrame, on: Sequence[str]
) -> DataFrame:
    """outerHashJoin() stream (OuterHashJoinStream.java)."""
    return probe.join(F.broadcast(hashed), list(on), "left_outer")


def fetch(
    stream: DataFrame, lookup: DataFrame, on: Sequence[str], fields: Sequence[str]
) -> DataFrame:
    """fetch() stream (FetchStream.java, 345 LoC): batched lookup join that
    enriches tuples with extra fields from a collection."""
    keep = lookup.select(*list(on), *list(fields))
    return stream.join(F.broadcast(keep), list(on), "left_outer")


def intersect(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """intersect() stream (IntersectStream.java, 231 LoC): keep left tuples
    whose key appears in right — a semi-join, not a set intersect."""
    return left.join(right.select(*list(on)), list(on), "left_semi")


def complement(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """complement() stream (ComplementStream.java, 229 LoC): left tuples whose
    key does NOT appear in right — an anti-join."""
    return left.join(right.select(*list(on)), list(on), "left_anti")


def cartesian_product(df: DataFrame, field: str, alias: str | None = None) -> DataFrame:
    """cartesianProduct() stream (CartesianProductStream.java, 359 LoC):
    unnest a multivalued field into N tuples."""
    return df.withColumn(alias or field, F.explode(F.col(field)))


# ---- aggregation ------------------------------------------------------------


def rollup(
    df: DataFrame, over: Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    """rollup()/hashRollup() streams (RollupStream.java:216,
    HashRollupStream.java): group-by + metric accumulators.  The
    sorted-vs-hashed distinction is physical and Spark owns it (hash agg
    with spill); partial aggregation (the reference's parallel()+rollup
    merge, ParallelMetricsRollup.java) is automatic."""
    return df.groupBy(*over).agg(*[c.alias(n) for n, c in aggs.items()])


def stats(df: DataFrame, aggs: dict[str, Column]) -> DataFrame:
    """stats() stream (StatsStream.java, 441 LoC): whole-input aggregates."""
    return df.agg(*[c.alias(n) for n, c in aggs.items()])


def facet(
    df: DataFrame,
    field: str | Sequence[str],
    aggs: dict[str, Column] | None = None,
    limit: int = 10,
    sort_by: str = "count",
    ascending: bool = False,
) -> DataFrame:
    """terms facet / facet() stream (FacetFieldProcessorByArrayDV.java:42,
    FacetStream.java:690): bucket by field value(s), aggregate, top-N
    buckets.  Exact — no shard refinement needed (FacetModule.java's
    overrequest/refine dance is an approximation artifact of scatter-gather
    that a shuffle-based engine doesn't have)."""
    fields = [field] if isinstance(field, str) else list(field)
    aggs = dict(aggs or {})
    if "count" not in aggs:
        aggs["count"] = F.count(F.lit(1))
    # docs without the facet field form no bucket (docValues iteration
    # skips them in the reference) — Spark's groupBy would emit a null key
    for f in fields:
        df = df.filter(F.col(f).isNotNull())
    out = df.groupBy(*fields).agg(*[c.alias(n) for n, c in aggs.items()])
    key = F.col(sort_by)
    order = [key.asc() if ascending else key.desc()] + [F.col(f).asc() for f in fields]
    return out.orderBy(*order).limit(limit)


def facet2d(
    df: DataFrame,
    x: str,
    y: str,
    dim_x: int,
    dim_y: int,
    agg: Column | None = None,
) -> DataFrame:
    """facet2D() stream (Facet2DStream.java, 533 LoC): top dimX values of x,
    and per x-bucket the top dimY values of y.  Docs missing either
    dimension form no bucket (same docValues-skip semantics as facet())."""
    agg = agg if agg is not None else F.count(F.lit(1))
    counts = (
        df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
        .groupBy(x, y)
        .agg(agg.alias("agg"))
    )
    top_x = (
        counts.groupBy(x)
        .agg(F.sum("agg").alias("_tot"))
        .orderBy(F.col("_tot").desc(), F.col(x).asc())
        .limit(dim_x)
        .select(x)
    )
    w = Window.partitionBy(x).orderBy(F.col("agg").desc(), F.col(y).asc())
    return (
        counts.join(F.broadcast(top_x), [x], "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= dim_y)
        .drop("_rn")
    )


def range_facet(
    df: DataFrame,
    field: str,
    start: float,
    end: float,
    gap: float,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """range facet (FacetRangeProcessor.java:51): bucket numeric values into
    [start+i*gap, start+(i+1)*gap) bins; values outside [start,end) dropped
    (the reference's before/after buckets are separate queries)."""
    aggs = dict(aggs or {"count": F.count(F.lit(1))})
    bucket = F.floor((F.col(field) - F.lit(start)) / F.lit(gap)).cast("long")
    return (
        df.filter((F.col(field) >= start) & (F.col(field) < end))
        .withColumn("bucket_start", (F.lit(start) + bucket * F.lit(gap)))
        .groupBy("bucket_start")
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .orderBy("bucket_start")
    )


def timeseries(
    df: DataFrame,
    ts_field: str,
    gap: str,
    aggs: dict[str, Column],
) -> DataFrame:
    """timeseries() stream (TimeSeriesStream.java:53,59): date-range facet
    with a gap — tumbling time windows via window()/date_trunc.  Docs with
    a null timestamp form no window (the reference's range facet skips
    them)."""
    w = F.window(F.col(ts_field), gap)
    return (
        df.filter(F.col(ts_field).isNotNull())
        .groupBy(w.alias("w"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(F.col("w.start").alias("window_start"), *aggs.keys())
        .orderBy("window_start")
    )


def significant_terms(
    fg: DataFrame, bg: DataFrame, term_col: str, min_doc_freq: int = 1, limit: int = 10
) -> DataFrame:
    """significantTerms() stream (SignificantTermsStream.java, 438 LoC):
    terms over-represented in the foreground set vs the background corpus,
    scored by foreground/background frequency ratio."""
    n_fg = fg.count()
    n_bg = bg.count()
    fg_counts = fg.groupBy(term_col).agg(F.count(F.lit(1)).alias("fg_count"))
    bg_counts = bg.groupBy(term_col).agg(F.count(F.lit(1)).alias("bg_count"))
    return (
        fg_counts.join(bg_counts, term_col)
        .filter(F.col("bg_count") >= min_doc_freq)
        .withColumn(
            "score",
            (F.col("fg_count") / F.lit(float(n_fg)))
            / (F.col("bg_count") / F.lit(float(n_bg))),
        )
        .orderBy(F.col("score").desc(), F.col(term_col).asc())
        .limit(limit)
    )


# ---- grouping / collapse ----------------------------------------------------


def collapse(
    df: DataFrame,
    group_by: str,
    order_by: Sequence[Column],
    null_policy: str = "ignore",
) -> DataFrame:
    """CollapsingQParserPlugin (search/CollapsingQParserPlugin.java:121,
    3812 LoC of custom collector): keep the single best tuple per group.
    Spark-first this is one window function.  ``null_policy`` is the
    reference's nullPolicy param for docs with a null collapse field:
    ``ignore`` drops them (reference default), ``expand`` keeps each as
    its own group, ``collapse`` folds them into one null group."""
    if null_policy not in ("ignore", "expand", "collapse"):
        raise ValueError(f"unknown nullPolicy {null_policy!r}")
    nulls = None
    if null_policy == "ignore":
        df = df.filter(F.col(group_by).isNotNull())
    elif null_policy == "expand":
        nulls = df.filter(F.col(group_by).isNull())
        df = df.filter(F.col(group_by).isNotNull())
    w = Window.partitionBy(group_by).orderBy(*order_by)
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return out.unionByName(nulls) if nulls is not None else out


def group_top_n(
    df: DataFrame, group_by: str, order_by: Sequence[Column], n: int
) -> DataFrame:
    """Result grouping group.field/group.limit (search/Grouping.java:73):
    top-N tuples per group."""
    w = Window.partitionBy(group_by).orderBy(*order_by)
    return (
        df.withColumn("group_rank", F.row_number().over(w))
        .filter(F.col("group_rank") <= n)
    )


def expand(
    collapsed: DataFrame, full: DataFrame, group_by: str, order_by: Sequence[Column], n: int
) -> DataFrame:
    """ExpandComponent (handler/component/ExpandComponent.java:110): for each
    collapsed head, re-attach up to n of the other members of its group."""
    heads = collapsed.select(group_by).distinct()
    w = Window.partitionBy(group_by).orderBy(*order_by)
    return (
        full.join(F.broadcast(heads), [group_by], "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .filter(F.col("_rn") <= n + 1)
        .drop("_rn")
    )


# ---- sort / top-k / pagination / set ops -------------------------------------


def sort_stream(df: DataFrame, *order_by: Column) -> DataFrame:
    """sort() stream (SortStream.java, 223 LoC): full re-sort. Spark's
    external sort replaces the reference's in-memory materialization."""
    return df.orderBy(*order_by)


def top(df: DataFrame, k: int, *order_by: Column) -> DataFrame:
    """top()/rank stream (RankStream.java:54): bounded top-k priority queue.
    orderBy().limit() compiles to TakeOrderedAndProject: partition-local
    top-k + driver merge — exactly the reference's distributed PQ merge
    (QueryComponent.mergeIds:970)."""
    return df.orderBy(*order_by).limit(k)


def cursor_page(
    df: DataFrame,
    sort_col: str,
    unique_key: str,
    k: int,
    after: tuple | None = None,
    ascending: bool = True,
) -> DataFrame:
    """CursorMark deep paging (search/CursorMark.java:46,129,301): keyset
    pagination on (sort value, uniqueKey) — no offset scan."""
    s, u = F.col(sort_col), F.col(unique_key)
    out = df
    if after is not None:
        a_s, a_u = after
        if ascending:
            out = out.filter((s > a_s) | ((s == a_s) & (u > a_u)))
        else:
            out = out.filter((s < a_s) | ((s == a_s) & (u > a_u)))
    order = [s.asc() if ascending else s.desc(), u.asc()]
    return out.orderBy(*order).limit(k)


def merge(*dfs: DataFrame) -> DataFrame:
    """merge() stream (MergeStream.java, 270 LoC): ordered union of sorted
    streams.  Spark keeps order a property of the consumer, so this is
    unionByName; add sort_stream() downstream when order matters."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def unique(df: DataFrame, on: Sequence[str]) -> DataFrame:
    """unique() stream (UniqueStream.java, 197 LoC): dedup on key."""
    return df.dropDuplicates(list(on))


# ---- scored / block joins ----------------------------------------------------


def score_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    score_col: str,
    mode: str = "max",
) -> DataFrame:
    """Cross-collection scored semi-join ({!join score=...},
    search/join/ScoreJoinQParserPlugin.java:92): rows of ``left`` having at
    least one match in ``right`` on left_on == right_on, carrying an
    aggregate of the matching rows' ``score_col``.

    mode: max | min | avg | total (the reference's ScoreMode values; "none"
    is just a plain semi-join — use intersect()).  Scale shape: one groupBy
    shuffle on the (usually far smaller) right side, then a broadcast-able
    join of the aggregated scores into the left scan.
    """
    aggf = {"max": F.max, "min": F.min, "avg": F.avg, "total": F.sum}
    if mode not in aggf:
        raise ValueError(f"unknown score mode {mode!r}")
    scores = right.groupBy(F.col(right_on).alias(left_on)).agg(
        aggf[mode](score_col).alias("join_score")
    )
    return left.join(scores, left_on, "inner")


def block_join_parent(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_root: str,
    child_predicate: Column,
) -> DataFrame:
    """Block join, parent side ({!parent which=...},
    search/join/BlockJoinParentQParserPlugin.java): parents having at least
    one child matching the predicate.  The reference stores children in the
    same index block with a _root_ pointer; here children carry
    ``child_root`` = their parent's key (SURVEY.md §1.1 maps _root_ to a
    child-table column or an exploded ArrayType(Struct))."""
    matched = (
        children.filter(child_predicate)
        .select(F.col(child_root).alias(parent_key))
        .distinct()
    )
    return parents.join(matched, parent_key, "left_semi")


def block_join_children(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_root: str,
    parent_predicate: Column,
) -> DataFrame:
    """Block join, child side ({!child of=...},
    search/join/BlockJoinChildQParserPlugin.java): children whose parent
    matches the predicate."""
    matched = (
        parents.filter(parent_predicate)
        .select(F.col(parent_key).alias(child_root))
        .distinct()
    )
    return children.join(matched, child_root, "left_semi")


def unique_block(df: DataFrame, group_by: str, root_col: str) -> DataFrame:
    """uniqueBlock(_root_) aggregation (search/facet/UniqueBlockAgg.java):
    per facet bucket, the number of distinct parent blocks touched."""
    return df.groupBy(group_by).agg(
        F.countDistinct(root_col).alias("unique_block")
    )


# ---- relatedness (semantic knowledge graph) ---------------------------------


def _sigmoid_helper(x: Column, offset: float, scale: float) -> Column:
    return (x + F.lit(offset)) / (F.lit(scale) + F.abs(x + F.lit(offset)))


def relatedness_expr(
    fg_count: Column, fg_size: Column, bg_count: Column, bg_size: Column
) -> Column:
    """relatedness() aggregation (search/facet/RelatednessAgg.java:756-772):
    z-score of the foreground count against the background probability,
    squashed through five sigmoids and rounded to 5 digits."""
    bg_prob = bg_count / bg_size.cast("double")
    num = fg_count - fg_size.cast("double") * bg_prob
    denom = F.sqrt(fg_size.cast("double") * bg_prob * (F.lit(1.0) - bg_prob))
    denom = F.when(denom == 0, F.lit(1e-10)).otherwise(denom)
    z = num / denom
    result = (
        F.lit(0.2) * _sigmoid_helper(z, -80, 50)
        + F.lit(0.2) * _sigmoid_helper(z, -30, 30)
        + F.lit(0.2) * _sigmoid_helper(z, 0, 30)
        + F.lit(0.2) * _sigmoid_helper(z, 30, 30)
        + F.lit(0.2) * _sigmoid_helper(z, 80, 50)
    )
    return F.round(result * 1e5) / F.lit(1e5)


def relatedness_facet(
    df: DataFrame,
    bucket_col: str,
    fg_predicate: Column,
    id_col: str,
    limit: int | None = None,
) -> DataFrame:
    """Terms facet with a relatedness() sub-aggregation: for each bucket,
    fg_count = matching docs in the foreground set, bg_count = matching docs
    overall, scored by RelatednessAgg.computeRelatedness.  One aggregation
    pass; the global fg/bg sizes ride along as literals from a first agg."""
    sizes = df.agg(
        F.countDistinct(id_col).alias("bg"),
        F.countDistinct(F.when(fg_predicate, F.col(id_col))).alias("fg"),
    ).collect()[0]
    fg_size, bg_size = int(sizes["fg"]), int(sizes["bg"])
    counts = df.groupBy(bucket_col).agg(
        F.countDistinct(F.when(fg_predicate, F.col(id_col))).alias("fg_count"),
        F.countDistinct(id_col).alias("bg_count"),
    )
    out = counts.select(
        bucket_col,
        "fg_count",
        "bg_count",
        relatedness_expr(
            F.col("fg_count").cast("double"),
            F.lit(float(fg_size)),
            F.col("bg_count").cast("double"),
            F.lit(float(bg_size)),
        ).alias("relatedness"),
    ).orderBy(F.col("relatedness").desc(), F.col(bucket_col).asc())
    return out.limit(limit) if limit else out


def range_facet_other(
    df: DataFrame,
    field: str,
    start: float,
    end: float,
    gap: float,
) -> DataFrame:
    """range facet with other=all (FacetRangeProcessor.java:51
    other=before/after/between): the regular gap buckets plus the three
    out-of-range summary buckets, as (bucket string, n) rows.  One pass:
    a single conditional-bucket aggregation, then the between/before/after
    rows derive from the same grouped result — no second scan."""
    bucket = (
        F.when(F.col(field) < start, F.lit("before"))
        .when(F.col(field) >= end, F.lit("after"))
        .otherwise(
            (F.lit(start) + F.floor((F.col(field) - F.lit(start)) / F.lit(gap))
             * F.lit(gap)).cast("long").cast("string")
        )
    )
    grouped = df.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    between = (
        grouped.filter(~F.col("bucket").isin("before", "after"))
        .agg(F.sum("n").alias("n"))
        .select(F.lit("between").alias("bucket"), "n")
        .na.fill(0, ["n"])
    )
    return grouped.unionByName(between).orderBy("bucket")


def _parse_interval(spec: str) -> tuple[str, object, object, bool, bool]:
    """Parse the reference's interval syntax (request/IntervalFacets.java:
    FacetInterval ctor, :500-560): ``[a,b]`` / ``(a,b)`` mixed brackets,
    ``*`` for an open end.  Returns (key, start, end, start_open,
    end_open); start/end are None for ``*``."""
    from apache___solr_spark.query.structured import coerce_literal

    s = spec.strip()
    if len(s) < 3 or s[0] not in "[(" or s[-1] not in "])":
        raise ValueError(f"invalid facet interval {spec!r}")
    start_open = s[0] == "("
    end_open = s[-1] == ")"
    body = s[1:-1]
    if "," not in body:
        raise ValueError(f"facet interval needs 'start,end': {spec!r}")
    lo_s, hi_s = (p.strip() for p in body.split(",", 1))
    lo = None if lo_s == "*" else coerce_literal(lo_s)
    hi = None if hi_s == "*" else coerce_literal(hi_s)
    return s, lo, hi, start_open, end_open


def interval_facet(
    df: DataFrame, field: str, intervals: Sequence[str]
) -> DataFrame:
    """facet.interval (request/IntervalFacets.java): count docs per
    arbitrary interval ``[a,b] (a,b) [*,x)``.  Unlike range facets the
    intervals may OVERLAP — a doc counts in every interval containing its
    value — so this is one conditional aggregation pass (one scan, no
    shuffle beyond the single-row agg), then an unpivot back to
    (interval, count) rows in the request's interval order."""
    col = F.col(field)
    conds = []
    for spec in intervals:
        key, lo, hi, lo_open, hi_open = _parse_interval(spec)
        c = F.lit(True)
        if lo is not None:
            c = c & (col > lo if lo_open else col >= lo)
        if hi is not None:
            c = c & (col < hi if hi_open else col <= hi)
        conds.append((key, c))
    wide = df.agg(
        *[
            F.count(F.when(c, F.lit(1))).alias(f"_iv{i}")
            for i, (_, c) in enumerate(conds)
        ]
    )
    stack_args = ", ".join(
        "'{}', _iv{}".format(key.replace("'", "\\'"), i)
        for i, (key, _) in enumerate(conds)
    )
    return wide.selectExpr(
        f"stack({len(conds)}, {stack_args}) as (interval, n)"
    )


def pivot_facet(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """Pivot facet (handler/component/PivotFacetComponent.java,
    PivotFacetProcessor): hierarchical counts along ``fields``, flattened as
    one row per tree node with a ``level`` column (1 = top field only).
    Spark's rollup() computes every prefix level in ONE aggregation pass
    (partial aggregation map-side); the grand-total row the reference does
    not emit is filtered out."""
    cols = list(fields)
    # F.grouping() distinguishes rollup's structural nulls from null DATA,
    # so levels stay correct on sparse fields; a null data value at a
    # grouped level forms no bucket (the reference skips docs missing the
    # pivot field at that level) while the doc still counts at the levels
    # above it.
    out = (
        df.rollup(*cols)
        .agg(
            F.count(F.lit(1)).alias("count"),
            *[F.grouping(c).alias(f"_g_{c}") for c in cols],
        )
        .withColumn(
            "level", sum(1 - F.col(f"_g_{c}") for c in cols)
        )
        .filter(F.col("level") > 0)
    )
    for c in cols:
        out = out.filter(~(F.col(c).isNull() & (F.col(f"_g_{c}") == 0)))
    return out.drop(*[f"_g_{c}" for c in cols]).orderBy("level", *cols)


def heatmap_facet(
    df: DataFrame,
    x: str,
    y: str,
    x_start: float,
    x_gap: float,
    y_start: float,
    y_gap: float,
) -> DataFrame:
    """heatmap facet (FacetHeatmap.java capability — spatial grid-cell
    counting, re-expressed for any two numeric dimensions): counts on a 2D
    grid, one aggregation pass, (x_bucket, y_bucket, n) rows for non-empty
    cells."""
    gx = F.floor((F.col(x) - F.lit(x_start)) / F.lit(x_gap)).cast("long")
    gy = F.floor((F.col(y) - F.lit(y_start)) / F.lit(y_gap)).cast("long")
    return (
        df.groupBy(gx.alias("x_bucket"), gy.alias("y_bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("x_bucket", "y_bucket")
    )

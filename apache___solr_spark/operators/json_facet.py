"""JSON Facet API: the reference's nested facet DSL over DataFrames.

Reference surface (solr/core/src/java/org/apache/solr/search/facet/
FacetRequest.java + FacetField.java + FacetRange.java + FacetQuery.java,
parsed in FacetParser.java): a request like

    {"top_types": {
        "type": "terms", "field": "event_type", "limit": 5,
        "sort": "avg_v desc",
        "facet": {
            "avg_v": "avg(value)",
            "by_user": {"type": "terms", "field": "user_id", "limit": 3}
        }}}

buckets the scan by field values, computes named stats per bucket, and
nests sub-facets inside surviving buckets.

Spark-first lowering: each facet LEVEL is one groupBy over (parent bucket
keys + this field) — a single shuffle per level regardless of bucket
count, where the reference walks per-bucket collectors.  Bucket limits
apply per parent bucket via a window top-N; sub-facets see only rows of
surviving buckets (broadcast semi-join, so the 100 TB scan is pruned
before the child shuffle).  Everything stays in JVM column expressions.

Result: dict of facet path -> DataFrame (e.g. ``"top_types"``,
``"top_types.by_user"``); each frame carries its parent bucket key
columns, the bucket field, ``count``, and the named stats.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from apache___solr_spark.query.structured import structured_q_predicate

_STAT_RE = re.compile(r"^(\w+)\((.*)\)$")


def _stat_col(spec: str) -> Column:
    """One JSON-facet stat string -> aggregate Column (FacetModule agg
    functions: sum/avg/min/max/unique/hll/variance/stddev/sumsq/missing/
    countvals/percentile)."""
    m = _STAT_RE.match(spec.strip())
    if not m:
        raise ValueError(f"bad stat spec {spec!r}")
    fn, arg = m.group(1), m.group(2).strip()
    if fn == "sum":
        return F.sum(arg)
    if fn == "avg":
        return F.avg(arg)
    if fn == "min":
        return F.min(arg)
    if fn == "max":
        return F.max(arg)
    if fn in ("unique", "countDist"):
        return F.count_distinct(F.col(arg))
    if fn == "hll":
        return F.approx_count_distinct(arg)
    if fn == "variance":
        return F.var_samp(arg)
    if fn == "stddev":
        return F.stddev_samp(arg)
    if fn == "sumsq":
        return F.sum(F.col(arg) * F.col(arg))
    if fn == "missing":
        return F.count(F.when(F.col(arg).isNull(), F.lit(1)))
    if fn == "countvals":
        return F.count(F.col(arg))
    if fn == "percentile":
        col, p = arg.split(",", 1)
        return F.expr(f"percentile({col.strip()}, {float(p) / 100.0})")
    raise ValueError(f"unknown stat function {fn!r} in {spec!r}")


def _split_node(node: dict) -> tuple[dict[str, Column], dict[str, dict]]:
    stats: dict[str, Column] = {}
    subs: dict[str, dict] = {}
    for k, v in (node.get("facet") or {}).items():
        if isinstance(v, str):
            stats[k] = _stat_col(v)
        elif isinstance(v, dict):
            subs[k] = v
        else:
            raise ValueError(f"facet entry {k!r} must be a stat string or dict")
    return stats, subs


def _sort_order(node: dict, stats: dict[str, Column], bucket_col: str) -> list:
    spec = node.get("sort", "count desc")
    if isinstance(spec, dict):
        (name, direction), = spec.items()
    else:
        parts = spec.split()
        name = parts[0]
        direction = parts[1] if len(parts) > 1 else "desc"
    if name == "index":
        key = F.col(bucket_col)
        lead = key.asc() if direction == "asc" else key.desc()
        return [lead]
    key = F.col(name)
    lead = key.asc() if direction == "asc" else key.desc()
    return [lead, F.col(bucket_col).asc()]


def json_facet(
    df: DataFrame,
    spec: dict,
    fqs: dict[str, Column | str] | None = None,
    root_col: str = "_root_",
    key_col: str = "id",
) -> dict[str, DataFrame]:
    """Evaluate a JSON Facet request; see module docstring.

    ``fqs`` maps filter-query TAGS to predicates (Column or structured-q
    string); all of them narrow the base domain, and a facet node whose
    ``domain: {excludeTags: [...]}`` names some of them is evaluated with
    those filters removed — the reference's multi-select faceting
    (FacetRequest.java domain excludeTags, via JsonQueryConverter tags).
    ``root_col``/``key_col`` name the block-join columns used by
    ``domain: {blockChildren|blockParent: "<q>"}`` transforms.
    """
    fq_preds: dict[str, Column] = {}
    for tag, p in (fqs or {}).items():
        pred = structured_q_predicate(p) if isinstance(p, str) else p
        if pred is not None:
            fq_preds[tag] = pred
    base = df
    for pred in fq_preds.values():
        base = base.filter(pred)
    ctx = {"raw": df, "fq_preds": fq_preds, "root": root_col, "key": key_col}
    out: dict[str, DataFrame] = {}
    _lower_level(base, spec, parents=[], prefix="", out=out, ctx=ctx)
    return out


def _apply_domain(
    df: DataFrame, node: dict, parents: list[str], ctx: dict | None
) -> DataFrame:
    """Apply a facet node's ``domain`` transform (FacetRequest.java
    parseDomain: excludeTags / filter / blockChildren / blockParent /
    join) before bucketing."""
    dom = node.get("domain")
    if not dom:
        return df
    ctx = ctx or {}
    if "excludeTags" in dom:
        # recompute from the un-filtered scan with the named fq tags
        # dropped (multi-select faceting).  Only meaningful where the
        # domain IS the fq-filtered base, i.e. top-level facets.
        if parents:
            raise NotImplementedError(
                "domain.excludeTags on a nested facet (bucket-context "
                "re-derivation) is not supported; restructure as a "
                "top-level facet"
            )
        excl = dom["excludeTags"]
        excl = {excl} if isinstance(excl, str) else set(excl)
        df = ctx.get("raw", df)
        for tag, pred in ctx.get("fq_preds", {}).items():
            if tag not in excl:
                df = df.filter(pred)
    if "filter" in dom:
        filters = dom["filter"]
        for q in [filters] if isinstance(filters, str) else filters:
            pred = structured_q_predicate(q)
            if pred is not None:
                df = df.filter(pred)
    if "blockChildren" in dom:
        # current domain = parent docs; new domain = their children
        # (rows whose root_col points at a parent key in the domain).
        parents_mask = structured_q_predicate(dom["blockChildren"])
        raw, root, key = ctx["raw"], ctx["root"], ctx["key"]
        par = df.filter(parents_mask) if parents_mask is not None else df
        keys = par.select(F.col(key).alias(root)).distinct()
        df = raw.join(F.broadcast(keys), root, "left_semi")
        if parents_mask is not None:
            df = df.filter(~parents_mask)
    if "blockParent" in dom:
        # current domain = child docs; new domain = their parents.
        parents_mask = structured_q_predicate(dom["blockParent"])
        raw, root, key = ctx["raw"], ctx["root"], ctx["key"]
        roots = df.select(F.col(root).alias(key)).distinct()
        par = raw.join(F.broadcast(roots), key, "left_semi")
        df = par.filter(parents_mask) if parents_mask is not None else par
    if "join" in dom:
        # self-join domain transform ({"join": {"from": f, "to": t}}):
        # docs whose `to` value appears among the domain's `from` values.
        j = dom["join"]
        raw = ctx["raw"]
        frm, to = j["from"], j["to"]
        vals = df.select(F.col(frm).alias(to)).distinct()
        df = raw.join(vals, to, "left_semi")
    return df


def _agg_frame(
    df: DataFrame, keys: list[str], stats: dict[str, Column]
) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("count")] + [
        c.alias(n) for n, c in stats.items()
    ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def _lower_level(
    df: DataFrame,
    facets: dict,
    parents: list[str],
    prefix: str,
    out: dict[str, DataFrame],
    ctx: dict | None = None,
) -> None:
    base_df = df
    for name, node in facets.items():
        if not isinstance(node, dict):
            raise ValueError(f"top-level facet {name!r} must be a dict")
        path = prefix + name
        typ = node.get("type", "terms")
        stats, subs = _split_node(node)
        df = _apply_domain(base_df, node, parents, ctx)

        if typ == "terms":
            field = node["field"]
            limit = int(node.get("limit", 10))
            offset = int(node.get("offset", 0))
            mincount = int(node.get("mincount", 1))
            keys = parents + [field]
            # Solr terms buckets exclude missing values (FacetField docs:
            # the null group is NOT a bucket; it's the opt-in missing:true
            # bucket below) — Spark's groupBy would include it.
            domain = df.filter(F.col(field).isNotNull())
            grouped = _agg_frame(domain, keys, stats)
            if mincount > 1:
                grouped = grouped.filter(F.col("count") >= mincount)
            prefix_filter = node.get("prefix")
            if prefix_filter:
                grouped = grouped.filter(
                    F.col(field).cast("string").startswith(prefix_filter)
                )
            order = _sort_order(node, stats, field)
            if limit >= 0:
                if parents or offset:
                    w = Window.partitionBy(*parents).orderBy(*order)
                    grouped = (
                        grouped.withColumn("_rn", F.row_number().over(w))
                        .filter(
                            (F.col("_rn") > offset)
                            & (F.col("_rn") <= offset + limit)
                        )
                        .drop("_rn")
                    )
                else:
                    grouped = grouped.orderBy(*order).limit(limit)
            out[path] = grouped
            # special buckets (FacetField params), emitted as sibling
            # frames so the dict-of-frames response shape stays uniform:
            if node.get("missing"):
                out[path + "._missing_"] = _agg_frame(
                    df.filter(F.col(field).isNull()), parents, stats
                )
            if node.get("allBuckets"):
                out[path + "._all_"] = _agg_frame(domain, parents, stats)
            if node.get("numBuckets"):
                nb = F.count_distinct(F.col(field)).alias("numBuckets")
                out[path + "._num_"] = (
                    domain.groupBy(*parents).agg(nb)
                    if parents
                    else domain.agg(nb)
                )
            if subs:
                survivors = grouped.select(*keys)
                child = df.join(F.broadcast(survivors), keys, "left_semi")
                _lower_level(child, subs, keys, path + ".", out, ctx)

        elif typ == "query":
            pred = structured_q_predicate(node["q"])
            sub_df = df.filter(pred) if pred is not None else df
            out[path] = _agg_frame(sub_df, parents, stats)
            if subs:
                _lower_level(sub_df, subs, parents, path + ".", out, ctx)

        elif typ == "range":
            field = node["field"]
            start, end, gap = (
                float(node["start"]),
                float(node["end"]),
                float(node["gap"]),
            )
            c = F.col(field)
            bucket = (
                F.lit(start)
                + F.floor((c - F.lit(start)) / F.lit(gap)) * F.lit(gap)
            ).alias("bucket_start")
            ranged = df.filter((c >= start) & (c < end)).withColumn(
                "bucket_start", bucket
            )
            keys = parents + ["bucket_start"]
            out[path] = _agg_frame(ranged, keys, stats).orderBy(*keys)
            if subs:
                _lower_level(ranged, subs, keys, path + ".", out, ctx)

        elif typ == "heatmap":
            # FacetHeatmap.java capability (json.facet type:heatmap):
            # grid-cell counting over two numeric dims; gridLevel is
            # replaced by explicit start/gap per axis (our points are
            # plain numeric columns, not encoded geohash prefixes).
            # Subfacets/stats aggregate per cell like any other bucket.
            fx, fy = node["x"], node["y"]
            gx = (
                F.floor(
                    (F.col(fx) - F.lit(float(node["xStart"])))
                    / F.lit(float(node["xGap"]))
                )
                .cast("long")
                .alias("x_bucket")
            )
            gy = (
                F.floor(
                    (F.col(fy) - F.lit(float(node["yStart"])))
                    / F.lit(float(node["yGap"]))
                )
                .cast("long")
                .alias("y_bucket")
            )
            cells = df.withColumn("x_bucket", gx).withColumn("y_bucket", gy)
            keys = parents + ["x_bucket", "y_bucket"]
            out[path] = _agg_frame(cells, keys, stats).orderBy(*keys)
            if subs:
                _lower_level(cells, subs, keys, path + ".", out, ctx)

        else:
            raise NotImplementedError(f"unknown facet type {typ!r}")

"""Streaming-expression language: parser units + lowering equivalence.

The lowering tests run each expression through StreamFactory and compare
against the hand-built DataFrame plan over the same sf0.001 tables —
the same "expression string a reference user runs today" contract the
reference's StreamExpressionToExpessionTest / StreamingTest pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache___solr_spark.expr import StreamFactory, parse_expression
from apache___solr_spark.expr.parser import NamedParam, StreamExpression


# ---- parser (no Spark) -------------------------------------------------------


def test_parse_nested_named_and_positional():
    e = parse_expression(
        'top(n=5, rollup(search(orders, q="*:*"), over="k", sum(v)), sort="sum(v) desc")'
    )
    assert e.name == "top"
    assert e.named("n") == "5"
    ru = e.sub_expressions()[0]
    assert ru.name == "rollup" and ru.named("over") == "k"
    assert [s.name for s in ru.sub_expressions()] == ["search", "sum"]
    assert ru.sub_expressions()[0].positionals() == ["orders"]


def test_parse_quotes_commas_escapes_comments():
    e = parse_expression('# a comment\nselect(echo("a, (b)=c \\" d"), "x as y")')
    inner = e.sub_expressions()[0]
    assert inner.params == ['a, (b)=c " d']
    assert e.positionals()[1] == "x as y"


def test_parse_named_param_holding_expression():
    e = parse_expression('hashJoin(search(a), hashed=search(b), on="k")')
    hp = e.named("hashed")
    assert isinstance(hp, StreamExpression) and hp.name == "search"
    assert isinstance(e.params[1], NamedParam)


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_expression("not an expression")
    with pytest.raises(ValueError):
        parse_expression("f(a))(")


# ---- lowering ---------------------------------------------------------------


@pytest.fixture(scope="module")
def factory(spark, sf_dir):
    return StreamFactory(spark, sf_dir=sf_dir)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_search_q_fl_sort_rows(factory, spark, sf_dir):
    got = factory.df(
        'search(orders, q="o_totalprice:[200000 TO *]", '
        'fl="o_orderkey,o_totalprice", sort="o_totalprice desc, o_orderkey asc", rows=15)'
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = (
        o.filter(F.col("o_totalprice") >= 200000)
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
    )
    assert _rows(got) == _rows(want)


def test_q_exclusive_range_negation_and_in_group(factory, spark, sf_dir):
    got = factory.df(
        'search(orders, q="o_totalprice:{100000 TO 200000} -o_orderpriority:1-URGENT '
        'o_orderstatus:(O F)", fl="o_orderkey", sort="o_orderkey asc")'
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = (
        o.filter(
            (F.col("o_totalprice") > 100000)
            & (F.col("o_totalprice") < 200000)
            & ~(F.col("o_orderpriority") == "1-URGENT")
            & F.col("o_orderstatus").isin("O", "F")
        )
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )
    assert _rows(got) == _rows(want)


def test_rollup_having_top_select_composite(factory, spark, sf_dir):
    got = factory.df(
        "select("
        "  top(n=10,"
        "    having("
        "      rollup("
        '        leftOuterJoin(search(customer, q="*:*", fl="c_custkey,c_nationkey"),'
        '                      search(orders, q="*:*", fl="o_custkey,o_totalprice"),'
        '                      on="c_custkey=o_custkey"),'
        '        over="c_nationkey", sum(o_totalprice), count(*)),'
        "      gt(count(*), 10)),"
        '    sort="sum(o_totalprice) desc, c_nationkey asc"),'
        '  "c_nationkey", "sum(o_totalprice) as sum_price", "count(*) as cnt")'
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    want = (
        c.join(o, ["c_custkey"], "left_outer")
        .groupBy("c_nationkey")
        .agg(
            F.sum("o_totalprice").alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") > 10)
        .orderBy(F.col("sum_price").desc(), F.col("c_nationkey").asc())
        .limit(10)
    )
    assert _rows(got) == _rows(want)


def test_facet_buckets_sorts_limit(factory, spark, sf_dir):
    got = factory.df(
        'facet(events, q="*:*", buckets="event_type", '
        'bucketSorts="sum(value) desc", bucketSizeLimit=3, sum(value), count(*))'
    )
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = (
        e.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("s").desc(), F.col("event_type").asc())
        .limit(3)
    )
    assert [r[0] for r in got.collect()] == [r[0] for r in want.collect()]


def test_hash_join_broadcasts(factory, spark, sf_dir):
    got = factory.df(
        'hashJoin(search(orders, q="*:*", fl="o_custkey,o_orderkey"), '
        'hashed=search(customer, q="*:*", fl="c_custkey,c_mktsegment"), '
        'on="o_custkey=c_custkey")'
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert got.count() == o.count()


def test_intersect_complement_partition(factory, spark, sf_dir):
    both = factory.df(
        'intersect(search(customer, q="*:*", fl="c_custkey"), '
        'search(orders, q="*:*", fl="o_custkey"), on="c_custkey=o_custkey")'
    ).count()
    neither = factory.df(
        'complement(search(customer, q="*:*", fl="c_custkey"), '
        'search(orders, q="*:*", fl="o_custkey"), on="c_custkey=o_custkey")'
    ).count()
    total = factory.df('search(customer, q="*:*", fl="c_custkey")').count()
    assert both + neither == total and both > 0


def test_merge_unique_stats(factory, spark, sf_dir):
    got = factory.df(
        'stats(unique(merge(search(orders, q="o_orderstatus:O", fl="o_custkey"), '
        'search(orders, q="o_orderstatus:F", fl="o_custkey")), over="o_custkey"), '
        "count(*), countDist(o_custkey))"
    ).collect()[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = (
        o.filter(F.col("o_orderstatus").isin("O", "F"))
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert got["count(*)"] == want and got["countDist(o_custkey)"] == want


def test_timeseries_gap(factory, spark, sf_dir):
    got = factory.df(
        'timeseries(events, q="*:*", field="ts", gap="+1DAY", count(*), avg(value))'
    )
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = (
        e.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("ws"), "c")
        .orderBy("ws")
    )
    assert [(r[0], r[1]) for r in got.select("window_start", "count(*)").collect()] == [
        (r[0], r[1]) for r in want.collect()
    ]


def test_null_echo_tuple_cartesian(factory, spark):
    n = factory.df('null(search(region, q="*:*"))').collect()[0]["nullCount"]
    assert n == factory.df('search(region, q="*:*")').count()
    assert factory.df('echo("hi")').collect()[0]["echo"] == "hi"
    t = factory.df("tuple(a=1, b=2.5, c=x)").collect()[0]
    assert (t["a"], t["b"], t["c"]) == (1, 2.5, "x")
    f2 = StreamFactory(
        spark,
        tables={"arr": spark.createDataFrame([(1, [10, 20])], "id int, vs array<int>")},
    )
    rows = f2.df('cartesianProduct(search(arr, q="*:*"), vs)').collect()
    assert sorted(r["vs"] for r in rows) == [10, 20]


def test_unknown_function_raises(factory):
    with pytest.raises(NotImplementedError):
        factory.df("frobnicate(search(orders))")
    with pytest.raises(ValueError):
        factory.df('search(orders, q="free text without field")')


def test_let_get_knn(factory, spark, sf_dir):
    got = factory.df(
        'let(a=search(orders, q="o_totalprice:[300000 TO *]", fl="o_custkey"), '
        "rollup(get(a), over=o_custkey, count(*)))"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = (
        o.filter(F.col("o_totalprice") >= 300000)
        .groupBy("o_custkey")
        .count()
    )
    assert got.count() == want.count()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    qv = ",".join(["0.1"] * dim)
    knn = factory.df(
        f'knnSearch(embeddings, q="*:*", vec="[{qv}]", k=5)'
    ).collect()
    assert len(knn) == 5
    plan = factory.df(
        f'knnSearch(embeddings, q="*:*", vec="[{qv}]", k=5)'
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_update_commit_roundtrip(spark, sf_dir, tmp_path):
    fac = StreamFactory(spark, sf_dir=sf_dir, output_dir=str(tmp_path))
    res = fac.df(
        'commit(dest, update(dest, search(orders, q="o_totalprice:[300000 TO *]", '
        'fl="o_orderkey,o_totalprice")))'
    ).collect()[0]
    n = fac.df('search(dest, q="*:*")').count()
    assert res["batchIndexed"] == n and n > 0
    # durable: the parquet sink is readable by a fresh factory
    fac2 = StreamFactory(spark, sf_dir=str(tmp_path))
    assert fac2.df('search(dest, q="*:*")').count() == n
    # in-memory destination without output_dir
    fac3 = StreamFactory(spark, sf_dir=sf_dir)
    fac3.df('update(mem, search(region, q="*:*"))')
    assert fac3.df('rollup(get(mem), over=r_name, count(*))').count() == 5


def test_drill_input_rollup(factory, spark, sf_dir):
    got = factory.df(
        'drill(orders, q="*:*", fl="o_orderstatus,o_totalprice", '
        'sort="o_orderstatus asc", '
        'rollup(input(), over="o_orderstatus", sum(o_totalprice), count(*)))'
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = o.groupBy("o_orderstatus").agg(
        F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("c")
    )
    g = {r["o_orderstatus"]: (round(r["sum(o_totalprice)"], 4), r["count(*)"])
         for r in got.collect()}
    w = {r["o_orderstatus"]: (round(r["s"], 4), r["c"]) for r in want.collect()}
    assert g == w
    with pytest.raises(ValueError):
        StreamFactory(spark, sf_dir=sf_dir).df("input()")


def test_features_train_classify(factory, spark, sf_dir):
    """features()/train()/classify() (FeaturesSelectionStream /
    TextLogitStream / ClassifyStream): the expression pipeline agrees with
    the pipeline.textml functions it lowers to."""
    from apache___solr_spark.pipeline.textml import (
        select_features_igain,
        train_text_logit,
    )

    feats_df = factory.df(
        'features(documents, field="text", outcome="lang", '
        'positiveLabel="en", numTerms=6, featureSet="fs1")'
    )
    rows = feats_df.collect()
    assert [r["index_i"] for r in rows] == list(range(1, 7))
    assert all(r["featureSet_s"] == "fs1" for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = select_features_igain(
        docs, "text", "lang", "en", num_terms=6
    ).collect()
    assert [r["term_s"] for r in rows] == [w["term"] for w in want]

    model = factory.df(
        'train(documents, features(documents, field="text", outcome="lang", '
        'positiveLabel="en", numTerms=6), field="text", outcome="lang", '
        'positiveLabel="en", maxIterations=3, alpha=0.05, name="m1")'
    )
    mrows = model.orderBy("iteration_i").collect()
    assert [r["iteration_i"] for r in mrows] == [1, 2, 3]
    feats = [(w["term"], w["idf"]) for w in want]
    iters = train_text_logit(
        docs, "text", "lang", feats, positive_label="en",
        iterations=3, alpha=0.05,
    )
    assert mrows[-1]["weights_ds"] == pytest.approx(
        iters[-1]["weights"], rel=1e-9
    )
    assert mrows[-1]["error_d"] == pytest.approx(iters[-1]["error"], rel=1e-6)

    scored = factory.df(
        'classify(train(documents, field="text", outcome="lang", '
        'positiveLabel="en", numTerms=6, maxIterations=3, alpha=0.05), '
        'search(documents, q="*:*"), field="text")'
    )
    srows = scored.limit(20).collect()
    assert all(0.0 <= r["probability_d"] <= 1.0 for r in srows)
    assert all(r["prediction_i"] in (0, 1) for r in srows)


def test_let_bind_values_and_coercion(spark):
    """let_bind: bound expressions evaluate once per row and feed the body
    as lambda variables; string bindings coerce to columns; nesting works."""
    from apache___solr_spark.functions.evaluators import let_bind

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], ["id", "arr"])
    row = df.select(
        # scalar binding
        let_bind(
            {"s": F.aggregate("arr", F.lit(0.0), lambda a, x: a + x)},
            lambda s: s * 2,
        ).alias("twice_sum"),
        # array binding + string coercion
        let_bind(
            {"a": "arr"},
            lambda a: F.transform(a, lambda x: x / F.size(a)),
        ).alias("scaled"),
        # nested: inner binding references the outer lambda variable
        let_bind(
            {"m": F.array_max("arr")},
            lambda m: let_bind(
                {"mn": F.array_min("arr")},
                lambda mn: m - mn,
            ),
        ).alias("range_"),
    ).first()
    assert row["twice_sum"] == 12.0
    assert row["scaled"] == [1.0 / 3, 2.0 / 3, 1.0]
    assert row["range_"] == 2.0


def test_matrix_ops_after_binding(spark):
    """transpose/matmul still correct after the let_bind rewrite, including
    composed inputs (matmul over a transpose expression)."""
    from apache___solr_spark.functions import matrix as M

    def mat(rows):
        return F.array(
            *[F.array(*[F.lit(float(v)) for v in r]) for r in rows]
        )

    df = spark.range(1).select(
        mat([[1, 2], [3, 4], [5, 6]]).alias("a"),
        mat([[7, 8], [9, 10]]).alias("b"),
    )
    row = df.select(
        M.transpose("a").alias("at"),
        M.matmul("a", "b").alias("ab"),
        M.matmul(M.transpose("a"), "a").alias("ata"),
    ).first()
    assert row["at"] == [[1, 3, 5], [2, 4, 6]]
    assert row["ab"] == [[25, 28], [57, 64], [89, 100]]
    assert row["ata"] == [[35, 44], [44, 56]]


def test_timeseries_calendar_gap_months(spark):
    """+nMONTH gaps anchor at start= and step by DateMathParser month
    arithmetic (day-of-month clamps: Jan 30 + 1MONTH = Feb 29)."""
    import calendar
    import datetime as dt
    from collections import Counter

    raws = [
        "2020-01-30 00:00:00",  # bucket boundary itself
        "2020-02-28 23:59:59",  # just before the clamped Feb 29 boundary
        "2020-02-29 00:00:00",  # exactly on the clamped boundary
        "2020-03-29 23:59:59",
        "2020-03-30 12:00:00",
        "2020-07-30 00:00:00",
        "2021-01-29 23:59:59",
        "2021-06-15 00:00:00",
    ]
    df = spark.createDataFrame([(r,) for r in raws], ["raw"]).select(
        F.to_timestamp("raw").alias("ts")
    )
    fac = StreamFactory(spark, tables={"ev": df})
    start = "2020-01-30 00:00:00"

    def add_months(d, m):
        y = d.year + (d.month - 1 + m) // 12
        mo = (d.month - 1 + m) % 12 + 1
        return d.replace(
            year=y, month=mo, day=min(d.day, calendar.monthrange(y, mo)[1])
        )

    s = dt.datetime(2020, 1, 30)
    for gap, months in (("+1MONTH", 1), ("+3MONTHS", 3), ("+1YEAR", 12)):
        got = fac.df(
            f'timeseries(ev, q="*:*", field="ts", start="{start}", '
            f'gap="{gap}", count(*))'
        ).collect()
        want = Counter()
        for raw in raws:
            t = dt.datetime.strptime(raw, "%Y-%m-%d %H:%M:%S")
            i = 0
            while add_months(s, (i + 1) * months) <= t:
                i += 1
            want[add_months(s, i * months)] += 1
        assert {(r["window_start"], r["count(*)"]) for r in got} == set(
            want.items()
        ), gap


def test_timeseries_calendar_gap_needs_start(spark):
    df = spark.createDataFrame([("2020-01-01 00:00:00",)], ["raw"]).select(
        F.to_timestamp("raw").alias("ts")
    )
    fac = StreamFactory(spark, tables={"ev": df})
    with pytest.raises(ValueError, match="start="):
        fac.df('timeseries(ev, q="*:*", field="ts", gap="+3MONTHS", count(*))')

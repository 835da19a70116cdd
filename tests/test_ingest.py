"""UpdateRequestProcessor chain (update/processor/*.java analogs)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from apache___solr_spark.ingest import (
    clone_field,
    concat_field,
    count_field_values,
    default_value,
    field_length,
    html_strip_field,
    ignore_field,
    langid_field,
    processor_chain,
    regex_replace,
    remove_blank,
    signature_dedup,
    timestamp_field,
    trim_field,
    truncate_field,
    uuid_field,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "  Hello World  ", ["a", "b", "c"], None),
            (2, "", ["x"], "keep"),
            (3, None, None, None),
        ],
        "id long, title string, tags array<string>, note string",
    )


def test_scalar_processors_compose(spark):
    chain = processor_chain(
        trim_field("title"),
        remove_blank("title"),
        clone_field("title", "title_copy"),
        default_value("note", "n/a"),
        truncate_field("title", 5),
        field_length("title_copy", "title_len"),
        count_field_values("tags", "n_tags"),
        concat_field("tags"),
    )
    rows = {r["id"]: r.asDict() for r in chain(_docs(spark)).collect()}
    assert rows[1]["title"] == "Hello"
    assert rows[1]["title_copy"] == "Hello World"
    assert rows[1]["title_len"] == 11
    assert rows[1]["n_tags"] == 3 and rows[1]["tags"] == "a, b, c"
    assert rows[1]["note"] == "n/a"
    assert rows[2]["title"] is None  # blank removed
    assert rows[2]["note"] == "keep"  # default only fills absent
    assert rows[3]["title"] is None and rows[3]["n_tags"] == 0


def test_regex_replace(spark):
    df = spark.createDataFrame([(1, "a   b\tc")], "id long, s string")
    out = regex_replace("s", r"\s+", " ")(df).collect()[0]
    assert out["s"] == "a b c"


def test_ignore_and_timestamp_and_uuid(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    chain = processor_chain(
        timestamp_field("ts", literal="2026-01-02 03:04:05"),
        uuid_field("doc_uuid", from_field="s"),
        ignore_field("s"),
    )
    rows = chain(df).collect()
    assert all(str(r["ts"]).startswith("2026-01-02") for r in rows)
    assert "s" not in chain(df).columns
    uuids = [r["doc_uuid"] for r in rows]
    assert all(
        re.fullmatch(r"[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}", u)
        for u in uuids
    )
    # content-derived => deterministic and distinct
    assert uuids == [r["doc_uuid"] for r in chain(df).collect()]
    assert uuids[0] != uuids[1]
    # random variant fills only absent values
    df2 = spark.createDataFrame([("fixed",), (None,)], "id string")
    got = uuid_field("id")(df2).collect()
    assert got[0]["id"] == "fixed" or got[1]["id"] == "fixed"
    assert all(r["id"] for r in got)


def test_html_strip_field(spark):
    df = spark.createDataFrame(
        [(1, "<p>Hello <b>world</b></p>"), (2, None)],
        "id long, body string",
    )
    rows = {
        r["id"]: r["body_text"]
        for r in html_strip_field("body", "body_text")(df).collect()
    }
    assert "Hello" in rows[1] and "world" in rows[1] and "<" not in rows[1]
    assert rows[2] is None


def test_signature_dedup(spark):
    df = spark.createDataFrame(
        [
            (1, "dup text", "A"),
            (2, "dup text", "A"),
            (3, "other", "A"),
            (4, "dup text", "B"),  # different sig_field combo -> kept
        ],
        "id long, body string, site string",
    )
    out = signature_dedup(["body", "site"], order_by="id")(df)
    rows = sorted(r["id"] for r in out.collect())
    assert rows == [1, 3, 4]
    # signature column present and equal for the collapsed pair
    sigs = {
        r["id"]: r["signature_"]
        for r in signature_dedup(["body", "site"], overwrite_dupes=False)(
            df
        ).collect()
    }
    assert sigs[1] == sigs[2] and sigs[1] != sigs[4]


def test_langid_matches_pipeline_layer(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox is on the hill and it was there"),
            (2, "zzz qqq kkk vvv mmm nnn"),
        ],
        "id long, body string",
    )
    rows = {
        r["id"]: r["language_"] for r in langid_field("body")(df).collect()
    }
    assert rows == {1: "en", 2: "other"}
    # agrees with pipeline.textqual.detect_language on the same docs
    from apache___solr_spark.pipeline.textqual import detect_language

    ref = {
        r["id"]: r["lang_pred"]
        for r in detect_language(df, "body", "id").collect()
    }
    assert ref == rows


def test_chain_is_one_projection(spark):
    """The scalar chain must not introduce shuffles/actions: the plan of a
    composed chain over a parquet scan stays exchange-free."""
    import os
    import tempfile

    d = tempfile.mkdtemp()
    p = os.path.join(d, "t.parquet")
    _docs(spark).write.mode("overwrite").parquet(p)
    chain = processor_chain(
        trim_field("title"),
        clone_field("title", "t2"),
        default_value("note", "n/a"),
        langid_field("title"),
    )
    plan = chain(spark.read.parquet(p))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_parse_field_processors(spark):
    from apache___solr_spark.ingest import (
        parse_boolean_field,
        parse_date_field,
        parse_numeric_field,
    )

    df = spark.createDataFrame(
        [
            ("2024-03-05T10:00:00", "42", "True"),
            ("05/03/2024", "x7", "no"),
            (None, None, "FALSE"),
        ],
        "when string, n string, flag string",
    )
    chain = processor_chain(
        parse_date_field("when", ["yyyy-MM-dd'T'HH:mm:ss", "dd/MM/yyyy"]),
        parse_numeric_field("n", "long"),
        parse_boolean_field("flag"),
    )
    out = chain(df)
    assert dict(out.dtypes) == {
        "when": "timestamp",
        "n": "bigint",
        "flag": "boolean",
    }
    rows = out.collect()
    assert rows[0]["when"].month == 3 and rows[0]["when"].day == 5
    assert rows[1]["when"].month == 3 and rows[1]["when"].day == 5
    assert rows[0]["n"] == 42 and rows[1]["n"] is None
    # caseSensitive=false: "True" -> true; "no" is neither -> null
    assert rows[0]["flag"] is True
    assert rows[1]["flag"] is None
    assert rows[2]["flag"] is False


def test_multivalue_subset_processors(spark):
    from apache___solr_spark.ingest import (
        first_field_value,
        last_field_value,
        max_field_value,
        min_field_value,
        uniq_field_values,
    )

    df = spark.createDataFrame(
        [(1, [3, 1, 2, 1])], "id long, vals array<int>"
    )
    assert first_field_value("vals")(df).collect()[0]["vals"] == 3
    assert last_field_value("vals")(df).collect()[0]["vals"] == 1
    assert min_field_value("vals")(df).collect()[0]["vals"] == 1
    assert max_field_value("vals")(df).collect()[0]["vals"] == 3
    assert uniq_field_values("vals")(df).collect()[0]["vals"] == [3, 1, 2]


def test_field_name_mutating(spark):
    from apache___solr_spark.ingest import field_name_mutating

    df = spark.createDataFrame([(1, "a", "b")], "id long, f_x string, f_y string")
    out = field_name_mutating(r"^f_", "feat_")(df)
    assert out.columns == ["id", "feat_x", "feat_y"]
    # collisions raise like the reference's duplicate-field error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        field_name_mutating(r"^f_.$", "f")(df)


def test_ignore_large_documents(spark):
    from apache___solr_spark.ingest import ignore_large_documents

    df = spark.createDataFrame(
        [(1, "short"), (2, "x" * 100)], "id long, body string"
    )
    kept = ignore_large_documents(50)(df).collect()
    assert [r["id"] for r in kept] == [1]


def test_regexp_boost(spark):
    from apache___solr_spark.ingest import regexp_boost

    df = spark.createDataFrame(
        [(1, "https://example.com/a"), (2, "http://spam.biz/x"), (3, None)],
        "id long, url string",
    )
    out = regexp_boost(
        "url", [(r"^https://", 2.0), (r"\.biz/", 0.1)]
    )(df)
    rows = {r["id"]: r["document_boost"] for r in out.collect()}
    assert rows[1] == 2.0 and abs(rows[2] - 0.1) < 1e-12 and rows[3] == 1.0


def test_doc_expiration_and_reaper(spark):
    from apache___solr_spark.ingest import doc_expiration, expired_docs_filter

    df = spark.createDataFrame(
        [(1, "+1DAYS"), (2, "+30DAYS"), (3, None)],
        "id long, ttl string",
    )
    now = "2024-06-01 00:00:00"
    stamped = doc_expiration(ttl_field="ttl", now=now)(df)
    rows = {r["id"]: r["_expire_at_"] for r in stamped.collect()}
    assert rows[1].day == 2 and rows[2].month == 7 and rows[3] is None
    # a week later doc 1 is gone, doc 2 and the never-expiring doc 3 stay
    alive = expired_docs_filter(now="2024-06-08 00:00:00")(stamped)
    assert sorted(r["id"] for r in alive.collect()) == [2, 3]
    # fixed-ttl form stamps every doc
    fixed = doc_expiration(ttl="+2HOURS", now=now)(df)
    assert all(r["_expire_at_"].hour == 2 for r in fixed.collect())


def test_version_constraints_and_content_hash(spark):
    from apache___solr_spark.ingest import (
        content_hash_version,
        version_constraints,
    )

    existing = spark.createDataFrame(
        [(1, 5, "old-1"), (2, 7, "old-2")], "id long, v long, body string"
    )
    new = spark.createDataFrame(
        [
            (1, 6, "newer-1"),   # newer -> accepted
            (1, 4, "stale-1"),   # older version of same key in batch
            (2, 7, "equal-2"),   # equal -> rejected
            (3, 1, "fresh-3"),   # brand new key -> accepted
        ],
        "id long, v long, body string",
    )
    out = version_constraints(new, existing, key="id", version_field="v")
    rows = {r["id"]: r["body"] for r in out.collect()}
    assert rows == {1: "newer-1", 3: "fresh-3"}

    hashed = content_hash_version(["body"], "chash")(existing)
    h = {r["id"]: r["chash"] for r in hashed.collect()}
    assert h[1] != h[2] and all(v is not None for v in h.values())


def test_tolerant_split(spark):
    from apache___solr_spark.ingest import tolerant_split

    df = spark.createDataFrame(
        [(1, "ok"), (None, "no id"), (3, None)], "id long, body string"
    )
    good, bad = tolerant_split(df, required=["id", "body"])
    assert [r["id"] for r in good.collect()] == [1]
    assert bad.count() == 2

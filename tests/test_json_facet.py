"""JSON Facet API vs DuckDB oracles on the sf0.001 events table."""

from __future__ import annotations

import duckdb
import pytest

from apache___solr_spark.operators.json_facet import json_facet


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).collect()]


def test_terms_facet_stat_sort_limit(events, ddb):
    out = json_facet(
        events,
        {
            "types": {
                "type": "terms",
                "field": "event_type",
                "limit": 3,
                "sort": "s desc",
                "facet": {"s": "sum(value)", "u": "unique(user_id)"},
            }
        },
    )["types"]
    want = ddb.sql(
        """
        SELECT event_type, count(*) AS count, sum(value) AS s,
               count(DISTINCT user_id) AS u
        FROM events GROUP BY event_type
        ORDER BY s DESC, event_type ASC LIMIT 3
        """
    ).fetchall()
    got = [
        (r["event_type"], r["count"], round(r["s"], 6), r["u"])
        for r in out.collect()
    ]
    assert got == [(t, c, round(s, 6), u) for t, c, s, u in want]


def test_nested_terms_per_parent_limit(events, ddb):
    out = json_facet(
        events,
        {
            "types": {
                "type": "terms",
                "field": "event_type",
                "limit": 2,
                "facet": {
                    "by_user": {"type": "terms", "field": "user_id", "limit": 3}
                },
            }
        },
    )
    want = ddb.sql(
        """
        WITH top_types AS (
            SELECT event_type FROM events GROUP BY event_type
            ORDER BY count(*) DESC, event_type ASC LIMIT 2
        ), ranked AS (
            SELECT e.event_type, e.user_id, count(*) AS count,
                   row_number() OVER (
                       PARTITION BY e.event_type
                       ORDER BY count(*) DESC, e.user_id ASC) AS rn
            FROM events e JOIN top_types USING (event_type)
            GROUP BY e.event_type, e.user_id
        )
        SELECT event_type, user_id, count FROM ranked WHERE rn <= 3
        ORDER BY event_type, count DESC, user_id
        """
    ).fetchall()
    got = sorted(
        _rows(out["types.by_user"], "event_type", "user_id", "count"),
        key=lambda r: (r[0], -r[2], r[1]),
    )
    assert got == [tuple(r) for r in want]


def test_query_facet_with_nested_terms(events, ddb):
    out = json_facet(
        events,
        {
            "big": {
                "type": "query",
                "q": "value:[50 TO *]",
                "facet": {
                    "avg_v": "avg(value)",
                    "types": {"type": "terms", "field": "event_type", "limit": 100,
                              "sort": "index asc"},
                },
            }
        },
    )
    head = out["big"].collect()[0]
    want = ddb.sql(
        "SELECT count(*), avg(value) FROM events WHERE value >= 50"
    ).fetchone()
    assert head["count"] == want[0]
    assert abs(head["avg_v"] - want[1]) < 1e-9
    sub = _rows(out["big.types"], "event_type", "count")
    want_sub = ddb.sql(
        """
        SELECT event_type, count(*) FROM events WHERE value >= 50
        GROUP BY event_type ORDER BY event_type ASC
        """
    ).fetchall()
    assert sub == [tuple(r) for r in want_sub]


def test_range_facet_with_stats(events, ddb):
    out = json_facet(
        events,
        {
            "vr": {
                "type": "range",
                "field": "value",
                "start": 0,
                "end": 100,
                "gap": 25,
                "facet": {"m": "max(value)"},
            }
        },
    )["vr"]
    want = ddb.sql(
        """
        SELECT floor(value / 25) * 25 AS b, count(*), max(value)
        FROM events WHERE value >= 0 AND value < 100
        GROUP BY b ORDER BY b
        """
    ).fetchall()
    got = [
        (r["bucket_start"], r["count"], round(r["m"], 6)) for r in out.collect()
    ]
    assert got == [(b, c, round(m, 6)) for b, c, m in want]


def test_mincount_and_bad_specs(events):
    out = json_facet(
        events,
        {"t": {"type": "terms", "field": "event_type", "mincount": 10**9}},
    )["t"]
    assert out.count() == 0
    with pytest.raises(ValueError):
        json_facet(events, {"t": {"type": "terms", "field": "x",
                                  "facet": {"bad": "nonsense"}}})
    with pytest.raises(NotImplementedError):
        json_facet(events, {"t": {"type": "geodist", "field": "x"}})


def test_offset_missing_allbuckets_numbuckets(spark):
    """FacetField params: offset paging, missing bucket (null field values
    are EXCLUDED from terms buckets, Solr semantics), allBuckets,
    numBuckets."""
    from pyspark.sql import functions as F

    rows = (
        [("a", 1)] * 5 + [("b", 2)] * 4 + [("c", 3)] * 3
        + [("d", 4)] * 2 + [(None, 9)] * 6
    )
    df = spark.createDataFrame(rows, "k string, v int")
    out = json_facet(
        df,
        {
            "t": {
                "type": "terms", "field": "k", "limit": 2, "offset": 1,
                "sort": "count desc", "missing": True, "allBuckets": True,
                "numBuckets": True, "facet": {"s": "sum(v)"},
            }
        },
    )
    # offset 1, limit 2 over count-desc [a:5, b:4, c:3, d:2] -> b, c;
    # the 6 null rows must NOT form a bucket
    got = [(r["k"], r["count"]) for r in out["t"].collect()]
    assert got == [("b", 4), ("c", 3)]
    miss = out["t._missing_"].collect()[0]
    assert (miss["count"], miss["s"]) == (6, 54)
    allb = out["t._all_"].collect()[0]
    assert (allb["count"], allb["s"]) == (14, 5 + 8 + 9 + 8)
    assert out["t._num_"].collect()[0]["numBuckets"] == 4


def test_heatmap_facet_type(events, ddb):
    """type:heatmap (FacetHeatmap.java capability): 2D grid-cell counts
    with per-cell stats, DuckDB-oracled."""
    out = json_facet(
        events,
        {
            "grid": {
                "type": "heatmap",
                "x": "value",
                "y": "user_id",
                "xStart": 0.0,
                "xGap": 25.0,
                "yStart": 0.0,
                "yGap": 500.0,
                "facet": {"s": "sum(value)"},
            }
        },
    )["grid"]
    want = ddb.sql(
        """
        SELECT CAST(floor(value / 25.0) AS BIGINT) AS x_bucket,
               CAST(floor(user_id / 500.0) AS BIGINT) AS y_bucket,
               count(*) AS count, sum(value) AS s
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    got = [
        (r["x_bucket"], r["y_bucket"], r["count"], round(r["s"], 6))
        for r in out.collect()
    ]
    assert got == [(x, y, c, round(s, 6)) for x, y, c, s in want]
    assert len(got) > 3


# ---------------------------------------------------------------------------
# domain transforms (FacetRequest.java parseDomain)
# ---------------------------------------------------------------------------


def test_domain_exclude_tags_multiselect(events, ddb):
    """Multi-select faceting: the facet over event_type drops its own fq
    tag, the sibling keeps all fqs."""
    out = json_facet(
        events,
        {
            "types_all": {"type": "terms", "field": "event_type", "limit": -1,
                          "sort": "index asc"},
            "types_self_excl": {
                "type": "terms", "field": "event_type", "limit": -1,
                "sort": "index asc",
                "domain": {"excludeTags": ["bytype"]},
            },
        },
        fqs={"bytype": "event_type:click", "byval": "value:[50 TO *]"},
    )
    want_all = ddb.sql(
        "SELECT event_type, count(*) FROM events "
        "WHERE event_type='click' AND value>=50 GROUP BY 1 ORDER BY 1"
    ).fetchall()
    want_excl = ddb.sql(
        "SELECT event_type, count(*) FROM events WHERE value>=50 "
        "GROUP BY 1 ORDER BY 1"
    ).fetchall()
    got_all = _rows(out["types_all"].orderBy("event_type"), "event_type", "count")
    got_excl = _rows(
        out["types_self_excl"].orderBy("event_type"), "event_type", "count"
    )
    assert got_all == want_all
    assert got_excl == want_excl


def test_domain_filter(events, ddb):
    out = json_facet(
        events,
        {
            "types": {
                "type": "terms", "field": "event_type", "limit": -1,
                "sort": "index asc",
                "domain": {"filter": ["value:[10 TO 90]", "user_id:[0 TO 40]"]},
                "facet": {"s": "sum(value)"},
            }
        },
    )["types"]
    want = ddb.sql(
        "SELECT event_type, count(*), round(sum(value), 6) FROM events "
        "WHERE value BETWEEN 10 AND 90 AND user_id BETWEEN 0 AND 40 "
        "GROUP BY 1 ORDER BY 1"
    ).fetchall()
    got = [
        (r["event_type"], r["count"], round(r["s"], 6))
        for r in out.orderBy("event_type").collect()
    ]
    assert got == [tuple(w) for w in want]


def test_domain_join(events, ddb):
    """domain.join: all events of users who ever clicked, faceted by type."""
    out = json_facet(
        events,
        {
            "types": {
                "type": "terms", "field": "event_type", "limit": -1,
                "sort": "index asc",
                "domain": {
                    "filter": "event_type:click",
                    "join": {"from": "user_id", "to": "user_id"},
                },
            }
        },
    )["types"]
    want = ddb.sql(
        "SELECT event_type, count(*) FROM events WHERE user_id IN "
        "(SELECT user_id FROM events WHERE event_type='click') "
        "GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert _rows(out.orderBy("event_type"), "event_type", "count") == want


@pytest.fixture(scope="module")
def blocks(spark):
    """Parent/child block corpus: parents carry _root_ = own id (Solr's
    root-document convention), children _root_ = parent id."""
    rows = []
    brands = ["acme", "beta", "acme", "gamma"]
    colors = {0: ["red", "blue"], 1: ["red"], 2: ["green", "green", "blue"],
              3: ["blue"]}
    for pid, brand in enumerate(brands):
        rows.append((pid, pid, "p", brand, None))
        for j, c in enumerate(colors[pid]):
            rows.append((100 + pid * 10 + j, pid, "c", None, c))
    return spark.createDataFrame(
        rows, "id long, _root_ long, doc_type string, brand string, color string"
    )


def test_domain_block_children(blocks):
    """Facet child colors under acme parents: domain filter->blockChildren."""
    out = json_facet(
        blocks,
        {
            "colors": {
                "type": "terms", "field": "color", "limit": -1,
                "sort": "index asc",
                "domain": {
                    "filter": "brand:acme doc_type:p",
                    "blockChildren": "doc_type:p",
                },
            }
        },
    )["colors"]
    # acme parents 0 and 2 -> children red, blue, green, green, blue
    assert _rows(out.orderBy("color"), "color", "count") == [
        ("blue", 2), ("green", 2), ("red", 1),
    ]


def test_domain_block_parent(blocks):
    """Facet brands of parents having a red child: filter->blockParent."""
    out = json_facet(
        blocks,
        {
            "brands": {
                "type": "terms", "field": "brand", "limit": -1,
                "sort": "index asc",
                "domain": {
                    "filter": "color:red doc_type:c",
                    "blockParent": "doc_type:p",
                },
            }
        },
    )["brands"]
    # red children under parents 0 (acme) and 1 (beta)
    assert _rows(out.orderBy("brand"), "brand", "count") == [
        ("acme", 1), ("beta", 1),
    ]


def test_domain_exclude_tags_nested_raises(events):
    with pytest.raises(NotImplementedError):
        json_facet(
            events,
            {
                "types": {
                    "type": "terms", "field": "event_type",
                    "facet": {
                        "users": {
                            "type": "terms", "field": "user_id",
                            "domain": {"excludeTags": "x"},
                        }
                    },
                }
            },
            fqs={"x": "value:[0 TO 10]"},
        )["types.users"]


def test_json_facet_fuzz_two_level_vs_duckdb(events, ddb):
    """Property fuzz: random nested terms specs (stat set, sort key and
    direction, limit, mincount, nested child facet) must match a
    programmatically-built DuckDB query on every draw."""
    import random

    rng = random.Random(23)
    STATS = {
        "s": ("sum(value)", "sum(value)"),
        "a": ("avg(value)", "avg(value)"),
        "mn": ("min(value)", "min(value)"),
        "mx": ("max(value)", "max(value)"),
        "u": ("unique(user_id)", "count(DISTINCT user_id)"),
    }
    for trial in range(8):
        keys = rng.sample(sorted(STATS), rng.randrange(1, 4))
        sort_key = rng.choice(keys + ["count"])
        direction = rng.choice(["asc", "desc"])
        limit = rng.randrange(1, 6)
        mincount = rng.choice([1, 1, 5])
        spec_stats = {k: STATS[k][0] for k in keys}
        node = {
            "type": "terms",
            "field": "event_type",
            "limit": limit,
            "mincount": mincount,
            "sort": f"{sort_key} {direction}",
            "facet": dict(spec_stats),
        }
        nested = rng.random() < 0.5
        if nested:
            node["facet"]["by_user"] = {
                "type": "terms",
                "field": "user_id",
                "limit": 2,
                "sort": "count desc",
            }
        out = json_facet(events, {"t": node})
        sel = ", ".join(
            f"{STATS[k][1]} AS {k}" for k in keys
        )
        ord_sql = (
            f"{sort_key} {direction.upper()}, event_type ASC"
        )
        want = ddb.sql(
            f"SELECT event_type, count(*) AS count, {sel} FROM events "
            f"GROUP BY event_type HAVING count(*) >= {mincount} "
            f"ORDER BY {ord_sql} LIMIT {limit}"
        ).fetchall()
        got = [
            tuple(
                round(v, 6) if isinstance(v, float) else v
                for v in (r["event_type"], r["count"], *[r[k] for k in keys])
            )
            for r in out["t"].collect()
        ]
        want = [
            tuple(round(v, 6) if isinstance(v, float) else v for v in row)
            for row in want
        ]
        assert got == want, (trial, node)
        if nested:
            # child buckets: per surviving parent, top-2 users by count
            parents = [row[0] for row in want]
            cw = []
            for p in parents:
                cw += ddb.sql(
                    "SELECT event_type, user_id, count(*) AS count "
                    "FROM events WHERE event_type = ? GROUP BY 1, 2 "
                    "ORDER BY count DESC, user_id ASC LIMIT 2",
                    params=[p],
                ).fetchall()
            cg = [
                (r["event_type"], r["user_id"], r["count"])
                for r in out["t.by_user"]
                .orderBy("event_type", "user_id")
                .collect()
            ]
            assert sorted(cg) == sorted(cw), (trial, node)

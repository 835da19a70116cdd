"""Training-pipeline ops: near-dup estimators vs exact ground truth,
ANN recall vs brute force, multimodal stub plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from apache___solr_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_dedup_candidates,
)
from apache___solr_spark.pipeline.multimodal import extract_image_features
from apache___solr_spark.pipeline.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill every single afternoon in summer"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("summer", "winter")),  # near dup
        (3, "completely different content about spark dataframes and shuffles"),
        (4, "completely different content about spark dataframes and shuffles"),
        (5, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(dup_docs):
    out = {r["id"]: r for r in exact_dedup(dup_docs, "text", "doc_id").collect()}
    assert out[1]["canonical_id"] == 0 and out[1]["is_duplicate"]
    assert out[4]["canonical_id"] == 3 and out[4]["is_duplicate"]
    assert not out[0]["is_duplicate"] and not out[5]["is_duplicate"]


def test_minhash_finds_near_dups_and_estimates_jaccard(dup_docs):
    cands = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_candidates(dup_docs, "text", "doc_id").collect()
    }
    assert cands.get((0, 1)) == 1.0  # exact dup: all minhashes equal
    assert (0, 2) in cands or (1, 2) in cands  # near dup found
    assert (3, 4) in cands
    # estimate roughly tracks exact jaccard for the near-dup pair
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_docs, "text", "doc_id", n=3).collect()
    }
    if (0, 2) in cands:
        assert abs(cands[(0, 2)] - exact[(0, 2)]) < 0.35


def test_simhash_near_dups(dup_docs):
    cands = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_dedup_candidates(dup_docs, "text", "doc_id").collect()
    }
    assert cands.get((0, 1)) == 0
    assert cands.get((3, 4)) == 0
    if (0, 2) in cands:
        assert cands[(0, 2)] <= 12


def test_lsh_ann_recall(spark):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    exact = [r["vec_id"] for r in cosine_topk_bruteforce(df, q, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in cosine_topk_lsh(
            df, q, k=10, n_planes=8, multiprobe_hamming=2
        ).collect()
    ]
    assert exact[0] == 0  # self is nearest
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5  # multiprobe LSH over random data


def test_multimodal_stub_plumbing(spark):
    rows = [(i, bytes([i] * 32), "image/png", 8, 6) for i in range(10)]
    df = spark.createDataFrame(
        rows, "media_id long, content binary, mime string, width int, height int"
    )
    out = extract_image_features(df, fake=True).collect()
    assert len(out) == 10
    assert all(len(r["feature"]) == 8 for r in out)
    # deterministic across runs
    again = extract_image_features(df, fake=True).collect()
    assert [r["feature"] for r in out] == [r["feature"] for r in again]
    # real path: garbage bytes raise a clear decode error (PNG decode is
    # real now; formats we still can't decode raise NotImplementedError)
    with pytest.raises(
        Exception, match="NotImplementedError|PIL|decoding|not a PNG"
    ):
        extract_image_features(df, fake=False).collect()


def test_fingerprint_and_quality(spark, sf_dir):
    from apache___solr_spark.pipeline.textqual import (
        document_fingerprint,
        quality_score,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = document_fingerprint(d, "text", "doc_id")
    assert fp.count() == d.count()
    # same normalized content -> same fingerprint
    two = spark.createDataFrame(
        [(1, "Hello,   WORLD!"), (2, "hello world")], "doc_id long, text string"
    )
    vals = [r["fingerprint"] for r in document_fingerprint(two, "text", "doc_id").collect()]
    assert vals[0] == vals[1]
    q = quality_score(d, "text", "doc_id")
    assert q.filter(F.col("quality") > 1.0).count() == 0


def test_repetition_stats_hand_computed(spark):
    """Gopher repetition filters vs hand-computed fixtures: duplicate
    lines, a dominating 2-gram, empty text, and a no-repeat doc."""
    from apache___solr_spark.pipeline.textqual import repetition_stats

    rows = [
        (1, "a b c\na b c\nx y z"),          # 1 dup line of 3; "a b"/"b c" x2
        (2, "the cat the cat the cat sat"),  # "the cat" covers 6/7 tokens
        (3, ""),                              # all-zero guards
        (4, "unique words only here now"),    # no repetition at all
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(df, "text", "doc_id").collect()
    }
    assert got[1]["n_lines"] == 3
    assert got[1]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[1]["dup_line_char_frac"] == pytest.approx(5 / 15, abs=1e-6)
    # 9 tokens, 8 2-grams, top count 2 -> 4/9; distinct 6 -> dup 2/8
    assert got[1]["top_2gram_frac"] == pytest.approx(4 / 9, abs=1e-6)
    assert got[1]["dup_2gram_frac"] == pytest.approx(2 / 8, abs=1e-6)
    # 7 3-grams, "a b c" twice -> 1/7
    assert got[1]["dup_3gram_frac"] == pytest.approx(1 / 7, abs=1e-6)
    # doc 2: 7 tokens; "the cat" x3 -> 6/7; 6 2-grams, 3 distinct -> 0.5;
    # 5 3-grams, 3 distinct -> 0.4
    assert got[2]["top_2gram_frac"] == pytest.approx(6 / 7, abs=1e-6)
    assert got[2]["dup_2gram_frac"] == pytest.approx(0.5, abs=1e-6)
    assert got[2]["dup_3gram_frac"] == pytest.approx(0.4, abs=1e-6)
    assert all(v == 0 for k, v in got[3].items() if k != "doc_id")
    assert got[4]["dup_2gram_frac"] == 0.0
    assert got[4]["top_2gram_frac"] == pytest.approx(2 / 5, abs=1e-6)


def test_minhash_bucket_cap_bounds_degenerate_cliques(spark):
    """A degenerate bucket (many identical docs) must not go O(n^2): with a
    cap the clique's pairs are dropped, while normal near-dup pairs in small
    buckets survive."""
    rows = [(i, "the same boilerplate page content repeated verbatim " * 5)
            for i in range(30)]
    rows += [
        (100, "a unique document about distributed inverted index builds"),
        (101, "a unique document about distributed inverted index build"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_lsh_candidates(
        df, "text", "doc_id", max_bucket_size=None
    ).count()
    capped = minhash_lsh_candidates(
        df, "text", "doc_id", max_bucket_size=10
    )
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert uncapped >= 30 * 29 // 2  # the clique exploded without a cap
    assert (100, 101) in pairs  # normal candidates survive the cap
    assert all(a >= 100 for a, _ in pairs)  # clique pairs are gone


def test_ann_index_persists_and_prunes(spark, tmp_path):
    """build_ann_index + query_ann_index: partition-pruned probe scan with
    decent recall vs exact brute force."""
    from apache___solr_spark.pipeline.similarity import (
        build_ann_index,
        query_ann_index,
    )

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((400, 16)).astype("float32")
    # plant 9 true near neighbors of vec 0 (ids 1..9) so exact top-10 is
    # structured, not gaussian noise
    for i in range(1, 10):
        vecs[i] = vecs[0] + 0.05 * rng.standard_normal(16).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    out = str(tmp_path / "ann")
    build_ann_index(df, out, dim=16)
    q = [float(x) for x in vecs[0]]
    got = query_ann_index(spark, out, q, k=10, multiprobe_hamming=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "lsh_bucket" in plan and "PartitionFilters" in plan
    ids = {r["vec_id"] for r in got.collect()}
    assert 0 in ids  # the query vector itself is its own nearest neighbor
    exact = {
        r["vec_id"] for r in cosine_topk_bruteforce(df, q, k=10).collect()
    }
    assert len(ids & exact) / 10 >= 0.5


def test_embedding_near_dup_lsh_recall(spark):
    """LSH bucket-join near-dup variant finds most of the exact pairs."""
    from apache___solr_spark.pipeline.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16))
    # plant 20 near-dup pairs
    for i in range(20):
        vecs[100 + i] = vecs[i] + 0.02 * rng.standard_normal(16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, 0.95, use_lsh=False).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, 0.95, use_lsh=True, n_planes=6
        ).collect()
    }
    assert len(exact) >= 20
    assert approx <= exact  # no false positives (exact cosine filter)
    assert len(approx & exact) / len(exact) >= 0.5  # recall


def test_ivf_index_recall_and_pruning(spark, tmp_path):
    """IVF (spherical k-means coarse quantizer) ANN: on a clustered corpus,
    recall@20 >= 0.9 vs exact brute force while scanning <= 10% of the
    partitions (2 probes of 20 cells) — the adaptive-centroid upgrade over
    random-hyperplane LSH (VERDICT r2 #7)."""
    from apache___solr_spark.pipeline.similarity import (
        build_ivf_index,
        cosine_topk_bruteforce,
        query_ivf_index,
    )

    rng = np.random.default_rng(3)
    n_clusters, per, dim = 20, 30, 32
    centers = rng.standard_normal((n_clusters, dim))
    rows = []
    vecs = []
    for c in range(n_clusters):
        for j in range(per):
            v = centers[c] + 0.15 * rng.standard_normal(dim)
            vecs.append(v)
            rows.append((len(rows), [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = str(tmp_path / "ivf")
    build_ivf_index(df, out, n_centroids=20, seed=5)

    recalls = []
    for qid in (0, 31, 333):
        q = rows[qid][1]
        got = query_ivf_index(spark, out, q, k=20, n_probes=2)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "ivf_cell" in plan and "PartitionFilters" in plan
        ids = {r["vec_id"] for r in got.collect()}
        exact = {r["vec_id"] for r in cosine_topk_bruteforce(df, q, k=20).collect()}
        recalls.append(len(ids & exact) / 20)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_finds_planted_near_dup_in_real_embeddings(spark, sf_dir, tmp_path):
    """On the driver's embeddings table (near-random vectors with planted
    near-dup pairs), the IVF index must return a planted near-duplicate in
    its top-k for a query that has one (the near-dup recall that matters
    for dedup at scale; whole-top-20 recall is probe-fraction-bound on
    unclustered data — documented)."""
    from apache___solr_spark.pipeline.similarity import (
        build_ivf_index,
        embedding_near_dup_pairs,
        query_ivf_index,
    )

    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    planted = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda v: v + F.lit(0.05)).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    out = str(tmp_path / "ivf_emb")
    build_ivf_index(corpus, out, n_centroids=16, seed=5)
    by_id = {r["vec_id"]: r["embedding"] for r in base.limit(10).collect()}
    hit = 0
    for vid, q in by_id.items():
        got = {
            r["vec_id"]
            for r in query_ivf_index(spark, out, q, k=10, n_probes=2).collect()
        }
        hit += (vid + 100000) in got
    assert hit / len(by_id) >= 0.9, hit


def test_nsw_beam_is_sublinear_and_accurate():
    """Pure-graph check (no Spark): on a 2000-node NSW graph the beam
    search scores a small fraction of the nodes yet lands >= 0.9 of the
    exact top-10 — the property that makes per-cell graph search beat the
    per-cell brute scan once cells grow."""
    from apache___solr_spark.pipeline.similarity import (
        _build_nsw_adj,
        _nsw_beam,
    )

    rng = np.random.default_rng(9)
    n, dim = 2000, 24
    centers = rng.standard_normal((25, dim))
    vecs = centers[rng.integers(0, 25, n)] + 0.2 * rng.standard_normal(
        (n, dim)
    )
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    adj = _build_nsw_adj(vn, m=8, ef_construction=32)
    recalls, fractions = [], []
    for qi in (3, 700, 1500):
        q = vn[qi]
        hits, scored = _nsw_beam(vn, adj, q, ef=48)
        exact = set(np.argsort(-(vn @ q))[:10].tolist())
        recalls.append(len(exact & set(hits[:10])) / 10)
        fractions.append(scored / n)
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    assert max(fractions) <= 0.5, fractions  # beam never scans the cell


def test_graph_ann_recall_and_pruning(spark, tmp_path):
    """Graph ANN (NSW inside IVF cells — the HNSW-equivalent): recall@20
    >= 0.9 vs exact brute force on a clustered corpus while reading only
    the probed cells' partitions (PartitionFilters in the plan)."""
    from apache___solr_spark.pipeline.similarity import (
        build_graph_ann_index,
        cosine_topk_bruteforce,
        query_graph_ann_index,
    )

    rng = np.random.default_rng(3)
    n_clusters, per, dim = 20, 30, 32
    centers = rng.standard_normal((n_clusters, dim))
    rows = []
    for c in range(n_clusters):
        for j in range(per):
            v = centers[c] + 0.15 * rng.standard_normal(dim)
            rows.append((len(rows), [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = str(tmp_path / "graph_ann")
    build_graph_ann_index(df, out, n_centroids=20, m=8, seed=5)

    recalls = []
    for qid in (0, 31, 333):
        q = rows[qid][1]
        got = query_graph_ann_index(spark, out, q, k=20, n_probes=2)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "ivf_cell" in plan and "PartitionFilters" in plan
        ids = {r["vec_id"] for r in got.collect()}
        exact = {
            r["vec_id"] for r in cosine_topk_bruteforce(df, q, k=20).collect()
        }
        recalls.append(len(ids & exact) / 20)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_duplicate_components_vs_union_find(spark):
    """Connected components over candidate pairs vs a scalar union-find
    oracle: chains, a star, a triangle merged with a chain, and isolated
    pairs — the shapes near-dup clusters actually take."""
    from apache___solr_spark.pipeline.dedup import duplicate_components

    edges = [
        (1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
        (10, 11), (10, 12), (10, 13),    # star at 10
        (20, 21), (21, 22), (20, 22),    # triangle
        (22, 23),                        # chain off the triangle
        (30, 31),                        # isolated pair
        (40, 41), (42, 41),              # V shape
    ]
    # scalar union-find oracle
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {v: find(v) for v in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in duplicate_components(df).collect()
    }
    assert got == expect


def test_dedup_keep_canonical_end_to_end(spark):
    """pairs from the minhash detector -> one survivor per duplicate
    component, untouched docs pass through."""
    from apache___solr_spark.pipeline.dedup import (
        dedup_keep_canonical,
        minhash_lsh_candidates,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet green field toward the river bank"
    )
    rows = [(1, base), (2, base + " extra"), (3, base + " extra words")]
    rows += [(50, "completely different content about spark query engines"),
             (51, "another unrelated document mentioning inverted indexes")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_candidates(docs, "text", "doc_id")
    assert pairs.count() >= 2  # the three planted dups must pair up
    kept = dedup_keep_canonical(docs, pairs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert 1 in ids and 50 in ids and 51 in ids
    assert 2 not in ids and 3 not in ids


def test_remove_repeated_lines_matches_duckdb(spark):
    """C4/Gopher boilerplate-line removal vs an independent DuckDB oracle:
    lines >= min_line_chars appearing in >= 3 distinct docs vanish from
    every doc; order and short/unique lines survive."""
    import duckdb

    from apache___solr_spark.pipeline.dedup import remove_repeated_lines

    banner = "accept our cookies to continue browsing"
    footer = "copyright 2024 example corp all rights reserved"
    docs = []
    for i in range(12):
        lines = [f"unique opening line for document {i}"]
        if i % 2 == 0:
            lines.append(banner)
        lines.append(f"body text {i} with enough characters to count")
        if i % 3 == 0:
            lines.append(footer)
        lines.append("ok")  # short line: exempt even though repeated
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in remove_repeated_lines(
            df, "text", "id", min_repeats=3, min_line_chars=10
        ).collect()
    }

    con = duckdb.connect()
    con.execute("create table docs(id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", docs)
    oracle = con.execute("""
        with lines as (
          select id, u.line, u.pos
          from docs,
               lateral (select unnest(string_split(text, chr(10))) as line,
                               generate_subscripts(string_split(text, chr(10)), 1) as pos) u
        ), boiler as (
          select trim(line) tl from lines
          where length(trim(line)) >= 10
          group by trim(line) having count(distinct id) >= 3
        )
        select id,
               string_agg(line, chr(10) order by pos)
                 filter (where length(trim(line)) < 10
                         or trim(line) not in (select tl from boiler)) as text,
               count(*) as n_lines,
               count(*) filter (where length(trim(line)) >= 10
                         and trim(line) in (select tl from boiler)) as n_removed
        from lines group by id
    """).fetchall()
    want = {r[0]: (r[1] or "", r[2], r[3]) for r in oracle}
    assert got == want
    # the planted banner/footer are gone everywhere, uniques survive
    assert all(banner not in t for t, _, _ in got.values())
    assert all(footer not in t for t, _, _ in got.values())
    assert all("unique opening line" in t for t, _, _ in got.values())
    assert all(t.count("\nok") >= 0 and "ok" in t for t, _, _ in got.values())


def test_scrub_pii_matches_duckdb(spark):
    """PII scrub vs a DuckDB/RE2 oracle applying the same three patterns in
    the same fixed order (emails -> IPs -> phones); counts and redacted
    text must agree exactly."""
    import duckdb

    from apache___solr_spark.pipeline.textqual import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        scrub_pii,
    )

    docs = [
        (1, "contact alice.smith+spam@sub.example.co.uk or call 555-123-4567"),
        (2, "server at 192.168.1.254 and 8.8.8.8; port 999.999.999.999 is not an ip"),
        (3, "ring +44 20 7946 0958 or (020) 1234 5678 today"),
        (4, "no pii here, just the year 2024 and id 123456"),
        (5, "bob@localhost is not an email but bob@x.io is; ip 10.0.0.1."),
        (6, "date 20240101 is aggressive-matched as a phone; v1.2.3 is not"),
        (7, ""),
        (8, "mixed: a@b.org, 1.2.3.4, +1 (800) 555-0199, done"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: (r["text"], r["n_emails"], r["n_ips"], r["n_phones"])
        for r in scrub_pii(df, "text", "id").collect()
    }

    con = duckdb.connect()
    con.execute("create table docs(id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", docs)
    oracle = con.execute(
        """
        with t1 as (
          select id,
                 len(regexp_extract_all(text, ?)) as n_emails,
                 regexp_replace(text, ?, '<EMAIL>', 'g') as txt
          from docs
        ), t2 as (
          select id, n_emails,
                 len(regexp_extract_all(txt, ?)) as n_ips,
                 regexp_replace(txt, ?, '<IP>', 'g') as txt
          from t1
        )
        select id,
               regexp_replace(txt, ?, '<PHONE>', 'g') as txt,
               n_emails, n_ips,
               len(regexp_extract_all(txt, ?)) as n_phones
        from t2
        """,
        [PII_EMAIL_RE, PII_EMAIL_RE, PII_IPV4_RE, PII_IPV4_RE,
         PII_PHONE_RE, PII_PHONE_RE],
    ).fetchall()
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in oracle}
    assert got == want
    # spot semantics: emails/ips/phones gone, innocents survive
    assert "<EMAIL>" in got[1][0] and "<PHONE>" in got[1][0]
    # the two real IPs are typed <IP>; the out-of-range quad is NOT an IP
    # (it falls through to the aggressive phone pass instead)
    assert got[2][0].count("<IP>") == 2 and got[2][1:] == (0, 2, 1)
    assert got[3][3] == 2
    assert got[4] == ("no pii here, just the year 2024 and id 123456", 0, 0, 0)
    assert "bob@localhost" in got[5][0] and "<EMAIL>" in got[5][0]
    assert got[7] == ("", 0, 0, 0)


def test_canonicalize_urls_matches_urllib_oracle(spark):
    """URL canonicalization vs an independent urllib-based oracle that
    implements the same documented contract (scheme/host case, ports,
    userinfo, index pages, tracking params, param sort, fragments)."""
    import re
    from urllib.parse import urlsplit

    from apache___solr_spark.pipeline.weburl import (
        canonicalize_urls,
        url_dedup_key,
    )

    urls = [
        "HTTP://Example.COM/a/b/c?x=2&utm_source=tw&a=1#frag",
        "https://example.com:443//a//b/index.html?b=1&a=2",
        "http://user:pw@Sub.Example.com.:8080/path/?fbclid=zzz",
        "https://example.com",
        "http://example.com:80/?ref=hn",
        "https://news.example.co.uk/2024/01/story.html?gclid=1&z=9&y=8",
        "ftp://files.example.com/pub/x.tar.gz",
        "  https://pad.example.org/index.php?utm_medium=mail  ",
        "http://one.test/a?empty=&=bare&utm_x=1",
        "https://dot.test./",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
    got = {
        r["id"]: (r["url_canon"], r["host"], r["domain"], r["url_levels"], r["is_top_page"])
        for r in canonicalize_urls(df, "url", "id").collect()
    }

    track = re.compile(r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)=")

    def oracle(u):
        u = u.strip()
        sp = urlsplit(u)
        if sp.scheme.lower() not in ("http", "https"):
            return (u, None, None, None, None)
        scheme = sp.scheme.lower()
        host = (sp.hostname or "").rstrip(".")
        port = ""
        if sp.port is not None and sp.port != (80 if scheme == "http" else 443):
            port = f":{sp.port}"
        path = re.sub(r"/{2,}", "/", sp.path) or "/"
        path = re.sub(r"/index\.(html?|php)$", "/", path)
        params = sorted(p for p in sp.query.split("&") if p and not track.match(p))
        query = "&".join(params)
        canon = f"{scheme}://{host}{port}{path}" + (f"?{query}" if query else "")
        labels = host.split(".")
        domain = ".".join(labels[-2:]) if len(labels) >= 2 else host
        levels = len([s for s in path.split("/") if s])
        return (canon, host, domain, levels, path == "/" and query == "")

    want = {i: oracle(u) for i, u in enumerate(urls)}
    assert got == want
    # dedup key: scheme-case / default-port / tracking-param variants of
    # the same page collapse to one key, distinct pages do not
    variants = [
        (1, "http://example.com/a?x=1"),
        (2, "HTTP://EXAMPLE.COM:80/a?x=1&utm_source=z"),
        (3, "http://example.com/a?x=1#part2"),
        (4, "http://example.com/b?x=1"),
    ]
    vdf = spark.createDataFrame(variants, "id long, url string")
    keys = {r["id"]: r["k"] for r in vdf.select("id", url_dedup_key("url").alias("k")).collect()}
    assert keys[1] == keys[2] == keys[3] != keys[4]


def test_char_lm_perplexity_matches_duckdb(spark):
    """CCNet-style char-trigram perplexity vs a DuckDB oracle implementing
    the identical normalization, padding, add-k smoothing, and fallback
    chain; plus the semantic property the filter exists for: text like the
    training corpus scores lower perplexity than gibberish."""
    import duckdb
    import pytest as _pytest

    from apache___solr_spark.pipeline.lm import (
        perplexity_filter,
        score_perplexity,
        train_char_lm,
    )

    train_rows = [
        (i, t) for i, t in enumerate([
            "the quick brown fox jumps over the lazy dog",
            "a distributed index maps terms to posting lists",
            "language models assign probabilities to character sequences",
            "the cat sat on the mat and the dog slept on the rug",
            "spark shuffles data between executors during wide operations",
        ])
    ]
    score_rows = [
        (100, "the dog jumps over the brown fox near the mat"),
        (101, "xqzv jkwp zzyx qqqq vvkk wxyz zkqv pzzx"),
        (102, "Spark, MAPS terms!!  to posting lists."),
        (103, ""),
    ]
    tdf = spark.createDataFrame(train_rows, "id long, text string")
    sdf = spark.createDataFrame(score_rows, "id long, text string")
    lm = train_char_lm(tdf, "text", "id", n=3, add_k=0.1, vocab_cap=None)
    got = {
        r["id"]: (r["ppl"], r["n_grams"])
        for r in score_perplexity(sdf, "text", "id", lm).collect()
    }

    con = duckdb.connect()
    con.execute("create table train(id bigint, text varchar)")
    con.executemany("insert into train values (?, ?)", train_rows)
    con.execute("create table score(id bigint, text varchar)")
    con.executemany("insert into score values (?, ?)", score_rows)
    con.execute("""
        create macro pad(t) as '^^' ||
          trim(regexp_replace(regexp_replace(lower(t), '[^a-z0-9 ]', ' ', 'g'),
                              ' {2,}', ' ', 'g')) || '$';
        create table grams as
          select g.id, substr(g.p, u.i, 3) gram
          from (select id, pad(text) p from train) g,
               lateral (select unnest(generate_series(1, length(g.p) - 2)) as i) u;
        create table counts as
          select gram, count(*) c from grams group by gram;
        create table ctx as
          select substr(gram,1,2) ctx, sum(c) cc,
                 ln(0.1 / (sum(c) + 0.1*38)) log_unseen
          from counts group by substr(gram,1,2);
        create table model as
          select gram, ln((c + 0.1) / (cc + 0.1*38)) logp
          from counts join ctx on substr(counts.gram,1,2) = ctx.ctx;
    """)
    oracle = con.execute("""
        with sg as (
          select g.id, substr(g.p, u.i, 3) gram
          from (select id, pad(text) p from score) g,
               lateral (select unnest(generate_series(1, length(g.p) - 2)) as i) u
        )
        select sg.id,
               exp(-avg(coalesce(model.logp, ctx.log_unseen, ln(1.0/38)))) ppl,
               count(*) n
        from sg
        left join model on sg.gram = model.gram
        left join ctx on substr(sg.gram,1,2) = ctx.ctx
        group by sg.id
    """).fetchall()
    want = {r[0]: (r[1], r[2]) for r in oracle}
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == _pytest.approx(want[k][0], rel=1e-9)
    # semantics: in-domain < rewrite-of-train < gibberish
    assert got[100][0] < got[101][0]
    assert got[102][0] < got[101][0]
    # empty text still scores (pure boundary gram), and the filter keeps
    # exactly the low-perplexity docs
    assert got[103][1] == 1
    cut = (got[100][0] + got[101][0]) / 2
    kept = sorted(
        r["id"] for r in perplexity_filter(sdf, "text", "id", lm, cut).collect()
    )
    assert 100 in kept and 101 not in kept


def test_detect_language_multi(spark):
    """Multi-language stopword-profile classifier: real sentences in each
    of the 7 profiled languages classify correctly; gibberish and empty
    fall to 'und'; values match an independent Python re-implementation of
    the documented arithmetic (position hits / n_tokens, argmax with
    lexicographically-later tiebreak)."""
    import re

    from apache___solr_spark.pipeline.textqual import (
        LANG_PROFILES,
        detect_language_multi,
    )

    rows = [
        (1, "en", "The cat was in the house and it was clear that they "
                  "were happy with the food from the garden."),
        (2, "es", "El perro estaba en la casa y los gatos del barrio "
                  "jugaban con una pelota para pasar el rato, pero sus "
                  "amigos no estaban."),
        (3, "fr", "Le chien est dans la maison et les chats du quartier "
                  "jouent avec une balle pour passer le temps, mais pas "
                  "avec plus de bruit."),
        (4, "de", "Der Hund war in dem Haus und die Katzen aus der "
                  "Nachbarschaft spielten mit einem Ball, aber es ist "
                  "nicht immer so gewesen."),
        (5, "it", "Il cane era nella casa e i gatti del quartiere "
                  "giocavano con una palla per passare il tempo, ma non "
                  "sono anche questo."),
        (6, "pt", "O cachorro estava em casa e os gatos do bairro "
                  "brincavam com uma bola para passar o tempo, mas seu "
                  "amigo nao foi com ele."),
        (7, "nl", "De hond was in het huis en de katten uit de buurt "
                  "speelden met een bal om de tijd te doden, maar het is "
                  "niet altijd zo."),
        (8, "und", "zzkw qplx mvrt aaod kkjw pzlm wwox"),
        (9, "und", ""),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, _, t in rows], "id long, text string"
    )
    got = {
        r["id"]: (r["lang_pred"], r["lang_ratio"])
        for r in detect_language_multi(df, "text", "id").collect()
    }

    def oracle(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if not toks:
            return ("und", 0.0)
        best = max(
            ((sum(t in set(ws) for t in toks), code)
             for code, ws in LANG_PROFILES.items()),
        )
        ratio = best[0] / len(toks)
        return (best[1] if ratio >= 0.08 else "und", round(ratio, 6))

    for i, want_lang, text in rows:
        assert got[i] == oracle(text), (i, got[i], oracle(text))
        assert got[i][0] == want_lang, (i, got[i], want_lang)


def test_repetition_stats_short_and_empty_docs(spark):
    """Docs shorter than the n-gram width (and empty/null text) must not
    fault the in-array-guarded gram builder."""
    from apache___solr_spark.pipeline.textqual import repetition_stats

    df = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            repetition_stats(df, "text", "doc_id").collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r["dup_2gram_frac"] == 0.0
        assert r["dup_3gram_frac"] == 0.0


def test_decontaminate_matches_duckdb(spark):
    """GPT-3-style 13-gram benchmark decontamination vs an independent
    DuckDB oracle that matches gram STRINGS (the engine matches xxhash64
    of the same grams): exact eval passages inside training docs flag the
    doc, paraphrases and clean docs don't, short eval items catch
    verbatim short docs, and drop mode removes exactly the flagged ids."""
    import duckdb

    from apache___solr_spark.pipeline.dedup import decontaminate

    passage = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronomers chart retrograde orbits from a windswept ridge"
    )  # 19 tokens
    short_eval = "tiny holdout answer"  # 3 tokens < n
    evals = [(0, f"Q: something? A: {passage}"), (1, short_eval)]
    docs = [
        (0, f"intro text here. {passage}. closing remarks follow."),  # hit
        (1, passage.replace("seventeen", "nineteen")),  # paraphrase: clean
        (2, "Tiny holdout ANSWER"),  # short doc == short eval item (normed)
        (3, "tiny holdout answer embedded in a much longer document "
            "that keeps going for quite a few more tokens than thirteen "
            "so only 13-grams are generated"),  # short eval NOT caught: documented
        (4, "completely unrelated clean document about gardening and soil "
            "acidity with more than thirteen tokens of ordinary text in it"),
        (5, ""),  # empty
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    edf = spark.createDataFrame(evals, "eid long, text string")

    flagged = decontaminate(df, edf, "text", "id", n=13, mode="flag")
    got = {
        r["id"]: (r["n_hits"], r["contaminated"]) for r in flagged.collect()
    }

    con = duckdb.connect()
    con.execute("create table docs(id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", docs)
    con.execute("create table evals(eid bigint, text varchar)")
    con.executemany("insert into evals values (?, ?)", evals)
    n = 13
    oracle = con.execute(f"""
        with tr as (
          select id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') t from docs
        ), trg as (
          select id, array_to_string(t[i:i+{n - 1}], ' ') g
          from tr, lateral (select unnest(generate_series(1, len(t) - {n - 1})) as i)
          where len(t) >= {n}
          union all
          select id, array_to_string(t, ' ') from tr
          where len(t) > 0 and len(t) < {n}
        ), ev as (
          select list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') t from evals
        ), evg as (
          select distinct g from (
            select array_to_string(t[i:i+{n - 1}], ' ') g
            from ev, lateral (select unnest(generate_series(1, len(t) - {n - 1})) as i)
            where len(t) >= {n}
            union all
            select array_to_string(t, ' ') from ev
            where len(t) > 0 and len(t) < {n}
          )
        ), hits as (
          select id, count(*) h from trg join evg using (g) group by id
        )
        select d.id, coalesce(h, 0), coalesce(h, 0) > 0
        from docs d left join hits using (id)
    """).fetchall()
    want = {r[0]: (r[1], r[2]) for r in oracle}
    assert got == want
    # semantics spot checks (the oracle agrees, but make intent explicit)
    assert got[0][1] and got[2][1]
    assert not got[1][1] and not got[3][1] and not got[4][1] and not got[5][1]

    # the eval gram set must ride a broadcast join (no corpus shuffle)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    dropped = decontaminate(df, edf, "text", "id", n=13, mode="drop")
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3, 4, 5]


def test_pack_sequences_matches_duckdb(spark):
    """Concat-and-chunk packing vs a DuckDB oracle computing the SAME tape
    (explicit order_col = id so both engines agree on document order): one
    global window cumsum + generate_series chunk spans.  Covers docs much
    longer than seq_len, exact-boundary docs, and 1-token docs."""
    import duckdb

    from apache___solr_spark.pipeline.dedup import decontaminate  # noqa: F401
    from apache___solr_spark.pipeline.packing import pack_sequences

    L = 10
    docs = [(1, 3), (2, 10), (3, 27), (4, 1), (5, 0), (6, 9), (7, 20)]
    df = spark.createDataFrame(docs, "id long, n long")
    got = pack_sequences(
        df, "id", "n", L, order_col=F.col("id"), num_buckets=4
    )
    got_rows = sorted(
        (r["seq_id"], r["id"], r["seq_offset"], r["doc_offset"], r["n_toks"])
        for r in got.collect()
    )

    con = duckdb.connect()
    con.execute("create table docs(id bigint, n bigint)")
    con.executemany("insert into docs values (?, ?)", docs)
    want = sorted(
        tuple(r)
        for r in con.execute(f"""
        with d as (select id, n from docs where n > 0),
        c as (select id, n,
              sum(n) over (order by id rows between unbounded preceding
                           and current row) - n as s from d),
        x as (select id, n, s,
              unnest(generate_series((s // {L})::bigint,
                                     ((s + n - 1) // {L})::bigint)) q from c)
        select q, id,
               greatest(s, q*{L}) - q*{L},
               greatest(s, q*{L}) - s,
               least(s + n, (q+1)*{L}) - greatest(s, q*{L})
        from x
    """).fetchall()
    )
    assert got_rows == want

    # packing invariants: every full sequence holds exactly L tokens, the
    # tape has no holes, and each doc's slices tile [0, n) exactly
    per_seq = {}
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for q, i, so, do, nt in got_rows:
        assert nt > 0 and 0 <= so < L and so + nt <= L
        per_seq[q] = per_seq.get(q, 0) + nt
        per_doc.setdefault(i, []).append((do, nt))
    total = sum(n for _, n in docs)
    assert sum(per_seq.values()) == total
    last_seq = max(per_seq)
    for q, filled in per_seq.items():
        assert filled == L or (q == last_seq and filled == total - last_seq * L)
    for i, n in docs:
        if n == 0:
            assert i not in per_doc
            continue
        spans = sorted(per_doc[i])
        pos = 0
        for do, nt in spans:
            assert do == pos
            pos += nt
        assert pos == n


def test_pack_sequences_bucket_invariance_and_default_order(spark):
    """The distributed-prefix-sum decomposition is invisible: any
    num_buckets gives byte-identical output; the default (seeded xxhash64)
    order is deterministic across runs and seeds change it."""
    from apache___solr_spark.pipeline.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, 1 + (i * 7) % 23) for i in range(200)], "id long, n long"
    )

    def rows(**kw):
        return sorted(map(tuple, pack_sequences(df, "id", "n", 16, **kw).collect()))

    base = rows(order_col=F.col("id"), num_buckets=1)
    assert rows(order_col=F.col("id"), num_buckets=7) == base
    assert rows(order_col=F.col("id"), num_buckets=1024) == base

    d0 = rows(seed=0)
    assert rows(seed=0) == d0  # reproducible
    d1 = rows(seed=1)
    assert d1 != d0  # the seed really shuffles the tape
    # same token mass either way
    assert sum(r[4] for r in d0) == sum(r[4] for r in d1)


def test_stratified_sample_deterministic_and_monotone(spark):
    """Hash-threshold sampling: exactly reproducible, monotone in the
    rate (raising a rate only ADDS docs), exact at rates 0 and 1,
    empirically near the requested fraction, and map-only (no shuffle)."""
    from apache___solr_spark.pipeline.packing import stratified_sample

    df = spark.createDataFrame(
        [(i, ["web", "books", "code"][i % 3]) for i in range(3000)],
        "id long, domain string",
    )

    def ids(rates, **kw):
        return {
            r["id"]
            for r in stratified_sample(df, "domain", rates, "id", **kw).collect()
        }

    a = ids({"web": 0.3, "books": 1.0})
    assert ids({"web": 0.3, "books": 1.0}) == a  # deterministic
    b = ids({"web": 0.6, "books": 1.0})
    assert a <= b  # monotone: the 0.3 sample is a subset of the 0.6 sample
    assert {i for i in a if i % 3 == 1} == {i for i in range(3000) if i % 3 == 1}
    assert all(i % 3 != 2 for i in a)  # unlisted stratum -> default_rate=0
    n_web = sum(1 for i in a if i % 3 == 0)
    assert 0.22 <= n_web / 1000 <= 0.38  # ~30% of the 1000 web docs
    assert ids({"web": 0.3}, seed=7) != ids({"web": 0.3}, seed=8)

    plan = (
        stratified_sample(df, "domain", {"web": 0.5}, "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # map-only


def test_pack_sequences_property_fuzz(spark):
    """Property fuzz vs a shared-nothing Python oracle: random doc sets
    (token counts 1..3L, including all-shorter-than-L and one-huge-doc
    shapes), random seq_len and bucket counts — packing must equal the
    oracle's concat-and-chunk exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from apache___solr_spark.pipeline.packing import pack_sequences

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        ns=st.lists(st.integers(min_value=0, max_value=45), min_size=1, max_size=25),
        L=st.integers(min_value=1, max_value=17),
        buckets=st.sampled_from([1, 3, 64]),
    )
    def check(ns, L, buckets):
        docs = [(i, n) for i, n in enumerate(ns)]
        got = sorted(
            map(
                tuple,
                pack_sequences(
                    spark.createDataFrame(docs, "id long, n long"),
                    "id",
                    "n",
                    L,
                    order_col=F.col("id"),
                    num_buckets=buckets,
                    persist=False,
                ).collect(),
            )
        )
        want, start = [], 0
        for i, n in docs:
            if n == 0:
                continue
            for q in range(start // L, (start + n - 1) // L + 1):
                lo, hi = max(start, q * L), min(start + n, (q + 1) * L)
                want.append((q, i, lo - q * L, lo - start, hi - lo))
            start += n
        assert got == sorted(want)

    check()


def test_decontaminate_spans_python_oracle(spark):
    """Surgical decontamination vs an independent Python oracle that
    re-implements the semantics over gram STRINGS: only the overlapping
    token runs (plus pad) are cut, two separated collisions give two
    cuts, a short fully-matching doc empties, clean docs pass through
    (modulo the lossy token normalization)."""
    import re

    from apache___solr_spark.pipeline.dedup import decontaminate_spans

    n = 5
    passage = "alpha bravo charlie delta echo foxtrot golf"  # 7 tokens
    evals = [(0, passage), (1, "tiny holdout")]
    docs = [
        (0, f"intro words here {passage} closing words follow"),
        (1, f"{passage} mid filler tokens one two three four {passage}"),
        (2, "Tiny HOLDOUT"),  # short doc fully == short eval (normalized)
        (3, "a completely clean document with no overlap at all present"),
        (4, ""),
    ]

    def toks(s):
        return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]

    def oracle(text, pad):
        t = toks(text)
        egrams = set()
        for _, e in evals:
            et = toks(e)
            if len(et) >= n:
                for i in range(len(et) - n + 1):
                    egrams.add(" ".join(et[i : i + n]))
            elif et:
                egrams.add(" ".join(et))
        cut = [False] * len(t)
        if len(t) >= n:
            hits = [
                i
                for i in range(len(t) - n + 1)
                if " ".join(t[i : i + n]) in egrams
            ]
            for i in hits:
                for j in range(max(0, i - pad), min(len(t), i + n + pad)):
                    cut[j] = True
        elif t and " ".join(t) in egrams:
            cut = [True] * len(t)
            if pad:
                cut = [True] * len(t)
        kept = [x for x, c in zip(t, cut) if not c]
        return " ".join(kept), len(t) - len(kept)

    df = spark.createDataFrame(docs, "id long, text string")
    edf = spark.createDataFrame(evals, "eid long, text string")
    for pad in (0, 2):
        got = {
            r["id"]: (r["text"], r["n_removed_tokens"])
            for r in decontaminate_spans(
                df, edf, "text", "id", n=n, pad=pad
            ).collect()
        }
        want = {i: oracle(txt, pad) for i, txt in docs}
        assert got == want, f"pad={pad}"
    # semantics spot checks on the pad=0 result
    got0 = {
        r["id"]: r
        for r in decontaminate_spans(df, edf, "text", "id", n=n).collect()
    }
    assert got0[0]["text"] == "intro words here closing words follow"
    assert got0[0]["n_removed_tokens"] == 7
    assert got0[1]["n_removed_tokens"] == 14  # both occurrences cut
    assert "mid filler tokens" in got0[1]["text"]
    assert got0[2]["text"] == "" and got0[2]["n_removed_tokens"] == 2
    assert got0[3]["n_removed_tokens"] == 0


# ---------------------------------------------------------------------------
# byte-level BPE tokenizer


def _naive_bpe(texts: list[str], vocab_size: int):
    """Independent BPE reference: full pair-rescan per merge over the raw
    pretoken stream (no word-frequency factoring, no incremental tables),
    pretokenized with the `regex` module instead of Spark's Java regex."""
    import regex

    from apache___solr_spark.pipeline.textqual import BPE_PRETOKEN_RE

    pat = regex.compile(BPE_PRETOKEN_RE)
    stream = [
        [bytes([b]) for b in pt.encode("utf-8")]
        for t in texts
        for pt in pat.findall(t)
        if pt
    ]
    merges = []
    for _ in range(vocab_size - 256):
        counts: dict = {}
        for syms in stream:
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = best[0] + best[1]
        for syms in stream:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i: i + 2] = [new]
                else:
                    i += 1
    return merges


def _naive_encode(text: str, merges):
    import regex

    from apache___solr_spark.pipeline.textqual import BPE_PRETOKEN_RE

    ranks = {p: i for i, p in enumerate(merges)}
    out = []
    for pt in regex.findall(BPE_PRETOKEN_RE, text):
        syms = [bytes([b]) for b in pt.encode("utf-8")]
        while len(syms) > 1:
            ranked = [
                (ranks[p], i)
                for i, p in enumerate(zip(syms, syms[1:]))
                if p in ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            syms[i: i + 2] = [syms[i] + syms[i + 1]]
        out.extend(syms)
    return out


def test_bpe_train_encode_matches_naive_oracle(spark):
    from apache___solr_spark.pipeline.bpe import (
        bpe_encode,
        bpe_token_count,
        merges_to_vocab,
        train_bpe,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "pack my box with five dozen liquor jugs, quickly!",
        "sphinx of black quartz judge my vow 123 456",
        "naïve café déjà-vu — unicode bytes büt good",
        "the the the quick quick lazy lazy lazy dog",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(df, "text", vocab_size=300)
    assert merges == _naive_bpe(texts, 300)
    assert len(merges) == 44

    vocab = merges_to_vocab(merges)
    want_syms = {i: _naive_encode(t, merges) for i, t in enumerate(texts)}

    got_counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(df, "text", "doc_id", merges).collect()
    }
    assert got_counts == {i: len(s) for i, s in want_syms.items()}
    assert got_counts[6] == 0  # empty doc present, zero tokens

    got_ids = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode(df, "text", "doc_id", merges).collect()
    }
    assert got_ids == {
        i: [vocab[s] for s in syms] for i, syms in want_syms.items() if syms
    }
    # lossless round-trip: decoded bytes == original utf-8
    inv = {v: k for k, v in vocab.items()}
    for i, t in enumerate(texts):
        if i in got_ids:
            assert b"".join(inv[x] for x in got_ids[i]) == t.encode("utf-8")


def test_bpe_min_count_and_shuffle_shape(spark):
    from apache___solr_spark.pipeline.bpe import bpe_token_count, train_bpe

    # each doc ends in a DISTINCT pretoken (" qqq...q", unique length) with
    # corpus frequency 1 — min_count=2 must prune them all from the
    # trainer's table, so no learned merge may contain a 'q'
    rows = [(i, "common words repeat here " + "q" * (30 + i)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, "text", vocab_size=280, min_count=2)
    assert merges, "repeated vocabulary must still produce merges"
    common_bytes = b"common words repeat here "
    for a, b in merges:
        assert b"q" not in (a + b)
        assert (a + b).replace(b" ", b"") in common_bytes
    # count path: distinct-pretoken encodings join broadcast (scale shape)
    plan = bpe_token_count(df, "text", "doc_id", merges)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Gopher quality rules / C4 cleaning


def _gopher_oracle(text: str) -> dict:
    import re as _re

    words = [w for w in _re.split(r"\s+", text.strip()) if w]
    lines = text.split("\n")
    n_words = len(words)
    mean_wl = sum(len(w) for w in words) / n_words if n_words else 0.0
    n_hash = text.count("#")
    n_ell = len(_re.split(r"\.\.\.|…", text)) - 1
    bullet = sum(1 for ln in lines if _re.match(r"^[•\-\*▪●]", ln.strip()))
    ell_ln = sum(1 for ln in lines if _re.search(r"(\.\.\.|…)$", ln.rstrip()))
    alpha = sum(1 for w in words if _re.search(r"[A-Za-z]", w))
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    n_stop = len(stops & {w.lower() for w in words})
    frac = lambda a, b: (a / b) if b else 0.0  # noqa: E731
    ok = {
        "ok_word_count": 50 <= n_words <= 100000,
        "ok_mean_wordlen": 3.0 <= mean_wl <= 10.0,
        "ok_symbol_ratio": frac(n_hash, n_words) <= 0.1
        and frac(n_ell, n_words) <= 0.1,
        "ok_bullet_lines": frac(bullet, len(lines)) <= 0.9,
        "ok_ellipsis_lines": frac(ell_ln, len(lines)) <= 0.3,
        "ok_alpha_words": frac(alpha, n_words) >= 0.8,
        "ok_stop_words": n_stop >= 2,
    }
    ok["gopher_pass"] = all(ok.values())
    return ok


def test_gopher_filters_matches_oracle(spark):
    from apache___solr_spark.pipeline.textqual import gopher_filters

    good = (
        "the quick brown fox and the lazy dog have fun with words of all "
        "kinds that keep going to be long enough for the gopher rules to "
        "accept this document as natural english prose with plenty of "
        "common terms and a few more filler sentences that add up to the "
        "required fifty word minimum for the word count rule to pass here"
    )
    texts = [
        good,
        "short text",  # word count fails
        good + " " + "#tag " * 30,  # hash symbol ratio fails
        good + (" trailing..." + "\nmore stuff..." ) * 8,  # ellipsis lines
        "\n".join(["- bullet item for this line"] * 20),  # bullets + count
        good.replace("the", "123").replace("and", "456"),  # stops/alpha hit
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in gopher_filters(df, "text", "doc_id").collect()
    }
    for i, t in enumerate(texts):
        want = _gopher_oracle(t)
        for k, v in want.items():
            assert bool(rows[i][k]) == v, (i, k, rows[i], want)
    assert rows[0]["gopher_pass"] and not rows[1]["gopher_pass"]


def test_c4_clean_matches_oracle(spark):
    import re as _re

    from apache___solr_spark.pipeline.textqual import c4_clean

    texts = [
        # normal page: mixed keepable/droppable lines
        "This is a fine sentence with enough words here.\n"
        "too short.\n"
        "No terminal punctuation on this line with many words\n"
        "Another good line that ends with a question mark, right?\n"
        "Uses javascript for the menu so it must be dropped today.\n"
        'A quoted line with plenty of words ends in a quote."\n'
        "And one more complete sentence finishes the page properly.",
        # lorem ipsum page
        "Lorem ipsum dolor sit amet, consectetur adipiscing elit today.\n"
        "Another fine sentence with more than enough words here.\n"
        "Third complete sentence to pass the minimum line count now.",
        # curly brace page
        "function f() { return 1; } is code and kills the page.\n"
        "Second sentence with plenty of words to keep around here.\n"
        "Third sentence with plenty of words to keep around here.",
        # too few surviving lines
        "Only one good sentence with enough words survives here.\nnope\nnah",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict() for r in c4_clean(df, "text", "doc_id").collect()
    }
    for i, t in enumerate(texts):
        kept = [
            ln
            for ln in t.split("\n")
            if _re.search(r'[.!?"]$', ln.rstrip())
            and len([w for w in _re.split(r"\s+", ln.strip()) if w]) >= 5
            and "javascript" not in ln.lower()
        ]
        keep = (
            len(kept) >= 3
            and "lorem ipsum" not in t.lower()
            and "{" not in t
            and "}" not in t
        )
        assert got[i]["text_clean"] == "\n".join(kept), i
        assert got[i]["n_lines_kept"] == len(kept), i
        assert bool(got[i]["c4_keep"]) == keep, i
    assert got[0]["c4_keep"] and not got[1]["c4_keep"] and not got[2]["c4_keep"]


def test_bpe_property_fuzz(spark):
    """Property fuzz: random unicode corpora — train + count must match the
    naive full-rescan oracle, and decoding must round-trip every byte."""
    import random

    from apache___solr_spark.pipeline.bpe import (
        bpe_token_count,
        merges_to_vocab,
        train_bpe,
    )

    rng = random.Random(7)
    alphabet = "ab cde\nü—🙂.,!?19"
    for trial in range(3):
        texts = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
            for _ in range(12)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        vs = 256 + rng.randrange(5, 40)
        merges = train_bpe(df, "text", vocab_size=vs)
        assert merges == _naive_bpe(texts, vs), (trial, vs)
        got = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_token_count(df, "text", "doc_id", merges).collect()
        }
        want = {i: len(_naive_encode(t, merges)) for i, t in enumerate(texts)}
        assert got == want, trial


def test_train_bpe_max_table_cap(spark):
    """The driver-side frequency-table collect is bounded by ``max_table``:

    (1) capped training == uncapped training on the EXACT deterministic
        top-N cut (freq desc, pretoken asc — incl. the tie at the cut),
        materialized independently in the test;
    (2) a non-binding cap changes nothing;
    (3) a ~1e6-distinct-pretoken corpus (driver-OOM shape at web scale
        without the cap) trains under a 2k cap — the collect is a
        TakeOrderedAndProject, the driver never sees the hapax tail."""
    from apache___solr_spark.pipeline.bpe import train_bpe

    # distinct freqs + one freq-tie pair ("cdab" vs "cdba") straddling the
    # cut so the pretoken-asc tiebreak is exercised
    vocab = [("ab" * (i + 1), 40 - i) for i in range(12)]
    vocab += [("cdab", 7), ("cdba", 7), ("xy", 3), ("yz", 2)]
    rows = [((" " + w) * f,) for w, f in vocab]
    full = spark.createDataFrame(rows, "text string")
    cap = 13  # keeps the 12 distinct-freq words + "cdab" (tie, pt asc)
    cut = sorted(vocab, key=lambda wf: (-wf[1], " " + wf[0]))[:cap]
    subset = spark.createDataFrame(
        [((" " + w) * f,) for w, f in cut], "text string"
    )
    capped = train_bpe(full, "text", vocab_size=290, max_table=cap)
    want = train_bpe(subset, "text", vocab_size=290, max_table=None)
    assert capped == want and capped
    # (2) non-binding cap == no cap
    loose = train_bpe(full, "text", vocab_size=290, max_table=10_000)
    uncapped = train_bpe(full, "text", vocab_size=290, max_table=None)
    assert loose == uncapped
    assert loose != capped  # the binding cut really dropped tail mass
    # (3) ~1e6 distinct hapax pretokens, capped collect stays tiny
    tail = spark.range(1000).select(
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(999)),
                lambda i: F.translate(
                    (F.col("id") * 1000 + i + 1_000_000).cast("string"),
                    "0123456789",
                    "qwertyuiop",
                ),
            ),
        ).alias("text")
    )
    merges = train_bpe(tail, "text", vocab_size=266, max_table=2000)
    assert len(merges) == 10


# ---------------------------------------------------------------------------
# main-content extraction (pipeline/extract.py, jusText-style)


_ARTICLE_HTML = """
<html><head><title>T</title></head><body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li>
<li><a href="/c">Contact</a></li></ul></nav>
<h1>The article title here</h1>
<p>This is the first paragraph of the article and it is quite long because
it has to exceed the length threshold, with plenty of the usual stopwords
that an English sentence would have in it as we write more and more of this
text about the topic at hand.</p>
<p>Short connector.</p>
<p>The second long paragraph continues the discussion of the topic with
further details and it also contains the usual density of common English
stopwords so that it will be classified as good by the algorithm that we
have implemented here in this module today.</p>
<div><a href="/ad">Buy now!</a></div>
<footer>&copy; 2026 Example Corp. All rights reserved.</footer>
</body></html>
"""


def test_extract_blocks_article_fixture():
    """Nav link lists, the <title>, the ad link and the copyright footer
    are boilerplate; the heading, both long stopword-rich paragraphs AND
    the short connector between them (context rule: short between two
    goods) are content."""
    from apache___solr_spark.pipeline.extract import extract_blocks

    got = extract_blocks(_ARTICLE_HTML)
    classes = [c for c, _ in got]
    texts = [t for _, t in got]
    assert classes == [
        "bad", "bad", "bad", "bad",  # title + 3 nav links
        "good",  # heading (promoted: near good content)
        "good", "good", "good",  # para, short connector, para
        "bad", "bad",  # ad link, copyright footer
    ], list(zip(classes, texts))
    assert texts[4] == "The article title here"
    assert texts[6] == "Short connector."


def test_extract_blocks_context_rules():
    from apache___solr_spark.pipeline.extract import extract_blocks

    LONG = (
        "this paragraph is long enough to pass the high length threshold and"
        " it is full of the most common english stopwords so that it will be"
        " judged as good content by the context free classification step of"
        " the algorithm because we wrote it that way on purpose for testing"
    )
    NOSW = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 5
    # short between two bad blocks -> bad
    got = extract_blocks(
        f"<p>{NOSW}</p><p>Short thing.</p><p>{NOSW}</p>"
    )
    assert [c for c, _ in got] == ["bad", "bad", "bad"]
    # short between two good blocks -> good
    got = extract_blocks(f"<p>{LONG}</p><p>Short thing.</p><p>{LONG}</p>")
    assert [c for c, _ in got] == ["good", "good", "good"]
    # isolated page of only a short block -> bad (edges are bad)
    got = extract_blocks("<p>Short thing.</p>")
    assert [c for c, _ in got] == ["bad"]
    # link-dense block is bad even when long and stopword-rich
    got = extract_blocks(f"<p><a href='/x'>{LONG}</a></p>")
    assert [c for c, _ in got] == ["bad"]


def test_extract_blocks_segmenter_matches_html_strip_tokens():
    """The block segmenter and html_strip must see the SAME visible words
    (the north-rule text invariant extends to the block view)."""
    import re

    from apache___solr_spark.analysis.html_strip import html_strip
    from apache___solr_spark.pipeline.extract import _segment_blocks

    html = _ARTICLE_HTML + "<script>var x = '<p>no</p>';</script>"
    w = re.compile(r"\S+")
    stripped = w.findall(html_strip(html))
    blocks = w.findall(" ".join(b.text for b in _segment_blocks(html)))
    assert blocks == stripped


def test_extract_main_content_spark(spark):
    """Arrow-batched Spark pass: passthrough columns survive, main_text
    equals the pure kernel's good blocks, html may be binary or null, and
    the pass is map-only (no Exchange in the plan)."""
    from apache___solr_spark.pipeline.extract import (
        extract_blocks,
        extract_main_content,
    )

    rows = [
        ("u1", _ARTICLE_HTML.encode("utf-8")),
        ("u2", None),
        ("u3", b"<p>plain tiny</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract_main_content(df, "html").orderBy("url")
    got = {r["url"]: r for r in out.collect()}
    want_main = "\n".join(
        t for c, t in extract_blocks(_ARTICLE_HTML) if c == "good"
    )
    assert got["u1"]["main_text"] == want_main
    assert got["u1"]["n_blocks_good"] == 4
    assert got["u1"]["n_blocks_total"] == 10
    assert got["u2"]["main_text"] == "" and got["u2"]["n_blocks_total"] == 0
    assert got["u3"]["main_text"] == "" and got["u3"]["n_blocks_good"] == 0
    plan = extract_main_content(df, "html")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only


def test_extract_segmenter_fuzz_token_identity():
    """Property fuzz: random nested/malformed HTML — the block segmenter
    must see exactly html_strip's visible words, in order."""
    import random
    import re

    from apache___solr_spark.analysis.html_strip import html_strip
    from apache___solr_spark.pipeline.extract import _segment_blocks

    rng = random.Random(11)
    tags = ["p", "div", "a href='/x'", "span", "li", "h2", "table", "td",
            "em", "nav", "footer", "br/", "hr"]
    words = ["alpha", "beta", "the", "of", "and", "&amp;", "&#65;", "x<y",
             "a&b", "café"]
    w = re.compile(r"\S+")
    for trial in range(25):
        parts = []
        depth = 0
        for _ in range(rng.randrange(5, 60)):
            r = rng.random()
            if r < 0.35:
                t = rng.choice(tags)
                parts.append(f"<{t}>")
                depth += 1
            elif r < 0.55 and depth > 0:
                parts.append(f"</{rng.choice(tags).split()[0]}>")
                depth -= 1
            else:
                parts.append(" ".join(rng.choices(words, k=rng.randrange(1, 6))))
        html = " ".join(parts)
        stripped = w.findall(html_strip(html))
        blocks = w.findall(" ".join(b.text for b in _segment_blocks(html)))
        assert blocks == stripped, (trial, html)


def test_extract_blocks_br_runs():
    """Single <br> is a line break inside the block; a run of 2+ <br>
    separates paragraphs (the old-web idiom) — prose split by single
    <br>s must stay ONE block, not fragment into short boilerplate."""
    from apache___solr_spark.pipeline.extract import extract_blocks

    line = "the quick brown fox jumps over the lazy dog of the town"
    # 6 short lines joined by single <br>: one good block
    got = extract_blocks("<div>" + "<br>".join([line] * 6) + "</div>")
    assert [c for c, _ in got] == ["good"]
    assert got[0][1].count("fox") == 6
    # the same lines joined by <br><br>: six separate (short) blocks
    got = extract_blocks("<div>" + "<br><br>".join([line] * 6) + "</div>")
    assert len(got) == 6

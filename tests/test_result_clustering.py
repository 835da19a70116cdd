"""Search-result clustering (ClusteringComponent.java:73): topical
grouping of one result page with salient-term labels."""

from __future__ import annotations

from apache___solr_spark.query.clustering import cluster_results


def _topic_corpus(spark):
    rows = []
    topics = {
        "astronomy": "telescope galaxy nebula star astronomy orbit",
        "cooking": "recipe oven butter flour cooking bake",
        "football": "goal striker football referee penalty match",
    }
    for name, words in topics.items():
        for i in range(6):
            # rotate word order so docs differ but share the topic vocab
            ws = words.split()
            text = " ".join(ws[i % len(ws) :] + ws[: i % len(ws)])
            rows.append((f"{name}-{i}", f"{text} common shared page"))
    return spark.createDataFrame(rows, "url string, text string")


def test_clusters_follow_topics(spark):
    source = _topic_corpus(spark)
    hits = source.select("url")
    out = cluster_results(
        hits, source, n_clusters=3, label_terms=3, seed=7
    ).collect()
    assert sum(r["n_docs"] for r in out) == 18
    # every cluster is topic-pure and its label names topic vocabulary
    topic_vocab = {
        "astronomy": {"telescope", "galaxy", "nebula", "star", "astronomy", "orbit"},
        "cooking": {"recipe", "oven", "butter", "flour", "cooking", "bake"},
        "football": {"goal", "striker", "football", "referee", "penalty", "match"},
    }
    seen_topics = set()
    for r in out:
        topics = {d.rsplit("-", 1)[0] for d in r["doc_ids"]}
        assert len(topics) == 1, (r["label"], sorted(r["doc_ids"]))
        (topic,) = topics
        seen_topics.add(topic)
        assert set(r["label"].split()) <= topic_vocab[topic], r["label"]
    assert seen_topics == set(topic_vocab)


def test_deterministic_and_subset_page(spark):
    source = _topic_corpus(spark)
    hits = source.select("url").filter("url like 'astronomy%' or url like 'cooking%'")
    a = cluster_results(hits, source, n_clusters=2, seed=7).collect()
    b = cluster_results(hits, source, n_clusters=2, seed=7).collect()
    assert [(r["label"], r["doc_ids"]) for r in a] == [
        (r["label"], r["doc_ids"]) for r in b
    ]
    assert sum(r["n_docs"] for r in a) == 12


def test_empty_page(spark):
    source = _topic_corpus(spark)
    hits = source.select("url").filter("url = 'nope'")
    assert cluster_results(hits, source).count() == 0

"""Text vectorisation (language-models module):
TextToVectorUpdateProcessor + {!knn_text_to_vector} analogs."""

from __future__ import annotations

import numpy as np

from apache___solr_spark.pipeline.textvec import (
    embed_text,
    hashing_text_encoder,
    knn_text_to_vector,
)


def test_encoder_deterministic_and_semantic():
    enc = hashing_text_encoder(dim=64, seed=0)
    a = enc(["the telescope observed a distant galaxy"])
    b = enc(["the telescope observed a distant galaxy"])
    assert np.allclose(a, b)
    # shared-vocab texts are closer than unrelated ones
    sim = enc(
        [
            "telescope galaxy nebula star",
            "galaxy star telescope orbit",
            "butter flour oven recipe",
        ]
    )
    near = float(sim[0] @ sim[1])
    far = float(sim[0] @ sim[2])
    assert near > far + 0.3, (near, far)
    # a different seed produces a different space
    enc2 = hashing_text_encoder(dim=64, seed=1)
    assert not np.allclose(a, enc2(["the telescope observed a distant galaxy"]))


def _corpus(spark):
    topics = {
        0: "telescope galaxy nebula star astronomy orbit",
        1: "recipe oven butter flour cooking bake",
        2: "goal striker football referee penalty match",
    }
    rows = []
    for t, words in topics.items():
        ws = words.split()
        for i in range(5):
            rows.append(
                (t * 100 + i, " ".join(ws[i:] + ws[:i]) + " shared page")
            )
    return spark.createDataFrame(rows, "vec_id long, text string")


def test_embed_text_adds_vector_column(spark):
    df = embed_text(_corpus(spark), "text", encoder=hashing_text_encoder(32))
    rows = df.collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    norms = [float(np.linalg.norm(r["embedding"])) for r in rows]
    assert all(abs(n - 1.0) < 1e-9 for n in norms)


def test_knn_text_to_vector_bruteforce(spark):
    enc = hashing_text_encoder(dim=64, seed=0)
    emb = embed_text(_corpus(spark), "text", encoder=enc)
    hits = knn_text_to_vector(
        spark, emb, "telescope astronomy star galaxy", k=5, encoder=enc
    ).collect()
    # every hit is from the astronomy topic (vec_id 0..4)
    assert {r["vec_id"] // 100 for r in hits} == {0}


def test_knn_text_to_vector_over_graph_ann(spark, tmp_path):
    from apache___solr_spark.pipeline.similarity import build_graph_ann_index

    enc = hashing_text_encoder(dim=64, seed=0)
    emb = embed_text(_corpus(spark), "text", encoder=enc)
    idx = str(tmp_path / "gann")
    build_graph_ann_index(emb.select("vec_id", "embedding"), idx, n_centroids=3)
    hits = knn_text_to_vector(
        spark, idx, "butter oven flour recipe", k=5, encoder=enc
    ).collect()
    assert {r["vec_id"] // 100 for r in hits} == {1}

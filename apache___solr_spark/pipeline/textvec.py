"""Text vectorisation — the language-models module
(solr/modules/language-models/src/java/org/apache/solr/languagemodels/
textvectorisation/): `TextToVectorUpdateProcessor.java:35` embeds a text
field into a dense-vector field at index time through a pluggable model,
and `TextToVectorQParserPlugin.java:44` (`{!knn_text_to_vector}`) embeds
the QUERY text with the same model and runs knn with it.

The reference calls external models (LangChain4j).  This module keeps
the same two-sided contract with a LOCAL default model: signed feature
hashing of analyzed tokens + bigrams (HashingVectorizer-style, signed to
unbias collisions), which is deterministic, dependency-free, and a real
technique — texts sharing vocabulary land near each other in cosine
space.  External models plug in as any callable
``list[str] -> np.ndarray``; the Spark plumbing (Arrow-batched
mapInPandas, schema, ANN integration) is identical either way.
"""

from __future__ import annotations

import zlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache___solr_spark.analysis.chain import analyze

__all__ = [
    "hashing_text_encoder",
    "embed_text",
    "knn_text_to_vector",
]


def hashing_text_encoder(
    dim: int = 64, seed: int = 0, use_bigrams: bool = True
) -> Callable[[list[str]], np.ndarray]:
    """Signed feature-hashing encoder: each analyzed token (and bigram)
    hashes to a dimension, sign split off a second hash bit, counts
    L2-normalized.  Deterministic across runs/machines (crc32)."""
    salt = f"#{seed}#".encode()

    def encode(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, text in enumerate(texts):
            toks = analyze(text or "")
            feats = list(toks)
            if use_bigrams:
                feats.extend(
                    f"{a}_{b}" for a, b in zip(toks, toks[1:])
                )
            for f_ in feats:
                h = zlib.crc32(salt + f_.encode())
                sign = 1.0 if (h >> 31) & 1 else -1.0
                out[i, h % dim] += sign
        norms = np.maximum(np.linalg.norm(out, axis=1), 1e-12)
        return out / norms[:, None]

    encode.dim = dim  # type: ignore[attr-defined]
    return encode


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    encoder: Callable[[list[str]], np.ndarray] | None = None,
) -> DataFrame:
    """TextToVectorUpdateProcessor analog: add a dense-vector column
    computed from ``text_col`` — one Arrow-batched pass, no shuffle."""
    enc = encoder or hashing_text_encoder()

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, {out_col} array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = enc(list(pdf[text_col]))
            out = pdf.copy()
            out[out_col] = [row.tolist() for row in vecs]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def knn_text_to_vector(
    spark: SparkSession,
    corpus: DataFrame | str,
    query_text: str,
    k: int = 10,
    encoder: Callable[[list[str]], np.ndarray] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 3,
) -> DataFrame:
    """{!knn_text_to_vector} analog: embed the query text with the SAME
    model as the documents, then run knn.  ``corpus`` is either an
    embedded DataFrame (brute-force cosine — the exact path) or the
    directory of a persisted graph-ANN index built over embed_text output
    (partition-pruned beam search — the scale path)."""
    enc = encoder or hashing_text_encoder()
    qvec = [float(x) for x in enc([query_text])[0]]
    if isinstance(corpus, str):
        from apache___solr_spark.pipeline.similarity import (
            query_graph_ann_index,
        )

        return query_graph_ann_index(
            spark, corpus, qvec, k=k, n_probes=n_probes
        )
    from apache___solr_spark.pipeline.similarity import (
        cosine_topk_bruteforce,
    )

    return cosine_topk_bruteforce(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
        ),
        qvec,
        k=k,
    )

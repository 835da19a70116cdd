"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata structs; the
decode/feature kernels run as Arrow-batched ``mapInPandas`` so executors
stream batches without materializing whole partitions.

The decode step itself is STUBBED in this container (no PIL/ffmpeg):
``decode_image`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic fake decoder so the Spark-side plumbing —
schema, batch iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, content binary, mime string, width int, height int"
)
FEATURE_SCHEMA = "media_id long, width int, height int, feature array<float>"


def _fake_decode(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image decoder: derive a small pixel
    array from a content digest (stable across runs/machines)."""
    digest = hashlib.sha256(content or b"").digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random((max(height, 1), max(width, 1)), dtype=np.float32)


def extract_image_features(
    df: DataFrame,
    fake: bool = False,
    feature_dim: int = 8,
) -> DataFrame:
    """binary image column -> small feature vector per image.

    Real deployments drop a PIL/torchvision kernel into ``run``; the batch
    shape (Arrow record batches in, pandas out) and output schema stay
    identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                if not fake:
                    raise NotImplementedError(
                        "image decoding requires PIL/libvips — not in this "
                        "container; pass fake=True for the deterministic stub"
                    )
                img = _fake_decode(bytes(content) if content is not None else b"", w, h)
                # toy feature: row-mean pooled to feature_dim buckets
                pooled = np.array_split(img.mean(axis=1), feature_dim)
                feats.append(
                    np.array([p.mean() if p.size else 0.0 for p in pooled], np.float32)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)

"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages — the Spark-side shape (schema,
partitioning, UDF signature, batch flow) is real and tested; the actual
codec decode is STUBBED because no image/audio libraries exist in this
container.  Swap ``_decode_image_stub`` for PIL/ffmpeg in production —
nothing else changes.

Schema:
    media(media_id long, url string, kind string,      -- image|audio|video
          payload binary, mime string, width int, height int,
          duration_ms int)
Feature output:
    features(media_id long, kind string, n_bytes int,
             feature array<float>)   -- fixed-dim feature vector
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, url string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels from the payload hash.

    Production: ``PIL.Image.open(io.BytesIO(payload))`` + resize; raise
    NotImplementedError semantics are emulated by the deterministic fake
    so the pipeline stays testable without codecs.
    """
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint8)
    return arr.astype(np.float32).reshape(FEATURE_DIM, 4).mean(axis=1) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction; one map stage, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            nb = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    nb.append(0)
                else:
                    feats.append(_decode_image_stub(bytes(payload)).tolist())
                    nb.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nb, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def synthetic_media_df(spark, n: int = 64):
    """Deterministic media fixture (binary payloads derived from the id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (i, f"https://cdn.example.com/m/{i}", kinds[i % 3], payload,
             "application/octet-stream", 64 + i % 512, 64 + (i * 3) % 512,
             1000 * (i % 90))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

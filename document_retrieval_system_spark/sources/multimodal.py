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


RESIZED_SCHEMA = (
    "media_id long, kind string, out_w int, out_h int, pixels binary"
)
FRAME_SCHEMA = "media_id long, frame_no int, ts_ms int, frame binary"


def _decode_pixels_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode to a (height, width) uint8 image; production swaps in
    PIL — the deterministic fake keeps the RESIZE math below testable."""
    need = width * height
    digest = hashlib.sha256(payload).digest()
    buf = (digest * (need // len(digest) + 1))[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width)


def resize_images(media: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Resize stage: decode (stubbed) -> real nearest-neighbor resample ->
    packed bytes.  One Arrow map stage, no shuffle; the scan reads only
    (media_id, kind, payload, width, height) — metadata columns prune."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.payload is None or not row.width or not row.height:
                    out.append(None)
                    continue
                img = _decode_pixels_stub(bytes(row.payload), int(row.width),
                                          int(row.height))
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                out.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"],
                 "out_w": pd.Series([out_w] * len(pdf), dtype="int32"),
                 "out_h": pd.Series([out_h] * len(pdf), dtype="int32"),
                 "pixels": out}
            )

    return media.select("media_id", "kind", "payload", "width", "height").mapInPandas(
        run, RESIZED_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    timestamp (t = 0, every_ms, 2*every_ms, ... < duration_ms).  The
    per-frame decode is stubbed (hash of payload + frame_no); the
    EXPLODE-shaped Arrow batch flow — one input row fanning out to
    duration/every_ms output rows — is the real contract a video
    pipeline needs, and it happens inside the Python worker so no
    JVM-side row blow-up precedes the (cheap) per-frame work."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, tss, frames = [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.payload is None or row.kind != "video" or not row.duration_ms:
                    continue
                n_frames = max(1, int(row.duration_ms) // every_ms)
                payload = bytes(row.payload)
                for f in range(n_frames):
                    ids.append(row.media_id)
                    fnos.append(f)
                    tss.append(f * every_ms)
                    frames.append(
                        hashlib.sha256(payload + f.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_no": pd.Series(fnos, dtype="int32"),
                 "ts_ms": pd.Series(tss, dtype="int32"),
                 "frame": frames}
            )

    return media.select("media_id", "kind", "payload", "duration_ms").mapInPandas(
        run, FRAME_SCHEMA
    )


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

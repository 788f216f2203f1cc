"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators over `mapInPandas`. The image/audio codec
libraries are NOT present in this environment, so the decode kernel is
stubbed behind `DecoderUnavailable` with a deterministic fake used by
tests — the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and exercised.

Scale notes: binary payloads dominate row width, so every operator here
projects metadata-only columns as early as possible and keeps payload
bytes inside a single mapInPandas stage (no payload shuffle); the output
is fixed-width features, which is what downstream joins/aggregations see.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the pixel/sample decode path: codec libraries are not
    bundled (container-HEADER metadata probing below is real, stdlib-only)."""


def decode_image(payload: bytes, mime: str):  # pragma: no cover - stub
    """Pixel decode entry point — wire Pillow/libvips here on a real cluster."""
    raise DecoderUnavailable(f"no codec for {mime}: image/audio libs not bundled")


_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def probe_payload(payload: bytes) -> tuple[int | None, int | None, int | None]:
    """(width, height, duration_ms) from CONTAINER HEADERS — real decode,
    pure stdlib (no codec libraries): PNG IHDR, GIF logical screen, JPEG
    SOF marker walk, WAV RIFF fmt/data chunk walk. Unknown or truncated
    containers return all-None rather than raising (crawl data is dirty).
    """
    if not payload:
        return (None, None, None)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = _struct.unpack(">II", payload[16:24])
        return (w, h, None)
    if payload[:3] == b"GIF" and len(payload) >= 10:
        w, h = _struct.unpack("<HH", payload[6:10])
        return (w, h, None)
    if payload[:2] == b"\xff\xd8":
        n = len(payload)
        i = 2
        while i + 1 < n:
            if payload[i] != 0xFF:
                break
            j = i + 1
            while j < n and payload[j] == 0xFF:  # legal fill bytes
                j += 1
            if j >= n:
                break
            marker = payload[j]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i = j + 1  # standalone marker, no length field
                continue
            if j + 3 > n:
                break
            seg_len = int.from_bytes(payload[j + 1 : j + 3], "big")
            if marker in _JPEG_SOF:
                if j + 8 <= n:  # precision byte + height(2) + width(2)
                    h = int.from_bytes(payload[j + 4 : j + 6], "big")
                    w = int.from_bytes(payload[j + 6 : j + 8], "big")
                    return (w, h, None)
                break
            i = j + 1 + seg_len
        return (None, None, None)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i, rate, block_align, data_len = 12, None, None, None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            clen = int.from_bytes(payload[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 22 <= len(payload):
                rate = int.from_bytes(payload[i + 12 : i + 16], "little")
                block_align = int.from_bytes(payload[i + 20 : i + 22], "little")
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        if rate and block_align and data_len is not None:
            return (None, None, int(data_len / (rate * block_align) * 1000))
    return (None, None, None)


def probe_metadata(media: DataFrame) -> DataFrame:
    """Fill width/height/duration_ms from payload headers (Arrow-batched;
    payload bytes stay inside the stage, only metadata leaves)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            probed = [
                probe_payload(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            out = pdf.copy()
            out["width"] = pd.array([p[0] for p in probed], dtype="Int32")
            out["height"] = pd.array([p[1] for p in probed], dtype="Int32")
            out["duration_ms"] = pd.array([p[2] for p in probed], dtype="Int32")
            yield out

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding: 8 floats from sha256."""
    digest = hashlib.sha256(payload or b"").digest()
    return [
        _struct.unpack("<i", digest[i * 4 : i * 4 + 4])[0] / 2**31 for i in range(dim)
    ]


def extract_features(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """binary payloads → fixed-width features via Arrow-batched UDF.

    The batch shape is the contract: payload bytes never leave this stage;
    output rows are metadata + feature vector only.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                payload = bytes(payload) if payload is not None else b""
                if use_fake_decoder:
                    feature = _fake_feature(payload)
                else:
                    feature = decode_image(payload, mime)  # DecoderUnavailable
                rows.append(
                    {
                        "media_id": media_id,
                        "mime": mime,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "payload", "mime").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Metadata-only resize planning (JVM-side): compute target dimensions
    without touching payloads; the actual pixel work belongs in the same
    mapInPandas kernel as decode."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "mime",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (sequence + explode, JVM-side)."""
    video = media.filter(F.col("mime").startswith("video/") & F.col("duration_ms").isNotNull())
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )

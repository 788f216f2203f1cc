"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators over `mapInPandas`. PNG pixel decode
(zlib IDAT inflate + per-row unfilter) and WAV PCM sample decode are REAL
and stdlib-only; formats that genuinely need codec libraries (JPEG
entropy decode, GIF LZW, video) raise `DecoderUnavailable`, with a
deterministic fake available for pipeline tests — the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and exercised
either way.

Scale notes: binary payloads dominate row width, so every operator here
projects metadata-only columns as early as possible and keeps payload
bytes inside a single mapInPandas stage (no payload shuffle); the output
is fixed-width features, which is what downstream joins/aggregations see.
"""

from __future__ import annotations

import hashlib
import struct as _struct
import sys
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
    """Raised by the pixel/sample decode path for formats that genuinely
    need codec libraries (JPEG entropy decode, GIF LZW, video). PNG and
    WAV-PCM decode below are REAL and stdlib-only."""


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (bit depth 8 only; palette needs PLTE)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> dict:
    """Full PNG pixel decode, pure stdlib: chunk walk → concatenated IDAT
    zlib inflate → per-scanline unfilter (None/Sub/Up/Average/Paeth).

    Supports the dominant subset: bit depth 8, color types 0/2/4/6
    (gray, RGB, gray+alpha, RGBA), no interlace. Anything else raises
    DecoderUnavailable rather than guessing.
    Returns {"width", "height", "channels", "pixels": bytes} with pixels
    in row-major order, filter bytes removed.
    """
    import zlib

    if payload[:8] != _PNG_SIG:
        raise DecoderUnavailable("not a PNG signature")
    pos, ihdr, idat = 8, None, []
    n = len(payload)
    while pos + 8 <= n:
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + data + CRC
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise DecoderUnavailable("truncated PNG: missing IHDR/IDAT")
    width, height = _struct.unpack(">II", ihdr[:8])
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise DecoderUnavailable(
            f"PNG subset: depth={bit_depth} color={color_type} interlace={interlace}"
        )
    channels = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # corrupt/truncated IDAT: keep the typed contract
        raise DecoderUnavailable(f"PNG IDAT inflate failed: {e}") from e
    stride = width * channels  # bytes per scanline, sans filter byte
    if len(raw) != (stride + 1) * height:
        raise DecoderUnavailable("PNG IDAT length mismatch")
    bpp = channels  # bytes per pixel at depth 8
    out = bytearray(stride * height)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        prev_off = (y - 1) * stride
        off = y * stride
        if f == 0:  # None
            out[off : off + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                out[off + x] = (line[x] + a) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                b = out[prev_off + x] if y > 0 else 0
                out[off + x] = (line[x] + b) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + x] if y > 0 else 0
                out[off + x] = (line[x] + (a + b) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + x] if y > 0 else 0
                c = out[prev_off + x - bpp] if (y > 0 and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[off + x] = (line[x] + pred) & 0xFF
        else:
            raise DecoderUnavailable(f"PNG filter type {f}")
    return {"width": width, "height": height, "channels": channels, "pixels": bytes(out)}


def decode_wav(payload: bytes) -> dict:
    """WAV PCM sample decode, pure stdlib (struct/array): RIFF chunk walk →
    fmt (must be PCM, 8- or 16-bit) → data chunk → normalized [-1, 1]
    floats. Compressed WAV (non-PCM audio_format) raises DecoderUnavailable.
    Returns {"rate", "channels", "samples": list[float]} (interleaved)."""
    import array

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise DecoderUnavailable("not a RIFF/WAVE container")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= len(payload):
            fmt = payload[i + 8 : i + 8 + clen]
        elif cid == b"data":
            data = payload[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None or len(fmt) < 16:
        raise DecoderUnavailable("truncated WAV: missing fmt/data")
    audio_format, channels, rate = _struct.unpack("<HHI", fmt[:8])
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise DecoderUnavailable(f"WAV subset: format={audio_format} bits={bits}")
    if bits == 16:
        arr = array.array("h")
        arr.frombytes(data[: len(data) - (len(data) % 2)])
        if sys.byteorder == "big":
            arr.byteswap()
        samples = [s / 32768.0 for s in arr]
    else:  # 8-bit PCM is unsigned, midpoint 128
        samples = [(b - 128) / 128.0 for b in data]
    return {"rate": rate, "channels": channels, "samples": samples}


def decode_image(payload: bytes, mime: str) -> list[float]:
    """Pixel/sample decode → 8-dim feature vector (same width as the fake
    decoder, so FEATURE_SCHEMA is decode-mode-independent).

    PNG → [width, height, channels, mean, std, min, max, frac_bright];
    WAV → [channels, rate_khz, n_samples, mean, rms, min, max, zcr].
    JPEG/GIF/video → DecoderUnavailable (real codecs go here on a cluster).
    """
    import math

    if payload[:8] == _PNG_SIG:
        img = decode_png(payload)
        px = img["pixels"]
        n = len(px) or 1
        total = sum(px)
        mean = total / n
        var = sum((v - mean) ** 2 for v in px) / n
        return [
            float(img["width"]),
            float(img["height"]),
            float(img["channels"]),
            mean / 255.0,
            math.sqrt(var) / 255.0,
            min(px, default=0) / 255.0,
            max(px, default=0) / 255.0,
            sum(1 for v in px if v > 127) / n,
        ]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        wav = decode_wav(payload)
        s = wav["samples"]
        n = len(s) or 1
        mean = sum(s) / n
        rms = math.sqrt(sum(v * v for v in s) / n)
        zcr = sum(1 for i in range(1, len(s)) if (s[i - 1] < 0) != (s[i] < 0)) / n
        return [
            float(wav["channels"]),
            wav["rate"] / 1000.0,
            float(len(s)),
            mean,
            rms,
            min(s, default=0.0),
            max(s, default=0.0),
            zcr,
        ]
    raise DecoderUnavailable(f"no codec for {mime}: JPEG/GIF/video need codec libs")


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
    payload bytes stay inside the stage, only metadata leaves).

    Probed values take precedence; incoming metadata survives where the
    container is unrecognized or truncated (the probe yields None there) —
    a recognized header is ground truth, upstream metadata is a hint.
    """

    def _coalesce(probed_vals: list[int | None], incoming: pd.Series) -> pd.Series:
        probed = pd.Series(pd.array(probed_vals, dtype="Int32"), index=incoming.index)
        return probed.combine_first(incoming.astype("Int32")).astype("Int32")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            probed = [
                probe_payload(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            out = pdf.copy()
            out["width"] = _coalesce([p[0] for p in probed], pdf["width"])
            out["height"] = _coalesce([p[1] for p in probed], pdf["height"])
            out["duration_ms"] = _coalesce([p[2] for p in probed], pdf["duration_ms"])
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
    output rows are metadata + feature vector only. In real-decode mode a
    row whose format has no codec (JPEG/GIF-pixels/video) or whose payload
    is corrupt yields a NULL feature instead of failing the batch — crawl
    media is mixed and dirty, and one undecodable row must not kill the
    stage (n_bytes/sha256 are still emitted for every row).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                payload = bytes(payload) if payload is not None else b""
                if use_fake_decoder:
                    feature = _fake_feature(payload)
                else:
                    try:
                        feature = decode_image(payload, mime)  # real for PNG/WAV
                    except DecoderUnavailable:
                        feature = None
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

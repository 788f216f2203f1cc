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

"""Multimodal plumbing tests: schemas, batch shapes, stub decode."""

import pytest

from ctinexus_spark.operators.multimodal import (
    decode_and_featurize,
    frame_sample_plan,
    media_metadata,
)


@pytest.fixture
def media(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNG fake bytes 1")),
        ("m2", "image", bytearray(b"\x89PNG fake bytes 22")),
        ("m3", "image", None),
    ]
    return spark.createDataFrame(rows, "media_id string, kind string, content binary")


def test_metadata_no_decode(spark, media):
    rows = {r.media_id: r for r in media_metadata(media).collect()}
    assert rows["m1"].n_bytes == 17
    assert rows["m1"].digest != rows["m2"].digest
    assert rows["m1"].kind == "image"


def test_decode_stub_raises_without_fake(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|decode requires"):
        decode_and_featurize(media, fake=False).collect()


def test_fake_decode_deterministic(spark, media):
    a = {r.media_id: r for r in decode_and_featurize(media, fake=True).collect()}
    b = {r.media_id: r for r in decode_and_featurize(media, fake=True).collect()}
    for k in a:
        assert a[k].width == b[k].width
        assert a[k].features == b[k].features
        assert len(a[k].features) == 8
        assert 16 <= a[k].width < 80


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [("v1", 10.0), ("v2", 0.5)], "media_id string, duration_sec double"
    )
    rows = frame_sample_plan(vids, fps=0.2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.sample_ts_sec)
    assert by_id["v1"] == [0.0, 5.0]  # floor(10*0.2)=2 frames at 0s,5s
    assert by_id["v2"] == [0.0]      # min 1 frame

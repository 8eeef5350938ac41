"""Multimodal plumbing tests: binary payload columns through mapInPandas
decode/resize/frame-sample with the deterministic fake codec."""

from __future__ import annotations

import pytest

from arrowhouse_spark.operators.multimodal import (
    DECODE_SCHEMA,
    MEDIA_SCHEMA,
    decode_images,
    frame_sample,
    make_fake_payload,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", make_fake_payload(8, 6, seed=1), (8, 6, None, None)),
        (2, "image", make_fake_payload(16, 4, seed=2), (16, 4, None, None)),
        (3, "video", make_fake_payload(4, 100, seed=3), (4, 100, 4000, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)


def test_decode_images(media):
    out = {r.media_id: r for r in decode_images(media).collect()}
    assert out[1].width == 8 and out[1].height == 6
    assert out[2].width == 16 and out[2].height == 4
    # deterministic fake: mean pixel reproducible driver-side
    exp = sum(((x * 31 + 1) % 251) for x in range(48)) / 48
    assert abs(out[1].mean_pixel - exp) < 1e-9


def test_decode_real_codec_stubbed(media):
    """Contract test for the real-codec seam so it can't silently rot: the
    plan (schema) is identical to the fake-codec path, and execution fails
    with the pinned NotImplementedError message."""
    out = decode_images(media, use_real_codec=True)
    assert out.schema == DECODE_SCHEMA
    with pytest.raises(Exception, match="image codec libraries not installed"):
        out.collect()


def test_resize_images(media):
    resized = resize_images(media, max_side=4)
    dec = {r.media_id: r for r in decode_images(resized).collect()}
    assert dec[1].width <= 4 and dec[1].height <= 4
    assert dec[2].width <= 4 and dec[2].height <= 4


def test_frame_sample(media):
    frames = frame_sample(media.filter("media_type = 'video'"), every_ms=1000).collect()
    # 100 'frames' at 25fps sampled every 1000ms → step 25 → frames 0,25,50,75
    assert [f.frame_idx for f in sorted(frames, key=lambda r: r.frame_idx)] == [0, 25, 50, 75]
    assert all(f.ts_ms == f.frame_idx * 40 for f in frames)

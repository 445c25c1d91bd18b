"""Multimodal plumbing: binary payload + typed metadata through
Arrow-batched mapInPandas. Decode is a deterministic fake (codec libs
absent); the schema/batching/1→N shapes are the real contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from libmr_spark.operators.multimodal import (
    attach_fake_media,
    audio_features,
    decode_images,
    resize_images,
    sample_video_frames,
)
from libmr_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return attach_fake_media(load_table(spark, "documents", sf_dir))


def test_media_schema(media):
    fields = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<width:int,height:int,n_frames:int")
    assert set(r.kind for r in media.select("kind").distinct().collect()) == {"image", "audio", "video"}


def test_decode_images_deterministic(media):
    out1 = sorted(map(tuple, decode_images(media).collect()))
    out2 = sorted(map(tuple, decode_images(media).collect()))
    assert out1 == out2 and len(out1) > 0
    r = out1[0]
    assert len(r) == 6  # media_id, width, height, n_pixels, mean_pixel, phash


def test_decode_real_raises_at_seam(media):
    with pytest.raises(NotImplementedError, match="codec"):
        decode_images(media, mode="real")


def test_resize_shapes(media):
    out = resize_images(media, 8, 8).collect()
    assert all(len(bytes(r.payload)) == 64 and r.width == 8 and r.height == 8 for r in out)


def test_video_frame_sampling_is_one_to_many(media):
    frames = sample_video_frames(media, every_nth=2)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.count() > n_videos  # 1→N expansion
    # frame_idx respects the sampling stride
    assert frames.filter(F.col("frame_idx") % 2 != 0).count() == 0


def test_audio_features(media):
    out = audio_features(media).collect()
    assert len(out) > 0
    assert all(r.duration_s > 0 and 0 <= r.loudness <= 255 for r in out)

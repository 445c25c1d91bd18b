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


def test_decode_real_raises_when_codec_missing(media):
    # escape hatch: with Pillow absent, mode='real' names the missing
    # library and the install command; with it present, it decodes
    from libmr_spark.operators import multimodal as MM

    if MM.HAS_PIL:
        pytest.skip("Pillow present — covered by test_decode_images_real_pil")
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_images(media, mode="real")


def test_decode_images_real_pil(spark):
    # runs only where Pillow is installed: a 2×2 PNG decodes to real
    # dimensions and pixel stats through the same Spark plumbing
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.frombytes("L", (2, 2), bytes([0, 100, 200, 255])).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, "image", "mem://1", bytearray(buf.getvalue()), (2, 2, 1, 16000, "png"))],
        "media_id bigint, kind string, uri string, payload binary, "
        "meta struct<width:int, height:int, n_frames:int, sample_rate:int, codec:string>",
    )
    r = decode_images(df, mode="real").first()
    assert (r.width, r.height, r.n_pixels) == (2, 2, 4)
    assert abs(r.mean_pixel - (0 + 100 + 200 + 255) / 4) < 1e-6


def test_video_real_raises_when_ffmpeg_missing(media):
    from libmr_spark.operators import multimodal as MM

    if MM.HAS_FFMPEG:
        pytest.skip("ffmpeg present")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_video_frames(media, mode="real")


def test_audio_features_real_wav(spark):
    # the real audio path has a stdlib `wave` fallback, so it is
    # exercisable even in a codec-less container: build a genuine WAV
    # and check duration/sample-rate/loudness come from actual decode
    import io
    import struct
    import wave

    sr, n = 8000, 4000  # 0.5 s
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        # constant half-scale amplitude → loudness ≈ 0.5
        w.writeframes(struct.pack(f"<{n}h", *([2**14] * n)))
    df = spark.createDataFrame(
        [(7, "audio", "mem://7", bytearray(buf.getvalue()), (0, 0, 0, sr, "wav"))],
        "media_id bigint, kind string, uri string, payload binary, "
        "meta struct<width:int, height:int, n_frames:int, sample_rate:int, codec:string>",
    )
    r = audio_features(df, mode="real").first()
    assert r.sample_rate == sr
    assert abs(r.duration_s - 0.5) < 1e-6
    assert abs(r.loudness - 0.5) < 0.01


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

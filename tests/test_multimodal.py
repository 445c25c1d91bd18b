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
    # escape hatch: with Pillow absent, a NON-PNG payload in mode='real'
    # names the missing library and the install command (lazily, at
    # decode time — PNG payloads decode via the stdlib codec instead);
    # with Pillow present, it decodes everything PIL can
    from libmr_spark.operators import multimodal as MM

    if MM.HAS_PIL:
        pytest.skip("Pillow present — covered by test_decode_images_real_pil")
    with pytest.raises(Exception, match="Pillow"):
        # media payloads are utf-8 text bytes, not PNG
        decode_images(media, mode="real").collect()


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
    # lazily, at decode time: non-Y4M payloads without ffmpeg name the
    # binary; Y4M payloads parse via the stdlib fallback instead
    from libmr_spark.operators import multimodal as MM

    if MM.HAS_FFMPEG:
        pytest.skip("ffmpeg present")
    with pytest.raises(Exception, match="ffmpeg"):
        sample_video_frames(media, mode="real").collect()


def test_video_frames_real_y4m(spark):
    # the real video path has a stdlib Y4M fallback: build a genuine
    # YUV4MPEG2 stream (the uncompressed format ffmpeg emits) with 5
    # distinguishable 4:2:0 frames and check every_nth sampling returns
    # the actual frame bytes
    from libmr_spark.operators import multimodal as MM

    if MM.HAS_FFMPEG:
        pytest.skip("ffmpeg present — the subprocess path applies instead")
    w, h = 4, 2
    fsize = w * h * 3 // 2
    frames = [bytes([i] * fsize) for i in range(5)]
    payload = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n" + b"".join(
        b"FRAME\n" + f for f in frames
    )
    df = spark.createDataFrame(
        [(3, "video", "mem://3", bytearray(payload), (w, h, 5, 0, "y4m"))],
        "media_id bigint, kind string, uri string, payload binary, "
        "meta struct<width:int, height:int, n_frames:int, sample_rate:int, codec:string>",
    )
    rows = sample_video_frames(df, every_nth=2, mode="real").collect()
    assert [(r.frame_idx, bytes(r.frame_bytes)) for r in sorted(rows, key=lambda r: r.frame_idx)] == [
        (0, frames[0]),
        (2, frames[2]),
        (4, frames[4]),
    ]


def test_y4m_parser_truncation_and_odd_dims():
    # driverless parser edge cases (ADVICE r4): a truncated stream must
    # raise, not silently yield a short final frame; odd dimensions use
    # ceil halves for the 4:2:0 chroma planes (w*h*3//2 would be short
    # and desynchronize the FRAME scan)
    import pytest as _pytest

    from libmr_spark.operators.multimodal import _y4m_frames

    # odd dims: 3x3 => Y=9 + 2*(2*2)=8 -> 17 bytes per frame
    fsize = 17
    frames = [bytes([i] * fsize) for i in range(3)]
    payload = b"YUV4MPEG2 W3 H3 F25:1 C420\n" + b"".join(b"FRAME\n" + f for f in frames)
    assert list(_y4m_frames(payload)) == frames

    truncated = payload[:-5]
    with _pytest.raises(ValueError, match="truncated"):
        list(_y4m_frames(truncated))


def test_decode_images_real_stdlib_png(spark):
    # the real image path has a stdlib PNG fallback (functions/png.py),
    # so it is exercisable even in a codec-less container — the image
    # analog of the `wave` audio fallback. Build a genuine PNG and
    # check dims/pixel stats come from actual decode.
    from libmr_spark.functions.png import png_encode
    from libmr_spark.operators import multimodal as MM

    if MM.HAS_PIL:
        pytest.skip("Pillow present — PIL path covered by test_decode_images_real_pil")
    payload = png_encode(2, 2, bytes([0, 100, 200, 255]), channels=1)
    df = spark.createDataFrame(
        [(1, "image", "mem://1", bytearray(payload), (2, 2, 1, 16000, "png"))],
        "media_id bigint, kind string, uri string, payload binary, "
        "meta struct<width:int, height:int, n_frames:int, sample_rate:int, codec:string>",
    )
    r = decode_images(df, mode="real").first()
    assert (r.width, r.height, r.n_pixels) == (2, 2, 4)
    assert abs(r.mean_pixel - (0 + 100 + 200 + 255) / 4) < 1e-6
    assert len(r.phash) == 16


def test_resize_images_real_stdlib_png(spark):
    # real resize via stdlib decode -> nearest resample -> re-encode:
    # output payload is a valid PNG of the target dims with the exact
    # nearest-neighbor pixels
    from libmr_spark.functions.png import png_decode, png_encode
    from libmr_spark.operators import multimodal as MM

    if MM.HAS_PIL:
        pytest.skip("Pillow present — PIL resize path applies instead")
    payload = png_encode(2, 2, bytes([1, 2, 3, 4]), channels=1)
    df = spark.createDataFrame(
        [(9, "image", "mem://9", bytearray(payload), (2, 2, 1, 16000, "png"))],
        "media_id bigint, kind string, uri string, payload binary, "
        "meta struct<width:int, height:int, n_frames:int, sample_rate:int, codec:string>",
    )
    r = resize_images(df, 4, 4, mode="real").first()
    assert (r.width, r.height) == (4, 4)
    w, h, ch, px = png_decode(bytes(r.payload))
    assert (w, h, ch) == (4, 4, 1)
    assert list(px) == [1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4]


def test_png_codec_roundtrip_and_filters():
    # pure-python PNG codec sanity: filter-0 round-trip (gray + RGB)
    # and decode of handcrafted filter-1..4 streams (forward-filtered
    # with an independent implementation of the spec's predictors)
    import random
    import struct
    import zlib

    from libmr_spark.functions.png import SIGNATURE, _chunk, png_decode, png_encode

    rng = random.Random(42)
    for ch in (1, 3):
        w, h = 13, 7
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        got = png_decode(png_encode(w, h, px, ch))
        assert got[:3] == (w, h, ch) and bytes(got[3]) == px

    def forward(f, row, prev, ch):
        out = bytearray(len(row))
        for i in range(len(row)):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (row[i] - pred) & 0xFF
        return out

    for ch in (1, 3):
        w, h = 5, 4
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        stride = w * ch
        raw, prev = bytearray(), bytearray(stride)
        for y in range(h):
            row = bytearray(px[y * stride : (y + 1) * stride])
            f = (y % 4) + 1
            raw.append(f)
            raw += forward(f, row, prev, ch)
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if ch == 1 else 2, 0, 0, 0)
        data = (
            SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        assert bytes(png_decode(data)[3]) == px, f"filter decode mismatch ch={ch}"


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

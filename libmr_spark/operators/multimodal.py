"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partition sizing, UDF signatures,
batch shapes — is real and tested. The codec step itself is STUBBED:
the decode libraries (PIL/ffmpeg/librosa) are not in this container,
so ``decode=fake`` produces deterministic pseudo-decodes derived from
the payload bytes, and ``decode=real`` raises ``NotImplementedError``
at the exact seam where a codec call belongs.

At scale: payloads ride in the row (parquet binary) only when small;
the schema carries a ``uri`` column for externalized blobs so the same
operators work with pointer-style storage, and batch size is bounded
by rows AND bytes (``spark.sql.execution.arrow.maxRecordsPerBatch`` +
per-batch byte budget below) to keep executor memory flat.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, uri string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int, codec:string>"
)

# soft byte budget per emitted pandas batch (decode outputs are larger
# than inputs; bound them so an Arrow batch can't blow the heap)
MAX_BATCH_BYTES = 64 * 1024 * 1024


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic media table from documents: payload =
    utf-8 bytes of the text, metadata derived from payload length.
    This stands in for a real (id, binary, meta) ingest."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.length(payload)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.concat(F.lit("mem://doc/"), F.col(id_col).cast("string")).alias("uri"),
        payload.alias("payload"),
        F.struct(
            (n % 64 + 1).cast("int").alias("width"),
            (n % 48 + 1).cast("int").alias("height"),
            (n % 16 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _fake_pixels(payload: bytes, width: int, height: int) -> list[int]:
    """Deterministic stand-in for a codec: stretch the payload digest
    over width*height 'pixels'."""
    digest = hashlib.sha256(payload).digest()
    npix = width * height
    return [digest[i % len(digest)] for i in range(min(npix, 256))]


def decode_images(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode image payloads → fixed-shape feature rows.

    Output schema: media_id, width, height, n_pixels, mean_pixel,
    phash (hex). ``mode='real'`` marks where PIL/libjpeg plugs in.
    """
    if mode == "real":
        raise NotImplementedError(
            "real image decode requires a codec library not present in this "
            "container; plug PIL.Image.open(io.BytesIO(payload)) in here"
        )

    out_schema = "media_id bigint, width int, height int, n_pixels bigint, mean_pixel double, phash string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows, nbytes = [], 0
            for rec in pdf.to_dict("records"):
                payload = bytes(rec["payload"])
                w, h = rec["meta"]["width"], rec["meta"]["height"]
                px = _fake_pixels(payload, w, h)
                rows.append(
                    {
                        "media_id": rec["media_id"],
                        "width": w,
                        "height": h,
                        "n_pixels": w * h,
                        "mean_pixel": round(sum(px) / len(px), 6),
                        "phash": hashlib.sha256(payload).hexdigest()[:16],
                    }
                )
                nbytes += len(payload)
                if nbytes >= MAX_BATCH_BYTES:
                    yield pd.DataFrame(rows)
                    rows, nbytes = [], 0
            if rows:
                yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "image").mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, target_w: int, target_h: int, mode: str = "fake") -> DataFrame:
    """Resize step: payload → payload of the target 'resolution'.
    Fake mode truncates/pads the payload deterministically; the schema
    and batching are exactly what a real resampler needs."""
    if mode == "real":
        raise NotImplementedError("plug a real resampler (PIL.Image.resize) here")

    out_schema = "media_id bigint, width int, height int, payload binary"
    target = target_w * target_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = bytes(rec["payload"])
                resized = (payload * (target // max(len(payload), 1) + 1))[:target]
                rows.append(
                    {"media_id": rec["media_id"], "width": target_w, "height": target_h, "payload": resized}
                )
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "image").mapInPandas(run, schema=out_schema)


def sample_video_frames(df: DataFrame, every_nth: int = 2, mode: str = "fake") -> DataFrame:
    """Frame sampling: one output row per sampled frame (1→N mapInPandas,
    the shape a real ffmpeg-backed sampler produces)."""
    if mode == "real":
        raise NotImplementedError("plug ffmpeg frame extraction here")

    out_schema = "media_id bigint, frame_idx int, frame_bytes binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = bytes(rec["payload"])
                n_frames = rec["meta"]["n_frames"]
                for i in range(0, n_frames, every_nth):
                    start = (i * 7) % max(len(payload) - 8, 1)
                    rows.append(
                        {"media_id": rec["media_id"], "frame_idx": i, "frame_bytes": payload[start : start + 8]}
                    )
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").mapInPandas(run, schema=out_schema)


def audio_features(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Audio feature extraction (duration, 'loudness') from payload +
    sample-rate metadata."""
    if mode == "real":
        raise NotImplementedError("plug librosa/soundfile decoding here")

    out_schema = "media_id bigint, sample_rate int, duration_s double, loudness double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                payload = bytes(rec["payload"])
                sr = rec["meta"]["sample_rate"]
                rows.append(
                    {
                        "media_id": rec["media_id"],
                        "sample_rate": sr,
                        "duration_s": round(len(payload) / sr, 6),
                        "loudness": round(sum(payload[:256]) / max(min(len(payload), 256), 1), 6),
                    }
                )
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "audio").mapInPandas(run, schema=out_schema)

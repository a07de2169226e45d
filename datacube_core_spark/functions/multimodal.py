"""Multimodal columns: opaque binary payloads + typed metadata.

Task-brief requirement: treat image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched kernels over ``mapInPandas``.  The
image/audio codec libraries are NOT in this container, so the *codec*
step is stubbed (deterministic fake decode, or ``NotImplementedError``
when ``strict=True``), while every piece of Spark plumbing — schema,
partitioning, UDF signatures, Arrow batch shapes — is real and tested.

Schema: ``media(media_id long, kind string, payload binary,
meta struct<width int, height int, duration_ms int, sample_rate int,
codec string>)``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id LONG, kind STRING, payload BINARY, "
    "meta STRUCT<width: INT, height: INT, duration_ms: INT, sample_rate: INT, codec: STRING>"
)

_KINDS = ("image", "audio", "video")


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table derived from documents: the
    payload is a seeded byte pattern (stands in for encoded image/audio
    bytes), metadata is arithmetic in doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id")
    kind = (
        F.when(d % 3 == 0, F.lit("image")).when(d % 3 == 1, F.lit("audio")).otherwise(F.lit("video"))
    )
    # payload: sha2 of the id repeated — opaque, deterministic bytes
    payload = F.encode(F.repeat(F.sha2(d.cast("string").cast("binary"), 256), 4), "UTF-8")
    meta = F.struct(
        (F.lit(64) + (d % 8) * 32).cast("int").alias("width"),
        (F.lit(64) + (d % 5) * 32).cast("int").alias("height"),
        ((d % 90 + 1) * 1000).cast("int").alias("duration_ms"),
        F.lit(16000).cast("int").alias("sample_rate"),
        F.when(kind == "image", "png").when(kind == "audio", "pcm16").otherwise("h264").alias("codec"),
    )
    return docs.select(d.alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta"))


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image codec: bytes → (h, w) uint8
    luma plane.  Real decode (PIL/libjpeg) is not available in this
    container; the surrounding Spark plumbing is identical either way."""
    seed = np.frombuffer(payload[:64], dtype=np.uint8).astype(np.uint32)
    base = int(seed.sum()) % 251
    yy, xx = np.mgrid[0:height, 0:width]
    return ((yy * 7 + xx * 13 + base) % 256).astype(np.uint8)


def decode_images(media: DataFrame, strict: bool = False) -> DataFrame:
    """image rows → (media_id, height, width, pixels array<int>).

    ``strict=True`` raises NotImplementedError (no codec libs here);
    the default uses the deterministic fake so the pipeline is testable.
    """
    if strict:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "plug a real decoder into _fake_decode_image's slot"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                w, h = int(r.meta["width"]), int(r.meta["height"])
                img = _fake_decode_image(bytes(r.payload), w, h)
                rows.append((int(r.media_id), h, w, img.ravel().astype(np.int32).tolist()))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "height", "width", "pixels"])

    imgs = media.where(F.col("kind") == "image")
    return imgs.mapInPandas(kernel, schema="media_id LONG, height INT, width INT, pixels ARRAY<INT>")


def resize_images(decoded: DataFrame, out_h: int = 32, out_w: int = 32) -> DataFrame:
    """Nearest-neighbor resize of decoded luma planes (vectorized numpy;
    the paste/NN path of the reference's read_time_slice)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                h, w = int(r.height), int(r.width)
                img = np.asarray(r.pixels, dtype=np.int32).reshape(h, w)
                ri = (np.arange(out_h) * h // out_h).astype(int)
                ci = (np.arange(out_w) * w // out_w).astype(int)
                small = img[np.ix_(ri, ci)]
                rows.append((int(r.media_id), out_h, out_w, small.ravel().tolist()))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "height", "width", "pixels"])

    return decoded.mapInPandas(kernel, schema="media_id LONG, height INT, width INT, pixels ARRAY<INT>")


def image_features(decoded: DataFrame, bins: int = 16) -> DataFrame:
    """Feature extraction: normalized histogram + moments per image —
    a real, deterministic computation (no codec needed)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                px = np.asarray(r.pixels, dtype=np.float64)
                hist, _ = np.histogram(px, bins=bins, range=(0, 256))
                feat = (hist / max(1, px.size)).tolist() + [float(px.mean()), float(px.std())]
                rows.append((int(r.media_id), feat))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "features"])

    return decoded.mapInPandas(kernel, schema="media_id LONG, features ARRAY<DOUBLE>")


def frame_sample(media: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """Video frame sampling *plan*: one row per sampled frame timestamp —
    pure Catalyst (sequence/explode over duration); the frame decode
    itself would plug into decode_images' kernel slot."""
    vids = media.where(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
    return vids.select("media_id", F.explode(ts).alias("frame_ms"))


def audio_window_energy(media: DataFrame, window_ms: int = 1000) -> DataFrame:
    """Audio feature stub: per-window deterministic energy derived from
    payload bytes (PCM decode would replace the byte view)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8).astype(np.float64)
                n_win = max(1, int(r.meta["duration_ms"]) // window_ms)
                chunks = np.array_split(buf, n_win)
                for i, c in enumerate(chunks):
                    rows.append((int(r.media_id), i * window_ms, float(np.sqrt((c ** 2).mean()))))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "window_ms", "energy"])

    auds = media.where(F.col("kind") == "audio")
    return auds.mapInPandas(kernel, schema="media_id LONG, window_ms LONG, energy DOUBLE")

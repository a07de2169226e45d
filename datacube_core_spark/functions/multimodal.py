"""Multimodal columns: opaque binary payloads + typed metadata.

Task-brief requirement: treat image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched kernels over ``mapInPandas``.

The codec tier is REAL for PNG: ``functions/png.py`` implements the
published PNG container + all five scanline filters on pure stdlib
``zlib`` + numpy, so an image payload that IS a PNG is actually decoded
(``decode_images``), pixel-exact, with chunk CRCs verified.  Formats
whose codecs genuinely aren't in this container (JPEG, H.264, …) fall
back to a deterministic fake decode — or, with ``strict=True``, fail
the job loudly — while every piece of Spark plumbing (schema,
partitioning, UDF signatures, Arrow batch shapes) is identical across
the three paths.

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


def synth_png_media(
    spark: SparkSession, sf_dir: str, pre_partition: int = 0
) -> DataFrame:
    """:func:`synth_media` with REAL PNG payloads on the image rows: a
    deterministic per-id pattern image (grayscale for even ids, RGB for
    odd) encoded by :func:`..functions.png.png_encode` on the executors,
    metadata updated to the true decoded dimensions.  Audio/video rows
    keep the opaque byte payloads.

    ``pre_partition`` > 0 repartitions the source FIRST so the encode
    kernel (and everything downstream of it) fans out — the documents
    table is a single small file, i.e. one input partition, and the
    whole point of the mapInPandas codec tier is that its per-image
    Python cost scales with executor count."""
    from .png import png_encode

    base = synth_media(spark, sf_dir)
    if pre_partition:
        base = base.repartition(pre_partition, "media_id")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for r in pdf.itertuples():
                if r.kind != "image":
                    payloads.append(bytes(r.payload))
                    continue
                mid = int(r.media_id)
                w, h = int(r.meta["width"]), int(r.meta["height"])
                yy, xx = np.mgrid[0:h, 0:w]
                luma = ((yy * 11 + xx * 5 + mid) % 256).astype(np.uint8)
                if mid % 2:
                    img = np.stack(
                        [luma, (luma + 85) % 256, (luma + 170) % 256], axis=-1
                    ).astype(np.uint8)
                else:
                    img = luma
                # cycle filters so stored corpora exercise every decoder
                # branch, like a wild-encoder mix would
                payloads.append(png_encode(img, filter_mode="cycle"))
            out = pdf.copy()
            out["payload"] = payloads
            yield out

    return base.mapInPandas(kernel, schema=base.schema)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for codecs that are genuinely absent here
    (JPEG/H.264…): bytes → (h, w) uint8 luma plane.  PNG payloads never
    reach this — they take the real :func:`..functions.png.png_decode`
    path."""
    seed = np.frombuffer(payload[:64], dtype=np.uint8).astype(np.uint32)
    base = int(seed.sum()) % 251
    yy, xx = np.mgrid[0:height, 0:width]
    return ((yy * 7 + xx * 13 + base) % 256).astype(np.uint8)


def _decode_payload(payload: bytes, width: int, height: int, strict: bool) -> np.ndarray:
    """One image payload → (h, w) uint8 luma plane.

    PNG payloads (magic-bytes sniff) take the REAL decoder; RGB/RGBA
    collapse to luma by the integer BT.601 weights (299/587/114 — exact
    integer arithmetic so every engine reproduces it).  Non-PNG payloads
    use the deterministic fake, or raise with ``strict=True``."""
    from .png import is_png, png_decode

    if is_png(payload):
        img = png_decode(payload)
        if img.ndim == 3:
            c = img.astype(np.int32)
            img = (
                (299 * c[..., 0] + 587 * c[..., 1] + 114 * c[..., 2]) // 1000
            ).astype(np.uint8)
        return img
    if strict:
        raise ValueError(
            "strict decode: payload is not a PNG and no other codec is "
            "available in this environment"
        )
    return _fake_decode_image(payload, width, height)


def decode_images(media: DataFrame, strict: bool = False) -> DataFrame:
    """image rows → (media_id, height, width, pixels array<int>).

    PNG payloads are REALLY decoded (``functions/png.py``); height/width
    come from the decoded plane (the IHDR ground truth), not the
    metadata struct.  Non-PNG payloads fall back to the deterministic
    fake — or, with ``strict=True``, raise inside the kernel and fail
    the job loudly (corrupt or unsupported payloads at scale must never
    turn into quiet synthetic pixels)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                w, h = int(r.meta["width"]), int(r.meta["height"])
                img = _decode_payload(bytes(r.payload), w, h, strict)
                rows.append(
                    (int(r.media_id), img.shape[0], img.shape[1],
                     img.ravel().astype(np.int32).tolist())
                )
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

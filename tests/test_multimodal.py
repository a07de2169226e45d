"""Multimodal plumbing tests: schemas, batch shapes, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.functions.multimodal import (
    audio_window_energy,
    decode_images,
    frame_sample,
    image_features,
    resize_images,
    synth_media,
)

from .conftest import SF_TINY


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, SF_TINY)


def test_media_schema_and_kinds(spark, media):
    assert set(media.columns) == {"media_id", "kind", "payload", "meta"}
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    r = media.where(F.col("media_id") == 3).collect()[0]
    assert r["kind"] == "image"
    assert len(bytes(r["payload"])) == 256  # 64-hex sha * 4
    assert r["meta"]["width"] == 64 + (3 % 8) * 32


def test_decode_strict_fails_job_on_non_png(spark, media):
    """strict=True: a payload that is not a decodable PNG must fail the
    JOB loudly (corrupt/unsupported payloads at scale must never become
    quiet synthetic pixels) — synth_media's sha-byte payloads are not
    PNGs, so collecting the strict decode raises."""
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="strict decode"):
        decode_images(media, strict=True).collect()


def test_real_png_decode_pixel_exact(spark):
    """The codec tier is REAL for PNG: synth_png_media image payloads
    are true PNG byte streams (mixed gray/RGB, cycled filters), and
    decode_images reproduces the generator's pattern pixel-exactly —
    including the integer-BT.601 luma collapse for RGB — under
    strict=True (no fake-decode fallback involved)."""
    from datacube_core_spark.functions.multimodal import synth_png_media
    from datacube_core_spark.functions.png import is_png, png_meta

    m = synth_png_media(spark, SF_TINY)
    imgs = m.where(F.col("kind") == "image")
    sample = imgs.limit(6).collect()
    assert sample and all(is_png(bytes(r["payload"])) for r in sample)

    decoded = {r["media_id"]: r for r in decode_images(imgs.limit(6), strict=True).collect()}
    for r in sample:
        mid = int(r["media_id"])
        w, h, ch = png_meta(bytes(r["payload"]))
        d = decoded[mid]
        assert (d["width"], d["height"]) == (w, h)
        yy, xx = np.mgrid[0:h, 0:w]
        luma = ((yy * 11 + xx * 5 + mid) % 256).astype(np.int64)
        if mid % 2:  # RGB: BT.601 integer collapse of the 3 planes
            r_, g_, b_ = luma, (luma + 85) % 256, (luma + 170) % 256
            expect = (299 * r_ + 587 * g_ + 114 * b_) // 1000
            assert ch == 3
        else:
            expect = luma
            assert ch == 1
        assert np.array_equal(
            np.asarray(d["pixels"], dtype=np.int64).reshape(h, w), expect
        ), mid


def test_decode_resize_features_pipeline(spark, media):
    decoded = decode_images(media)
    rows = decoded.limit(3).collect()
    for r in rows:
        assert len(r["pixels"]) == r["height"] * r["width"]

    # determinism: running twice gives identical pixel arrays
    a = {r["media_id"]: list(r["pixels"]) for r in decoded.limit(3).collect()}
    b = {r["media_id"]: list(r["pixels"]) for r in decode_images(media).limit(3).collect()}
    for k in a:
        assert a[k] == b[k]

    small = resize_images(decoded.limit(5), 16, 16).collect()
    for r in small:
        assert r["height"] == 16 and r["width"] == 16 and len(r["pixels"]) == 256

    feats = image_features(decoded.limit(5), bins=8).collect()
    for r in feats:
        assert len(r["features"]) == 10  # 8 bins + mean + std
        assert abs(sum(r["features"][:8]) - 1.0) < 1e-9


def test_frame_sample_plan_is_catalyst(spark, media):
    fs = frame_sample(media, every_ms=10_000)
    plan = fs._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure sequence/explode
    r = fs.groupBy("media_id").count().collect()
    meta = {x["media_id"]: x["meta"]["duration_ms"] for x in media.where(F.col("kind") == "video").collect()}
    for row in r:
        exp = (meta[row["media_id"]] - 1) // 10_000 + 1
        assert row["count"] == exp


def test_audio_energy(spark, media):
    e = audio_window_energy(media, window_ms=30_000).collect()
    assert len(e) > 0
    for r in e:
        assert r["energy"] > 0

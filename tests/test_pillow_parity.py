"""Gated Pillow parity battery (VERDICT r11 ask #8): the multimodal
layer's Pillow fast path exists but this container ships no Pillow, so
these tests auto-skip here and prove the mixed-corpus (PNG + JPEG)
story wherever Pillow IS installed: the stdlib PNG codec decodes
byte-identically to Pillow, JPEG twins of PNG fixtures flow through the
same Spark plumbing with exact metadata and near-equal features (JPEG
is lossy by design — means compare with a tolerance), and the header
sniffer agrees with Pillow's raster on dimensions."""

from __future__ import annotations

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL", reason="Pillow not installed (gated fast path)")
from PIL import Image  # noqa: E402

from wrtd_etl_spark.multimodal.binary_ops import sniff_image_dims  # noqa: E402
from wrtd_etl_spark.multimodal.png_codec import decode_png  # noqa: E402


def _gradient(w=40, h=24, ch=3) -> np.ndarray:
    """Deterministic raster: per-channel affine gradients."""
    y, x = np.mgrid[0:h, 0:w]
    planes = [((x * (3 + c) + y * (5 + c)) % 256) for c in range(ch)]
    a = np.stack(planes, axis=-1).astype(np.uint8)
    return a[..., 0] if ch == 1 else a


def _encode(a: np.ndarray, fmt: str, **kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format=fmt, **kw)
    return buf.getvalue()


@pytest.mark.parametrize("ch,mode", [(1, "gray"), (3, "rgb")])
def test_stdlib_png_codec_matches_pillow_exactly(ch, mode):
    """The environment gate must not change results: on any PNG both
    decode paths produce the SAME bytes, so a cluster with Pillow and a
    cluster without read one corpus identically."""
    a = _gradient(ch=ch)
    png = _encode(a, "PNG")
    w, h, nch, raster = decode_png(png)
    with Image.open(io.BytesIO(png)) as im:
        pa = np.asarray(im)
    assert (w, h, nch) == (im.width, im.height, 1 if pa.ndim == 2 else pa.shape[2])
    assert raster == pa.tobytes()


def test_jpeg_twin_metadata_exact_and_features_close(spark):
    """A JPEG twin of a PNG fixture flows through the real Spark
    plumbing: decode_image metadata is EXACT (dims/channels survive the
    lossy codec), decode_image_pixels means are close (JPEG quality 95
    bounds the per-channel drift), and both formats ride ONE mixed
    DataFrame — the 100-TB corpus is never format-partitioned."""
    from wrtd_etl_spark.multimodal.binary_ops import (
        decode_image,
        decode_image_pixels,
    )

    a = _gradient()
    png, jpg = _encode(a, "PNG"), _encode(a, "JPEG", quality=95)
    df = spark.createDataFrame(
        [(1, "image/png", bytearray(png)), (2, "image/jpeg", bytearray(jpg))],
        "media_id long, media_type string, payload binary",
    )
    meta = {r.media_id: (r.width, r.height, r.n_channels)
            for r in decode_image(df).collect()}
    assert meta[1] == meta[2] == (40, 24, 3)
    pix = {r.media_id: r for r in decode_image_pixels(df).collect()}
    assert (pix[1].width, pix[1].height, pix[1].n_channels) == (
        pix[2].width, pix[2].height, pix[2].n_channels,
    )
    means_p = np.array(pix[1].channel_means[:3])
    means_j = np.array(pix[2].channel_means[:3])
    assert np.allclose(means_p, means_j, atol=3.0)


def test_jpeg_header_sniff_matches_pillow():
    """The stdlib SOF sniffer (the no-Pillow metadata path) agrees with
    Pillow's actual raster on every encode shape Pillow emits here —
    baseline and progressive."""
    a = _gradient(w=33, h=17)
    for kw in ({}, {"progressive": True}, {"optimize": True}):
        jpg = _encode(a, "JPEG", **kw)
        w, h, _ = sniff_image_dims(jpg)
        with Image.open(io.BytesIO(jpg)) as im:
            assert (w, h) == (im.width, im.height)


def test_feature_extraction_runs_on_jpeg(spark):
    """extract_image_features' Pillow path covers JPEG end-to-end: a
    26-float vector comes back non-null with sane histogram mass."""
    from wrtd_etl_spark.multimodal.binary_ops import extract_image_features

    jpg = _encode(_gradient(), "JPEG", quality=95)
    df = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(jpg))],
        "media_id long, media_type string, payload binary",
    )
    row = extract_image_features(df).head()
    assert row.feature is not None and len(row.feature) == 26
    assert abs(sum(row.feature[:16]) - 1.0) < 1e-5  # histogram normalized

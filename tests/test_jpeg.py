"""Baseline JPEG codec (operators/jpeg.py): round-trip fidelity,
stream conformance knobs (subsampling, restart intervals, grayscale),
error paths, and the Spark mapInPandas integration through
real_media_features."""

from __future__ import annotations

import numpy as np
import pytest

from hrtech_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg
from hrtech_etl_spark.operators.multimodal import decode_image


def _test_image(h: int = 40, w: int = 52) -> np.ndarray:
    """Deterministic smooth-gradient RGB image (smooth → tight
    quantization-error bounds)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(1, w - 1),
            yy * 255 // max(1, h - 1),
            (xx + yy) * 255 // max(1, h + w - 2),
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("quality", [95, 75])
@pytest.mark.parametrize("dri", [0, 2])
def test_roundtrip_fidelity(subsample, quality, dri):
    img = _test_image()
    data = encode_jpeg(
        img, quality=quality, subsample=subsample, restart_interval=dri
    )
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    # smooth gradients: 4:4:4 stays within a few levels, 4:2:0 within
    # chroma-averaging distance
    bound = 8 if subsample == "4:4:4" else 16
    assert err.max() <= bound, (subsample, quality, dri, err.max())
    assert err.mean() <= 4.0


@pytest.mark.parametrize(
    "h,w", [(8, 8), (9, 13), (16, 16), (17, 31), (1, 1), (3, 200)]
)
def test_odd_dimensions(h, w):
    """Non-8-multiple and non-16-multiple (4:2:0 MCU) sizes pad with
    edge replication and crop back exactly. Slope-bounded fixture
    (≤2 levels/px): the full-range gradient of _test_image would be
    85 levels/px at h=3, where 4:2:0 chroma averaging legitimately
    loses tens of levels — that's subsampling, not a codec defect."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            np.clip(40 + 2 * xx, 0, 255),
            np.clip(40 + 2 * yy, 0, 255),
            np.clip(30 + xx + yy, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 16


def test_grayscale_roundtrip():
    yy, xx = np.mgrid[0:24, 0:40]
    g = ((xx + yy) * 255 // 62).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (24, 40, 3)
    # all three channels replicate the decoded luma
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 8


def test_deterministic():
    img = _test_image()
    a, b = encode_jpeg(img, quality=80), encode_jpeg(img, quality=80)
    assert a == b
    assert (decode_jpeg(a) == decode_jpeg(b)).all()


def test_quality_tradeoff():
    """Lower quality → fewer bytes and (weakly) more error."""
    img = _test_image(64, 64)
    hi, lo = encode_jpeg(img, quality=95), encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)
    err_hi = np.abs(decode_jpeg(hi).astype(int) - img.astype(int)).mean()
    err_lo = np.abs(decode_jpeg(lo).astype(int) - img.astype(int)).mean()
    assert err_lo >= err_hi


def test_restart_interval_markers_present():
    img = _test_image(32, 32)  # 4 MCUs at 4:4:4... 16 blocks
    data = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    # and a decoder that honors restarts reproduces the no-restart image
    base = decode_jpeg(encode_jpeg(img, quality=90))
    assert (decode_jpeg(data) == base).all()


def test_progressive_rejected():
    # minimal SOF2 (progressive) frame header after SOI
    data = b"\xff\xd8" + b"\xff\xc2" + b"\x00\x0b" + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="progressive|baseline"):
        decode_jpeg(data)


def test_truncated_stream_raises():
    data = encode_jpeg(_test_image(), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(data[: int(len(data) * 0.6)])


def test_not_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"P6\n1 1\n255\n\x00\x00\x00")


def test_decode_image_sniffs_jpeg():
    img = _test_image(16, 16)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_spark_media_features_on_jpeg(spark):
    """The full Arrow path: JPEG payloads inside the typed media
    struct, real_media_features decoding them inside mapInPandas; the
    distributed features must equal a local decode feature-for-feature."""
    from hrtech_etl_spark.operators.multimodal import (
        media_column,
        media_features,
        real_media_features,
    )
    from pyspark.sql import functions as F

    imgs = {i: _test_image(16 + i, 24 + 2 * i) for i in range(4)}
    payloads = {i: encode_jpeg(im, quality=90, subsample="4:2:0") for i, im in imgs.items()}
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads.items()], "doc_id long, content binary"
    ).withColumn(
        "media",
        media_column(F.col("content"), F.lit("image/jpeg"), F.col("doc_id")),
    )
    got = {
        r["doc_id"]: r["features"]
        for r in media_features(
            df, kernel=lambda b: real_media_features(b)
        ).collect()
    }
    assert set(got) == set(payloads)
    for i, p in payloads.items():
        assert got[i] == real_media_features(p)

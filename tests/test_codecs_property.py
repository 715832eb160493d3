"""Property-based roundtrips for the pure-numpy media codecs: encode →
decode must be the identity for arbitrary pixel/sample content (no
Spark session involved — these are plain byte-math properties)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hrtech_etl_spark.operators import multimodal as mm

dims = st.tuples(st.integers(1, 16), st.integers(1, 16))


def _random_img(h: int, w: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


@settings(max_examples=50, deadline=None)
@given(dims=dims, seed=st.integers(0, 2**31))
def test_ppm_roundtrip_property(dims, seed):
    img = _random_img(*dims, seed)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)


@settings(max_examples=50, deadline=None)
@given(dims=dims, seed=st.integers(0, 2**31))
def test_bmp_decode_property(dims, seed):
    """decode_bmp inverts an independent minimal BMP writer for every
    (h, w) — including widths whose rows need 4-byte padding."""
    img = _random_img(*dims, seed)
    h, w = img.shape[:2]
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        img[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    content = (
        struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
        + body
    )
    assert np.array_equal(mm.decode_bmp(content), img)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 2000),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_property(n, sr, seed):
    samples = np.random.default_rng(seed).integers(
        -32768, 32768, size=n, dtype=np.int16
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(samples.tobytes())
    got, got_sr = mm.decode_wav(buf.getvalue())
    assert got_sr == sr
    assert np.allclose(got, samples.astype(np.float64) / 32768.0)


@settings(max_examples=25, deadline=None)
@given(
    frames=st.lists(st.tuples(dims, st.integers(0, 2**31)), min_size=1, max_size=6),
    every_n=st.integers(1, 4),
)
def test_ppm_stream_split_property(frames, every_n):
    """Splitting a concatenated stream of arbitrary-sized frames
    recovers exactly the frames that were concatenated."""
    payloads = [mm.encode_ppm(_random_img(*d, s)) for d, s in frames]
    assert mm.split_ppm_stream(b"".join(payloads)) == payloads
    assert mm.real_frame_sample(b"".join(payloads), every_n) == payloads[::every_n]
    # a stream cut off mid-raster fails loudly at the split, not as a
    # short final frame that corrupts a later decode
    with pytest.raises(ValueError, match="truncated PPM stream"):
        mm.split_ppm_stream(b"".join(payloads)[:-1])


@settings(max_examples=40, deadline=None)
@given(dims=dims, seed=st.integers(0, 2**31), out=dims)
def test_resize_property(dims, seed, out):
    """Nearest-neighbor resize: every output pixel is some input pixel,
    the output shape is exact, and identity-resize is the identity."""
    img = _random_img(*dims, seed)
    oh, ow = out
    resized = mm.decode_ppm(mm.real_resize(mm.encode_ppm(img), ow, oh))
    assert resized.shape == (oh, ow, 3)
    flat = {tuple(p) for p in img.reshape(-1, 3)}
    assert {tuple(p) for p in resized.reshape(-1, 3)} <= flat
    same = mm.decode_ppm(
        mm.real_resize(mm.encode_ppm(img), img.shape[1], img.shape[0])
    )
    assert np.array_equal(same, img)


@settings(max_examples=40, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 24), st.integers(1, 24)),
    seed=st.integers(0, 2**31),
    quality=st.integers(50, 95),
    subsample=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
    dri=st.sampled_from([0, 1, 3]),
)
def test_jpeg_structure_property(dims, seed, quality, subsample, dri):
    """JPEG is lossy, so the property is structural: any uint8 image at
    any knob combination encodes to a well-formed stream that decodes
    back to the same shape/dtype, deterministically."""
    from hrtech_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = _random_img(*dims, seed)
    data = encode_jpeg(
        img, quality=quality, subsample=subsample, restart_interval=dri
    )
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (decode_jpeg(data) == out).all()
    assert encode_jpeg(
        img, quality=quality, subsample=subsample, restart_interval=dri
    ) == data


@settings(max_examples=40, deadline=None)
@given(dims=st.tuples(st.integers(1, 24), st.integers(1, 24)), seed=st.integers(0, 2**31))
def test_jpeg_444_error_bound_property(dims, seed):
    """At 4:4:4 / quality 95 the loss is quantization only — bounded
    even on pure noise (subsampled modes legitimately average away
    chroma noise, so no such bound exists there)."""
    from hrtech_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = _random_img(*dims, seed)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample="4:4:4"))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 48
    assert err.mean() <= 12.0

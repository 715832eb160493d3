"""PNG codec (operators/png.py): lossless round trips, independent
hand-built streams, palette/tRNS decode, filters, error paths."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hrtech_etl_spark.operators.png import decode_png, encode_png


def _hand_chunk(ctype: bytes, body: bytes) -> bytes:
    """Independent chunk writer (test-local, not the encoder's)."""
    import binascii

    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + (binascii.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def test_roundtrip_property():
    rng = np.random.RandomState(7)
    for shape in [(1, 1), (3, 9), (6, 5, 3), (5, 2, 4), (17, 13)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for ft in ("none", "sub", "up", "paeth", "adaptive"):
            dec = decode_png(encode_png(img, filter_type=ft))
            assert np.array_equal(dec, img), (shape, ft)


def test_decoder_reads_hand_built_stream():
    """A 2x2 RGB PNG assembled byte-by-byte in the TEST (different
    code path from the encoder): row 0 filter None, row 1 filter Up."""
    px = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[15, 25, 35], [45, 55, 65]]],
        dtype=np.uint8,
    )
    row0 = bytes([0]) + px[0].tobytes()
    up = (px[1].astype(int) - px[0].astype(int)) % 256
    row1 = bytes([2]) + up.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _hand_chunk(b"IHDR", ihdr)
        + _hand_chunk(b"IDAT", zlib.compress(row0 + row1))
        + _hand_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)


def test_multiple_idat_chunks():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = encode_png(img, filter_type="none")
    # split the single IDAT into two chunks; decoder must concatenate
    sig, rest = data[:8], data[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    out = sig
    for ctype, body in chunks:
        if ctype == b"IDAT":
            mid = len(body) // 2
            out += _hand_chunk(b"IDAT", body[:mid])
            out += _hand_chunk(b"IDAT", body[mid:])
        else:
            out += _hand_chunk(ctype, body)
    assert np.array_equal(decode_png(out), img)


def test_palette_and_trns():
    """Indexed-color stream built by hand: PLTE + tRNS expand to RGBA."""
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    rows = b"".join(bytes([0]) + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    base = (
        b"\x89PNG\r\n\x1a\n"
        + _hand_chunk(b"IHDR", ihdr)
        + _hand_chunk(b"PLTE", pal)
    )
    tail = _hand_chunk(b"IDAT", zlib.compress(rows)) + _hand_chunk(b"IEND", b"")
    rgb = decode_png(base + tail)
    assert rgb.shape == (2, 2, 3)
    assert tuple(rgb[0, 0]) == (255, 0, 0) and tuple(rgb[1, 0]) == (0, 0, 255)
    rgba = decode_png(base + _hand_chunk(b"tRNS", bytes([128])) + tail)
    assert rgba.shape == (2, 2, 4)
    assert rgba[0, 0, 3] == 128 and rgba[0, 1, 3] == 255


def test_error_paths():
    img = np.zeros((2, 2), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    # corrupt one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    bad[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-6])
    # 16-bit depth and interlace are explicit NotImplementedError
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    s16 = (
        b"\x89PNG\r\n\x1a\n"
        + _hand_chunk(b"IHDR", ihdr16)
        + _hand_chunk(b"IDAT", zlib.compress(bytes([0, 0, 0])))
        + _hand_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(s16)
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    si = (
        b"\x89PNG\r\n\x1a\n"
        + _hand_chunk(b"IHDR", ihdr_i)
        + _hand_chunk(b"IDAT", zlib.compress(bytes([0, 0])))
        + _hand_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(si)
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((2, 2), dtype=np.float64))
    with pytest.raises(ValueError, match="shape"):
        encode_png(np.zeros((2, 2, 2), dtype=np.uint8))


def test_average_filter_decode():
    """Filter 3 (Average) exercise: encoder never emits it, so build
    the stream by hand and check against the spec's reconstruction."""
    line0 = np.array([10, 100, 200], dtype=np.uint8)
    line1 = np.array([50, 60, 70], dtype=np.uint8)
    # filter row 1 with Average: out[x] = raw - (left + up)//2
    recon = np.zeros(3, dtype=int)
    enc1 = []
    for x in range(3):
        left = recon[x - 1] if x >= 1 else 0
        enc1.append((int(line1[x]) - (left + int(line0[x])) // 2) % 256)
        recon[x] = line1[x]
    rows = bytes([0]) + line0.tobytes() + bytes([3]) + bytes(enc1)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _hand_chunk(b"IHDR", ihdr)
        + _hand_chunk(b"IDAT", zlib.compress(rows))
        + _hand_chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert np.array_equal(out, np.vstack([line0, line1]))

"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the compressed-image tier of ``operators/multimodal.py``: this
environment has no Pillow/libjpeg, so baseline JPEG is implemented
from the public spec directly — no third-party codec.

Decoder (``decode_jpeg``): baseline sequential DCT (SOF0) only, 8-bit
precision, 1 or 3 components, arbitrary sampling factors up to 2×2
(4:4:4 / 4:2:2 / 4:2:0), restart intervals (DRI/RSTn), byte
unstuffing, Huffman tables taken from the stream's own DHT segments
(canonical decode — works on any spec-conforming baseline file, not
just ours). Progressive (SOF2) and arithmetic coding raise
``NotImplementedError`` with a clear message; truncated streams raise
``ValueError``.

Encoder (``encode_jpeg``): the fixture/thumbnail writer — 8-bit RGB or
grayscale, quality-scaled Annex-K quantization tables, standard
Huffman tables, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, optional
restart intervals. The encoder embeds the exact tables it codes with, so the
bitstream is self-describing and round-trips through ANY baseline
decoder.

Performance shape: DCTs are vectorized over all blocks of a component
(two 8×8 matmuls via einsum); only the entropy coding loop is
per-symbol Python. That is the right trade for this engine — media
decode runs inside Arrow-batched ``mapInPandas`` kernels
(operators/multimodal.py) where the per-asset cost is amortized per
batch, and a production deployment swaps in a native codec through the
same injectable-kernel contract.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants: zigzag, DCT basis, Annex-K tables
# ---------------------------------------------------------------------------

def _zigzag_order() -> list[tuple[int, int]]:
    """The 64 (row, col) pairs in JPEG zigzag scan order, generated
    (not transcribed) so it cannot be mistyped."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left → top-right
        order.extend(diag)
    return order


_ZZ = _zigzag_order()
#: flat indices such that block.flat[_ZZ_FLAT] yields zigzag order
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ])
#: inverse: zigzag vector → natural order
_ZZ_INV = np.argsort(_ZZ_FLAT)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    a = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    a *= np.sqrt(2.0 / 8.0)
    a[0] *= np.sqrt(0.5)
    return a


_A = _dct_matrix()  # FDCT: A @ x @ A.T ; IDCT: A.T @ X @ A

# Annex K quantization tables (natural order, row-major)
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K "typical" Huffman specs: (bits[1..16], values). The decoder
# never uses these (it reads DHT from the stream); the encoder both
# codes with and embeds them, so internal consistency — not byte
# equality with any other implementation — is what correctness needs,
# and _build_huff_codes verifies it.
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _build_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol → (code, length). Validates the spec
    (counts match values; code space never overflows)."""
    if sum(bits) != len(vals):
        raise ValueError(
            f"inconsistent Huffman spec: {sum(bits)} counts vs {len(vals)} values"
        )
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("Huffman code space overflow")
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical Huffman decode tables (F.2.2.3): per-length
    min/max code + value pointer."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits: list[int], vals: list[int]):
        if sum(bits) != len(vals):
            raise ValueError("corrupt DHT: counts do not match values")
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = reader.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("corrupt entropy stream: Huffman code > 16 bits")
            code = (code << 1) | reader.read_bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "bitbuf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            self.bitbuf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, n: int) -> int:
    """T.81 F.12: map an n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 ndarray (h, w, 3) RGB (grayscale sources
    replicate to 3 channels, same contract as the other decoders)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")

    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None  # (h, w, components[(cid, hs, vs, tq)])
    restart_interval = 0
    i = 2
    n = len(content)

    while i < n:
        if content[i] != 0xFF:
            raise ValueError(f"expected marker at byte {i}")
        marker = content[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS — no image data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if i + 2 > n:
            raise ValueError("truncated segment header")
        seglen = struct.unpack_from(">H", content, i)[0]
        seg = content[i + 2 : i + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment body")
        i += seglen

        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.float64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], ">u2").astype(np.float64)
                    p += 128
                qt[tq] = tbl[_ZZ_INV]  # store natural order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                p += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both sequential)
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision not supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported; "
                f"got SOF marker 0xFF{marker:02X} (progressive/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            return _decode_scan(
                content, i, seg, frame, qt, huff_dc, huff_ac, restart_interval
            )
        # APPn/COM/others: skipped
    raise ValueError("no SOS marker — not a decodable JPEG stream")


def _split_entropy(content: bytes, start: int) -> list[bytes]:
    """Entropy-coded data from ``start``: unstuff FF00, split on RSTn,
    stop at the next real marker."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(content)
    while i < n:
        b = content[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        nxt = content[i + 1] if i + 1 < n else None
        if nxt == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:
            segs.append(bytearray())
            i += 2
        else:
            break  # EOI or the next segment
    return [bytes(s) for s in segs]


def _decode_scan(content, data_start, sos, frame, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame
    ns = sos[0]
    scan_tables = {}
    for c in range(ns):
        cs, td_ta = sos[1 + 2 * c : 3 + 2 * c]
        scan_tables[cs] = (td_ta >> 4, td_ta & 15)
    order = [c for c in comps if c[0] in scan_tables]
    if len(order) != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) JPEG not supported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    segments = _split_entropy(content, data_start)
    # per component: coefficient store (one 64-vec per block)
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
    blocks: dict[int, list[tuple[int, int, np.ndarray]]] = {c[0]: [] for c in comps}

    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {c[0]: 0 for c in comps}
    mcu = 0
    total_mcus = mcux * mcuy
    while mcu < total_mcus:
        if dri and mcu and mcu % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment in entropy stream")
            reader = _BitReader(segments[seg_idx])
            pred = {c[0]: 0 for c in comps}
        my, mx = divmod(mcu, mcux)
        for cid, hs, vs, tq in comps:
            dc_t = huff_dc[scan_tables[cid][0]]
            ac_t = huff_ac[scan_tables[cid][1]]
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, dtype=np.float64)
                    t = dc_t.decode(reader)
                    pred[cid] += _extend(reader.receive(t), t)
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(reader)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("corrupt AC run past block end")
                        zz[k] = _extend(reader.receive(s), s)
                        k += 1
                    blocks[cid].append(
                        ((my * vs + by) * 8, (mx * hs + bx) * 8, zz * qt[tq][_ZZ_FLAT])
                    )
        mcu += 1

    # vectorized de-zigzag + IDCT per component, then place blocks
    for cid, hs, vs, tq in comps:
        blist = blocks[cid]
        if not blist:
            continue
        coeffs = np.stack([b[2] for b in blist])[:, _ZZ_INV].reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _A.T, coeffs, _A) + 128.0
        plane = planes[cid]
        for (y, x, _), block in zip(blist, pix):
            plane[y : y + 8, x : x + 8] = block

    # upsample to full resolution and crop
    out_planes = []
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])

    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255)
        return np.ascontiguousarray(
            np.repeat(y[..., None], 3, axis=2)
        ).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "bitbuf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.bitbuf = (self.bitbuf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.bitbuf >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QT_LUMA, _QT_CHROMA):
        q = np.floor((base * scale + 50) / 100)
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


def _blockify(plane: np.ndarray, ph: int, pw: int) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to exactly (ph, pw) — the MCU-aligned grid,
    which can exceed the next 8-multiple when the component samples at
    2×2 — and return (n,8,8) blocks in raster block order plus the
    block grid (by, bx)."""
    h, w = plane.shape
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def _encode_blocks(coeffs_zz: np.ndarray, writer, dc_codes, ac_codes, order, pred):
    """Entropy-code blocks (already quantized, zigzag int arrays) in the
    given index order; returns the updated DC predictor."""
    for idx in order:
        zz = coeffs_zz[idx]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        mag, size = abs(diff), 0
        while mag:
            size += 1
            mag >>= 1
        code, length = dc_codes[size]
        writer.write(code, length)
        if size:
            v = diff if diff >= 0 else diff + (1 << size) - 1
            writer.write(v, size)
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                writer.write(*ac_codes[0xF0])  # ZRL
                run -= 16
            mag, size = abs(v), 0
            while mag:
                size += 1
                mag >>= 1
            writer.write(*ac_codes[(run << 4) | size])
            writer.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last < 63:
            writer.write(*ac_codes[0x00])  # EOB
    return pred


def encode_jpeg(
    img: np.ndarray,
    *,
    quality: int = 90,
    subsample: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale → baseline JFIF bytes."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (h, w, 3) RGB or (h, w) grayscale")
    if subsample not in ("4:4:4", "4:2:2", "4:2:0"):
        raise NotImplementedError(
            "subsample must be '4:4:4', '4:2:2' or '4:2:0'"
        )
    h, w = img.shape[0], img.shape[1]
    qt_l, qt_c = _quality_tables(quality)

    x = img.astype(np.float64)
    if gray:
        planes = [x]
    else:
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "4:2:0":
            # pad to even dims (edge) then 2x2 mean
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        elif subsample == "4:2:2":
            # horizontal-only 1x2 mean
            pw = -(-w // 2) * 2
            cb = np.pad(cb, ((0, 0), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, 0), (0, pw - w)), mode="edge")
            cb = cb.reshape(h, pw // 2, 2).mean(axis=2)
            cr = cr.reshape(h, pw // 2, 2).mean(axis=2)
        planes = [y, cb, cr]

    luma_hv = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}[subsample]
    sampling = (
        [(1, 1)]
        if gray
        else ([(1, 1)] * 3 if subsample == "4:4:4" else [luma_hv, (1, 1), (1, 1)])
    )
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # quantized zigzag coefficients per component, MCU-aligned grids
    comp_zz, comp_grid = [], []
    for ci, plane in enumerate(planes):
        hs, vs = sampling[ci]
        qtab = qt_l if ci == 0 else qt_c
        blocks, by, bx = _blockify(plane - 128.0, mcuy * vs * 8, mcux * hs * 8)
        coeffs = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T)
        zz = np.round(coeffs.reshape(-1, 64) / qtab).astype(np.int64)[:, _ZZ_FLAT]
        comp_zz.append(zz)
        comp_grid.append((by, bx))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qtab in ((0, qt_l),) + (() if gray else ((1, qt_c),)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(qtab[_ZZ_FLAT].astype(np.uint8).tolist())
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        tq = 0 if ci == 0 else 1
        out += bytes([ci + 1, (hs << 4) | vs, tq])
    # DHT (the tables we code with)
    specs = [(0, 0, _HUFF_DC_LUMA), (1, 0, _HUFF_AC_LUMA)]
    if not gray:
        specs += [(0, 1, _HUFF_DC_CHROMA), (1, 1, _HUFF_AC_CHROMA)]
    for tc, th, (bits, vals) in specs:
        out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_l = _build_huff_codes(*_HUFF_DC_LUMA)
    ac_l = _build_huff_codes(*_HUFF_AC_LUMA)
    dc_c = _build_huff_codes(*_HUFF_DC_CHROMA)
    ac_c = _build_huff_codes(*_HUFF_AC_CHROMA)

    writer = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            writer = _BitWriter()
            pred = [0] * ncomp
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            hs, vs = sampling[ci]
            _, bx = comp_grid[ci]
            dc = dc_l if ci == 0 else dc_c
            ac = ac_l if ci == 0 else ac_c
            order = [
                (my * vs + by) * bx + (mx * hs + bxx)
                for by in range(vs)
                for bxx in range(hs)
            ]
            pred[ci] = _encode_blocks(
                comp_zz[ci], writer, dc, ac, order, pred[ci]
            )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)

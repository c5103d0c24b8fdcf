"""Baseline JFIF (SOF0) JPEG codec — pure numpy + stdlib, no pillow.

Real Common-Crawl media is mostly JPEG (the reference crawler accepted
arbitrary content types and stored the raw bytes — tse/Crawl.cpp:439-451);
this module closes the gap so the stdlib multimodal backend handles the
PNG/GIF/JPEG trio end to end.  Scope is baseline sequential DCT exactly
as ITU-T T.81 defines it:

- **encode_jpeg**: 8-bit gray or RGB -> JFIF bytes.  Level shift,
  8x8 forward DCT (orthonormal matrix form), quality-scaled Annex-K
  quantization tables (IJG quality law), zigzag, DC prediction, the
  spec's canonical DC/AC Huffman tables (Annex K.3), byte-stuffed
  entropy stream.  Color goes through BT.601 full-range YCbCr with
  4:2:0 (default) or 4:4:4 subsampling; planes pad by edge replication
  to full MCUs.
- **decode_jpeg**: JFIF/EXIF bytes -> uint8 array, (h, w) for one
  component, (h, w, 3) RGB for three.  Marker walk (APPn/COM skipped,
  DQT 8/16-bit, DHT multi-table, DRI), baseline SOF0 only —
  progressive (SOF2) and arithmetic variants raise ValueError so the
  multimodal router can surface its pillow gate.  Entropy decode
  handles 0xFF00 un-stuffing and RSTn restart markers (DC predictor
  reset + byte alignment).

The DCT pair uses the orthonormal matrix A[u,x] = 1/2 c(u)
cos((2x+1)u*pi/16) (c(0)=1/sqrt(2)), so FDCT = A @ block @ A.T and
IDCT = A.T @ S @ A are exact transposes — tested against the direct
double-sum definition.  Everything is vectorized per-plane except the
entropy coder, which is per-block Python over numpy buffers: this is
the coverage path (like the GIF LZW codec); the throughput media path
remains the fake/pillow backends.

Exactness property used by the driver oracle (media_jpeg_roundtrip):
at quality 75 the scaled luminance DC quantizer is exactly 8
(floor((16*50+50)/100)), and a flat 8x8 block's only nonzero
coefficient is DC = 8*(v-128) — so block-aligned piecewise-flat gray
images survive encode->decode bit-exactly, making the lossy codec
SQL-oracle-checkable without replicating float DCT in SQL.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# ITU-T T.81 Annex K.1 — luminance/chrominance quantization (natural
# row-major order).
Q_LUM = np.array(
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
    dtype=np.int64,
).reshape(8, 8)

Q_CHR = np.array(
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
    dtype=np.int64,
).reshape(8, 8)

# zigzag scan: ZIGZAG[k] = flat (row*8+col) index of the k-th scanned
# coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
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
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A (A @ A.T == I):
    A[u, x] = 1/2 * c(u) * cos((2x+1) u pi / 16), c(0) = 1/sqrt(2)."""
    u = np.arange(8).reshape(8, 1).astype(np.float64)
    x = np.arange(8).reshape(1, 8).astype(np.float64)
    a = 0.5 * np.cos((2.0 * x + 1.0) * u * np.pi / 16.0)
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return a


_A = _dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables (1..100)."""
    q = int(min(100, max(1, quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((Q_LUM * scale + 50) // 100, 1, 255)
    chr_ = np.clip((Q_CHR * scale + 50) // 100, 1, 255)
    return lum.astype(np.int64), chr_.astype(np.int64)


# ------------------------------------------------------------- huffman


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """value -> (code, length) per the canonical JPEG algorithm."""
    out: dict[int, tuple] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple, int]:
    """(length, code) -> value for the decoder's bit-walk."""
    enc = _build_codes(bits, vals)
    return {(ln, code): v for v, (code, ln) in enc.items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    """Entropy-stream reader: un-stuffs 0xFF00, surfaces RSTn markers.

    The whole scan is pre-split ONCE into marker-delimited segments
    (0xFF00 un-stuffed as it goes), so steady-state reads refill a
    32-bit-at-a-time accumulator instead of walking the stream one
    byte per bit — the per-symbol cost is a couple of int ops, and
    :func:`_build_lut`'s 16-bit window decode rides on ``peek16``."""

    def __init__(self, data: bytes, pos: int) -> None:
        segs: list[tuple[bytes, int | None]] = []
        cur = bytearray()
        p, n = pos, len(data)
        while True:
            q = data.find(b"\xff", p)
            if q < 0:
                cur += data[p:n]
                segs.append((bytes(cur), None))  # ran out with no marker
                break
            cur += data[p:q]
            nxt = data[q + 1] if q + 1 < n else 0xD9
            if nxt == 0x00:  # byte stuffing
                cur.append(0xFF)
                p = q + 2
                continue
            segs.append((bytes(cur), nxt))
            if 0xD0 <= nxt <= 0xD7:  # RSTn: the scan continues after it
                cur = bytearray()
                p = q + 2
                continue
            break  # any other marker ends the entropy scan
        self.segments = segs
        self.seg_i = 0
        self._load()

    def _load(self) -> None:
        buf, marker = self.segments[self.seg_i]
        self.buf = buf
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = marker

    def _refill(self, need: int) -> bool:
        while self.nbits < need:
            avail = len(self.buf) - self.bytepos
            if avail <= 0:
                return False
            take = 4 if avail >= 4 else avail
            self.acc = (self.acc << (8 * take)) | int.from_bytes(
                self.buf[self.bytepos : self.bytepos + take], "big"
            )
            self.nbits += 8 * take
            self.bytepos += take
        return True

    def _hit(self):
        if self.marker is None:
            raise ValueError("truncated JPEG entropy stream")
        raise _MarkerHit()

    def bit(self) -> int:
        if not self._refill(1):
            self._hit()
        self.nbits -= 1
        b = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return b

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if not self._refill(n):
            self._hit()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek16(self) -> int:
        """Next 16 bits without consuming; past the real end the
        window pads with 1-bits (the flush pad law) — ``consume``
        still refuses to eat fabricated bits."""
        if not self._refill(16):
            pad = 16 - self.nbits
            return ((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        if self.nbits < n:
            self._hit()
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def align_after_marker(self) -> int:
        """Consume the pending marker and continue in the next
        segment (empty after the scan's terminating marker)."""
        m = self.marker
        self.seg_i += 1
        if self.seg_i < len(self.segments):
            self._load()
        else:
            self.buf = b""
            self.bytepos = 0
            self.acc = 0
            self.nbits = 0
            self.marker = None
        return m if m is not None else 0


def _build_lut(tab: dict) -> np.ndarray:
    """16-bit-window Huffman LUT: entry = (value << 8) | code_length,
    0 = invalid.  Every code (max 16 bits per T.81) owns the
    contiguous slice of windows sharing its prefix, so construction is
    one slice-assign per code."""
    lut = np.zeros(65536, dtype=np.int32)
    for (ln, code), v in tab.items():
        start = code << (16 - ln)
        lut[start : start + (1 << (16 - ln))] = (v << 8) | ln
    return lut


class _MarkerHit(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t raw bits to the signed coefficient."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ------------------------------------------------------------- encoder


def _to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    clip = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _pad_plane(p: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to multiples of (bh, bw)."""
    h, w = p.shape
    ph = (-h) % bh
    pw = (-w) % bw
    return np.pad(p, ((0, ph), (0, pw)), mode="edge")


def _subsample2(p: np.ndarray) -> np.ndarray:
    """2x2 box average (p padded to even dims first)."""
    p = _pad_plane(p, 2, 2).astype(np.float64)
    s = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
    return np.clip(np.round(s), 0, 255).astype(np.uint8)


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    s = block.astype(np.float64) - 128.0
    coef = _A @ s @ _A.T
    return np.round(coef / q).astype(np.int64)


def _fdct_quant_batch(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, 8, 8) uint8 blocks -> (n, 64) zigzagged quantized
    coefficients in ONE einsum: the whole plane's DCT/quantize/zigzag
    runs as three vectorized ops instead of a per-block Python loop —
    only the entropy coding (whose Huffman state chains block to
    block) stays sequential."""
    s = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _A, s, _A, optimize=True)
    return (
        np.round(coef / q).astype(np.int64).reshape(len(s), 64)[:, ZIGZAG]
    )


def _scan_order(
    grid_c: int, mcus_y: int, mcus_x: int, cv: int, ch: int
) -> np.ndarray:
    """Flat block indices of a component's block grid in interleaved
    scan order (my, mx, by, bx) — shared by the encoder's gather and
    the decoder's scatter."""
    r = (
        np.arange(mcus_y)[:, None, None, None] * cv
        + np.arange(cv)[None, None, :, None]
    )
    c = (
        np.arange(mcus_x)[None, :, None, None] * ch
        + np.arange(ch)[None, None, None, :]
    )
    return (r * grid_c + c).ravel()


def _plane_blocks_in_scan_order(
    plane: np.ndarray, mcus_y: int, mcus_x: int, cv: int, ch: int
) -> np.ndarray:
    """(n_blocks, 8, 8) view of a padded component plane ordered
    exactly as the interleaved scan emits them: (my, mx, by, bx)."""
    grid_r, grid_c = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(grid_r, 8, grid_c, 8)
        .transpose(0, 2, 1, 3)
        .reshape(grid_r * grid_c, 8, 8)
    )
    return blocks[_scan_order(grid_c, mcus_y, mcus_x, cv, ch)]


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    # walk only the NONZERO AC positions (numpy finds them): typical
    # quantized blocks are mostly zero, so this is per-symbol-emitted
    # work, not a fixed 63-iteration scan
    nz = np.flatnonzero(zz[1:]) + 1
    prev_k = 0
    for k in nz.tolist():
        run = k - prev_k - 1
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        v = int(zz[k])
        t = _category(v)
        code, ln = ac_codes[(run << 4) | t]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        prev_k = k
    if prev_k != 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _category_arr(v: np.ndarray) -> np.ndarray:
    """Vectorized T.81 category (bit length of |v|)."""
    a = np.abs(v.astype(np.int64))
    t = np.zeros(a.shape, np.int64)
    while (a > 0).any():
        t += a > 0
        a >>= 1
    return t


def _codes_to_arrays(codes: dict) -> tuple[np.ndarray, np.ndarray]:
    """value -> (code, length) dict as two dense lookup arrays."""
    hi = max(codes) + 1
    carr = np.zeros(hi, np.int64)
    larr = np.zeros(hi, np.int64)
    for v, (c, ln) in codes.items():
        carr[v] = c
        larr[v] = ln
    return carr, larr


def _encode_component_bits(
    zzq: np.ndarray, dc_codes: dict, ac_codes: dict
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized entropy coding of one component's blocks (scan
    order): -> (bit array MSB-first, per-block bit counts).

    Byte-for-byte identical to walking :func:`_encode_block` over the
    same blocks (pytest-pinned): DC diffs chain across the whole
    sequence, AC symbols are (run, size) with ZRL expansion and EOB,
    all built as flat numpy item tables sorted by (block, seq) and
    bit-expanded 16 lanes at a time — no per-coefficient Python."""
    n = len(zzq)
    dc_c, dc_l = _codes_to_arrays(dc_codes)
    ac_c, ac_l = _codes_to_arrays(ac_codes)

    items_b: list[np.ndarray] = []  # block ids
    items_s: list[np.ndarray] = []  # intra-block sequence keys
    items_c: list[np.ndarray] = []  # raw code values
    items_l: list[np.ndarray] = []  # bit lengths

    # DC: diffs chain block to block
    dc = zzq[:, 0].astype(np.int64)
    diff = np.diff(dc, prepend=0)
    t = _category_arr(diff)
    blocks = np.arange(n, dtype=np.int64)
    items_b.append(blocks)
    items_s.append(np.zeros(n, np.int64))
    items_c.append(dc_c[t])
    items_l.append(dc_l[t])
    has = t > 0
    vb = np.where(diff >= 0, diff, diff + (1 << t) - 1)
    items_b.append(blocks[has])
    items_s.append(np.ones(int(has.sum()), np.int64))
    items_c.append(vb[has])
    items_l.append(t[has])

    # AC: nonzero coefficients in row-major order
    rows, cols = np.nonzero(zzq[:, 1:])
    k = cols.astype(np.int64) + 1
    rows = rows.astype(np.int64)
    if len(rows):
        first = np.empty(len(rows), bool)
        first[0] = True
        first[1:] = rows[1:] != rows[:-1]
        prev_k = np.where(first, 0, np.roll(k, 1))
        run = k - prev_k - 1
        zrl = run // 16
        rem = run % 16
        v = zzq[rows, k]
        s = _category_arr(v)
        sym = (rem << 4) | s
        # index of each nonzero within its block (for the seq budget:
        # up to 3 ZRLs + symbol + value bits = 5 slots, budget 6)
        starts = np.flatnonzero(first)
        block_start_of = np.repeat(starts, np.diff(np.append(starts, len(rows))))
        idx_in_block = np.arange(len(rows), dtype=np.int64) - block_start_of
        seq0 = 2 + 6 * idx_in_block
        # ZRL copies
        tot_z = int(zrl.sum())
        if tot_z:
            rz = np.repeat(rows, zrl)
            base = np.repeat(seq0, zrl)
            cz = np.arange(tot_z, dtype=np.int64) - np.repeat(
                np.cumsum(zrl) - zrl, zrl
            )
            items_b.append(rz)
            items_s.append(base + cz)
            items_c.append(np.full(tot_z, ac_c[0xF0], np.int64))
            items_l.append(np.full(tot_z, ac_l[0xF0], np.int64))
        items_b.append(rows)
        items_s.append(seq0 + 3)
        items_c.append(ac_c[sym])
        items_l.append(ac_l[sym])
        vb2 = np.where(v >= 0, v, v + (1 << s) - 1)
        items_b.append(rows)
        items_s.append(seq0 + 4)
        items_c.append(vb2)
        items_l.append(s)
        last_nz = np.zeros(n, np.int64)
        np.maximum.at(last_nz, rows, k)
    else:
        last_nz = np.zeros(n, np.int64)

    eob_rows = np.flatnonzero(last_nz != 63).astype(np.int64)
    items_b.append(eob_rows)
    items_s.append(np.full(len(eob_rows), 1 << 20, np.int64))
    items_c.append(np.full(len(eob_rows), ac_c[0x00], np.int64))
    items_l.append(np.full(len(eob_rows), ac_l[0x00], np.int64))

    b = np.concatenate(items_b)
    sq = np.concatenate(items_s)
    codes = np.concatenate(items_c)
    lens = np.concatenate(items_l)
    order = np.lexsort((sq, b))
    b, codes, lens = b[order], codes[order], lens[order]

    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = int(lens.sum())
    bits = np.zeros(total, np.uint8)
    for bp in range(int(lens.max()) if len(lens) else 0):
        m = lens > bp
        bits[offs[m] + bp] = (codes[m] >> (lens[m] - 1 - bp)) & 1
    per_block = np.bincount(b, weights=lens, minlength=n).astype(np.int64)
    return bits, per_block


def _assemble_scan(
    parts: "list[tuple[np.ndarray, np.ndarray]]",
    bpm: "list[int]",
    mcus: int,
) -> bytes:
    """Interleave per-component bit streams into the MCU scan order,
    pad with 1-bits, pack MSB-first, byte-stuff 0xFF -> 0xFF00."""
    n_comp = len(parts)
    tot_bpm = sum(bpm)
    counts_g = np.zeros(mcus * tot_bpm, np.int64)
    before = np.concatenate(([0], np.cumsum(bpm)[:-1]))
    slots = []
    for ci in range(n_comp):
        j = np.arange(mcus * bpm[ci], dtype=np.int64)
        slot = (j // bpm[ci]) * tot_bpm + before[ci] + (j % bpm[ci])
        counts_g[slot] = parts[ci][1]
        slots.append(slot)
    offs_g = np.concatenate(([0], np.cumsum(counts_g)[:-1]))
    out = np.zeros(int(counts_g.sum()), np.uint8)
    for ci in range(n_comp):
        bits, counts = parts[ci]
        in_offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        delta = offs_g[slots[ci]] - in_offs
        if len(bits):
            pos = np.arange(len(bits), dtype=np.int64) + np.repeat(
                delta, counts
            )
            out[pos] = bits
    pad = (-len(out)) % 8
    if pad:
        out = np.concatenate([out, np.ones(pad, np.uint8)])
    packed = np.packbits(out)  # MSB-first
    ff = packed == 0xFF
    if ff.any():
        dest = np.empty(len(packed) + int(ff.sum()), np.uint8)
        idx = np.arange(len(packed)) + np.cumsum(ff) - ff
        dest[idx] = packed
        dest[idx[ff] + 1] = 0x00
        packed = dest
    return packed.tobytes()


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(
    px: np.ndarray, quality: int = 75, subsampling: str = "420"
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline JFIF bytes."""
    px = np.asarray(px)
    if px.dtype != np.uint8:
        raise ValueError("encode_jpeg needs uint8 pixels")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode_jpeg needs (h,w) gray or (h,w,3) RGB")
    h, w = int(px.shape[0]), int(px.shape[1])
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum, qchr = quality_tables(quality)

    if gray:
        comps = [(1, 1, 1, 0)]  # (id, H, V, qtab)
        planes = [px]
    else:
        y, cb, cr = _to_ycbcr(px)
        if subsampling == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [y, _subsample2(cb), _subsample2(cr)]
        elif subsampling == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [y, cb, cr]
        else:
            raise ValueError(f"subsampling {subsampling!r}: use 420 or 444")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # pad every plane to full MCUs of ITS sampling grid
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (_, ch, cv, _) in zip(planes, comps):
        want_w = mcus_x * ch * 8
        want_h = mcus_y * cv * 8
        p8 = _pad_plane(p, 8, 8)
        extra_h = want_h - p8.shape[0]
        extra_w = want_w - p8.shape[1]
        if extra_h or extra_w:
            p8 = np.pad(
                p8, ((0, max(0, extra_h)), (0, max(0, extra_w))), mode="edge"
            )
        padded.append(p8[:want_h, :want_w])

    dc_l = _build_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _build_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _build_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_c = _build_codes(AC_CHR_BITS, AC_CHR_VALS)

    qtabs = [qlum, qchr]
    # fully vectorized entropy phase: every component's
    # DCT/quantize/zigzag in one batch (blocks pre-ordered as the
    # interleaved scan wants them), then numpy symbol tables + bit
    # expansion per component and an MCU-interleaving bit scatter —
    # byte-identical to the per-block _encode_block walk, which stays
    # as the pytest-pinned reference twin
    zzs = [
        _fdct_quant_batch(
            _plane_blocks_in_scan_order(padded[ci], mcus_y, mcus_x, cv, ch),
            qtabs[tq],
        )
        for ci, (_, ch, cv, tq) in enumerate(comps)
    ]
    parts = [
        _encode_component_bits(
            zzs[ci],
            dc_l if ci == 0 else dc_c,
            ac_l if ci == 0 else ac_c,
        )
        for ci in range(len(comps))
    ]
    scan = _assemble_scan(
        parts, [ch * cv for (_, ch, cv, _) in comps], mcus_y * mcus_x
    )

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
        + b"\x00\x00"
    )
    zz_l = qlum.ravel()[ZIGZAG].astype(np.uint8).tobytes()
    out += _seg(0xDB, b"\x00" + zz_l)
    if not gray:
        zz_c = qchr.ravel()[ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xDB, b"\x01" + zz_c)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += _seg(0xC0, bytes(sof))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += dht(0, 1, DC_CHR_BITS, DC_CHR_VALS)
        out += dht(1, 1, AC_CHR_BITS, AC_CHR_VALS)
    sos = bytearray([len(comps)])
    for i, (cid, _, _, _) in enumerate(comps):
        td_ta = 0 if i == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder


def _decode_block(
    br: _BitReader,
    pred: int,
    dc_lut: np.ndarray,
    ac_lut: np.ndarray,
) -> tuple[np.ndarray, int]:
    """One block's quantized zigzag coefficients (no IDCT here — the
    caller batches the IDCT over the whole scan).  Each Huffman symbol
    is ONE 16-bit-window LUT probe instead of a bit-by-bit tree walk."""
    def huff(lut: np.ndarray) -> int:
        e = int(lut[br.peek16()])
        ln = e & 0xFF
        if ln == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        br.consume(ln)
        return e >> 8

    zz = np.zeros(64, dtype=np.int64)
    t = huff(dc_lut)
    diff = _extend(br.bits(t), t) if t else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = huff(ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz, dc


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF/EXIF bytes -> uint8 (h, w) gray or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple] = []  # (id, H, V, tq)
    h = w = 0
    restart = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    vals = np.frombuffer(
                        body[i:i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(
                        body[i:i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = vals
                qtabs[tq] = t.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG coding (progressive/arithmetic) — "
                "use decode_backend='pillow'"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17:i + 17 + cnt])
                if len(bits) < 16 or len(vals) < cnt:
                    raise ValueError("truncated JPEG DHT segment")
                tab = _build_decode(bits, vals)
                (dc_tabs if cls == 0 else ac_tabs)[tid] = tab
                i += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            nc = body[0]
            scomp = []
            for c in range(nc):
                cid, tdta = body[1 + 2 * c:3 + 2 * c]
                meta = next(x for x in comps if x[0] == cid)
                scomp.append((meta, tdta >> 4, tdta & 0x0F))
            pos += ln
            return _decode_scan(
                data, pos, h, w, scomp, qtabs, dc_tabs, ac_tabs, restart
            )
        pos += ln
    raise ValueError("no SOS marker — truncated or unsupported JPEG")


def _decode_scan(
    data: bytes,
    pos: int,
    h: int,
    w: int,
    scomp: list,
    qtabs: dict,
    dc_tabs: dict,
    ac_tabs: dict,
    restart: int,
) -> np.ndarray:
    hmax = max(m[1] for m, _, _ in scomp)
    vmax = max(m[2] for m, _, _ in scomp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(data, pos)
    dc_luts = {td: _build_lut(dc_tabs[td]) for _, td, _ in scomp}
    ac_luts = {ta: _build_lut(ac_tabs[ta]) for _, _, ta in scomp}
    preds = [0] * len(scomp)
    # entropy phase collects quantized zigzag coefficients per
    # component in scan order; dequantize + IDCT run batched below
    zz_lists: list[list[np.ndarray]] = [[] for _ in scomp]
    mcu_i = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart and mcu_i and mcu_i % restart == 0:
                # byte-align and consume the RSTn marker
                try:
                    while True:
                        br.bit()
                except _MarkerHit:
                    m = br.align_after_marker()
                    if not (0xD0 <= m <= 0xD7):
                        raise ValueError("expected RSTn marker")
                preds = [0] * len(scomp)
            for ci, ((_, ch, cv, _tq), td, ta) in enumerate(scomp):
                for _b in range(cv * ch):
                    try:
                        zz, preds[ci] = _decode_block(
                            br, preds[ci], dc_luts[td], ac_luts[ta]
                        )
                    except _MarkerHit:
                        m = br.align_after_marker()
                        if 0xD0 <= m <= 0xD7:
                            preds = [0] * len(scomp)
                            zz, preds[ci] = _decode_block(
                                br, 0, dc_luts[td], ac_luts[ta]
                            )
                        else:
                            raise ValueError(
                                f"unexpected marker 0xFF{m:02X} "
                                "inside scan"
                            )
                    zz_lists[ci].append(zz)
            mcu_i += 1
    planes = []
    for ci, ((_, ch, cv, tq), _, _) in enumerate(scomp):
        grid_r, grid_c = mcus_y * cv, mcus_x * ch
        Z = np.stack(zz_lists[ci])
        C = np.zeros((len(Z), 64), dtype=np.float64)
        C[:, ZIGZAG] = Z * qtabs[tq].ravel()[ZIGZAG]
        blocks = np.einsum(
            "ji,njk,kl->nil", _A, C.reshape(-1, 8, 8), _A, optimize=True
        )
        grid = np.empty((grid_r * grid_c, 8, 8), dtype=np.float64)
        grid[_scan_order(grid_c, mcus_y, mcus_x, cv, ch)] = blocks
        planes.append(
            grid.reshape(grid_r, grid_c, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(grid_r * 8, grid_c * 8)
        )
    out_planes = []
    for ((_, ch, cv, _), _, _), p in zip(scomp, planes):
        p = np.clip(np.round(p + 128.0), 0, 255)
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch,
                          axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(c), 0, 255) for c in (r, g, b)], axis=-1
    )
    return rgb.astype(np.uint8)

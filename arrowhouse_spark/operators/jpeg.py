"""Minimal baseline JPEG codec — pure stdlib + numpy, no external
image library.

Why this exists: the reference treats media payloads as opaque blobs
(`ArrowHouse` has no codecs at all); this engine's multimodal seam
decodes them map-side. MJPEG is the most common surviving AVI payload
in real lakes (round-12 verdict #2), and its frames are standalone
baseline JPEGs — so a small spec-faithful decoder makes the video
modality usable on found data without pillow/ffmpeg, exactly like the
pure-stdlib PNG decoder in ``operators/multimodal.py`` did for images.

Scope (documented, test-pinned):

* **decode** (:func:`decode_jpeg_gray`): baseline / extended-sequential
  Huffman DCT (SOF0/SOF1), GRAYSCALE and 3-component YCbCr COLOR in one
  interleaved scan (any chroma subsampling — the gray output is the Y
  plane, which IS the ITU-R 601 luma the engine's image seam uses, so
  chroma blocks are entropy-decoded and discarded), 8-bit precision,
  restart intervals honored, missing-DHT files fall back to the T.81
  Annex K tables by table id (the classic MJPEG quirk of omitting DHT).
  Progressive (SOF2), arithmetic-coded, CMYK and non-interleaved
  multi-scan files raise :class:`JPEGUnsupportedError` so callers can
  route to the optional-pillow seam; corrupt streams raise
  ``ValueError`` loudly.
* **encode** (:func:`encode_jpeg_gray`, :func:`encode_jpeg_color`): the
  fixture/test builders — baseline grayscale / YCbCr (4:4:4, 4:2:2,
  4:2:0), Annex K Huffman tables, caller-supplied quant tables (default
  all-ones, i.e. near-lossless). With the all-ones table an image whose
  8x8 blocks are each CONSTANT round-trips **bit-exactly** (a flat
  block quantizes to a lone DC coefficient that the IDCT reproduces
  without rounding error) — and gray-content COLOR images (R == G == B)
  keep that exactness at any subsampling (Y equals the channel value,
  chroma is constant 128) — which is what lets SQL oracles replay MJPEG
  frame features closed-form through a lossy codec.

Everything follows the public ITU-T T.81 spec (zigzag Figure 5, Annex F
entropy coding, Annex K tables). The per-symbol Huffman loop is plain
Python — fine for the fixture-scale frames the built-in path targets;
pillow/ffmpeg swap in through the codec seam for production decode of
arbitrary lake media.
"""

from __future__ import annotations

import struct


class JPEGUnsupportedError(NotImplementedError):
    """Payload is a valid JPEG but outside the built-in baseline scope
    (progressive, arithmetic, >8-bit, CMYK, non-interleaved multi-scan);
    callers route these to the optional external-codec seam."""


# T.81 Figure 5 zigzag: zigzag index -> natural (row-major) index.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3.3.1 / K.3.3.2 luminance Huffman specs: (BITS[1..16], HUFFVAL).
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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


# Annex K.3.3.1 / K.3.3.2 chrominance Huffman specs — the decoder's
# missing-DHT defaults for table id 1 (the Annex K pairing: table 0 =
# luminance, table 1 = chrominance) and the encoder's chroma tables.
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
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


def _canonical_codes(bits: list[int], vals: list[int]):
    """T.81 Annex C canonical code assignment. Returns
    (encode: {symbol: (code, length)}, decode: {(length, code): symbol})."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


_DC_ENC, _DC_DEC = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
_AC_ENC, _AC_DEC = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
_DC_CHR_ENC, _DC_CHR_DEC = _canonical_codes(_DC_CHR_BITS, _DC_CHR_VALS)
_AC_CHR_ENC, _AC_CHR_DEC = _canonical_codes(_AC_CHR_BITS, _AC_CHR_VALS)


def _dct_matrix():
    """Orthonormal 8-point DCT-II matrix M (M @ M.T == I): forward 2-D
    DCT is M @ b @ M.T, inverse is M.T @ F @ M — the exact T.81 A.3.3
    normalization."""
    import numpy as np

    x = np.arange(8, dtype=np.float64)
    m = np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / 16.0) / 2.0
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


def _category(v: int) -> int:
    """Magnitude category (T.81 F.1.2.1.1): number of bits after the
    Huffman size symbol."""
    return int(abs(v)).bit_length()


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _emit_block(bw: _BitWriter, zrow, pred: int, dc_enc, ac_enc) -> int:
    """Huffman-encode one ZIGZAGGED quantized block against ``pred``
    (the component's DC predictor); returns the block's DC as the new
    predictor. Shared by the gray and color encoders."""
    dc = int(zrow[0])
    diff = dc - pred
    s = _category(diff)
    if s > 11:
        raise ValueError("DC difference out of 8-bit baseline range")
    code, ln = dc_enc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zrow[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        if s > 10:
            raise ValueError("AC coefficient out of 8-bit baseline range")
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg_gray(gray, quant=None) -> bytes:
    """Encode an h x w uint8 grid as a baseline grayscale JFIF/JPEG.

    ``quant`` is the 8x8 quantization table (integers 1..255); the
    default all-ones table is near-lossless and EXACT on images whose
    8x8 blocks are constant (the oracle-fixture contract — see module
    docstring). Dimensions need not be multiples of 8 (edge-replicated
    padding, cropped on decode per the spec)."""
    import numpy as np

    g = np.asarray(gray, dtype=np.uint8)
    if g.ndim != 2 or g.size == 0:
        raise ValueError("encode_jpeg_gray needs a non-empty 2-D uint8 grid")
    h, w = g.shape
    if h > 65535 or w > 65535:
        raise ValueError("image dimension exceeds the JPEG 16-bit limit")
    q = (
        np.ones((8, 8), dtype=np.int64)
        if quant is None
        else np.asarray(quant, dtype=np.int64).reshape(8, 8)
    )
    if (q < 1).any() or (q > 255).any():
        raise ValueError("quant table entries must be in 1..255")

    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    g = np.pad(g, ((0, ph - h), (0, pw - w)), mode="edge")
    m = _dct_matrix()
    blocks = (
        g.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coefs = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
    qc = np.rint(coefs / q.astype(np.float64)).astype(np.int64)

    bw = _BitWriter()
    pred = 0
    flat = qc.reshape(-1, 64)
    zz = np.array(ZIGZAG, dtype=np.int64)
    for row in flat:
        pred = _emit_block(bw, row[zz], pred, _DC_ENC, _AC_ENC)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"  # density 1x1, no thumb
    zzq = bytes(int(q.reshape(-1)[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq  # DQT pq=0 tq=0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)  # SOF0
    out += bytes((1, 0x11, 0))  # comp 1, 1x1 sampling, quant table 0
    for tc, bits, vals in (
        (0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, _AC_LUM_BITS, _AC_LUM_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00, 0, 63, 0))
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_color(rgb, sampling=(2, 2), quant=None, quant_chroma=None) -> bytes:
    """Encode an h x w x 3 uint8 RGB grid as a baseline COLOR
    JFIF/JPEG: YCbCr (the JFIF full-range transform), chroma
    box-averaged down by ``sampling`` = (hf, vf) — (1, 1) is 4:4:4,
    (2, 1) is 4:2:2, (2, 2) is 4:2:0 — one interleaved scan, Annex K
    luminance tables for Y and chrominance tables for Cb/Cr (so a
    stripped-DHT file decodes identically under the decoder's Annex K
    defaults, the MJPEG quirk). ``quant``/``quant_chroma`` default to
    the all-ones near-lossless table.

    Exactness contract for oracle fixtures: GRAY-CONTENT color images
    (R == G == B, constant per 8x8 luma block) round-trip the Y plane
    BIT-EXACTLY at any sampling — Y equals the common channel value
    (the JFIF luma weights sum to 1) and Cb/Cr are constant 128 (weights
    sum to 0), so every coefficient quantizes without error."""
    import numpy as np

    a = np.asarray(rgb, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3 or a.size == 0:
        raise ValueError("encode_jpeg_color needs a non-empty h x w x 3 grid")
    hf, vf = sampling
    if hf not in (1, 2, 4) or vf not in (1, 2, 4):
        raise ValueError("sampling factors must be 1, 2 or 4")
    h, w = a.shape[:2]
    if h > 65535 or w > 65535:
        raise ValueError("image dimension exceeds the JPEG 16-bit limit")

    def _qt(q):
        t = (
            np.ones((8, 8), dtype=np.int64)
            if q is None
            else np.asarray(q, dtype=np.int64).reshape(8, 8)
        )
        if (t < 1).any() or (t > 255).any():
            raise ValueError("quant table entries must be in 1..255")
        return t

    qy, qc = _qt(quant), _qt(quant_chroma if quant_chroma is not None else quant)
    mw, mh = 8 * hf, 8 * vf
    pw, ph = -(-w // mw) * mw, -(-h // mh) * mh
    a = np.pad(a, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge").astype(
        np.float64
    )
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    planes = [
        np.rint(0.299 * r + 0.587 * g + 0.114 * b),
        np.rint(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b),
        np.rint(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b),
    ]
    for i in (1, 2):  # chroma: box-average down to the sampled grid
        planes[i] = np.rint(
            planes[i].reshape(ph // vf, vf, pw // hf, hf).mean(axis=(1, 3))
        )
    planes = [np.clip(p, 0, 255) for p in planes]

    m = _dct_matrix()
    zz = np.array(ZIGZAG, dtype=np.int64)

    def _qcoefs(plane, q):
        bh_, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh_, 8, bw_, 8).transpose(0, 2, 1, 3) - 128.0
        )
        f = np.einsum("ux,rcxy,vy->rcuv", m, blocks, m)
        return np.rint(f / q).astype(np.int64).reshape(bh_, bw_, 64)

    qcs = [_qcoefs(planes[0], qy), _qcoefs(planes[1], qc), _qcoefs(planes[2], qc)]
    tabs = [(_DC_ENC, _AC_ENC), (_DC_CHR_ENC, _AC_CHR_ENC), (_DC_CHR_ENC, _AC_CHR_ENC)]
    factors = [(hf, vf), (1, 1), (1, 1)]
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcux, mcuy = pw // mw, ph // mh
    for mi in range(mcux * mcuy):
        my, mx = divmod(mi, mcux)
        for ci in range(3):
            chf, cvf = factors[ci]
            dc_enc, ac_enc = tabs[ci]
            for j in range(cvf):
                for i in range(chf):
                    row = qcs[ci][my * cvf + j, mx * chf + i]
                    preds[ci] = _emit_block(
                        bw, row[zz], preds[ci], dc_enc, ac_enc
                    )
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in ((0, qy), (1, qc)):
        zzq = bytes(int(q.reshape(-1)[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zzq
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF0
    out += bytes((1, (hf << 4) | vf, 0))  # Y
    out += bytes((2, 0x11, 1))  # Cb
    out += bytes((3, 0x11, 1))  # Cr
    for tc_th, bits, vals in (
        (0x00, _DC_LUM_BITS, _DC_LUM_VALS),
        (0x10, _AC_LUM_BITS, _AC_LUM_VALS),
        (0x01, _DC_CHR_BITS, _DC_CHR_VALS),
        (0x11, _AC_CHR_BITS, _AC_CHR_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes((1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment: un-stuffs
    0xFF00, stops at any real marker, byte-aligns across restarts."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self.cur = 0
        self.n = 0

    def _next_byte(self) -> int:
        d = self.d
        if self.pos >= len(d):
            raise ValueError("truncated JPEG scan")
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        if self.pos + 1 >= len(d):
            raise ValueError("truncated JPEG scan")
        if d[self.pos + 1] == 0x00:
            self.pos += 2
            return 0xFF
        raise ValueError("JPEG scan data ended at an unexpected marker")

    def read_bit(self) -> int:
        if self.n == 0:
            self.cur = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.cur >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v

    def expect_restart(self, idx: int) -> None:
        """Byte-align and consume the RSTn marker (n = idx mod 8)."""
        self.n = 0  # discard pad bits
        d = self.d
        if self.pos + 2 > len(d) or d[self.pos] != 0xFF:
            raise ValueError("missing JPEG restart marker")
        m = d[self.pos + 1]
        if m != 0xD0 + (idx & 7):
            raise ValueError(
                f"JPEG restart marker out of sequence: got {m:#x}, "
                f"expected {0xD0 + (idx & 7):#x}"
            )
        self.pos += 2


def _extend(r: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits back to a signed value."""
    if s == 0:
        return 0
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg_gray(payload: bytes):
    """Decode a baseline JPEG to an h x w uint8 GRAY grid.

    Grayscale files return the lone component; COLOR (3-component
    YCbCr/JFIF) files return the Y plane — which IS the integer
    ITU-R 601 luma of the encoded RGB (Y = 0.299R + 0.587G + 0.114B by
    the JFIF definition), i.e. exactly the gray contract the PNG and
    AVI seams use. Chroma subsampling (4:4:4 / 4:2:2 / 4:2:0, any
    factors up to 4x4) is handled by entropy-decoding the interleaved
    Cb/Cr blocks to keep the bitstream position and DISCARDING them —
    Y is always stored full-resolution, so no chroma upsampling enters
    the gray path at all.

    Supported: SOF0/SOF1, 1 or 3 components in one interleaved scan,
    8-bit precision, restart intervals, 8- or 16-bit DQT, missing DHT
    (the MJPEG quirk — Annex K defaults by TABLE ID: id 0 luminance,
    id 1 chrominance, the Annex K pairing). Progressive (SOF2),
    arithmetic coding, >8-bit, CMYK and multi-scan (non-interleaved)
    files raise :class:`JPEGUnsupportedError`; malformed streams raise
    ``ValueError`` with a stable message."""
    import numpy as np

    d = payload
    if len(d) < 4 or d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[dict] = []  # SOF order: {id, hf, vf, tq}
    ri = 0
    scan: list[dict] = []  # SOS order with td/ta attached
    scan_start = None

    while scan_start is None:
        if pos + 2 > len(d):
            raise ValueError("truncated JPEG headers")
        if d[pos] != 0xFF:
            raise ValueError("malformed JPEG marker stream")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:
            raise ValueError("JPEG ended before any scan")
        if pos + 2 > len(d):
            raise ValueError("truncated JPEG headers")
        (seglen,) = struct.unpack(">H", d[pos : pos + 2])
        body = d[pos + 2 : pos + seglen]
        if seglen < 2 or pos + seglen > len(d):
            raise ValueError("truncated JPEG segment")
        if marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JPEGUnsupportedError(
                    "only 8-bit JPEG precision decodes built-in"
                )
            if ncomp not in (1, 3):
                raise JPEGUnsupportedError(
                    f"{ncomp}-component JPEG (CMYK?) needs an external "
                    "codec; grayscale and YCbCr decode built-in"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF segment")
            h, w = fh, fw
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hf, vf = hv >> 4, hv & 15
                if not (1 <= hf <= 4 and 1 <= vf <= 4):
                    raise ValueError("JPEG sampling factors out of range")
                comps.append({"id": cid, "hf": hf, "vf": vf, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JPEGUnsupportedError(
                "progressive/arithmetic JPEG needs an external codec"
            )
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            bp = 0
            while bp < len(body):
                tcth = body[bp]
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("truncated JPEG DHT segment")
                _, dec = _canonical_codes(bits, vals)
                htables[(tcth >> 4, tcth & 15)] = dec
                bp += 17 + nv
        elif marker == 0xDB:  # DQT — possibly several tables per segment
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 15
                n = 128 if pq else 64
                raw = body[bp + 1 : bp + 1 + n]
                if len(raw) < n:
                    raise ValueError("truncated JPEG DQT segment")
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = vals
                qtables[tq] = nat.reshape(8, 8)
                bp += 1 + n
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG scan before SOF header")
            ns = body[0]
            if ns != len(comps):
                raise JPEGUnsupportedError(
                    "non-interleaved multi-scan JPEG needs an external "
                    "codec"
                )
            by_id = {c["id"]: c for c in comps}
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in by_id:
                    raise ValueError("JPEG scan names an unknown component")
                entry = dict(by_id[cs])
                entry["td"], entry["ta"] = tdta >> 4, tdta & 15
                scan.append(entry)
            scan_start = pos + seglen
        # APPn / COM / anything else: skipped by length
        pos += seglen

    if h is None or w is None:
        raise ValueError("JPEG scan before SOF header")
    if len(comps) == 1:
        # T.81 A.2.3: a single-component scan is NON-interleaved — the MCU
        # is one data unit and sampling factors (meaningful only relative
        # to other components) play no role. Normalize them so grayscale
        # JPEGs that keep luma factors > 1 (e.g. jpegtran -grayscale
        # output preserving the 2x2 color factors) decode like any gray
        # JPEG instead of misparsing the scan as 4-blocks-per-MCU.
        comps[0]["hf"] = comps[0]["vf"] = 1
        for c in scan:
            c["hf"] = c["vf"] = 1
    hmax = max(c["hf"] for c in comps)
    vmax = max(c["vf"] for c in comps)
    for i, c in enumerate(scan):
        if c["tq"] not in qtables:
            raise ValueError("JPEG references a missing quantization table")
        # missing DHT -> Annex K defaults BY TABLE ID (0 luma, 1 chroma)
        c["dc"] = htables.get((0, c["td"])) or (
            _DC_DEC if c["td"] == 0 else _DC_CHR_DEC
        )
        c["ac"] = htables.get((1, c["ta"])) or (
            _AC_DEC if c["ta"] == 0 else _AC_CHR_DEC
        )
        c["__i"] = i

    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    y_comp = scan[0]  # gray = the first (luma / only) component
    ybw, ybh = mcux * y_comp["hf"], mcuy * y_comp["vf"]
    ycoefs = np.zeros((ybh * ybw, 64), dtype=np.int64)
    br = _BitReader(d, scan_start)
    preds = [0] * len(scan)
    restarts = 0
    scratch = np.zeros(64, dtype=np.int64)  # chroma coefs land here

    def _block(comp, out) -> None:
        s = _decode_huff(br, comp["dc"])
        preds[comp["__i"]] += _extend(br.receive(s), s)
        out[0] = preds[comp["__i"]]
        k = 1
        while k < 64:
            rs = _decode_huff(br, comp["ac"])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                return  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC run past end of block")
            out[ZIGZAG[k]] = _extend(br.receive(s), s)
            k += 1

    for mi in range(mcux * mcuy):
        if ri and mi and mi % ri == 0:
            br.expect_restart(restarts)
            restarts += 1
            for i in range(len(preds)):
                preds[i] = 0
        my, mx = divmod(mi, mcux)
        for c in scan:
            for j in range(c["vf"]):
                for i in range(c["hf"]):
                    if c["__i"] == 0:
                        row = my * c["vf"] + j
                        col = mx * c["hf"] + i
                        _block(c, ycoefs[row * ybw + col])
                    else:
                        scratch[:] = 0
                        _block(c, scratch)  # advance bitstream, discard

    m = _dct_matrix()
    q = qtables[y_comp["tq"]].astype(np.float64)
    fq = ycoefs.reshape(-1, 8, 8).astype(np.float64) * q
    pix = np.einsum("ux,nuv,vy->nxy", m, fq, m) + 128.0
    pix = np.clip(np.rint(pix), 0, 255).astype(np.uint8)
    grid = (
        pix.reshape(ybh, ybw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(ybh * 8, ybw * 8)
    )
    return grid[:h, :w]

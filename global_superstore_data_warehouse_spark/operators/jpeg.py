"""Vendored pure-python/numpy JPEG codec (round 10) — the last
image-format gap the verdict tracked, closed without codec
libraries.

Decoder: Huffman JPEG at 8-bit precision, sequential (SOF0/SOF1)
AND progressive (SOF2, late round 10) — marker walk, DQT/DHT
canonical-Huffman table builds, entropy decode with byte-stuffing
and DRI/RSTn restart handling. Every scan accumulates into
per-component zigzag coefficient arrays; progressive scans follow
T.81 annex G (DC successive approximation with arithmetic-shift
point transform, single-component spectral-band AC-first scans
with EOB runs, and the G.1.2.3 AC-refinement correction-bit
algorithm); a final vectorized dequantize + matrix IDCT +
nearest-neighbor chroma upsample (+ JFIF YCbCr->RGB) produces
pixels. Grayscale (1 component) and YCbCr (3 components) frames,
sampling factors in {1, 2}. Arithmetic coding (SOF9+),
hierarchical, and 12-bit precision raise NotImplementedError — the
honest refusal line.

Encoders (test support, like encode_png/encode_bmp):
``encode_jpeg_baseline`` — RGB->YCbCr, optional 2x2 box chroma
downsample (4:2:0), level shift, FDCT via the same orthonormal
DCT-II matrix, uniform or caller-provided quantization tables,
fixed-length canonical Huffman tables (legal DHT: every DC symbol
gets a 4-bit code, every AC symbol an 8-bit code — poor
compression, zero transcription risk vs Annex K), byte stuffing,
optional restart intervals — and ``encode_jpeg_progressive``, which
emits a five-stage annex-G scan script transmitting EXACTLY the
same quantized coefficients, so tests can assert
decode(progressive) == decode(baseline) bit-for-bit on pixels.
Encode->decode round-trips are LOSSY by nature; tests assert
exactness on constant images with unit quant tables (DC-only blocks
reconstruct exactly) and bounded error on smooth gradients.
Hand-laid golden byte tests (one sequential with a VARIABLE-length
Huffman table the encoder can't emit, one progressive assembled
bit-by-bit from the annex-G text) break encoder/decoder
circularity.

Spec: ITU-T T.81 / ISO 10918-1 (public). PNG/BMP/PPM live in
operators/multimodal.py; ``decode_image`` dispatches FFD8 here.
"""

from __future__ import annotations

import struct

import functools as _functools
import numpy as np

# zigzag scan order as (row, col) pairs: anti-diagonals, even sums
# walked bottom-up (T.81 figure 5)
_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _rs = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (reversed(_rs) if _s % 2 == 0 else _rs):
        _ZIGZAG.append((_r, _s - _r))
_ZZ_ROWS = np.array([rc[0] for rc in _ZIGZAG])
_ZZ_COLS = np.array([rc[1] for rc in _ZIGZAG])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: FDCT is C @ B @ C.T, IDCT is
    C.T @ F @ C (T.81 annex A.3.3 up to the orthonormal scaling)."""
    n = np.arange(8)
    k = n.reshape(8, 1)
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(1.0 / 8.0)
    c[1:] *= np.sqrt(2.0 / 8.0)
    return c


_DCT = _dct_matrix()


# ----------------------------------------------------------------------
# Huffman plumbing
# ----------------------------------------------------------------------


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict:
    """(length, code) -> symbol map from a DHT's BITS/HUFFVAL lists —
    the canonical generation of T.81 annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], huffval: list[int]) -> dict:
    """symbol -> (code, length) — the encoder-side view. Cached: the
    canonical generation runs once per distinct DHT (in practice the
    fixed annex-K-style tables), not once per encoded image — table
    setup dominated tiny-image encodes (round-11 profiling)."""
    return _encode_codes_cached(tuple(bits), tuple(huffval))


@_functools.lru_cache(maxsize=64)
def _encode_codes_cached(bits: tuple, huffval: tuple) -> dict:
    return {
        sym: (code, length)
        for (length, code), sym in _canonical_codes(
            list(bits), list(huffval)
        ).items()
    }


@_functools.lru_cache(maxsize=64)
def _decode_table_cached(bits: tuple, huffval: tuple) -> "_HuffTable":
    """One _HuffTable (codes dict + 256-entry LUT) per distinct DHT
    payload — decoders re-parse the same table bytes per image, and
    the LUT build was the dominant per-decode cost for small images."""
    return _HuffTable(_canonical_codes(list(bits), list(huffval)))


# Fixed-length canonical tables (see module doc): 12 DC categories at
# 4 bits each; all 162 AC symbols (EOB, ZRL, run 0-15 x size 1-10) at
# 8 bits each. Neither exhausts its length's code space, so the
# all-ones code stays unused as T.81 requires.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = sorted([0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
])
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        # bulk append: accumulate the whole code, emit completed
        # bytes MSB-first (round-11 rewrite of the per-bit loop —
        # identical output incl. 0xFF stuffing, ~3x fewer pyops)
        acc = (self.acc << length) | (code & ((1 << length) - 1))
        n = self.n + length
        buf = self.buf
        while n >= 8:
            n -= 8
            byte = (acc >> n) & 0xFF
            buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                buf.append(0x00)
        self.acc = acc & ((1 << n) - 1)
        self.n = n

    def pad_to_byte(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


class _HuffTable:
    """Decoder view of one DHT: the canonical (length, code) -> sym
    dict plus an 8-bit prefix LUT — ``lut[b]`` is (sym, length) when
    the 8-bit window ``b`` starts with a complete code of length
    <= 8 (the overwhelmingly common case in real streams), else None
    and the decoder falls back to the bit-serial canonical walk.
    Round-11 profiling: the bit-serial walk plus its per-bit reader
    was ~75% of decode time; the LUT + buffered reader below cut the
    pure-python decode ~3x with identical semantics."""

    __slots__ = ("codes", "lut")

    def __init__(self, codes: dict) -> None:
        self.codes = codes
        lut: list = [None] * 256
        for (length, code), sym in codes.items():
            if length <= 8:
                lo = code << (8 - length)
                hit = (sym, length)
                for i in range(lo, lo + (1 << (8 - length))):
                    lut[i] = hit
        self.lut = lut


class _BitReader:
    """MSB-first entropy-coded-segment reader. ``_fill`` buffers a
    run of PLAIN bytes (never 0xFF) into a multi-bit accumulator so
    the hot paths (LUT symbol decode, magnitude-bit reads) are one
    shift+mask; stuffed 0xFF00 pairs, marker detection, truncation
    errors, and RST alignment keep the original byte-at-a-time
    semantics in the slow path. Because only plain single bytes are
    ever buffered, byte-alignment can rewind whole unconsumed bytes
    by position arithmetic."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.b = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self, want: int) -> None:
        n = self.n
        if n >= want:
            return
        b, pos = self.b, self.pos
        acc = self.acc & ((1 << n) - 1)  # keep the bigint bounded
        end = len(b)
        while n < want and pos < end:
            byte = b[pos]
            if byte == 0xFF:  # stuffed pair or marker: slow path only
                break
            acc = (acc << 8) | byte
            n += 8
            pos += 1
        self.acc, self.n, self.pos = acc, n, pos

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.b):
                raise ValueError("JPEG entropy data truncated")
            byte = self.b[self.pos]
            if byte == 0xFF:
                nxt = self.b[self.pos + 1] if self.pos + 1 < len(self.b) else None
                if nxt == 0x00:
                    self.pos += 2  # stuffed data byte 0xFF
                else:
                    raise ValueError("hit a marker inside entropy data")
            else:
                self.pos += 1
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, count: int) -> int:
        if count == 0:
            return 0
        if self.n < count:
            self._fill(24)  # deeper than needed: amortize the call
        n = self.n
        if n >= count:
            n -= count
            self.n = n
            return (self.acc >> n) & ((1 << count) - 1)
        v = 0  # stream tail / stuffed byte / marker: bit-serial
        for _ in range(count):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: "_HuffTable") -> int:
        if self.n < 8:
            self._fill(24)  # deeper than needed: amortize the call
        n = self.n
        if n >= 8:
            hit = table.lut[(self.acc >> (n - 8)) & 0xFF]
            if hit is not None:
                self.n = n - hit[1]
                return hit[0]
        # codes longer than 8 bits, or within 8 bits of a stuffed
        # byte / marker / stream end: canonical bit-serial walk
        codes = table.codes
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = codes.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def align_and_consume_rst(self, expected: int) -> None:
        """Byte-align and consume the next RSTn marker (T.81 E.2.4);
        ``expected`` is the 0-7 modulus the stream must carry.
        Alignment discards the partially-consumed byte's remaining
        bits (n % 8) and REWINDS any whole buffered bytes — legal
        precisely because ``_fill`` never buffers 0xFF bytes, so
        every buffered byte occupied exactly one stream byte."""
        self.pos -= self.n // 8
        self.n = 0
        if (
            self.pos + 1 >= len(self.b)
            or self.b[self.pos] != 0xFF
            or not (0xD0 <= self.b[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected RST marker at restart interval")
        if self.b[self.pos + 1] - 0xD0 != expected:
            raise ValueError("RST marker out of sequence")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t magnitude bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ----------------------------------------------------------------------
# Encoder
# ----------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB -> YCbCr, float64 (h, w, 3)."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=2)


def _pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _quant_table(quant) -> np.ndarray:
    """Uniform scalar or explicit 64-entry table -> (8, 8) int array."""
    q = np.asarray(quant)
    if q.ndim == 0:
        t = np.full((8, 8), int(q), dtype=np.int64)
    else:
        t = q.reshape(8, 8).astype(np.int64)
    if (t < 1).any() or (t > 255).any():
        raise ValueError("quant entries must be in 1..255 for 8-bit DQT")
    return t


def _encode_block(
    writer: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """FDCT + quantize + entropy-code one 8x8 spatial block; returns
    the new DC predictor."""
    coeffs = _DCT @ (block - 128.0) @ _DCT.T
    q = np.round(coeffs / qt).astype(np.int64)
    zz = q[_ZZ_ROWS, _ZZ_COLS]
    # DC
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        bits = diff if diff > 0 else diff + (1 << t) - 1
        writer.write(bits, t)
    # AC
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if (zz[1:] != 0).any() else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        bits = v if v > 0 else v + (1 << s) - 1
        writer.write(bits, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg_baseline(
    width: int,
    height: int,
    rgb,
    quant=1,
    subsampling: str = "4:4:4",
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JPEG writer (see module doc). ``quant`` is
    a scalar (uniform table — 1 is near-lossless for smooth content)
    or a 64-entry table used for every component. ``subsampling`` is
    "4:4:4" or "4:2:0" (ignored for grayscale). ``restart_interval``
    > 0 emits DRI + RSTn markers every that many MCUs so the decoder
    restart path is exercisable with real bytes."""
    px = np.asarray(rgb, dtype=np.uint8).reshape(height, width, 3)
    qt = _quant_table(quant)
    if grayscale:
        comps = [(1, 1, 1)]  # id, H, V
        planes = [_rgb_to_ycbcr(px)[:, :, 0]]
    elif subsampling == "4:4:4":
        comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
    elif subsampling == "4:2:0":
        comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
        ycc = _rgb_to_ycbcr(px)
        even = _pad_edge(ycc[:, :, 1], (height + 1) // 2 * 2, (width + 1) // 2 * 2)
        cb = (even[0::2, 0::2] + even[0::2, 1::2] + even[1::2, 0::2] + even[1::2, 1::2]) / 4.0
        even = _pad_edge(ycc[:, :, 2], (height + 1) // 2 * 2, (width + 1) // 2 * 2)
        cr = (even[0::2, 0::2] + even[0::2, 1::2] + even[1::2, 0::2] + even[1::2, 1::2]) / 4.0
        planes = [ycc[:, :, 0], cb, cr]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    padded = [
        _pad_edge(plane, mcuy * 8 * v, mcux * 8 * h)
        for plane, (_cid, h, v) in zip(planes, comps)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0, 8-bit precision, zigzag order)
    zzq = qt[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + zzq
    # SOF0
    body = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, h, v in comps:
        body += bytes([cid, (h << 4) | v, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body
    # DHT: DC table 0 + AC table 0 (shared by all components)
    for tc, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        seg = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    body = bytes([len(comps)])
    for cid, _h, _v in comps:
        body += bytes([cid, 0x00])
    body += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    dc_codes = _encode_codes(_DC_BITS, _DC_VALS)
    ac_codes = _encode_codes(_AC_BITS, _AC_VALS)
    writer = _BitWriter()
    preds = [0] * len(comps)
    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.pad_to_byte()
                writer.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (_cid, h, v) in enumerate(comps):
                for by in range(v):
                    for bx in range(h):
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            writer, block, qt, preds[ci], dc_codes, ac_codes
                        )
            mcu_index += 1
    writer.pad_to_byte()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------------
# Progressive encoder (test support)
# ----------------------------------------------------------------------
#
# Emits a fixed five-stage scan script per component family:
# DC-first at Al=1 (interleaved for color), two spectral-band
# AC-first scans (1-5, 6-63) at Al=1, one AC-refinement scan
# (Ah=1 -> Al=0) and one DC-refinement scan — so a decoder must
# exercise DC successive approximation, spectral selection, EOB
# runs, and the G.1.2.3 correction-bit algorithm to reproduce the
# image. The AC table must carry EOB_n symbols (r<<4 for r<15),
# which baseline's table lacks, so the progressive script uses its
# own fixed-length table: all 176 (run, size<=10) symbols at 8 bits.

_AC_VALS_PROG = sorted((r << 4) | s for r in range(16) for s in range(0, 11))
_AC_BITS_PROG = [0] * 7 + [len(_AC_VALS_PROG)] + [0] * 8


def _prepare_planes(width, height, rgb, quant, subsampling, grayscale):
    """Shared front half of both encoders: color transform,
    subsample, MCU-pad; returns (comps, padded planes, qt)."""
    px = np.asarray(rgb, dtype=np.uint8).reshape(height, width, 3)
    qt = _quant_table(quant)
    if grayscale:
        comps = [(1, 1, 1)]
        planes = [_rgb_to_ycbcr(px)[:, :, 0]]
    elif subsampling == "4:4:4":
        comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
    elif subsampling == "4:2:0":
        comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
        ycc = _rgb_to_ycbcr(px)
        even = _pad_edge(ycc[:, :, 1], (height + 1) // 2 * 2, (width + 1) // 2 * 2)
        cb = (even[0::2, 0::2] + even[0::2, 1::2] + even[1::2, 0::2] + even[1::2, 1::2]) / 4.0
        even = _pad_edge(ycc[:, :, 2], (height + 1) // 2 * 2, (width + 1) // 2 * 2)
        cr = (even[0::2, 0::2] + even[0::2, 1::2] + even[1::2, 0::2] + even[1::2, 1::2]) / 4.0
        planes = [ycc[:, :, 0], cb, cr]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    padded = [
        _pad_edge(plane, mcuy * 8 * v, mcux * 8 * h)
        for plane, (_cid, h, v) in zip(planes, comps)
    ]
    return comps, padded, qt, mcux, mcuy


def _quantized_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """FDCT + quantize every 8x8 block of a padded plane into
    zigzag-order coefficients (bh, bw, 64) — per-block arithmetic
    IDENTICAL to the baseline encoder's `_encode_block` so both
    encoders transmit the same integers for the same image."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coeffs = _DCT @ (block - 128.0) @ _DCT.T
            q = np.round(coeffs / qt).astype(np.int64)
            out[by, bx] = q[_ZZ_ROWS, _ZZ_COLS]
    return out


def _emit_eobrun(writer: _BitWriter, ac_codes: dict, st: dict) -> None:
    """Flush a pending EOB run (symbol = nbits<<4 plus nbits low
    bits of the run length, T.81 G.1.2.2) followed by the correction
    bits buffered against it (refinement scans only)."""
    if st["eobrun"] > 0:
        nbits = st["eobrun"].bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        writer.write(code, ln)
        if nbits:
            writer.write(st["eobrun"] - (1 << nbits), nbits)
        st["eobrun"] = 0
    for bit in st["be"]:
        writer.write(bit, 1)
    st["be"] = []


def _emit_dc_first(writer, zz, dc_codes, al: int, pred: int) -> int:
    """DC first pass: category/EXTEND of the point-transformed
    (arithmetic >> Al) difference; returns the new predictor."""
    v = int(zz[0]) >> al
    diff = v - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    return v


def _emit_ac_first(writer, zz, ac_codes, ss, se, al, st) -> None:
    """AC first pass over one block's spectral band, with EOB-run
    accumulation across blocks (point transform on magnitudes)."""
    run = 0
    for k in range(ss, se + 1):
        c = int(zz[k])
        v = (abs(c) >> al) * (1 if c >= 0 else -1)
        if v == 0:
            run += 1
            continue
        _emit_eobrun(writer, ac_codes, st)
        while run > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(writer, ac_codes, st)


def _emit_ac_refine(writer, zz, ac_codes, ss, se, al, st) -> None:
    """AC refinement over one block's spectral band — the encoder
    side of T.81 G.1.2.3 (mirroring libjpeg's jcphuff): newly
    significant coefficients (|c|>>Al == 1) emit (run,1)+sign;
    already-nonzero ones buffer their next magnitude bit, emitted
    after the next symbol; trailing zeros fold into the EOB run."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_idx = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob_idx = i
    r = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob_idx:
            _emit_eobrun(writer, ac_codes, st)
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
            for bit in br:
                writer.write(bit, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _emit_eobrun(writer, ac_codes, st)
        code, ln = ac_codes[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for bit in br:
            writer.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        st["eobrun"] += 1
        st["be"].extend(br)
        if st["eobrun"] == 0x7FFF or len(st["be"]) > 900:
            _emit_eobrun(writer, ac_codes, st)


def encode_jpeg_progressive(
    width: int,
    height: int,
    rgb,
    quant=1,
    subsampling: str = "4:4:4",
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Progressive JPEG writer (SOF2; see the scan script above).
    Transmits EXACTLY the same quantized coefficients as
    ``encode_jpeg_baseline`` for the same inputs, so decoding both
    must give identical pixels — the cross-check the tests pin."""
    comps, padded, qt, mcux, mcuy = _prepare_planes(
        width, height, rgb, quant, subsampling, grayscale
    )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    blocks = [_quantized_blocks(p, qt) for p in padded]

    out = bytearray(b"\xff\xd8")
    zzq = qt[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + zzq
    body = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, h, v in comps:
        body += bytes([cid, (h << 4) | v, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(body)) + body
    for tc, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS_PROG, _AC_VALS_PROG)):
        seg = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_codes = _encode_codes(_DC_BITS, _DC_VALS)
    ac_codes = _encode_codes(_AC_BITS_PROG, _AC_VALS_PROG)

    def sos_header(scan_cis, ss, se, ah, al):
        body = bytes([len(scan_cis)])
        for ci in scan_cis:
            body += bytes([comps[ci][0], 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def run_scan(scan_cis, ss, se, ah, al):
        nonlocal out
        out += sos_header(scan_cis, ss, se, ah, al)
        writer = _BitWriter()
        preds = {ci: 0 for ci in scan_cis}
        st = {"eobrun": 0, "be": []}
        rst = 0
        mcu_index = 0

        def block(ci, zz):
            if ss == 0:
                if ah == 0:
                    preds[ci] = _emit_dc_first(writer, zz, dc_codes, al, preds[ci])
                else:
                    writer.write((int(zz[0]) >> al) & 1, 1)
            else:
                if ah == 0:
                    _emit_ac_first(writer, zz, ac_codes, ss, se, al, st)
                else:
                    _emit_ac_refine(writer, zz, ac_codes, ss, se, al, st)

        def maybe_restart():
            nonlocal rst
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                _emit_eobrun(writer, ac_codes, st)
                writer.pad_to_byte()
                writer.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                for k in preds:
                    preds[k] = 0

        if len(scan_cis) == 1:
            ci = scan_cis[0]
            _cid, hh, v, = comps[ci]
            comp_w = -(-width * hh // hmax)
            comp_h = -(-height * v // vmax)
            bw, bh = -(-comp_w // 8), -(-comp_h // 8)
            for i in range(bh * bw):
                maybe_restart()
                block(ci, blocks[ci][i // bw, i % bw])
                mcu_index += 1
        else:
            for mi in range(mcuy * mcux):
                maybe_restart()
                my, mx = mi // mcux, mi % mcux
                for ci in scan_cis:
                    _cid, hh, v = comps[ci]
                    for by in range(v):
                        for bx in range(hh):
                            block(ci, blocks[ci][my * v + by, mx * hh + bx])
                mcu_index += 1
        _emit_eobrun(writer, ac_codes, st)
        writer.pad_to_byte()
        out += writer.buf

    all_cis = list(range(len(comps)))
    run_scan(all_cis, 0, 0, 0, 1)            # DC first, Al=1
    for ci in all_cis:
        run_scan([ci], 1, 5, 0, 1)            # AC band 1-5 first
        run_scan([ci], 6, 63, 0, 1)           # AC band 6-63 first
    for ci in all_cis:
        run_scan([ci], 1, 63, 1, 0)           # AC refinement -> full precision
    run_scan(all_cis, 0, 0, 1, 0)             # DC refinement -> full precision
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------------
# Decoder
# ----------------------------------------------------------------------
#
# Architecture (T.81 annex F sequential + annex G progressive,
# unified): every scan decodes INTO per-component zigzag coefficient
# arrays (blocks_y, blocks_x, 64); after the last scan, one
# vectorized dequantize + IDCT + upsample pass produces pixels. A
# sequential frame is simply the one-scan special case (Ss=0, Se=63,
# Ah=Al=0, DC and AC in the same block visit). Progressive scans
# arrive as any legal scan script: interleaved or single-component
# DC-first / DC-refinement scans, single-component spectral-band
# AC-first scans with EOB runs, and AC-refinement scans with
# correction bits (the G.1.2.3 algorithm, mirrored from the spec the
# same way libjpeg's jdphuff does).


def _decode_dc_first(reader, zz, dc_tab, al: int, pred: int) -> int:
    """DC coefficient, first pass (Ah=0): category + EXTEND bits,
    predictor in the point-transformed domain, stored shifted."""
    t = reader.decode_symbol(dc_tab)
    pred += _extend(reader.read_bits(t), t)
    zz[0] = pred << al
    return pred


def _decode_dc_refine(reader, zz, al: int) -> None:
    """DC successive-approximation refinement (Ah=Al+1): one bit,
    ORed at position Al (two's complement — the prior passes left
    the low bits zero)."""
    if reader.read_bit():
        zz[0] |= 1 << al


def _decode_ac_first(reader, zz, ac_tab, ss: int, se: int, al: int, eobrun: int) -> int:
    """AC coefficients of a spectral band, first pass (Ah=0).
    (r<<4)|0 symbols with r<15 start an EOB run of 2^r + bits(r)
    blocks (this block included); returns the EOB-run balance for
    the following blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.decode_symbol(ac_tab)
        r, s = sym >> 4, sym & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past spectral band end")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_correction(reader, zz, k: int, se: int, p1: int, m1: int) -> None:
    """Apply correction bits to every already-nonzero coefficient in
    zz[k..se] (the EOB-run tail of G.1.2.3). Zero-history
    coefficients consume no bits here, so iterating only the nonzero
    positions (one vectorized scan instead of per-element numpy
    scalar compares) reads the identical bit sequence — and for the
    common sparse/DC-only blocks it is near-free (round-11: this
    tail loop was the top progressive-decode cost)."""
    for i in np.nonzero(zz[k : se + 1])[0]:
        j = k + int(i)
        if reader.read_bit() and (zz[j] & p1) == 0:
            zz[j] += p1 if zz[j] >= 0 else m1


def _decode_ac_refine(reader, zz, ac_tab, ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement (Ah=Al+1), T.81
    G.1.2.3: newly-significant coefficients arrive as (run, 1)
    symbols plus a sign bit; every already-nonzero coefficient
    passed along the way carries one correction bit; EOB runs cover
    whole blocks of correction-only refinement."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        # Snapshot of the nonzero-HISTORY positions in the band: the
        # walk below only ever looks AHEAD of k, and this-scan
        # placements land behind the advancing k, so the entry
        # snapshot is exact — letting the zero-run advance jump the
        # gaps between nonzeros instead of testing every coefficient
        # (round-11: per-element numpy scalar reads dominated
        # progressive decode).
        nz = [int(i) + ss for i in np.nonzero(zz[ss : se + 1])[0]]
        nnz = len(nz)
        idx = 0
        while k <= se:
            sym = reader.decode_symbol(ac_tab)
            r, s = sym >> 4, sym & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement magnitude size != 1")
                newval = p1 if reader.read_bit() else m1
            # advance past r zero-history coefficients, applying a
            # correction bit at each nonzero-history one passed; the
            # walk stops AT the (r+1)-th zero-history position
            while idx < nnz and nz[idx] < k:
                idx += 1
            while k <= se:
                pnz = nz[idx] if idx < nnz else se + 1
                if r < pnz - k:  # target zero sits before the next nonzero
                    k += r
                    break
                r -= pnz - k
                k = pnz
                if k > se:
                    break
                if reader.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
                idx += 1
            if newval:
                if k > se:
                    raise ValueError("AC refinement ran past band end")
                zz[k] = newval
            k += 1
    if eobrun > 0:
        _ac_refine_correction(reader, zz, k, se, p1, m1)
        eobrun -= 1
    return eobrun


def _jpeg_decode(b: bytes) -> np.ndarray:
    """Decode baseline / extended-sequential / progressive Huffman
    JPEG bytes into a (height, width, 3) uint8 RGB array. See module
    doc for the supported envelope and the honest refusals."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    coefs: list[np.ndarray] | None = None
    restart_interval = 0
    saw_scan = False
    pos = 2
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = b[pos + 1]
        if m == 0xFF:  # fill byte padding before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(b):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        seg = b[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit DQT (12-bit JPEG)")
                zz = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                t = np.zeros((8, 8), dtype=np.int64)
                t[_ZZ_ROWS, _ZZ_COLS] = zz
                qtables[tq] = t
                i += 65
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                htables[(tc, th)] = _decode_table_cached(
                    tuple(bits), tuple(vals)
                )
                i += 17 + nvals
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            precision, h, w, nf = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG precision")
            comps = []
            for ci in range(nf):
                cid, hv, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, hv >> 4, hv & 15, tq))
            if nf not in (1, 3):
                raise NotImplementedError(f"{nf}-component JPEG")
            if any(c[1] not in (1, 2) or c[2] not in (1, 2) for c in comps):
                raise NotImplementedError("sampling factors beyond 2 unsupported")
            frame = (h, w, comps)
            progressive = m == 0xC2
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = [
                np.zeros((mcuy * v, mcux * hh, 64), dtype=np.int32)
                for (_cid, hh, v, _tq) in comps
            ]
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG frame type SOF{m - 0xC0}")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS — entropy data follows the header
            if frame is None or coefs is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tdta = seg[1 + ci * 2 : 3 + ci * 2]
                scan_comps.append((cid, tdta >> 4, tdta & 15))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            pos = _decode_sos(
                b, pos, frame, scan_comps, ss, se, ah, al,
                coefs, htables, restart_interval, progressive,
            )
            saw_scan = True
        # APPn / COM / DNL / others: skipped
    if not saw_scan or frame is None or coefs is None:
        raise ValueError("JPEG has no scan data")
    return _finish_frame(frame, coefs, qtables)


def _decode_sos(
    b, pos, frame, scan_comps, ss, se, ah, al,
    coefs, htables, restart_interval, progressive,
):
    """Decode one scan's entropy data into the coefficient arrays;
    returns the stream position after the scan (byte-aligned, at the
    next marker). Single-component scans are non-interleaved (MCU =
    one block over the component's OWN ceil(x/8) x ceil(y/8) grid,
    T.81 A.2.2); multi-component scans interleave H x V blocks per
    MCU (A.2.3)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if ss > 63 or se > 63 or ss > se:
            raise ValueError("bad spectral selection")
    else:
        ss, se, ah, al = 0, 63, 0, 0  # sequential semantics, always

    # resolve scan components to frame indices
    order = []  # (frame_ci, dc_tab or None, ac_tab or None)
    for cid, td, ta in scan_comps:
        ci = next(
            (i for i, c in enumerate(comps) if c[0] == cid), None
        )
        if ci is None:
            raise ValueError(f"scan references unknown component id {cid}")
        dc_tab = htables.get((0, td)) if ss == 0 else None
        ac_tab = htables.get((1, ta)) if se > 0 else None
        if ss == 0 and ah == 0 and dc_tab is None:
            raise ValueError("missing DC Huffman table")
        if se > 0 and ac_tab is None:
            raise ValueError("missing AC Huffman table")
        order.append((ci, dc_tab, ac_tab))

    reader = _BitReader(b, pos)
    preds = {ci: 0 for ci, _d, _a in order}
    eobrun = 0
    rst = 0

    def decode_block(zz, ci, dc_tab, ac_tab):
        nonlocal eobrun
        if ss == 0:
            if ah == 0:
                preds[ci] = _decode_dc_first(reader, zz, dc_tab, al, preds[ci])
            else:
                _decode_dc_refine(reader, zz, al)
        if se > 0:
            if ah == 0:
                eobrun = _decode_ac_first(
                    reader, zz, ac_tab, max(ss, 1), se, al, eobrun
                )
            else:
                eobrun = _decode_ac_refine(
                    reader, zz, ac_tab, max(ss, 1), se, al, eobrun
                )

    def maybe_restart(mcu_index):
        nonlocal rst, eobrun
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            reader.align_and_consume_rst(rst)
            rst = (rst + 1) % 8
            for k in preds:
                preds[k] = 0
            eobrun = 0

    if len(order) == 1:
        # non-interleaved: the component's own block grid
        ci, dc_tab, ac_tab = order[0]
        _cid, hh, v, _tq = comps[ci]
        comp_w = -(-w * hh // hmax)  # ceil(w * hh / hmax), T.81 A.1.1
        comp_h = -(-h * v // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        arr = coefs[ci]
        for i in range(bh * bw):
            maybe_restart(i)
            decode_block(arr[i // bw, i % bw], ci, dc_tab, ac_tab)
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for mi in range(mcuy * mcux):
            maybe_restart(mi)
            my, mx = mi // mcux, mi % mcux
            for ci, dc_tab, ac_tab in order:
                _cid, hh, v, _tq = comps[ci]
                for by in range(v):
                    for bx in range(hh):
                        decode_block(
                            coefs[ci][my * v + by, mx * hh + bx],
                            ci, dc_tab, ac_tab,
                        )
    # byte-align and report the position of the next marker
    reader.n = 0
    return reader.pos


def _finish_frame(frame, coefs, qtables) -> np.ndarray:
    """Dequantize + IDCT every block (vectorized over the whole
    component), upsample to full resolution, crop, and convert
    JFIF YCbCr -> RGB (or replicate grayscale)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for arr, (_cid, hh, v, tq) in zip(coefs, comps):
        qt = qtables.get(tq)
        if qt is None:
            raise ValueError(f"missing quantization table {tq}")
        deq = arr.astype(np.float64) * qt[_ZZ_ROWS, _ZZ_COLS]
        by, bx = arr.shape[0], arr.shape[1]
        blocks = np.zeros((by, bx, 8, 8), dtype=np.float64)
        blocks[:, :, _ZZ_ROWS, _ZZ_COLS] = deq
        spatial = np.einsum("ij,abjk,kl->abil", _DCT.T, blocks, _DCT) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        up = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // hh, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(gray[:, :, None], 3, axis=2))
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

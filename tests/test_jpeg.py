"""JPEG codec (operators/jpeg.py): golden hand-laid bytes with a
VARIABLE-length Huffman table (the fixed-length encoder can't
produce one — breaks encode/decode circularity), exact constant-image
round-trips at unit quant, bounded-error property round-trips over
gray/4:4:4/4:2:0 with restart intervals, the honest-refusal matrix
(12-bit, arithmetic, >2 sampling, WEBP), and — since progressive
decode landed — decode(progressive) == decode(baseline) equality
sweeps plus a bit-by-bit hand-laid annex-G progressive golden."""

import struct

import numpy as np
import pytest

from global_superstore_data_warehouse_spark.operators.jpeg import (
    _DCT,
    _ZIGZAG,
    _jpeg_decode,
    encode_jpeg_baseline,
)
from global_superstore_data_warehouse_spark.operators.multimodal import decode_image


def test_dct_orthonormal_and_zigzag_permutation():
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)
    assert sorted(_ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]
    # T.81 figure 5 head
    assert _ZIGZAG[:8] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    ]


def test_jpeg_golden_bytes_grayscale():
    """Hand-laid 8x8 grayscale JPEG written bit-by-bit from T.81, NOT
    via encode_jpeg_baseline, with a VARIABLE-length DC Huffman table
    (codes '0' -> category 5, '10' -> category 0) the fixed-length
    encoder never emits. Quant table all 16s; DC = round(8*(168-128)
    / 16) = 20 -> category 5, magnitude bits 10100; AC all zero ->
    EOB. Scan bits 0 10100 0 + 1-pad = 0x51. Every pixel must decode
    to exactly 168."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    dht_dc = (
        b"\xff\xc4"
        + struct.pack(">H", 21)
        + bytes([0x00])
        + bytes([1, 1] + [0] * 14)
        + bytes([5, 0])
    )
    dht_ac = (
        b"\xff\xc4"
        + struct.pack(">H", 20)
        + bytes([0x10])
        + bytes([1] + [0] * 15)
        + bytes([0x00])
    )
    sos = (
        b"\xff\xda"
        + struct.pack(">H", 8)
        + bytes([1, 1, 0x00, 0, 63, 0])
    )
    blob = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + bytes([0x51]) + b"\xff\xd9"
    )
    px = _jpeg_decode(blob)
    assert px.shape == (8, 8, 3)
    assert (px == 168).all()


def test_jpeg_constant_images_roundtrip_exactly():
    """Unit quant + constant block = DC-only spectrum: grayscale
    round-trips EXACTLY for every level tested; 4:4:4 color within
    the +/-1 color-transform rounding."""
    for g in (0, 1, 7, 127, 128, 200, 254, 255):
        px = np.full((11, 5, 3), g, dtype=np.uint8)
        out = _jpeg_decode(encode_jpeg_baseline(5, 11, px, quant=1, grayscale=True))
        assert (out == g).all(), g
    px = np.zeros((6, 10, 3), np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = 200, 30, 90
    for sub in ("4:4:4", "4:2:0"):
        out = _jpeg_decode(encode_jpeg_baseline(10, 6, px, quant=1, subsampling=sub))
        assert (out == out[0, 0]).all()
        assert np.abs(out[0, 0].astype(int) - [200, 30, 90]).max() <= 1, (sub, out[0, 0])


def test_jpeg_roundtrip_property():
    """Random images: gray and 4:4:4 at unit quant stay within the
    coefficient-rounding bound (+/-3) for ARBITRARY noise; 4:2:0 is
    tested on constant tiles (box downsample is exact there)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
        gray=st.booleans(),
        rst=st.sampled_from([0, 1, 3]),
    )
    def prop(w, h, seed, gray, rst):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if gray:
            px[:, :, 1] = px[:, :, 0]
            px[:, :, 2] = px[:, :, 0]
        blob = encode_jpeg_baseline(
            w, h, px, quant=1, grayscale=gray, restart_interval=rst
        )
        out = _jpeg_decode(blob)
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 3

    prop()


def test_jpeg_420_smooth_bounded():
    rng = np.random.default_rng(3)
    for _ in range(5):
        h, w = int(rng.integers(2, 30)), int(rng.integers(2, 30))
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256], axis=2
        ).astype(np.uint8)
        out = _jpeg_decode(encode_jpeg_baseline(w, h, px, quant=1, subsampling="4:2:0"))
        # wrap-around rows of the modular gradient are the worst case
        # for chroma averaging; interior smoothness stays tight
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 16


def test_jpeg_restart_markers_present_and_decoded():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(17, 33, 3), dtype=np.uint8)
    plain = encode_jpeg_baseline(33, 17, px, quant=1)
    with_rst = encode_jpeg_baseline(33, 17, px, quant=1, restart_interval=2)
    assert b"\xff\xdd" in with_rst  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8))
    assert (_jpeg_decode(plain) == _jpeg_decode(with_rst)).all()


def test_jpeg_refusals_stay_honest():
    base = encode_jpeg_baseline(4, 4, np.zeros((4, 4, 3), np.uint8), quant=1)
    # progressive (SOF2) DECODES since late round 10 — but a baseline
    # stream whose SOF marker was flipped to SOF2 carries an illegal
    # progressive scan header (Ss=0, Se=63), which must be a hard
    # ValueError, not a silent mis-decode
    prog = base.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="DC scan must have Se=0"):
        _jpeg_decode(prog)
    # arithmetic-coded sequential: SOF9
    arith = base.replace(b"\xff\xc0", b"\xff\xc9")
    with pytest.raises(NotImplementedError, match="SOF"):
        _jpeg_decode(arith)
    # 12-bit DQT precision (Pq=1)
    i = base.index(b"\xff\xdb")
    twelve = bytearray(base)
    twelve[i + 4] = 0x10
    with pytest.raises(NotImplementedError, match="12-bit"):
        _jpeg_decode(bytes(twelve))
    # sampling factor 3: patch the SOF component HV byte
    j = base.index(b"\xff\xc0")
    wild = bytearray(base)
    wild[j + 11] = 0x31  # H=3, V=1 for component 1
    with pytest.raises(NotImplementedError, match="sampling"):
        _jpeg_decode(bytes(wild))
    # WEBP via the dispatcher stays a refusal
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 16)


def test_decode_image_dispatches_jpeg():
    px = np.full((3, 3, 3), 77, dtype=np.uint8)
    blob = encode_jpeg_baseline(3, 3, px, quant=1, grayscale=True)
    assert (decode_image(blob) == 77).all()


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; the walk must skip them."""
    px = np.full((4, 4, 3), 99, np.uint8)
    b = encode_jpeg_baseline(4, 4, px, quant=1, grayscale=True)
    i = b.index(b"\xff\xc0")
    padded = b[:i] + b"\xff\xff\xff" + b[i:]
    assert (_jpeg_decode(padded) == 99).all()

def test_jpeg_progressive_equals_baseline():
    """The progressive encoder transmits the same quantized
    coefficients as the baseline encoder, so decoding both streams
    must give IDENTICAL pixels — across geometries, grayscale/4:4:4/
    4:2:0, quant levels, and restart intervals. This cross-checks
    the whole annex-G scan machinery (DC successive approximation,
    spectral bands, EOB runs, AC refinement correction bits) against
    the independently golden-pinned sequential path."""
    from global_superstore_data_warehouse_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    for (w, h, sub, gray, rst) in [
        (8, 8, "4:4:4", True, 0),
        (5, 11, "4:4:4", True, 0),
        (16, 16, "4:4:4", False, 0),
        (10, 6, "4:2:0", False, 0),
        (33, 17, "4:4:4", False, 2),
        (9, 9, "4:2:0", False, 3),
        (1, 1, "4:4:4", True, 0),
        (24, 8, "4:2:0", False, 0),
        (7, 13, "4:4:4", False, 1),
    ]:
        for q in (1, 8, 40):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            b = encode_jpeg_baseline(
                w, h, px, quant=q, subsampling=sub, grayscale=gray,
                restart_interval=rst,
            )
            p = encode_jpeg_progressive(
                w, h, px, quant=q, subsampling=sub, grayscale=gray,
                restart_interval=rst,
            )
            assert (_jpeg_decode(b) == _jpeg_decode(p)).all(), (w, h, sub, gray, rst, q)


def test_jpeg_progressive_property():
    """Hypothesis sweep of the same baseline==progressive equality."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from global_superstore_data_warehouse_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 20),
        q=st.integers(1, 60),
        gray=st.booleans(),
        sub=st.sampled_from(["4:4:4", "4:2:0"]),
        rst=st.integers(0, 3),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(w, h, q, gray, sub, rst, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        kw = dict(
            quant=q, subsampling=sub, grayscale=gray, restart_interval=rst
        )
        b = encode_jpeg_baseline(w, h, px, **kw)
        p = encode_jpeg_progressive(w, h, px, **kw)
        assert (_jpeg_decode(b) == _jpeg_decode(p)).all()

    prop()


def test_jpeg_progressive_golden_bytes():
    """HAND-LAID progressive golden, independent of our encoder: an
    8x8 grayscale SOF2 stream with unit quant and the fixed-length
    tables, whose four scans (DC-first Al=1, AC-first band 1-63
    Al=1, AC-refinement Ah=1->Al=0 carried entirely by an EOB run's
    correction bits, DC-refinement) were assembled bit-by-bit from
    T.81 annex G by hand. Coefficients: DC=576, zz1=(0,1)->3,
    zz5=(0,2)->-7. Expected pixels come from a cosine-sum IDCT
    written inline here — not the module's matrix."""
    import zlib  # noqa: F401  (parallel with the PNG goldens' imports)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    def entropy(bitstr):
        # pad with 1-bits to a byte, then byte-stuff 0xFF
        bitstr += "1" * (-len(bitstr) % 8)
        raw = bytes(
            int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8)
        )
        out = bytearray()
        for byte in raw:
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)

    ac_vals = sorted((r << 4) | s for r in range(16) for s in range(0, 11))
    assert ac_vals.index(0x01) == 1 and ac_vals.index(0x32) == 35

    blob = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + b"\x01" * 64)  # unit quant, table 0
        + seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00, 0, 0, 0, 12] + [0] * 12) + bytes(range(12)))
        + seg(0xC4, bytes([0x10] + [0] * 7 + [176] + [0] * 8) + bytes(ac_vals))
        # scan 1: DC first, Al=1 -> diff = 576>>1 = 288, category 9
        # ('1001'), then 9 magnitude bits of +288 ('100100000')
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
        + entropy("1001" + "100100000")
        # scan 2: AC first, band 1-63, Al=1 -> zz1: 3>>1=+1 via
        # symbol 0x01 (code idx 1) + sign-magnitude bit '1'; three
        # zeros; zz5: -(7>>1)=-3 via symbol 0x32 (run 3, size 2, code
        # idx 35) + extend bits '00'; then EOB (symbol 0x00, code 0)
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
        + entropy("00000001" + "1" + "00100011" + "00" + "00000000")
        # scan 3: AC refinement Ah=1 Al=0 -> one EOB run covering the
        # block (symbol 0x00), followed by the two correction bits
        # for the already-nonzero zz1 (3&1=1) and zz5 (7&1=1)
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
        + entropy("00000000" + "1" + "1")
        # scan 4: DC refinement -> the last DC magnitude bit (576&1=0)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
        + entropy("0")
        + b"\xff\xd9"
    )
    got = _jpeg_decode(blob)

    # independent IDCT: cosine sums, not the module's _DCT matrix
    coef = np.zeros((8, 8))
    coef[0, 0], coef[0, 1], coef[0, 2] = 576.0, 3.0, -7.0
    expect = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
                    cv = np.sqrt(0.125) if v == 0 else np.sqrt(0.25)
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            expect[y, x] = s + 128.0
    expect = np.clip(np.round(expect), 0, 255).astype(np.uint8)
    assert (got == np.repeat(expect[:, :, None], 3, axis=2)).all()


def test_jpeg_progressive_malformed_scans_rejected():
    """Illegal progressive scan headers are hard errors: a DC scan
    with Se!=0, a multi-component AC scan, and size!=1 refinement
    symbols must all raise rather than mis-decode."""
    from global_superstore_data_warehouse_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    px = np.full((8, 8, 3), 100, np.uint8)
    good = encode_jpeg_progressive(8, 8, px, quant=1, grayscale=True)

    # find the first SOS and corrupt its spectral selection: the DC
    # scan (Ss=0 Se=0) becomes Ss=0 Se=5
    i = good.index(b"\xff\xda")
    bad = bytearray(good)
    bad[i + 2 + 2 + 3 + 1] = 5  # Se byte of the 1-component scan header
    with pytest.raises(ValueError, match="Se=0"):
        _jpeg_decode(bytes(bad))


def test_bitreader_lut_fallback_and_alignment():
    """Round-11 reader internals, exercised directly: codes longer
    than 8 bits miss the 256-entry LUT and must decode via the
    canonical bit-serial walk; byte-alignment after buffered reads
    must rewind whole unconsumed bytes so the RST marker is found at
    its stream position; stuffed 0xFF00 bytes stay correct next to
    buffered runs."""
    from global_superstore_data_warehouse_spark.operators.jpeg import (
        _BitReader,
        _canonical_codes,
        _HuffTable,
    )

    # DHT with one 2-bit code (sym 5) and two 12-bit codes (7, 9):
    # BITS = one code of length 2, two of length 12
    bits = [0, 1] + [0] * 9 + [2] + [0] * 4
    tab = _HuffTable(_canonical_codes(bits, [5, 7, 9]))
    assert tab.lut[0b00_000000] == (5, 2)  # 2-bit code fills the LUT
    # canonical: len2 -> code 0; len12 -> codes 0b010000000000/..01
    long_a, long_b = 0b010000000000, 0b010000000001
    assert tab.codes[(12, long_a)] == 7 and tab.codes[(12, long_b)] == 9
    assert tab.lut[long_a >> 4] is None  # 8-bit prefix of a long code

    # stream: [sym7][sym5][sym9][5 magnitude bits=0b10110], padded
    # with 1-bits to the byte boundary (31 -> 32 bits)
    word = (
        (((((long_a << 2) | 0b00) << 12) | long_b) << 5) | 0b10110
    )
    word = (word << 1) | 0b1
    blob = word.to_bytes(4, "big")
    r = _BitReader(blob, 0)
    assert r.decode_symbol(tab) == 7   # slow path (12 bits)
    assert r.decode_symbol(tab) == 5   # LUT path
    assert r.decode_symbol(tab) == 9   # slow path again
    assert r.read_bits(5) == 0b10110

    # alignment: in a VALID stream the RST follows the partial byte
    # directly (fill stops at the 0xFF, so no whole bytes are ever
    # buffered past it) — tail bits drop, marker consumed in place
    blob2 = bytes([0b10100000, 0xFF, 0xD2])
    r2 = _BitReader(blob2, 0)
    r2._fill(24)
    assert r2.n == 8  # fill stopped at the marker
    assert r2.read_bits(3) == 0b101
    r2.align_and_consume_rst(2)
    assert r2.pos == 3 and r2.n == 0

    # corrupt stream (data bytes between the partial byte and the
    # RST): the rewind puts the reader at the byte-at-a-time reader's
    # exact position, so the same error fires at the same place
    import pytest as _pytest

    r2b = _BitReader(bytes([0b10100000, 0x11, 0xFF, 0xD2]), 0)
    r2b._fill(24)
    assert r2b.n == 16
    assert r2b.read_bits(3) == 0b101
    with _pytest.raises(ValueError, match="expected RST"):
        r2b.align_and_consume_rst(2)
    assert r2b.pos == 1  # rewound to the first unconsumed whole byte

    # stuffed byte adjacent to a buffered run: 0xFF00 decodes as a
    # data byte 0xFF via the slow path, then buffering resumes
    blob3 = bytes([0xAB, 0xFF, 0x00, 0xCD])
    r3 = _BitReader(blob3, 0)
    assert r3.read_bits(8) == 0xAB
    assert r3.read_bits(16) == 0xFFCD

    # truncation and marker errors preserved
    import pytest as _pytest

    r4 = _BitReader(bytes([0xFF, 0xD9]), 0)
    with _pytest.raises(ValueError, match="marker inside entropy"):
        r4.read_bit()
    r5 = _BitReader(b"", 0)
    with _pytest.raises(ValueError, match="truncated"):
        r5.read_bit()

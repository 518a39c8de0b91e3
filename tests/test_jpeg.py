"""Baseline JPEG codec (operators/jpeg.py): golden hand-laid bytes
with a VARIABLE-length Huffman table (the fixed-length encoder can't
produce one — breaks encode/decode circularity), exact constant-image
round-trips at unit quant, bounded-error property round-trips over
gray/4:4:4/4:2:0 with restart intervals, and the honest-refusal
matrix (progressive, 12-bit, >2 sampling, WEBP)."""

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
    # progressive: flip SOF0 -> SOF2
    prog = base.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(NotImplementedError, match="progressive"):
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

"""AVI/MJPEG container codec + video_frame_sample_stats tests.

The golden container below is laid out BY HAND from the public AVI
RIFF spec (chunk sizes computed on paper), so the decoder is pinned
independently of our own encoder — the same de-circularization
discipline as the BMP/PNG/WAV goldens in test_multimodal.py."""

import struct

import numpy as np
import pytest

from global_superstore_data_warehouse_spark.operators.avi import (
    AVIF_HASINDEX,
    AVIIF_KEYFRAME,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)


def _hand_laid_avi(frames, width=4, height=2, us=1000, *,
                   handler=b"MJPG", fcc_type=b"vids", n_streams=1,
                   total_override=None, idx_entries=None,
                   flags=AVIF_HASINDEX, strf_comp=b"MJPG"):
    """Assemble an AVI byte-by-byte with struct.pack only — no reuse
    of encode_avi_mjpeg. Keyword knobs let the refusal tests corrupt
    exactly one field."""
    sugg = max(len(f) for f in frames)  # dwSuggestedBufferSize
    avih = struct.pack(
        "<10I16s", us, 0, 0, flags,
        total_override if total_override is not None else len(frames),
        0, n_streams, sugg, width, height, b"\x00" * 16,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", fcc_type, handler, 0, 0, 0, 0,
        us, 1_000_000, 0, len(frames), sugg, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, strf_comp,
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi_body = bytearray()
    idx = bytearray()
    for f in frames:
        off = 4 + len(movi_body)
        movi_body += chunk(b"00dc", f)
        idx += struct.pack("<4sIII", b"00dc", AVIIF_KEYFRAME, off, len(f))
    if idx_entries is not None:
        idx = idx_entries
    body = (
        b"AVI " + hdrl + chunk(b"LIST", b"movi" + bytes(movi_body))
        + chunk(b"idx1", bytes(idx))
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


FRAME_A = b"\xff\xd8frame-a\xff\xd9"  # odd length: exercises pad byte
FRAME_B = b"\xff\xd8fr-b\xff\xd9"


def test_avi_decode_golden_bytes():
    meta, frames = decode_avi_mjpeg(_hand_laid_avi([FRAME_A, FRAME_B]))
    assert meta == {"width": 4, "height": 2, "us_per_frame": 1000,
                    "n_frames": 2}
    assert frames == [FRAME_A, FRAME_B]


def test_avi_encoder_matches_hand_layout():
    """The encoder reproduces the hand layout bit-for-bit (same
    advisory-field conventions), so every encoder byte is pinned to
    the spec transcription, not just to what the decoder accepts."""
    assert encode_avi_mjpeg(4, 2, [FRAME_A, FRAME_B], 1000) == _hand_laid_avi(
        [FRAME_A, FRAME_B]
    )


def test_avi_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.binary(min_size=0, max_size=17).map(lambda b: b"\xff\xd8" + b),
            min_size=1,
            max_size=6,
        ),
        st.integers(min_value=1, max_value=64),
        st.integers(min_value=1, max_value=64),
        st.integers(min_value=1, max_value=10**6),
    )
    def check(frames, w, h, us):
        meta, got = decode_avi_mjpeg(encode_avi_mjpeg(w, h, frames, us))
        assert got == frames
        assert meta == {
            "width": w, "height": h, "us_per_frame": us,
            "n_frames": len(frames),
        }

    check()


def test_avi_refusals_and_validation():
    ok = [FRAME_A]
    with pytest.raises(NotImplementedError, match="RIFF/AVI"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(NotImplementedError, match="handler"):
        decode_avi_mjpeg(_hand_laid_avi(ok, handler=b"H264"))
    with pytest.raises(NotImplementedError, match="stream type"):
        decode_avi_mjpeg(_hand_laid_avi(ok, fcc_type=b"auds"))
    with pytest.raises(NotImplementedError, match="streams"):
        decode_avi_mjpeg(_hand_laid_avi(ok, n_streams=2))
    with pytest.raises(NotImplementedError, match="compression"):
        decode_avi_mjpeg(_hand_laid_avi(ok, strf_comp=b"DIB "))
    with pytest.raises(ValueError, match="census"):
        decode_avi_mjpeg(_hand_laid_avi(ok, total_override=3))
    with pytest.raises(ValueError, match="SOI"):
        decode_avi_mjpeg(_hand_laid_avi([b"not-a-jpeg"]))
    with pytest.raises(ValueError, match="idx1 entry"):
        bad_idx = struct.pack("<4sIII", b"00dc", AVIIF_KEYFRAME, 99, 5)
        decode_avi_mjpeg(_hand_laid_avi(ok, idx_entries=bad_idx))
    with pytest.raises(ValueError, match="idx1 missing"):
        blob = _hand_laid_avi(ok)
        cut = blob.rindex(b"idx1")
        blob = blob[:cut]
        blob = blob[:4] + struct.pack("<I", len(blob) - 8) + blob[8:]
        decode_avi_mjpeg(blob)
    with pytest.raises(ValueError, match="overruns"):
        blob = bytearray(_hand_laid_avi(ok))
        pos = bytes(blob).index(b"00dc") + 4
        blob[pos : pos + 4] = struct.pack("<I", 10**6)
        decode_avi_mjpeg(bytes(blob))


def test_avi_mjpeg_frames_decode_exactly():
    """Constant-luma unit-quant frames survive the MJPEG round trip
    bit-exactly (DC-only spectrum), baseline and progressive alike —
    the invariant video_frame_sample_stats' arithmetic oracle rides
    on."""
    from global_superstore_data_warehouse_spark.operators.jpeg import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )
    from global_superstore_data_warehouse_spark.operators.multimodal import (
        decode_image,
    )

    w, h = 11, 9
    frames = []
    for f, enc in enumerate((encode_jpeg_baseline, encode_jpeg_progressive)):
        px = np.full((h, w, 3), 40 + f * 77, np.uint8)
        frames.append(enc(w, h, px, quant=1, grayscale=True))
    _meta, got = decode_avi_mjpeg(encode_avi_mjpeg(w, h, frames, 40_000))
    for f, jpg in enumerate(got):
        px = decode_image(jpg)
        assert px.shape == (h, w, 3)
        assert (px == 40 + f * 77).all()


def test_video_frame_sample_stats_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "video_frame_sample_stats", sf_dir)


def test_avi_rec_grouped_movi_chunks():
    """Interleaved AVIs wrap movi chunks in LIST 'rec ' groups; the
    walker must find frames through the grouping transparently, and
    idx1 offsets (which point at the chunk headers, not the groups)
    must still verify. Container laid out by hand."""
    frames = [FRAME_A, FRAME_B]

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    sugg = max(len(f) for f in frames)
    avih = struct.pack(
        "<10I16s", 1000, 0, 0, AVIF_HASINDEX, 2, 0, 1, sugg, 4, 2,
        b"\x00" * 16,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"MJPG", 0, 0, 0, 0, 1000,
        1_000_000, 0, 2, sugg, 0xFFFFFFFF, 0, 0, 0, 4, 2,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, 4, 2, 1, 24, b"MJPG", 24, 0, 0, 0, 0,
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + chunk(
        b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    ))
    # each frame inside its own LIST 'rec ' group
    movi_body = bytearray()
    idx = bytearray()
    for f in frames:
        # the frame chunk header sits 12 bytes into the rec list
        # (LIST hdr 8 + 'rec ' 4), relative to the 'movi' fourcc
        off = 4 + len(movi_body) + 12
        movi_body += chunk(b"LIST", b"rec " + chunk(b"00dc", f))
        idx += struct.pack("<4sIII", b"00dc", AVIIF_KEYFRAME, off, len(f))
    body = (
        b"AVI " + hdrl + chunk(b"LIST", b"movi" + bytes(movi_body))
        + chunk(b"idx1", bytes(idx))
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    meta, got = decode_avi_mjpeg(blob)
    assert got == frames
    assert meta["n_frames"] == 2


def test_avi_truncated_header_chunks_are_value_errors():
    """An avih/strh/strf chunk shorter than its struct layout is a
    corrupt header -> ValueError, never struct.error."""
    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    short_avih = chunk(b"avih", b"\x00" * 8)
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"MJPG", 0, 0, 0, 0, 1000,
        1_000_000, 0, 1, 0, 0, 0, 0, 0, 4, 2,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 4, 2, 1, 24, b"MJPG",
                       24, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + short_avih + chunk(
        b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", FRAME_A))
    body = b"AVI " + hdrl + movi
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="header chunk truncated"):
        decode_avi_mjpeg(blob)


def test_avi_idx1_absolute_offsets_accepted():
    """AVIOLDINDEX appears in the wild with offsets either relative
    to the 'movi' fourcc (the documented convention, what our encoder
    writes) or absolute from file start (common interop output, e.g.
    old VfW writers). Both must decode; a mixed/garbled index must
    still fail."""
    frames = [FRAME_A, FRAME_B]
    blob = bytearray(_hand_laid_avi(frames))
    movi_pos = bytes(blob).index(b"movi")
    idx_pos = bytes(blob).rindex(b"idx1") + 8
    # rewrite every idx1 entry offset from movi-relative to absolute
    for i in range(len(frames)):
        at = idx_pos + 16 * i + 8
        rel = struct.unpack_from("<I", blob, at)[0]
        struct.pack_into("<I", blob, at, rel + movi_pos)
    meta, got = decode_avi_mjpeg(bytes(blob))
    assert got == frames
    assert meta["n_frames"] == 2
    # garble the SECOND entry only: mode detection keys off the first
    # entry (absolute), so the mismatch must still raise
    struct.pack_into("<I", blob, idx_pos + 16 + 8, 7)
    with pytest.raises(ValueError, match="idx1 entry"):
        decode_avi_mjpeg(bytes(blob))

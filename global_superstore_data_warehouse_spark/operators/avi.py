"""Vendored pure-python AVI (RIFF) container codec for MJPEG video.

The classic AVI 1.0 layout (Microsoft "AVI RIFF File Reference", a
public spec; the same RIFF chunk grammar the WAV decoder in
``operators/multimodal.py`` walks):

    RIFF('AVI '
      LIST('hdrl'
        avih(<MainAVIHeader>)          # 56 bytes
        LIST('strl'
          strh(<AVIStreamHeader>)      # 56 bytes, fccType='vids'
          strf(<BITMAPINFOHEADER>)     # 40 bytes, biCompression='MJPG'
        )
      )
      LIST('movi'
        00dc(<one baseline/progressive JPEG per frame>) ...
      )
      idx1(<AVIOLDINDEX: 16 bytes per frame>)
    )

This is the video twin of the image (BMP/PNG/JPEG) and audio (WAV)
decode paths: the CONTAINER walk is fully implemented here — chunk
grammar, word alignment, header cross-validation, idx1 verification —
and each extracted '00dc' payload is a complete JPEG that
``operators/jpeg.py`` decodes. Codecs beyond MJPEG (anything whose
strh handler / strf compression is not MJPG, and 'auds' audio
streams) raise NotImplementedError — that is the plug-in-a-real-
codec-library boundary, exactly like WEBP for images and ADPCM for
audio. Reference parity note: the reference warehouse
(/root/reference, PL/pgSQL) has no media path at all; this module is
part of the commissioned beyond-reference training-data surface
(SURVEY.md §2.10 multimodal columns: "frame-sample ... make the
Spark-side plumbing real").
"""

from __future__ import annotations

import struct

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010


def _chunk(tag: bytes, body: bytes) -> bytes:
    """One RIFF chunk: fourcc + little-endian size + body + pad byte
    when the body length is odd (RIFF word alignment)."""
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames: list,
    us_per_frame: int = 40_000,
) -> bytes:
    """Write a classic AVI 1.0 container holding one MJPEG 'vids'
    stream: each entry of ``frames`` is a complete JPEG byte string
    and becomes one '00dc' chunk in the movi list; idx1 carries one
    keyframe entry per frame (MJPEG is all-intra). ``us_per_frame``
    maps to both avih.dwMicroSecPerFrame and the strh dwRate/dwScale
    pair (rate=1_000_000, scale=us_per_frame — exact, no fps
    rounding)."""
    frames = [bytes(f) for f in frames]
    if not frames:
        raise ValueError("AVI needs at least one frame")
    max_frame = max(len(f) for f in frames)
    avih = struct.pack(
        "<10I16s",
        int(us_per_frame),  # dwMicroSecPerFrame
        0,                  # dwMaxBytesPerSec (advisory)
        0,                  # dwPaddingGranularity
        AVIF_HASINDEX,      # dwFlags
        len(frames),        # dwTotalFrames
        0,                  # dwInitialFrames
        1,                  # dwStreams
        max_frame,          # dwSuggestedBufferSize
        int(width),
        int(height),
        b"\x00" * 16,       # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids",
        b"MJPG",
        0,                  # dwFlags
        0, 0,               # wPriority, wLanguage
        0,                  # dwInitialFrames
        int(us_per_frame),  # dwScale
        1_000_000,          # dwRate -> rate/scale = fps exactly
        0,                  # dwStart
        len(frames),        # dwLength (in frames)
        max_frame,          # dwSuggestedBufferSize
        0xFFFFFFFF,         # dwQuality (driver default)
        0,                  # dwSampleSize (0 = variable-size samples)
        0, 0, int(width), int(height),  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                 # biSize
        int(width),
        int(height),
        1,                  # biPlanes
        24,                 # biBitCount
        b"MJPG",            # biCompression
        int(width) * int(height) * 3,  # biSizeImage (uncompressed)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    # movi body + idx1 offsets: the AVIOLDINDEX convention stores each
    # chunk's offset relative to the 'movi' fourcc, so the first chunk
    # header sits at offset 4.
    movi_body = bytearray()
    index = bytearray()
    for f in frames:
        off = 4 + len(movi_body)  # relative to the 'movi' fourcc
        movi_body += _chunk(b"00dc", f)
        index += struct.pack("<4sIII", b"00dc", AVIIF_KEYFRAME, off, len(f))
    riff_body = (
        b"AVI "
        + hdrl
        + _list(b"movi", bytes(movi_body))
        + _chunk(b"idx1", bytes(index))
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(b: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) over a RIFF chunk run,
    honoring word alignment. Truncated chunk headers or bodies are
    hard errors — a container lying about sizes should never decode
    silently."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated RIFF chunk header")
        tag = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        if pos + 8 + size > end:
            raise ValueError(
                f"RIFF chunk {tag!r} overruns its parent "
                f"({pos + 8 + size} > {end})"
            )
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi_mjpeg(blob: bytes):
    """Parse an AVI container into (meta, frames) where ``meta`` is
    ``{"width", "height", "us_per_frame", "n_frames"}`` and
    ``frames`` is the list of raw JPEG byte strings from the '00dc'/
    '00db' chunks in stream order (decode each with
    ``operators.multimodal.decode_image``).

    A REAL container parse, not a byte-slicer: full RIFF chunk walk
    with word alignment, mandatory avih/strh/strf headers, and three
    cross-validations — frame count must agree between avih
    (dwTotalFrames), strh (dwLength), and the movi chunk census;
    every frame must start with a JPEG SOI marker; and when idx1 is
    present each entry's offset+size must point at the matching movi
    chunk. Non-MJPG video, audio streams, and multi-stream files
    raise NotImplementedError (the codec-library boundary)."""
    b = bytes(blob)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI container")
    riff_len = struct.unpack_from("<I", b, 4)[0]
    end = min(len(b), 8 + riff_len)

    avih = strh = strf = None
    movi_off = movi_len = None
    idx1 = None
    frames: list[bytes] = []
    frame_offsets: list[tuple[int, int]] = []  # (offset rel. 'movi', size)

    for tag, off, size in _walk(b, 12, end):
        if tag == b"LIST":
            ltype = b[off : off + 4]
            if ltype == b"hdrl":
                for t2, o2, s2 in _walk(b, off + 4, off + size):
                    if t2 == b"avih":
                        avih = b[o2 : o2 + s2]
                    elif t2 == b"LIST" and b[o2 : o2 + 4] == b"strl":
                        for t3, o3, s3 in _walk(b, o2 + 4, o2 + s2):
                            if t3 == b"strh":
                                if strh is not None:
                                    raise NotImplementedError(
                                        "multi-stream AVI unsupported"
                                    )
                                strh = b[o3 : o3 + s3]
                            elif t3 == b"strf":
                                strf = b[o3 : o3 + s3]
            elif ltype == b"movi":
                movi_off, movi_len = off, size

                def _collect(start: int, stop: int) -> None:
                    for t2, o2, s2 in _walk(b, start, stop):
                        if t2 == b"LIST" and b[o2 : o2 + 4] == b"rec ":
                            # interleaved files group chunks in
                            # 'rec ' lists — recurse transparently
                            _collect(o2 + 4, o2 + s2)
                        elif t2[2:4] in (b"dc", b"db"):
                            frames.append(b[o2 : o2 + s2])
                            # offset of the chunk HEADER relative to
                            # the 'movi' fourcc (AVIOLDINDEX
                            # convention, nesting-independent)
                            frame_offsets.append((o2 - 8 - movi_off, s2))

                _collect(off + 4, off + size)
        elif tag == b"idx1":
            idx1 = b[off : off + size]

    if avih is None or strh is None or strf is None or movi_off is None:
        raise ValueError("AVI missing avih/strh/strf/movi")
    # struct layouts below need: avih 40 bytes (through dwHeight),
    # strh 36 (through dwLength), strf 20 (through biCompression) —
    # shorter chunks are corrupt headers, not struct.error material
    if len(avih) < 40 or len(strh) < 36 or len(strf) < 20:
        raise ValueError(
            f"AVI header chunk truncated (avih={len(avih)} "
            f"strh={len(strh)} strf={len(strf)} bytes)"
        )
    (us_per_frame, _mbps, _pad, flags, total_frames, _init, n_streams,
     _sugg, width, height) = struct.unpack_from("<10I", avih, 0)
    if n_streams != 1:
        raise NotImplementedError(f"AVI with {n_streams} streams unsupported")
    fcc_type, fcc_handler = struct.unpack_from("<4s4s", strh, 0)
    if fcc_type != b"vids":
        raise NotImplementedError(f"stream type {fcc_type!r} unsupported")
    if fcc_handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"video handler {fcc_handler!r} unsupported (MJPEG only; "
            "plug in a codec library for H.264/VP9/AV1)"
        )
    strh_len = struct.unpack_from("<I", strh, 32)[0]
    bi_w, bi_h = struct.unpack_from("<ii", strf, 4)
    bi_comp = strf[16:20]
    if bi_comp not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(f"strf compression {bi_comp!r} unsupported")
    if (bi_w, abs(bi_h)) != (width, height):
        raise ValueError(
            f"strf dims {(bi_w, abs(bi_h))} disagree with avih "
            f"{(width, height)}"
        )
    if not (len(frames) == total_frames == strh_len):
        raise ValueError(
            f"frame census disagrees: movi={len(frames)} "
            f"avih={total_frames} strh={strh_len}"
        )
    for i, f in enumerate(frames):
        if f[:2] != b"\xff\xd8":
            raise ValueError(f"frame {i} does not start with JPEG SOI")
    if flags & AVIF_HASINDEX:
        if idx1 is None:
            raise ValueError("avih declares AVIF_HASINDEX but idx1 missing")
        if len(idx1) != 16 * len(frames):
            raise ValueError(
                f"idx1 has {len(idx1) // 16} entries for {len(frames)} frames"
            )
        # AVIOLDINDEX offsets appear in the wild in TWO conventions:
        # relative to the 'movi' fourcc (the documented one) or
        # absolute from file start (common interop output). Detect
        # from the first entry — if its offset equals the absolute
        # position of the first movi chunk header, validate the whole
        # index in absolute mode; both are valid input.
        base = 0
        if frame_offsets:
            first_off = struct.unpack_from("<4sIII", idx1, 0)[2]
            if first_off == frame_offsets[0][0] + movi_off:
                base = movi_off
        for i, (want_off, want_size) in enumerate(frame_offsets):
            ckid, _fl, ioff, isize = struct.unpack_from("<4sIII", idx1, 16 * i)
            if ckid[2:4] not in (b"dc", b"db") or (ioff - base, isize) != (
                want_off,
                want_size,
            ):
                raise ValueError(
                    f"idx1 entry {i} ({ckid!r}@{ioff}+{isize}) does not "
                    f"match movi chunk @{want_off + base}+{want_size}"
                )
    meta = {
        "width": int(width),
        "height": int(height),
        "us_per_frame": int(us_per_frame),
        "n_frames": len(frames),
    }
    return meta, frames

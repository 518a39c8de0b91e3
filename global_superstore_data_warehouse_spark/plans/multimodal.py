"""Multimodal feature-extraction query (beyond-reference): the
binary-column + mapInPandas plumbing exercised end-to-end. The
oracle recomputes the deterministic raw-byte features in SQL, so the
Arrow batch path is value-checked, not just shape-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.hints import spread_scan
from global_superstore_data_warehouse_spark.operators.multimodal import (
    extract_blob_features,
    make_blob_table,
    resize_images,
    sample_frames,
)

DECODE_STATS_SCHEMA = (
    "doc_id long, format string, width int, height int, n_pixels long, "
    "mean_r int, mean_g int, mean_b int"
)


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END REAL IMAGE DECODE: build genuine container bytes
    per document, cycling doc_id % 5 over the five vendored
    container families — 24-bit BMP (deterministic per-channel
    fill, widths 3..9 so most rows carry 1-3 padding bytes),
    8-bit RGB PNG (zlib-compressed, per-row filter type cycling 0-4
    so every scanline unfilter path runs inside the distributed
    query), palette PNG (PLTE lookup; bit depth cycles 1/2/4/8 by
    doc_id so MSB-first sub-byte index unpacking runs too — every
    palette entry carries the same fill so the mean stays the
    arithmetic one while the indices alternate across the depth
    range), 16-bit RGB PNG (big-endian samples with the fill in
    the high byte and doc_id-derived noise in the low byte, pinning
    the 16->8 high-byte scaling), and baseline JPEG (grayscale,
    unit quant tables — a constant block is DC-only spectrum, so the
    full marker-walk/Huffman/IDCT pipeline reconstructs the fill
    EXACTLY and stays inside the arithmetic oracle; restart markers
    every 2 MCUs exercise the DRI/RST path distributed) — then
    decode them with the vendored pure-python parsers and report
    per-image pixel statistics, all inside one Arrow-batched
    mapInPandas stage, zero shuffle, partition-parallel.

    The oracle never sees the bytes: it computes the SAME statistics
    arithmetically from the generator parameters (constant channel
    fills r=doc_id%256 etc.), so any decoder defect — stride/padding
    mishandling (zero padding bytes would drag a mean down),
    BGR/RGB swap (r and b means cross), scanline-direction, header
    offset, inflate or unfilter errors — breaks the value hash.
    Encode and decode are additionally de-circularized by golden
    hand-laid-out BMP and PNG byte tests in
    tests/test_multimodal.py."""
    import pandas as pd  # noqa: F401 (mapInPandas batch type)

    docs = spread_scan(
        load(spark, sf_dir, "documents"), sf_dir, "documents", by="doc_id"
    ).select("doc_id", "n_chars")

    def decode_batches(batches):
        import numpy as _np
        import pandas as _pd

        from global_superstore_data_warehouse_spark.operators.jpeg import (
            encode_jpeg_baseline,
        )
        from global_superstore_data_warehouse_spark.operators.multimodal import (
            decode_image,
            encode_bmp,
            encode_png,
            encode_png16,
            encode_png_palette,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "format", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b",
            )}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = int(n_chars) % 7 + 3   # 3..9: strides mostly padded
                h = int(n_chars) % 5 + 2   # 2..6
                fill = (
                    int(doc_id) % 256,
                    (int(doc_id) * 7 + 13) % 256,
                    (int(doc_id) * 31 + 5) % 256,
                )
                px = _np.empty((h, w, 3), dtype=_np.uint8)
                px[:, :, 0], px[:, :, 1], px[:, :, 2] = fill
                variant = int(doc_id) % 5
                # every PNG variant alternates sequential / Adam7 by
                # doc_id//5 parity: the pixels (and so the oracle's
                # arithmetic means) are identical, only the container
                # layout changes — per-pass unfilter + scatter runs
                # distributed under the same value hash
                inter = (int(doc_id) // 5) % 2 == 1
                from global_superstore_data_warehouse_spark.operators.multimodal import (  # noqa: E501
                    png_scanline_count,
                )

                filters = [
                    y % 5 for y in range(png_scanline_count(w, h, inter))
                ]
                if variant == 0:
                    fmt = "bmp"
                    blob = encode_bmp(w, h, px)
                elif variant == 1:
                    fmt = "png"
                    blob = encode_png(
                        w, h, px, row_filters=filters, interlace=inter
                    )
                elif variant == 4:
                    # JPEG, grayscale fill = doc_id % 256 (r channel's
                    # formula): unit quant makes the constant image
                    # reconstruct exactly, so the oracle's arithmetic
                    # means still hold with mean_r = mean_g = mean_b.
                    # Alternates baseline / PROGRESSIVE (SOF2) by the
                    # same doc_id//5 parity as the PNG interlace flag,
                    # so the annex-G scan machinery (DC successive
                    # approximation, spectral bands, EOB runs) also
                    # runs distributed under the value hash
                    fmt = "jpeg"
                    gray = _np.full((h, w, 3), fill[0], dtype=_np.uint8)
                    px = gray
                    if inter:
                        from global_superstore_data_warehouse_spark.operators.jpeg import (  # noqa: E501
                            encode_jpeg_progressive,
                        )

                        blob = encode_jpeg_progressive(
                            w, h, gray, quant=1, grayscale=True,
                            restart_interval=2,
                        )
                    else:
                        blob = encode_jpeg_baseline(
                            w, h, gray, quant=1, grayscale=True,
                            restart_interval=2,
                        )
                elif variant == 2:
                    # palette: depth cycles 1/2/4/8; indices sweep the
                    # depth's full range while every entry is the same
                    # fill, so sub-byte unpacking is exercised without
                    # moving the oracle's arithmetic means
                    fmt = "png-palette"
                    depth = (1, 2, 4, 8)[(int(doc_id) // 4) % 4]
                    n = 1 << depth
                    pal = _np.tile(
                        _np.array(fill, dtype=_np.uint8), (n, 1)
                    )
                    idx = (
                        _np.arange(h * w, dtype=_np.int64) % n
                    ).astype(_np.uint8).reshape(h, w)
                    blob = encode_png_palette(
                        w, h, pal, idx, depth=depth, row_filters=filters,
                        interlace=inter,
                    )
                else:
                    # 16-bit RGB: fill in the high byte, doc-derived
                    # noise in the low byte — decode must return the
                    # high byte exactly
                    fmt = "png16"
                    lo = int(doc_id) % 256
                    px16 = (
                        px.astype(_np.uint16) << 8
                    ) | _np.uint16(lo)
                    blob = encode_png16(
                        w, h, px16, color=2, row_filters=filters,
                        interlace=inter,
                    )
                decoded = decode_image(blob)
                out["doc_id"].append(int(doc_id))
                out["format"].append(fmt)
                out["width"].append(decoded.shape[1])
                out["height"].append(decoded.shape[0])
                out["n_pixels"].append(decoded.shape[0] * decoded.shape[1])
                means = decoded.reshape(-1, 3).mean(axis=0)
                out["mean_r"].append(int(round(means[0])))
                out["mean_g"].append(int(round(means[1])))
                out["mean_b"].append(int(round(means[2])))
            yield _pd.DataFrame(out)

    return docs.mapInPandas(decode_batches, DECODE_STATS_SCHEMA)


# the oracle derives every statistic arithmetically from the
# generator parameters — independent of the container bytes
MULTIMODAL_DECODE_STATS_ORACLE = """
    SELECT doc_id,
           CASE CAST(doc_id % 5 AS INTEGER)
                WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
                WHEN 2 THEN 'png-palette' WHEN 3 THEN 'png16'
                ELSE 'jpeg' END AS format,
           CAST(n_chars % 7 + 3 AS INTEGER) AS width,
           CAST(n_chars % 5 + 2 AS INTEGER) AS height,
           CAST((n_chars % 7 + 3) * (n_chars % 5 + 2) AS BIGINT) AS n_pixels,
           CAST(doc_id % 256 AS INTEGER) AS mean_r,
           CAST(CASE WHEN doc_id % 5 = 4 THEN doc_id % 256
                     ELSE (doc_id * 7 + 13) % 256 END AS INTEGER) AS mean_g,
           CAST(CASE WHEN doc_id % 5 = 4 THEN doc_id % 256
                     ELSE (doc_id * 31 + 5) % 256 END AS INTEGER) AS mean_b
    FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_blob_features(make_blob_table(docs))


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return resize_images(make_blob_table(docs))


MULTIMODAL_RESIZE_ORACLE = """
    WITH dims AS (
        SELECT doc_id,
               CAST(n_chars % 64 + 1 AS INTEGER) AS w,
               CAST(n_chars % 48 + 1 AS INTEGER) AS h
        FROM documents
    ), scaled AS (
        SELECT doc_id, w, h,
               least(32.0 / w, 32.0 / h, 1.0) AS s
        FROM dims
    )
    SELECT doc_id, w AS orig_width, h AS orig_height,
           CAST(greatest(1, floor(w * s)) AS INTEGER) AS new_width,
           CAST(greatest(1, floor(h * s)) AS INTEGER) AS new_height,
           ROUND(s, 6) AS scale
    FROM scaled
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return sample_frames(make_blob_table(docs))


# DuckDB cannot slice BLOBs, so the oracle slices the VARCHAR and
# encodes the slice — byte-identical because the documents corpus is
# ASCII (the multimodal_features header_hex oracle already relies on
# this).
MULTIMODAL_FRAME_SAMPLE_ORACLE = """
    WITH f AS (
        SELECT doc_id, text,
               CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT) AS nf
        FROM documents
    )
    SELECT doc_id,
           CAST(t.i AS INTEGER) AS frame_index,
           CAST(octet_length(encode(substring(text, CAST(t.i * 32 + 1 AS BIGINT), 32))) AS INTEGER) AS frame_len,
           lower(hex(encode(substring(text, CAST(t.i * 32 + 1 AS BIGINT), 4)))) AS frame_head
    FROM f, LATERAL (SELECT unnest(range(0, nf, 2)) AS i) t
"""


MULTIMODAL_FEATURES_ORACLE = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS blob_len,
           md5(text) AS blob_md5,
           lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
           CAST(n_chars % 64 + 1 AS INTEGER) AS width,
           CAST(n_chars % 48 + 1 AS INTEGER) AS height
    FROM documents
"""


# --- real audio decode (WAV PCM16) ------------------------------------

AUDIO_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, duration_us long, "
    "sum_abs long, peak_abs long"
)
AUDIO_RATE = 8000  # Hz -> one sample = 125 us exactly


def audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END REAL AUDIO DECODE — the WAV twin of
    ``multimodal_decode_stats``: build genuine RIFF/WAVE PCM16 mono
    container bytes per document (a deterministic per-SAMPLE
    waveform, so a byte-offset, endianness, or chunk-walk defect
    shifts every statistic, unlike a constant fill), decode them with
    the vendored pure-python WAV parser, and report per-clip sample
    statistics — one Arrow-batched mapInPandas stage, zero shuffle.

    The oracle never sees the bytes: it recomputes the SAME integer
    statistics arithmetically from the waveform formula
    s_t = ((doc_id*7919 + t*31) % 2048) - 1024, so parity is exact
    (integer sums, no float audio math). Encode/decode circularity is
    broken by a golden hand-laid-out WAV byte test in
    tests/test_multimodal.py."""
    docs = spread_scan(
        load(spark, sf_dir, "documents"), sf_dir, "documents", by="doc_id"
    ).select("doc_id")

    def decode_batches(batches):
        import numpy as _np
        import pandas as _pd

        from global_superstore_data_warehouse_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples", "duration_us",
                "sum_abs", "peak_abs",
            )}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 64 + d % 128
                t = _np.arange(n, dtype=_np.int64)
                samples = ((d * 7919 + t * 31) % 2048) - 1024
                rate, decoded = decode_wav(encode_wav(AUDIO_RATE, samples))
                a = _np.abs(decoded.astype(_np.int64))
                out["doc_id"].append(d)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(decoded))
                out["duration_us"].append(len(decoded) * 1_000_000 // rate)
                out["sum_abs"].append(int(a.sum()))
                out["peak_abs"].append(int(a.max()))
            yield _pd.DataFrame(out)

    return docs.mapInPandas(decode_batches, AUDIO_STATS_SCHEMA)


AUDIO_DECODE_STATS_ORACLE = f"""
    SELECT doc_id,
           {AUDIO_RATE} AS sample_rate,
           CAST(64 + doc_id % 128 AS INTEGER) AS n_samples,
           CAST((64 + doc_id % 128) * 125 AS BIGINT) AS duration_us,
           CAST(list_aggregate(list_transform(range(0, 64 + doc_id % 128),
                t -> abs(((doc_id * 7919 + t * 31) % 2048) - 1024)),
                'sum') AS BIGINT) AS sum_abs,
           CAST(list_max(list_transform(range(0, 64 + doc_id % 128),
                t -> abs(((doc_id * 7919 + t * 31) % 2048) - 1024)))
                AS BIGINT) AS peak_abs
    FROM documents
"""


# --- real video decode (AVI / MJPEG) -----------------------------------

VIDEO_STATS_SCHEMA = (
    "doc_id long, n_frames int, frame_index int, ts_us long, "
    "width int, height int, mean_luma int"
)
VIDEO_US_PER_FRAME = 40_000  # 25 fps exactly
VIDEO_FRAME_STRIDE = 2


def video_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END REAL VIDEO DECODE — the moving-picture twin of
    ``multimodal_decode_stats`` / ``audio_decode_stats``: build a
    genuine AVI 1.0 container per document (one MJPEG 'vids' stream,
    3..6 JPEG frames, avih/strh/strf headers + movi list + idx1
    keyframe index), parse it with the vendored pure-python RIFF
    walker (``operators/avi.py`` — header cross-validation, word
    alignment, idx1 verification), frame-sample every
    ``VIDEO_FRAME_STRIDE``-th frame, and DECODE each sampled frame
    with the vendored JPEG decoder — per-frame variant alternates
    baseline (SOF0) / progressive (SOF2) by (doc_id + frame) parity,
    so the annex-G scan machinery runs distributed inside a video
    container too. One Arrow-batched mapInPandas stage, zero shuffle,
    fan-out rows (one per sampled frame) — the shape a real
    frame-decoder pipeline uses at 100 TB: partition-parallel over
    videos, no driver involvement, no collect.

    Each frame is a constant-luma grayscale image
    (fill = (doc_id*11 + frame*37) % 256) with a unit quant table —
    a constant block is a DC-only spectrum, so the JPEG round-trip
    reconstructs the fill EXACTLY and the oracle stays arithmetic:
    it recomputes frame count, sampled indices, timestamps, and the
    per-frame mean from the generator parameters without ever seeing
    the bytes. Container encode/decode circularity is broken by a
    golden hand-laid AVI byte test plus refusal/idx1-mismatch tests
    in tests/test_avi.py."""
    docs = spread_scan(
        load(spark, sf_dir, "documents"), sf_dir, "documents", by="doc_id"
    ).select("doc_id")

    def decode_batches(batches):
        import numpy as _np
        import pandas as _pd

        from global_superstore_data_warehouse_spark.operators.avi import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )
        from global_superstore_data_warehouse_spark.operators.jpeg import (
            encode_jpeg_baseline,
            encode_jpeg_progressive,
        )
        from global_superstore_data_warehouse_spark.operators.multimodal import (
            decode_image,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_frames", "frame_index", "ts_us",
                "width", "height", "mean_luma",
            )}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 3 + d % 4
                w = 8 + d % 9   # 8..16: most sizes need MCU edge padding
                h = 8 + d % 7   # 8..14
                frames = []
                for f in range(nf):
                    fill = (d * 11 + f * 37) % 256
                    px = _np.full((h, w, 3), fill, dtype=_np.uint8)
                    enc = (
                        encode_jpeg_progressive
                        if (d + f) % 2
                        else encode_jpeg_baseline
                    )
                    frames.append(enc(w, h, px, quant=1, grayscale=True))
                meta, got = decode_avi_mjpeg(
                    encode_avi_mjpeg(w, h, frames, VIDEO_US_PER_FRAME)
                )
                assert meta["n_frames"] == nf  # container self-check
                for f in range(0, nf, VIDEO_FRAME_STRIDE):
                    px = decode_image(got[f])
                    assert px.shape == (h, w, 3)
                    out["doc_id"].append(d)
                    out["n_frames"].append(nf)
                    out["frame_index"].append(f)
                    out["ts_us"].append(f * meta["us_per_frame"])
                    out["width"].append(meta["width"])
                    out["height"].append(meta["height"])
                    out["mean_luma"].append(int(px[:, :, 0].mean()))
            yield _pd.DataFrame(out)

    return docs.mapInPandas(decode_batches, VIDEO_STATS_SCHEMA)


VIDEO_FRAME_SAMPLE_ORACLE = f"""
    WITH v AS (
        SELECT doc_id, 3 + doc_id % 4 AS nf FROM documents
    )
    SELECT doc_id,
           CAST(nf AS INTEGER) AS n_frames,
           CAST(t.i AS INTEGER) AS frame_index,
           CAST(t.i * {VIDEO_US_PER_FRAME} AS BIGINT) AS ts_us,
           CAST(8 + doc_id % 9 AS INTEGER) AS width,
           CAST(8 + doc_id % 7 AS INTEGER) AS height,
           CAST((doc_id * 11 + t.i * 37) % 256 AS INTEGER) AS mean_luma
    FROM v, LATERAL (
        SELECT unnest(range(0, nf, {VIDEO_FRAME_STRIDE})) AS i
    ) t
"""


# --- audio feature extraction (VAD-style) ------------------------------

AUDIO_VAD_SCHEMA = (
    "doc_id long, n_samples int, zero_crossings int, sum_sq long, "
    "rms_micro long, n_windows int, active_windows int"
)
VAD_WINDOW = 32          # samples per energy window
VAD_THRESHOLD = 8192     # window sum(|s|) above this = voice activity


def audio_vad_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION over the real WAV decode path — the
    step after ``audio_decode_stats``'s raw statistics: per-clip
    zero-crossing count, RMS, and a windowed voice-activity profile
    (energy per ``VAD_WINDOW``-sample window vs a fixed threshold),
    the classic front-end of a speech-data curation pipeline. The
    clip alternates SILENT and VOICED windows (window w is muted when
    (w + doc_id) % 3 == 0), so activity detection has real structure
    to find — not a constant. Encode -> decode_wav -> numpy features,
    one Arrow-batched mapInPandas stage, zero shuffle.

    Every output is an exact integer so the DuckDB oracle (nested
    list_transform lambdas over the same waveform formula) matches
    bit-for-bit: rms_micro = isqrt(sum_sq * 1e6 // n) is the
    floor-sqrt at micro precision, and floor(sqrt(x)) over an exactly
    representable integer x < 2^52 is IEEE-safe (the nearest double
    to sqrt(x) can only cross an integer boundary when x is a perfect
    square, where it is exact)."""
    docs = spread_scan(
        load(spark, sf_dir, "documents"), sf_dir, "documents", by="doc_id"
    ).select("doc_id")

    def feature_batches(batches):
        import math as _math

        import numpy as _np
        import pandas as _pd

        from global_superstore_data_warehouse_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_samples", "zero_crossings", "sum_sq",
                "rms_micro", "n_windows", "active_windows",
            )}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 64 + d % 128
                t = _np.arange(n, dtype=_np.int64)
                s = ((d * 7919 + t * 31) % 2048) - 1024
                s = _np.where((t // VAD_WINDOW + d) % 3 == 0, 0, s)
                _rate, dec = decode_wav(encode_wav(AUDIO_RATE, s))
                s = dec.astype(_np.int64)
                nonneg = s >= 0
                zc = int((nonneg[1:] != nonneg[:-1]).sum())
                sum_sq = int((s * s).sum())
                nw = -(-n // VAD_WINDOW)
                active = 0
                for w in range(nw):
                    win = s[w * VAD_WINDOW : (w + 1) * VAD_WINDOW]
                    if int(_np.abs(win).sum()) > VAD_THRESHOLD:
                        active += 1
                out["doc_id"].append(d)
                out["n_samples"].append(n)
                out["zero_crossings"].append(zc)
                out["sum_sq"].append(sum_sq)
                out["rms_micro"].append(_math.isqrt(sum_sq * 1_000_000 // n))
                out["n_windows"].append(nw)
                out["active_windows"].append(active)
            yield _pd.DataFrame(out)

    return docs.mapInPandas(feature_batches, AUDIO_VAD_SCHEMA)


# s(t) with the per-window mute, shared by every feature below
_VAD_S = (
    "CASE WHEN ((t // {W}) + doc_id) % 3 = 0 THEN 0 "
    "ELSE ((doc_id * 7919 + t * 31) % 2048) - 1024 END"
).format(W=VAD_WINDOW)

AUDIO_VAD_FEATURES_ORACLE = f"""
    WITH base AS (
        SELECT doc_id,
               64 + doc_id % 128 AS n,
               list_transform(range(0, 64 + doc_id % 128),
                              t -> {_VAD_S}) AS s
        FROM documents
    )
    SELECT doc_id,
           CAST(n AS INTEGER) AS n_samples,
           CAST(list_aggregate(list_transform(range(1, n), t ->
                CASE WHEN (s[t + 1] >= 0) <> (s[t] >= 0)
                     THEN 1 ELSE 0 END), 'sum') AS INTEGER)
               AS zero_crossings,
           CAST(list_aggregate(list_transform(s, v -> v * v), 'sum')
                AS BIGINT) AS sum_sq,
           CAST(floor(sqrt(CAST(
                (list_aggregate(list_transform(s, v -> v * v), 'sum')
                 * 1000000) // n AS DOUBLE))) AS BIGINT) AS rms_micro,
           CAST(ceil(n / {VAD_WINDOW}.0) AS INTEGER) AS n_windows,
           CAST(list_aggregate(list_transform(
                range(0, CAST(ceil(n / {VAD_WINDOW}.0) AS BIGINT)), w ->
                CASE WHEN list_aggregate(list_transform(
                         range(w * {VAD_WINDOW},
                               least((w + 1) * {VAD_WINDOW}, n)),
                         t -> abs({_VAD_S})), 'sum') > {VAD_THRESHOLD}
                     THEN 1 ELSE 0 END), 'sum') AS INTEGER)
               AS active_windows
    FROM base
"""

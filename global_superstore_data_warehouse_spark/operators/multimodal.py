"""Multimodal column plumbing (beyond-reference): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` pipelines.

The container has no image/audio codecs, so the actual decode step
is STUBBED (``decode_image`` raises NotImplementedError); everything
around it — schema, batch shape, partitioning, the pandas UDF
signature, deterministic feature extraction on raw bytes — is real
and tested. Swapping the stub for PIL/torchvision changes one
function body, not the plumbing.

Scale notes: blobs ride in parquet binary columns; mapInPandas
processes Arrow record batches (`spark.sql.execution.arrow
.maxRecordsPerBatch` bounds memory per task), and feature extraction
is embarrassingly partition-parallel — no shuffle at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = "width int, height int, format string"

FEATURES_SCHEMA = (
    "doc_id long, blob_len int, blob_md5 string, header_hex string, "
    "width int, height int"
)


def make_blob_table(docs: DataFrame) -> DataFrame:
    """Synthesize an image-like blob table from documents: utf-8
    bytes as the payload plus a typed metadata struct (what a real
    ingest would parse from the container header)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("blob"),
        F.struct(
            (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


def decode_image(blob: bytes) -> object:
    """Real image decode — STUB. The plumbing around this function is
    real; plug in PIL.Image.open(io.BytesIO(blob)) when codecs exist."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "extract_blob_features uses raw-byte features instead"
    )


def extract_blob_features(blob_table: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow round-trip, no
    shuffle; output schema is fixed and typed.

    The batch function is a closure with local imports so cloudpickle
    ships it by value — executor Python workers need no access to
    this package on their own sys.path."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            blobs = pdf["blob"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob_len": blobs.map(len).astype("int32"),
                    "blob_md5": blobs.map(
                        lambda b: _hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "header_hex": blobs.map(lambda b: bytes(b)[:8].hex()),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                }
            )

    return blob_table.mapInPandas(feature_batches, FEATURES_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, orig_width int, orig_height int, "
    "new_width int, new_height int, scale double"
)


def resize_images(blob_table: DataFrame, max_w: int = 32, max_h: int = 32) -> DataFrame:
    """Aspect-preserving resize plan via mapInPandas. The pixel
    resample itself is the stubbed decode step (no codecs in this
    container) — the real, tested parts are the Arrow batch flow and
    the target-geometry computation a real resizer would use."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            w = pdf["meta"].map(lambda m: m["width"]).astype("int32")
            h = pdf["meta"].map(lambda m: m["height"]).astype("int32")
            scale = (max_w / w).combine(max_h / h, min).clip(upper=1.0)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_width": w,
                    "orig_height": h,
                    "new_width": (w * scale).astype(int).clip(lower=1).astype("int32"),
                    "new_height": (h * scale).astype(int).clip(lower=1).astype("int32"),
                    "scale": scale.round(6),
                }
            )

    return blob_table.mapInPandas(resize_batches, RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_index int, frame_len int, frame_head string"


def sample_frames(
    blob_table: DataFrame, frame_size: int = 32, stride: int = 2
) -> DataFrame:
    """Frame sampling for video-like blobs: treat the payload as
    concatenated fixed-size frames, emit every ``stride``-th frame's
    index, byte length, and leading-bytes fingerprint. One input row
    fans out to many output rows — exactly the mapInPandas shape a
    real frame-decoder would use (and why this is not a scalar UDF).
    No shuffle; parallel over input partitions."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_index": [], "frame_len": [], "frame_head": []
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for i in range(0, n_frames, stride):
                    frame = b[i * frame_size : (i + 1) * frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["frame_len"].append(len(frame))
                    out["frame_head"].append(frame[:4].hex())
            yield _pd.DataFrame(out)

    return blob_table.mapInPandas(frame_batches, FRAMES_SCHEMA)

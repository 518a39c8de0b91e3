"""Multimodal feature-extraction query (beyond-reference): the
binary-column + mapInPandas plumbing exercised end-to-end. The
oracle recomputes the deterministic raw-byte features in SQL, so the
Arrow batch path is value-checked, not just shape-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.multimodal import (
    extract_blob_features,
    make_blob_table,
    resize_images,
    sample_frames,
)


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

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
)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_blob_features(make_blob_table(docs))


MULTIMODAL_FEATURES_ORACLE = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS blob_len,
           md5(text) AS blob_md5,
           lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
           CAST(n_chars % 64 + 1 AS INTEGER) AS width,
           CAST(n_chars % 48 + 1 AS INTEGER) AS height
    FROM documents
"""

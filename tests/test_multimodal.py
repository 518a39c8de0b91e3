"""Multimodal binary-column plumbing tests (mapInPandas path)."""

import pytest

from tests.conftest import assert_matches_oracle


def test_multimodal_features_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "multimodal_features", sf_dir)


def test_blob_table_schema(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.operators.multimodal import (
        make_blob_table,
    )

    bt = make_blob_table(load(spark, sf_dir, "documents"))
    assert dict(bt.dtypes)["blob"] == "binary"
    assert dict(bt.dtypes)["meta"].startswith("struct<width:int,height:int")


def test_decode_stub_raises(spark):
    from global_superstore_data_warehouse_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


@pytest.mark.parametrize("name", ["multimodal_resize", "multimodal_frame_sample"])
def test_multimodal_extra_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)

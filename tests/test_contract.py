"""Schema-contract reader over drifting producer generations
(sources/contract.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from global_superstore_data_warehouse_spark.sources.contract import (
    SchemaContractError,
    read_with_contract,
    schema_drift_report,
)

CONTRACT = StructType(
    [
        StructField("a", LongType()),      # disk has int -> widened
        StructField("b", StringType()),    # only in generation 1
        StructField("c", DoubleType()),    # only in generation 2
    ]
)


@pytest.fixture()
def drifted_dir(spark, tmp_path):
    path = str(tmp_path / "feed")
    gen1 = spark.createDataFrame(
        [(1, "x"), (2, "y")],
        StructType([StructField("a", IntegerType()), StructField("b", StringType())]),
    )
    gen1.write.parquet(path)
    gen2 = spark.createDataFrame(
        [(3, 0.5, "junk")],
        StructType(
            [
                StructField("a", IntegerType()),
                StructField("c", DoubleType()),
                StructField("z_extra", StringType()),
            ]
        ),
    )
    gen2.write.mode("append").parquet(path)
    return path


def test_drift_report_lists_every_divergence(spark, drifted_dir):
    report = dict(schema_drift_report(spark, drifted_dir, CONTRACT))
    assert report["a"].startswith("type_differs:int")
    assert report["z_extra"] == "extra_in_data"
    assert "b" not in report and "c" not in report  # present with declared types


def test_contract_read_conforms_all_generations(spark, drifted_dir):
    df = read_with_contract(spark, drifted_dir, CONTRACT)
    assert [f.name for f in df.schema.fields] == ["a", "b", "c"]
    assert dict(df.dtypes) == {"a": "bigint", "b": "string", "c": "double"}
    rows = {r["a"]: r for r in df.collect()}
    assert rows[1]["b"] == "x" and rows[1]["c"] is None
    assert rows[3]["b"] is None and rows[3]["c"] == 0.5


def test_contract_read_strict_rejects_extras(spark, drifted_dir):
    with pytest.raises(SchemaContractError, match="z_extra"):
        read_with_contract(spark, drifted_dir, CONTRACT, strict_extra=True)


def test_missing_declared_column_materializes_typed_null(spark, tmp_path):
    path = str(tmp_path / "only_gen1")
    spark.createDataFrame([(7,)], StructType([StructField("a", IntegerType())])).write.parquet(path)
    df = read_with_contract(spark, path, CONTRACT)
    r = df.first()
    assert r["a"] == 7 and r["b"] is None and r["c"] is None

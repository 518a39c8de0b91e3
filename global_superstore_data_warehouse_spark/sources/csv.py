"""CSV ingestion (S1): schema-on-read with every column string —
exactly the reference's file_fdw foreign tables
(/root/reference/Database/SRC_CONSUMER/consumer.sql:17-49: all
columns VARCHAR(255), format csv, header true, delimiter ',').

No schema inference: the caller declares column names, types come
later in the cleansing layer (F11 casts). At scale each CSV split is
an independent task; a malformed row lands in ``_corrupt_record``
rather than failing the scan (PERMISSIVE, Spark's default).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def all_string_schema(columns: Sequence[str]) -> StructType:
    return StructType([StructField(c, StringType(), True) for c in columns])


def read_csv(
    spark: SparkSession,
    path: str,
    columns: Sequence[str],
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(all_string_schema(columns))
        .option("header", True)
        .option("delimiter", delimiter)
        .csv(path)
    )

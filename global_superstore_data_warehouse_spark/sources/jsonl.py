"""JSON-lines ingestion/export (beyond-reference source format; the
reference ingests only file_fdw CSV — consumer.sql:17-49 — but a
feed-agnostic engine needs the data-lake's other lingua franca).

Scale rules, same as the CSV source:

- NO schema inference: ``spark.read.json`` without a schema runs a
  full inference scan first — at 100 TB that doubles the read. The
  caller declares the schema (DDL string or StructType).
- Malformed lines land in ``_corrupt_record`` (PERMISSIVE) instead
  of failing the scan; ``read_jsonl_strict`` opts into FAILFAST for
  pipelines that prefer loud ingestion errors.
- Writes are line-delimited (one JSON object per line), splittable
  by any downstream reader, and optionally partitioned the same way
  the parquet staging layer is (e.g. ``partition_by=["load_id"]``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema: StructType | str, spark: SparkSession) -> StructType:
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        from pyspark.sql.types import StringType, StructField

        schema = StructType(schema.fields + [StructField(CORRUPT_COL, StringType(), True)])
    return schema


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """PERMISSIVE read: well-formed rows get typed columns, malformed
    lines arrive whole in ``_corrupt_record`` with NULL data columns —
    the quarantine-and-continue shape (the reference's CSV staging has
    the same posture via all-string columns + cleansing casts).

    Spark trap: a query that references ONLY ``_corrupt_record`` on
    the raw (uncached) scan raises AnalysisException — Spark forbids
    selecting just the internal corrupt-record column from the file
    source. Either select at least one data column alongside it, or
    ``.cache()`` the returned frame first; e.g.
    ``read_jsonl(...).cache().filter('_corrupt_record IS NOT NULL')``.
    """
    return (
        spark.read.schema(_with_corrupt_col(schema, spark))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_jsonl_strict(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """FAILFAST read: any malformed line aborts the scan."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)

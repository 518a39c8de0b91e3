"""ORC source/sink — the third columnar interchange format next to
parquet (catalog default) and JSONL (sources/jsonl.py).

ORC is first-class in Spark (vectorized reader, predicate pushdown
via min/max + Bloom row-group stats, column pruning), so these
helpers are thin: their value is the engine-wide contract — explicit
schema on read (schema inference at 100 TB means a full extra pass),
partition-column layout on write, and pushdown verified by plan
tests (tests/test_orc.py asserts PushedFilters reaches the ORC
scan)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read ORC; pass ``schema`` to skip footer-sampling inference
    (with ORC the cost is footer reads, not a data pass, but an
    explicit schema also pins column types against drifting files)."""
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Write ORC with zstd (best ratio at comparable CPU; Spark's
    default is snappy). ``partition_by`` lays out hive-style
    directories so downstream filters partition-prune."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)

"""Schema-contract reader: ingest a directory whose files were
written across schema generations (drifting producers) and present
them under ONE declared contract.

Real feeds drift: producers add columns, retire columns, widen types.
A 100 TB table accumulates every generation side by side, and a plain
``spark.read.parquet`` either fails or silently drops/NULLs columns
depending on which file seeds the inferred schema. The contract
reader makes the policy explicit:

- declared columns present in the data are CAST to the contract type
  (widening int→long, float→double — cheap codegen'd casts);
- declared columns missing from the data materialize as typed NULLs
  (so downstream plans never see a missing-column error mid-backfill);
- undeclared extra columns are dropped by default, or rejected with
  ``strict_extra=True`` when the pipeline wants loud failure;
- ``schema_drift_report`` lists every divergence first, so the
  ingest job can log/alert before committing to a read.

``mergeSchema=true`` makes the underlying scan union all footer
schemas (one extra metadata pass at planning time — footer-sized, not
data-sized). The reference's staging layer solves the same problem by
degrading everything to VARCHAR staging columns
(consumer.sql:17-49); the contract reader keeps types and makes the
drift policy inspectable instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SchemaContractError(ValueError):
    """Raised when the data violates the declared contract."""


def schema_drift_report(
    spark: SparkSession, path: str, contract: StructType
) -> list[tuple[str, str]]:
    """Every divergence between the merged on-disk schema and the
    contract, as (column, status) with status in
    {'missing_in_data', 'extra_in_data', 'type_differs:<disk>'}."""
    disk = spark.read.option("mergeSchema", "true").parquet(path).schema
    disk_by_name = {f.name: f for f in disk.fields}
    declared = {f.name for f in contract.fields}
    report: list[tuple[str, str]] = []
    for f in contract.fields:
        if f.name not in disk_by_name:
            report.append((f.name, "missing_in_data"))
        elif disk_by_name[f.name].dataType != f.dataType:
            report.append(
                (f.name, f"type_differs:{disk_by_name[f.name].dataType.simpleString()}")
            )
    for name in disk_by_name:
        if name not in declared:
            report.append((name, "extra_in_data"))
    return report


def read_with_contract(
    spark: SparkSession,
    path: str,
    contract: StructType,
    strict_extra: bool = False,
) -> DataFrame:
    """Read ``path`` and conform every row to ``contract`` (column
    order, names, types). See the module docstring for the policy."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    present = set(df.columns)
    declared = {f.name for f in contract.fields}
    extra = sorted(present - declared)
    if extra and strict_extra:
        raise SchemaContractError(f"undeclared columns in data: {extra}")
    cols = [
        (
            F.col(f.name).cast(f.dataType)
            if f.name in present
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in contract.fields
    ]
    return df.select(*cols)

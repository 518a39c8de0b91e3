"""Audit-log sink (S9/C7): one row per pipeline step — procedure
name, rowcount, message, load_id, timestamp — appended to a parquet
log table (InsertLog, /root/reference/Database/BL_3NF/bl_3nf.sql:23-35
and dm_InsertLog, bl_dm.sql:23-35)."""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

LOG_SCHEMA = (
    "procedure_name string, rows_affected long, message string, "
    "load_id long, logged_at timestamp"
)


def log_step(
    spark: SparkSession,
    log_path: str,
    procedure_name: str,
    rows_affected: int,
    message: str,
    load_id: int,
) -> None:
    row = [
        (
            procedure_name,
            rows_affected,
            message,
            load_id,
            datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None),
        )
    ]
    spark.createDataFrame(row, LOG_SCHEMA).coalesce(1).write.mode("append").parquet(log_path)


def read_log(spark: SparkSession, log_path: str) -> DataFrame:
    return spark.read.parquet(log_path)

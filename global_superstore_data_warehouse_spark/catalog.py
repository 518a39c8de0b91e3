"""Table catalog over the driver-provided parquet test tables.

The reference declares fixed schemas for every table (see
/root/reference/Database/BL_3NF/bl_3nf.sql); here the fixed schemas
live in the parquet footers and we simply bind names → paths.
``load`` returns lazy DataFrames so Catalyst can push filters and
prune columns all the way into the parquet scan.
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one table; column pruning + predicate
    pushdown happen automatically downstream.

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS)
    (Spark's vectorized reader rejects it; read as nanos-long via the
    legacy conf and convert) and as a plain TIMESTAMP(MICROS) column
    (usable as-is) across driver data generations — normalize here so
    every consumer sees a microsecond TimestampType either way.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer `div`, NOT float division: ns epochs (~1.7e18)
            # lose precision in a double and events drift ±1µs across
            # window boundaries
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


@_lru_cache(maxsize=512)
def table_rows(sf_dir: str, name: str) -> int:
    """Row count from the parquet FOOTERS — the miniature of a
    metastore table statistic: driver-side metadata only, no Spark
    job, no data scan (milliseconds even over thousands of part
    files, since only footers are touched). Cost-based join gating
    (``hints.maybe_broadcast(n_rows=...)``) rides on this, exactly
    how a production engine consults catalog statistics to pick a
    join strategy instead of paying a runtime COUNT or letting AQE
    discover the size only AFTER the big side's shuffle map stage
    has already been written. Cached: the test tables are immutable
    per (sf_dir, name)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows
            for dirpath, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows

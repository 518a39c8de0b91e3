"""Bucketed table layout for co-located joins (SURVEY §4 /
100 TB design): the lineitem ⋈ orders shuffle — the one unavoidable
big-big join in every star query — disappears entirely when both
tables are written bucketed by the join key.

``write_bucketed`` persists a DataFrame with ``bucketBy(n, key)`` +
``sortBy(key)`` into the session catalog (parquet under
``spark.sql.warehouse.dir``). Readers joining two tables bucketed on
the same key with the same bucket count get a SortMergeJoin with NO
Exchange on either side — verified by ``tests/test_bucketed.py``'s
plan assertion.

At 100 TB: bucket count is chosen so a bucket of the larger table
fits an executor's memory (e.g. 4096 buckets for ~25 GB/bucket);
every nightly fact rebuild and every fact-to-fact reconciliation
join then runs shuffle-free, which is normally the single largest
cost in the pipeline.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 8,
) -> None:
    """Persist ``df`` bucketed+sorted by ``bucket_key`` as a catalog
    table (overwriting any previous version; orphaned managed-table
    locations from crashed runs are cleared first)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_key)
        .sortBy(bucket_key)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_left: str,
    key_right: str,
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys —
    planner emits a shuffle-free SortMergeJoin."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])

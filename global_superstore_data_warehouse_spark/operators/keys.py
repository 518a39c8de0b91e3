"""Surrogate-key generation (SURVEY §2.6).

The reference uses Postgres BIGSERIAL sequences
(/root/reference/Database/BL_3NF/bl_3nf.sql:44 etc.). Spark has no
sequences; we produce *deterministic, dense, gap-free* ids so
incremental loads and the DuckDB oracle both see stable keys.

Two paths:

- ``add_surrogate_key`` — single global-window ``row_number``. Fine
  for dimensions (≤ millions of rows) but the global sort collapses
  to ONE partition: do not use on fact-scale inputs.
- ``add_surrogate_key_distributed`` — scale path. Range-repartition
  on the ordering key, count rows per partition (a P-row action),
  broadcast the cumulative offsets back, then ``row_number`` within
  each partition. Every step is partition-parallel; the only
  driver-side data is one count per partition. Same output as the
  global window whenever the ordering key is unique.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(order_by: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def add_surrogate_key(
    df: DataFrame,
    order_by: Sequence[str | Column],
    name: str = "sk",
    offset: int = 0,
) -> DataFrame:
    """Dense ids via row_number over a global ordering — the
    small-dimension path (mirrors BIGSERIAL + deterministic insert
    order)."""
    w = Window.orderBy(*_cols(order_by))
    return df.withColumn(name, (F.row_number().over(w) + F.lit(offset)).cast("long"))


def add_surrogate_key_auto(
    df: DataFrame,
    order_by: Sequence[str],
    name: str = "sk",
    offset: int = 0,
    n_rows: int | None = None,
    max_window_rows: int = 5_000_000,
) -> DataFrame:
    """Size-gated path choice, same philosophy as
    ``operators/hints.maybe_broadcast``: the distributed path costs
    3-4 fixed Spark jobs (range-sample, checkpoint, partition count)
    that dominate when the input is dimension-sized, while the global
    window costs a single-partition sort that only hurts past
    millions of rows. Below the gate use the window; above it the
    SAME call degrades to the distributed path — no code change when
    the dimension outgrows the gate. Pass ``n_rows`` when known (a
    parquet count() is metadata-only) to avoid an extra action. The
    two paths are output-identical for unique keys (equivalence is
    pinned in tests/test_warehouse.py)."""
    n = df.count() if n_rows is None else n_rows
    if n <= max_window_rows:
        return add_surrogate_key(df, order_by, name=name, offset=offset)
    return add_surrogate_key_distributed(df, order_by, name=name, offset=offset)


def add_surrogate_key_distributed(
    df: DataFrame,
    order_by: Sequence[str],
    name: str = "sk",
    offset: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense deterministic ids without a global sort.

    Requires the ordering key to be unique (true for every natural
    key in the warehouse — enforced upstream by dedup); ties across
    a range boundary would otherwise make ids non-deterministic.
    """
    spark = df.sparkSession
    cols = _cols(order_by)
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # eager localCheckpoint, not persist(): pins the partitioning so
    # the count job and the output job see identical __pid values,
    # without leaving an unreleased cache entry behind (the blocks
    # free when this frame is garbage-collected)
    part = part.localCheckpoint(eager=True)
    counts = (
        part.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    acc = 0
    rows = []
    for r in sorted(counts, key=lambda r: r["__pid"]):
        rows.append((r["__pid"], acc))
        acc += r["cnt"]
    offsets = spark.createDataFrame(rows or [], "__pid int, __offset long")
    w = Window.partitionBy("__pid").orderBy(*cols)
    out = (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(
            name,
            (F.row_number().over(w) + F.col("__offset") + F.lit(offset)).cast("long"),
        )
        .drop("__pid", "__offset")
    )
    return out

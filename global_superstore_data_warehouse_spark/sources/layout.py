"""Storage-layout optimization (100 TB design): range-sorted writes,
Z-order clustering, small-file compaction, and a file-level min/max
data-skipping index.

At 100 TB the scan is the query: a table laid out so that each file
covers a NARROW range of the filter columns lets the reader skip
whole files (and, inside a file, parquet row groups via the pushed
predicate), turning a full-table scan into a few-file read. The
reference gets this only for the fact's year partitions
(bl_cl.sql:1147-1187 yearly partition machinery); this module
generalizes it:

- ``write_range_sorted`` — global range partitioning + in-file sort
  on ONE key set: perfect skipping for that key, the layout behind
  time-series and append-only fact tables.
- ``write_zordered`` — Morton (Z-order) interleaving of TWO keys so
  file min/max ranges stay tight on BOTH dimensions at once: the
  multi-column clustering trade (each dimension's ranges widen
  ~sqrt-fold vs its dedicated sort, but every clustered column
  skips, not just the first). The curve key is pure JVM bit
  arithmetic (shift/AND spreads) — whole-stage codegen, no UDF.
- ``file_skipping_stats`` / ``prune_files`` — the min/max-per-file
  index a lakehouse keeps in its manifest (Delta/Iceberg style),
  built here with one grouped scan over ``input_file_name()``; the
  pruner is bounded-metadata (file list on the driver — the same
  class of driver-side work as any catalog's manifest read).
- ``compact_files`` — rewrite a many-small-files table to
  ``target_files`` outputs, preserving (re-imposing) the sort; small
  files are the classic long-tail killer: per-file open/footer cost
  dominates under ~64 MB.

All writers are deterministic (no RNG, no timestamp) so re-runs are
byte-stable modulo parquet metadata.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZBITS = 16  # per-dimension resolution of the Z-curve (2 dims x 16 = 32-bit key)


def _spread16(x: Column) -> Column:
    """Interleave-ready bit spread: the low 16 bits of ``x`` move to
    the even bit positions of a 32-bit lane (classic mask-shift
    cascade, all JVM bitwise ops)."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(a: Column, b: Column) -> Column:
    """Morton (Z-order) interleave of two already-normalized
    ``[0, 2^ZBITS)`` integer columns: bit i of ``a`` lands at curve
    bit 2i, bit i of ``b`` at 2i+1. Locality property: points sharing
    their top k bits in BOTH dimensions share the curve key's top 2k
    bits, so a curve-sorted layout keeps both dimensions' file
    min/max ranges tight."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1)).cast("long")


def _normalized(df: DataFrame, col: str) -> Column:
    """Min/max-scale ``col`` into the Z-curve's ``[0, 2^ZBITS)`` grid.
    The two-value min/max aggregate is bounded metadata (the same
    scan Delta's OPTIMIZE ZORDER runs before clustering); it rides a
    scalar subquery-free local collect because the result is exactly
    one tiny row."""
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    span = max(hi - lo, 1)
    return F.least(
        F.lit((1 << ZBITS) - 1),
        ((F.col(col) - F.lit(lo)).cast("double") / span * ((1 << ZBITS) - 1)).cast(
            "int"
        ),
    )


def write_range_sorted(
    df: DataFrame, path: str, sort_cols: list[str], num_files: int
) -> None:
    """Globally range-partition on ``sort_cols`` into ``num_files``
    files, each internally sorted — disjoint per-file key ranges, the
    ideal single-dimension skipping layout. The range exchange
    samples partition bounds (one extra lightweight job), then each
    task writes one sorted file; no global sort materializes."""
    (
        df.repartitionByRange(num_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, num_files: int
) -> None:
    """Cluster ``df`` on the Z-curve over ``(col_a, col_b)`` and
    write ``num_files`` curve-range files. Both columns must be
    numeric; each is min/max-normalized onto the curve grid. The
    curve key is dropped from the output (it is a layout artifact,
    not data)."""
    zk = morton_key(_normalized(df, col_a), _normalized(df, col_b))
    (
        df.withColumn("__zkey", zk)
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skipping_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Build the per-file min/max index over ``cols`` — one grouped
    scan keyed by ``input_file_name()`` (file count × column count
    rows: manifest-sized, not data-sized). A lakehouse table format
    keeps exactly this in its metadata; for plain parquet we build it
    once after each (re)write."""
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def prune_files(stats: DataFrame, col: str, lo, hi) -> list[str]:
    """Files whose ``[min_col, max_col]`` envelope intersects
    ``[lo, hi]`` — the candidate read set for that range predicate.
    Driver-side by design: the stats frame is manifest-sized."""
    keep = stats.filter(
        ~((F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi)))
    )
    return [r["file"] for r in keep.select("file").collect()]


def read_pruned(spark: SparkSession, files: list[str]) -> DataFrame:
    """Scan exactly the pruned file set (the reader still applies the
    residual predicate — pruning is a superset guarantee, min/max
    envelopes admit false positives, never false negatives)."""
    if not files:
        raise ValueError("prune_files returned no candidate files")
    return spark.read.parquet(*files)


def compact_files(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Rewrite ``path`` into ``target_files`` outputs (re-imposing
    ``sort_cols`` clustering when given) via write-to-side + swap —
    the compaction job every small-file-accreting table needs. The
    swap is atomic at the directory-rename level, the same contract a
    non-transactional Hive compaction gives; at 100 TB the swap-in is
    a lakehouse OPTIMIZE with snapshot isolation."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp"
    if sort_cols:
        write_range_sorted(df, tmp, sort_cols, target_files)
    else:
        df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    import shutil

    old = path.rstrip("/") + ".__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)

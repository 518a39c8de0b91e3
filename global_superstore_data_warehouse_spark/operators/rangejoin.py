"""Bucketed range/interval join (beyond-reference custom operator).

Open-source Spark has no native range-join optimization: a raw
``points JOIN intervals ON ts BETWEEN start AND end`` plans as a
BroadcastNestedLoopJoin (or worse, a cartesian product) — quadratic,
and the classic 100 TB scale-killer. The standard fix is coarse
TIME-BUCKET BLOCKING:

1. explode each interval to the fixed-width buckets it overlaps;
2. bucket each point by the same width;
3. equi-join on the bucket (hash join — shuffle or broadcast, AQE's
   choice) with the exact range predicate as the residual condition.

Each point matches exactly one bucket of any interval it falls in,
so no post-join dedup is needed. Cost scales with
points + intervals x avg_buckets_per_interval, not their product;
the bucket width trades fan-out (small buckets -> many interval
rows) against residual selectivity (large buckets -> more filtered
candidates). Pick the width near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def _bucket(ts: Column, width_seconds: int) -> Column:
    # true integer floor division on epoch seconds (`/` in Spark is
    # double division and cast('long') truncates toward zero, which
    # would double-width the bucket straddling epoch 0 for pre-1970
    # timestamps; floor is exact everywhere and identical across
    # engines)
    return F.floor(F.unix_timestamp(ts) / width_seconds).cast("long")


def bucketed_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    width_seconds: int = 3600,
    how: str = "left",
) -> DataFrame:
    """Join each point to every interval with
    ``start <= ts < end`` (half-open), via bucket blocking.

    Returns interval columns + the matched point's columns.
    ``how='inner'`` is the clean pair list (only real matches);
    ``how='left'`` additionally emits EXACTLY ONE all-NULL-point row
    per interval that matched no point at all — the same contract as
    a naive ``LEFT JOIN ... ON ts BETWEEN`` — implemented as the
    inner join plus a left-anti reattach of the fully-unmatched
    intervals (an earlier version leaked one NULL row per empty
    *bucket*, fine for ``count(point_col)`` aggregates but wrong for
    row-level consumers). Column names must not collide across the
    two inputs (the engine-wide convention); duplicate interval rows
    are preserved."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"bucketed_interval_join supports inner/left, got {how!r}")
    iv = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), width_seconds),
                # end is exclusive, but a point in the same bucket as
                # `end` can still precede it — include the end bucket
                _bucket(F.col(end_col), width_seconds),
            )
        ),
    )
    pt = points.withColumn(BUCKET_COL, _bucket(F.col(ts_col), width_seconds))
    cond = (
        (iv[BUCKET_COL] == pt[BUCKET_COL])
        & (pt[ts_col] >= iv[start_col])
        & (pt[ts_col] < iv[end_col])
    )
    inner = iv.join(pt, cond, "inner").drop(BUCKET_COL)
    if how == "inner":
        return inner
    # left: reattach intervals with no match in ANY bucket, one NULL
    # row each. The anti-join keys on every interval column
    # (NULL-safe), so identical duplicate rows survive together.
    matched = inner.select(*intervals.columns).dropDuplicates().alias("__iv_hit")
    all_iv = intervals.alias("__iv_all")
    anti_cond = [
        F.col(f"__iv_all.{c}").eqNullSafe(F.col(f"__iv_hit.{c}"))
        for c in intervals.columns
    ]
    missing = all_iv.join(matched, anti_cond, "left_anti").select("__iv_all.*")
    for f in points.schema.fields:
        missing = missing.withColumn(f.name, F.lit(None).cast(f.dataType))
    return inner.unionByName(missing)

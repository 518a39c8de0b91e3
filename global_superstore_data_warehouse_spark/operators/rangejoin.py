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
    # integer arithmetic on epoch seconds: exact, and identical
    # across engines
    return (F.unix_timestamp(ts) / width_seconds).cast("long")


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

    Returns interval columns + the matched point's columns. With
    ``how='left'`` an interval with no match in SOME bucket emits a
    NULL row for each empty bucket — harmless for aggregate
    consumers (``count(point_col)`` / ``count(DISTINCT ...)`` ignore
    NULLs, so empty intervals count 0) but not a clean pair list;
    use ``how='inner'`` for pair-list output. Column names must not
    collide across the two inputs (the engine-wide convention)."""
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
    return iv.join(pt, cond, how).drop(BUCKET_COL)

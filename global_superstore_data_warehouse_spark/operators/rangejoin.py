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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    width_seconds: int = 3600,
) -> DataFrame:
    """INTERVAL x INTERVAL overlap join (half-open semantics:
    ``l_start < r_end AND r_start < l_end``), bucket-blocked like
    ``bucketed_interval_join`` — the raw inequality join would plan
    as a nested loop.

    All four bound columns are EPOCH-SECONDS LONGs (integer `div`
    bucketing — no float anywhere; truncating, see below). Both
    sides explode
    to the buckets they cover; the equi-join on the bucket finds
    co-located candidates; the residual predicate keeps true
    overlaps; and the RESPONSIBILITY condition
    ``bucket == greatest(l_start, r_start) div width`` emits each
    overlapping pair EXACTLY ONCE with no post-join dedup: the
    overlap's first instant lies inside both intervals, so both
    sides provably exploded its bucket, and it is unique per pair.
    Inner join only (pair consumers reattach empties themselves —
    see events_in_maintenance_windows for the pattern). Column names
    must not collide across inputs.
    """

    # `div` is integer division TRUNCATING toward zero (`/` on longs
    # would be double division in Spark) — not floor division: for
    # negative epochs bucket 0 spans (-width, width), i.e. is wider.
    # Correctness only needs `div` to be monotone non-decreasing and
    # applied identically on both explode and responsibility sides
    # (property-tested over negative epochs); fixed-width bucket math
    # must NOT be layered on top of this. Include the end bucket — a
    # bound inside it can still precede the (exclusive) end
    l_bucket, r_bucket = f"{BUCKET_COL}_l", f"{BUCKET_COL}_r"
    lb = left.withColumn(
        l_bucket,
        F.explode(
            F.expr(f"sequence({l_start} div {width_seconds}, {l_end} div {width_seconds})")
        ),
    )
    rb = right.withColumn(
        r_bucket,
        F.explode(
            F.expr(f"sequence({r_start} div {width_seconds}, {r_end} div {width_seconds})")
        ),
    )
    cond = (
        (lb[l_bucket] == rb[r_bucket])
        & (lb[l_start] < rb[r_end])
        & (rb[r_start] < lb[l_end])
        # responsibility: only the bucket holding the overlap's first
        # instant emits the pair
        & (lb[l_bucket] == F.expr(f"greatest({l_start}, {r_start}) div {width_seconds}"))
    )
    return lb.join(rb, cond, "inner").drop(l_bucket, r_bucket)

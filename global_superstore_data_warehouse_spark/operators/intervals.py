"""Interval-union (coverage) operator — merge overlapping half-open
intervals per key and report the merged islands.

The sweep-line classic as ONE key-partitioned sort: order each key's
intervals by (start, end, id) — a TOTAL order, so the running max of
interval ends over strictly-preceding rows is deterministic for any
input, including ties, nesting, and touching intervals — then a new
island starts exactly where the current start strictly clears that
max, and the island id is a running sum of start flags. Two further
aggregates (per-island, per-key) reuse the SAME partitioning — the
whole plan is one exchange on the key.

Half-open convention: [s, e) with e > s (empty intervals are the
caller's to filter). Intervals TOUCHING at a point (next.s == prev.e)
are merged — the union of [1,2) and [2,3) is the gapless [1,3) —
which is the `s > prev_max_e` test: a strict gap requires
s strictly beyond every earlier end.

Used by plans/events.user_activity_coverage (fixed-width activity
windows); property-tested against a brute-force union on arbitrary
random interval sets (tests/test_interval_union_properties.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_union_islands(
    df: DataFrame,
    key_cols: Sequence[str],
    s_col: str,
    e_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per merged island: key cols + (island, n_intervals,
    i_start, i_end). ``order_cols`` extends the sort key past
    (s, e) for callers that want a specific total order; correctness
    needs none (ties share their island membership either way — the
    flag-sum numbering is order-invariant across tied rows).
    """
    keys = list(key_cols)
    order = Window.partitionBy(*keys).orderBy(
        s_col, e_col, *order_cols
    )
    prev_max_e = F.max(e_col).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new_island",
        F.when(prev_max_e.isNull() | (F.col(s_col) > prev_max_e), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("_new_island").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy(*keys, "island").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.min(s_col).alias("i_start"),
        F.max(e_col).alias("i_end"),
    )


def interval_union_coverage(
    df: DataFrame,
    key_cols: Sequence[str],
    s_col: str,
    e_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key coverage summary over the merged islands: interval
    count, island count, union length, first-to-last span, and the
    coverage ratio."""
    keys = list(key_cols)
    islands = interval_union_islands(df, keys, s_col, e_col, order_cols)
    return islands.groupBy(*keys).agg(
        F.sum("n_intervals").alias("n_events"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("i_end") - F.col("i_start")).alias("covered_s"),
        (F.max("i_end") - F.min("i_start")).alias("span_s"),
        F.round(
            F.sum(F.col("i_end") - F.col("i_start"))
            / (F.max("i_end") - F.min("i_start")),
            6,
        ).alias("coverage_ratio"),
    )

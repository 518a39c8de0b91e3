"""Declarative data-quality checks (the engine-native form of the
reference's constraint-based invariants — NOT NULL / CHECK / UNIQUE /
FK, SURVEY §5.2, bl_3nf.sql:48,60,72 — which Spark tables do not
enforce; validation becomes an explicit, auditable operator).

``column_rules`` evaluates ANY number of row-level predicates in ONE
scan: each rule is a conditional count inside a single aggregation,
so adding rules costs arithmetic, not passes. Referential and
uniqueness checks need their own shuffle (anti-join / groupBy) and
are composed alongside.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_rules(df: DataFrame, rules: Sequence[tuple[str, Column]]) -> DataFrame:
    """One row per rule: (rule_name, violations, total). ``rules``
    maps rule name → VIOLATION predicate (true = bad row). Single
    scan, map-side partial aggregation."""
    aggs = [F.count(F.lit(1)).alias("total")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"__v{i}")
        for i, (_, cond) in enumerate(rules)
    ]
    row = df.agg(*aggs)
    out = None
    for i, (name, _) in enumerate(rules):
        r = row.select(
            F.lit(name).alias("rule_name"),
            F.col(f"__v{i}").cast("long").alias("violations"),
            F.col("total").cast("long").alias("total"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def referential_rule(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, name: str
) -> DataFrame:
    """FK orphan check: child rows whose key has no parent (the
    reference's FOREIGN KEY constraints). Anti-join — broadcast when
    the parent is small, shuffle otherwise (planner's call).

    Fully lazy: no job runs until the report DataFrame is acted on
    (a construction-time count would fire driver-side jobs merely
    assembling dq_report). The two single-row aggregates combine
    with a 1×1 cross join — constant-size, not a cartesian risk."""
    total = child.agg(F.count(F.lit(1)).cast("long").alias("total"))
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .join(parent.select(F.col(parent_key).alias("k")), "k", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return orphans.crossJoin(total).select(
        F.lit(name).alias("rule_name"), "violations", "total"
    )


def uniqueness_rule(df: DataFrame, keys: Sequence[str], name: str) -> DataFrame:
    """Natural-key uniqueness (the reference's UNIQUE constraints):
    counts rows carrying a duplicated key.

    Lazy, single shuffle: one groupBy computes per-key counts; a
    second (single-partition, constant-size) aggregation folds them
    into (violations, total) without a separate df.count() job."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.lit(name).alias("rule_name"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("violations"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("total"),
    )

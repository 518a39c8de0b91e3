"""Upsert / SCD merge operators (SURVEY §2.4 J5/S6, §2.9).

The reference uses Postgres ``ON CONFLICT DO UPDATE`` (SCD1,
bl_cl.sql:439) and two-phase ``MERGE`` (SCD2, bl_cl.sql:806-875,
879-1037, 1042-1139). Spark-on-Parquet has no ACID MERGE, so both
are expressed as join + when/otherwise producing the complete new
table state — an idempotent full-rewrite merge. The same logical
plan drops onto Delta ``MERGE`` unchanged when a lakehouse format is
available; at 100 TB the rewrite cost is bounded by partitioning the
dim on a stable key bucket so only touched partitions rewrite.

Deviation (deliberate, SURVEY §2.9): the reference's insert-MERGE
only matches on the open version, so a row closed in phase 1 gets
its replacement version on the *next* run. We implement correct
same-run SCD2: close + insert in one pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _any_attr_changed(left: str, right: str, attrs: Sequence[str]) -> F.Column:
    """NULL-safe "any tracked attribute differs" predicate."""
    cond = F.lit(False)
    for a in attrs:
        cond = cond | ~F.col(f"{left}.{a}").eqNullSafe(F.col(f"{right}.{a}"))
    return cond


def scd1_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
) -> DataFrame:
    """SCD1 upsert (S6): source rows overwrite matching target rows'
    attributes; unmatched source rows insert; untouched target rows
    pass through. Returns the full new table state with an
    ``is_updated`` marker column (the reference sets UPDATE_DT —
    callers stamp it from this flag so the op itself stays
    deterministic/testable).

    Plan: one full-outer shuffle join on the natural key; both
    branches then resolve with coalesce — no second pass.
    """
    keys = list(keys)
    t = target.alias("t")
    s = source.dropDuplicates(keys).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, on=cond, how="full_outer")
    matched = F.col(f"s.{keys[0]}").isNotNull() & F.col(f"t.{keys[0]}").isNotNull()
    sel = [F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in keys]
    sel += [F.coalesce(F.col(f"s.{a}"), F.col(f"t.{a}")).alias(a) for a in attrs]
    sel.append(matched.alias("is_updated"))
    return joined.select(*sel)


def scd2_merge(
    dim: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    effective_date: str = "2024-01-01",
    end_col: str = "end_dt",
    start_col: str = "start_dt",
    active_col: str = "is_active",
) -> DataFrame:
    """Two-phase SCD2 merge (§2.9) as one full-rewrite pass.

    Input ``dim`` carries key + attrs + start/end/is_active; ``source``
    carries key + attrs. Output = new full dim state:

    - closed history rows: pass through untouched;
    - open rows whose source attrs changed: closed
      (end_dt = effective_date, is_active = false)  [phase 1,
      bl_cl.sql:833-837];
    - new versions for changed keys + first versions for brand-new
      keys: start_dt = effective_date, end_dt = 9999-12-31, active
      [phase 2, bl_cl.sql:856-868];
    - open rows with no change: pass through.

    ``effective_date`` is a parameter (the reference uses now();
    injectable here so runs are deterministic and oracle-checkable).

    Plan: the dim is split by the is_active flag (one scan, no
    shuffle); open ⟕ source is one shuffle join on the natural key;
    outputs are union-all (no shuffle). Invariant preserved: exactly
    one open row per key.
    """
    keys = list(keys)
    eff = F.to_date(F.lit(effective_date))
    sentinel = F.to_date(F.lit("9999-12-31"))
    out_cols = keys + list(attrs) + [start_col, end_col, active_col]

    closed_history = dim.filter(~F.col(active_col)).select(*out_cols)
    open_rows = dim.filter(F.col(active_col))
    src = source.dropDuplicates(keys).select(*keys, *attrs)

    o = open_rows.alias("o")
    s = src.alias("s")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    j = o.join(s, on=cond, how="full_outer")
    in_src = F.col(f"s.{keys[0]}").isNotNull()
    in_dim = F.col(f"o.{keys[0]}").isNotNull()
    changed = in_src & in_dim & _any_attr_changed("o", "s", attrs)

    # open rows: unchanged or absent-from-source → pass through;
    # changed → closed-out version.
    open_out = j.filter(in_dim).select(
        *[F.col(f"o.{k}").alias(k) for k in keys],
        *[F.col(f"o.{a}").alias(a) for a in attrs],
        F.col(f"o.{start_col}").alias(start_col),
        F.when(changed, eff).otherwise(F.col(f"o.{end_col}")).alias(end_col),
        F.when(changed, F.lit(False)).otherwise(F.lit(True)).alias(active_col),
    )
    # new versions: changed keys + brand-new keys.
    new_out = j.filter(changed | (in_src & ~in_dim)).select(
        *[F.col(f"s.{k}").alias(k) for k in keys],
        *[F.col(f"s.{a}").alias(a) for a in attrs],
        eff.alias(start_col),
        sentinel.alias(end_col),
        F.lit(True).alias(active_col),
    )
    return closed_history.unionByName(open_out).unionByName(new_out)

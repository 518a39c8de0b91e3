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

    NULL semantics match the reference's ``ON CONFLICT DO UPDATE SET
    col = EXCLUDED.col`` (bl_cl.sql:439): on a key match the source
    value wins UNCONDITIONALLY, including an explicit source NULL
    overwriting a non-NULL target value. (The round-1 implementation
    coalesced per attribute, silently keeping the old value on
    source NULL — a divergence its oracle mirrored, so parity could
    not catch it.)

    Plan: one full-outer shuffle join on the natural key; the
    source-presence flag picks the winning side per row — no second
    pass.
    """
    keys = list(keys)
    t = target.alias("t")
    s = source.dropDuplicates(keys).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, on=cond, how="full_outer")
    in_src = F.col(f"s.{keys[0]}").isNotNull()
    in_tgt = F.col(f"t.{keys[0]}").isNotNull()
    sel = [F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in keys]
    sel += [
        F.when(in_src, F.col(f"s.{a}")).otherwise(F.col(f"t.{a}")).alias(a)
        for a in attrs
    ]
    sel.append((in_src & in_tgt).alias("is_updated"))
    return joined.select(*sel)


def scd2_propagate(
    dm: DataFrame,
    nf: DataFrame,
    version_cols: Sequence[str],
    start_col: str = "start_dt",
    end_col: str = "end_dt",
    active_col: str = "is_active",
) -> DataFrame:
    """Propagate a 3NF SCD2 dim into its DM-layer copy — the
    reference's Dm_Products / Dm_Customers pattern (bl_cl.sql:
    1806-2067): phase 1 closes DM-active rows whose version (natural
    key + tracked attrs) was closed in 3NF, taking the 3NF close
    date; phase 2 inserts 3NF-active versions with no DM-active
    match, carrying the 3NF validity window. FK re-keying to the
    DM's own sub-dims is the caller's join (the reference's
    subcategory remap, bl_cl.sql:1858-1860) — this operator owns
    only the version algebra.

    ``version_cols`` must include every tracked attribute, not just
    the natural key: the reference matches on (Product_NR,
    Product_name) so a changed attribute produces a distinct version
    identity — matching on the key alone would both miss the close
    and suppress the insert.

    Plan: DM splits by the active flag in one scan; phase 1 is a
    left join of DM-active against the closed-version deltas
    aggregated per version identity (max end_dt — idempotent if a
    version closed twice in history); phase 2 is a left-anti join of
    3NF-active against DM-active. Both shuffles key on the version
    identity; outputs reassemble with union-all. Invariant: applying
    propagation to a DM in sync with the pre-load 3NF state yields
    exactly the post-load 3NF state.
    """
    version = list(version_cols)
    sentinel = F.to_date(F.lit("9999-12-31"))
    out_cols = version + [start_col, end_col, active_col]

    dm_closed = dm.filter(~F.col(active_col)).select(*out_cols)
    dm_open = dm.filter(F.col(active_col)).select(*out_cols)

    closed_deltas = (
        nf.filter((~F.col(active_col)) & (F.col(end_col) != sentinel))
        .groupBy(*version)
        .agg(F.max(end_col).alias("_nf_end"))
    )
    closed_out = dm_open.join(closed_deltas, on=version, how="left").select(
        *version,
        F.col(start_col),
        F.coalesce("_nf_end", F.col(end_col)).alias(end_col),
        F.col("_nf_end").isNull().alias(active_col),
    )
    inserts = (
        nf.filter(F.col(active_col))
        .select(*out_cols)
        .join(dm_open.select(*version), on=version, how="left_anti")
    )
    return dm_closed.unionByName(closed_out).unionByName(inserts)


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

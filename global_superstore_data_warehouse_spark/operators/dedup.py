"""Dedup & set-operation operators (SURVEY §2.5 A1/A6, §2.7 U1/U2,
§2.4 J3/J4; replaces the reference's UNIQUE-constraint + ON CONFLICT
machinery, which Spark intentionally lacks).

All are shuffle-on-key operations; at scale the groupBy/dropDuplicates
shuffle is the cost and AQE coalesces post-shuffle partitions. The
anti-join idiom broadcasts whichever side is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION (distinct) of two conformed sources (U1, bl_cl.sql:319,416,...).

    `unionByName` guards against the positional-union footgun; the
    distinct is a single hash-aggregate shuffle with map-side partial
    dedup."""
    return a.unionByName(b).distinct()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL (U2, bl_cl.sql:473) — no shuffle at all."""
    return a.unionByName(b)


def new_rows(src: DataFrame, target: DataFrame, keys: Sequence[str]) -> DataFrame:
    """INSERT … ON CONFLICT DO NOTHING, set-based (S5/J4,
    bl_cl.sql:356,483,...): rows of ``src`` whose natural key is not
    already in ``target``. Within-batch dedup on the key first (the
    reference gets this from the UNIQUE constraint itself)."""
    return src.dropDuplicates(list(keys)).join(
        target.select(*keys), on=list(keys), how="left_anti"
    )


def full_outer_coalesce(
    a: DataFrame, b: DataFrame, keys: Sequence[str], cols: Sequence[str]
) -> DataFrame:
    """FULL OUTER JOIN + per-column COALESCE merge of two sources
    describing the same entities (J3/P7, bl_cl.sql:346-355), with
    ``a`` (the reference's consumer feed) winning ties."""
    keys = list(keys)
    # Explicit aliases: both inputs may share lineage (e.g. two
    # filters of the same scan), which would otherwise collapse the
    # join condition into a trivially-true self-compare.
    a, b = a.alias("__fo_l"), b.alias("__fo_r")
    sel = [
        F.coalesce(F.col(f"__fo_l.{k}"), F.col(f"__fo_r.{k}")).alias(k) for k in keys
    ] + [F.coalesce(F.col(f"__fo_l.{c}"), F.col(f"__fo_r.{c}")).alias(c) for c in cols]
    cond = [F.col(f"__fo_l.{k}").eqNullSafe(F.col(f"__fo_r.{k}")) for k in keys]
    return a.join(b, on=cond, how="full_outer").select(*sel)


def check_duplicates(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """QA duplicate detector (C8/A6, bl_cl.sql:2217-2226): offending
    keys with their multiplicities."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(
    df: DataFrame, on: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact content dedup by hash of ``on`` (beyond-reference,
    training-data pipeline): group identical content, keep the
    min/max id as canonical. One shuffle on the content hash —
    hashing first keeps the shuffle key fixed-width at 100 TB."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(F.md5(F.col(on)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(agg.alias("canonical_id"), F.count(F.lit(1)).alias("copies"))
    )

"""Delta Lake MERGE variants of the SCD operators (SURVEY §2.9's
"at 100 TB switch to ACID MERGE" swap-in, made executable).

``operators/merge.py`` expresses SCD1/SCD2 as full-rewrite joins —
correct everywhere Spark-on-Parquet runs, but at 100 TB an ACID table
format turns the same logic into a partial-file MERGE: only files
containing matched keys rewrite, concurrent readers see snapshots,
and the two phases commit atomically per statement. These functions
run the identical semantics through ``DeltaTable.merge`` so the
swap-in claim is code, not prose (reference semantics:
bl_cl.sql:806-875 two-phase MERGE; our deliberate same-run
close+insert deviation is documented in merge.py).

The sandbox image has no ``delta-spark`` package, so everything is
gated behind :func:`delta_available`; the pytest suite skips these
tests when the import fails. The condition builders are plain-string
functions, unit-tested without Delta. A session must be built with
the Delta extensions to use the executable paths::

    SparkSession.builder
      .config("spark.sql.extensions",
              "io.delta.sql.DeltaSparkSessionExtension")
      .config("spark.sql.catalog.spark_catalog",
              "org.apache.spark.sql.delta.catalog.DeltaCatalog")
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available() -> bool:
    """True when the delta-spark package is importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


# --- condition builders (pure strings; unit-testable without Delta) --

def key_match_condition(keys: Sequence[str], active_col: str | None = None) -> str:
    """NULL-safe key equality between merge aliases t (target) and
    s (source); optionally restricted to the target's open version."""
    parts = [f"t.{k} <=> s.{k}" for k in keys]
    if active_col:
        parts.append(f"t.{active_col} = true")
    return " AND ".join(parts)


def any_attr_changed_condition(attrs: Sequence[str]) -> str:
    """NULL-safe "any tracked attribute differs" (merge.py's
    ``_any_attr_changed`` as a SQL string)."""
    return " OR ".join(f"NOT (t.{a} <=> s.{a})" for a in attrs)


# --- executable Delta paths ------------------------------------------

def scd1_upsert_delta(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
) -> None:
    """SCD1 upsert as one Delta MERGE: matched rows take the source's
    attribute values unconditionally (including explicit source NULLs
    — the ``ON CONFLICT DO UPDATE`` semantics merge.py implements),
    unmatched source rows insert. Mutates the Delta table in place."""
    from delta.tables import DeltaTable

    tgt = DeltaTable.forPath(spark, target_path)
    src = source.dropDuplicates(list(keys))
    (
        tgt.alias("t")
        .merge(src.alias("s"), key_match_condition(keys))
        .whenMatchedUpdate(set={a: f"s.{a}" for a in attrs})
        .whenNotMatchedInsertAll()
        .execute()
    )


def scd2_merge_delta(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    effective_date: str,
    start_col: str = "start_dt",
    end_col: str = "end_dt",
    active_col: str = "is_active",
) -> None:
    """Two-phase SCD2 as two Delta MERGE statements (same-run
    close+insert, matching merge.py's ``scd2_merge``):

    phase 1 — close: open target versions whose source attrs changed
    get ``end_dt = effective_date, is_active = false``; only files
    holding those keys rewrite.

    phase 2 — insert: source rows with no OPEN match (keys closed in
    phase 1 + brand-new keys) insert as the active version. Unchanged
    open matches hit no clause in either phase — untouched files.
    """
    from delta.tables import DeltaTable

    tgt = DeltaTable.forPath(spark, target_path)
    src = source.dropDuplicates(list(keys))
    open_match = key_match_condition(keys, active_col=active_col)
    (
        tgt.alias("t")
        .merge(src.alias("s"), open_match)
        .whenMatchedUpdate(
            condition=any_attr_changed_condition(attrs),
            set={end_col: f"DATE'{effective_date}'", active_col: "false"},
        )
        .execute()
    )
    versioned = src.select(
        *[F.col(c) for c in list(keys) + list(attrs)],
        F.to_date(F.lit(effective_date)).alias(start_col),
        F.to_date(F.lit("9999-12-31")).alias(end_col),
        F.lit(True).alias(active_col),
    )
    (
        tgt.alias("t")
        .merge(versioned.alias("s"), open_match)
        .whenNotMatchedInsertAll()
        .execute()
    )

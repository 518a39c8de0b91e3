"""Central registry binding query names → (Spark callable, oracle SQL).

``__spark_entry__.py`` exposes this to the driver. Every operator
from SURVEY.md §2 that is "done" has an entry here; oracle_sql may be
None only for genuinely non-SQL-expressible operators (the driver
then records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Entry:
    fn: QueryFn
    oracle: str | None


_REGISTRY: dict[str, Entry] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query registration: {name}")
    _REGISTRY[name] = Entry(fn, oracle)


def queries() -> dict[str, QueryFn]:
    _ensure_populated()
    return {name: e.fn for name, e in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_populated()
    return {name: e.oracle for name, e in _REGISTRY.items() if e.oracle is not None}


_POPULATED = False


def _ensure_populated() -> None:
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    # Import for side effect: each module registers its queries.
    from global_superstore_data_warehouse_spark import queries as _q  # noqa: F401


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship query (yearly_sales_profit — the reference's
    primary materialized view)."""
    from global_superstore_data_warehouse_spark.plans import views

    return views.yearly_sales_profit(spark, sf_dir)

"""Central registry binding query names → (Spark callable, oracle SQL).

``__spark_entry__.py`` exposes this to the driver. Every operator
from SURVEY.md §2 that is "done" has an entry here; oracle_sql may be
None only for genuinely non-SQL-expressible operators (the driver
then records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
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


def promote(window: "Sequence[str]") -> None:
    """Reorder the registry so ``window`` comes FIRST, in the given
    order — the driver records CORRECTNESS rows for the first 50
    entries only, so this list IS the per-round rotation. Entries not
    named keep their existing relative order after the window.
    Rotations are now a single-list edit at the bottom of
    ``queries.py`` instead of moving register() blocks around."""
    missing = [n for n in window if n not in _REGISTRY]
    if missing:
        raise ValueError(f"promote: unregistered names {missing}")
    head = {n: _REGISTRY[n] for n in window}
    tail = {n: e for n, e in _REGISTRY.items() if n not in head}
    _REGISTRY.clear()
    _REGISTRY.update(head)
    _REGISTRY.update(tail)


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

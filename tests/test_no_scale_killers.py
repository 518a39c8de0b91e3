"""Repo-wide scale-killer sweep — the audit every round's verdict ran
by hand, automated: walk EVERY registered query's physical plan and
reject the patterns that do not survive 100 TB.

Forbidden everywhere:
- ``CartesianProduct``: an unbroadcast cross join is quadratic work.
  (``BroadcastNestedLoopJoin`` is allowed — the repo uses it solely
  for deliberate 1-row/tiny-frame attaches, and those are asserted
  per-query in test_plan_shape.py.)
- ``BatchEvalPython``: a row-at-a-time Python UDF in any registered
  plan breaks the zero-scalar-UDF guarantee. Arrow-batched pandas
  paths (``MapInPandas``/``ArrowEvalPython``/``FlatMapGroupsInPandas``)
  remain allowed — they are the documented vectorized escape hatch
  (multimodal, equivalence twins).

Constructing a plan may execute eager checkpoints (the iterative
operators), so the sweep runs at the smallest SF and is one
session-scoped pass over the registry.
"""

import pytest

from tests.conftest import SF_DIR

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def _physical(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def _registry_names():
    from global_superstore_data_warehouse_spark import registry

    return sorted(registry.queries())


@pytest.mark.parametrize("name", _registry_names())
def test_no_scale_killer_in_plan(spark, name):
    from global_superstore_data_warehouse_spark import registry

    df = registry.queries()[name](spark, SF_DIR)
    plan = _physical(df)
    for pattern in FORBIDDEN:
        assert pattern not in plan, (
            f"{name}: {pattern} in physical plan — this shape does not "
            f"survive 100 TB\n{plan[:1500]}"
        )

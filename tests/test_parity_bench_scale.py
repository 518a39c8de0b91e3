"""Opt-in bench-scale parity sweep: every oracle-backed query checked
against DuckDB at sf0.1 (the driver's own gate runs at sf0.01 — this
catches scale-dependent drift like rounding-boundary hits, which it
has: see the integer-cents fix in customer_ltv_deciles).

Slow (several minutes; the pair-quadratic oracles dominate). Enable
with ``SPARK_GRAFT_SLOW=1 python -m pytest tests/test_parity_bench_scale.py``.
"""

import os

import duckdb
import pytest

SLOW = os.environ.get("SPARK_GRAFT_SLOW") == "1"
SF01 = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _names():
    if not SLOW:
        return []
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from global_superstore_data_warehouse_spark import registry

    names = sorted(registry.oracle_sql())
    # Optional slice for resuming/sharding a long sweep (the DuckDB
    # side of a few oracles — recursive-CTE dedup closures, exact
    # pair ground truths — runs tens of minutes at sf0.1, so one
    # process can outlive a harness timeout): SPARK_GRAFT_SLOW_START /
    # SPARK_GRAFT_SLOW_STOP index into THIS sorted order.
    start = int(os.environ.get("SPARK_GRAFT_SLOW_START", "0"))
    stop = int(os.environ.get("SPARK_GRAFT_SLOW_STOP", str(len(names))))
    return names[start:stop]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.skipif(not SLOW, reason="set SPARK_GRAFT_SLOW=1 to run the sf0.1 sweep")
@pytest.mark.parametrize("name", _names())
def test_bench_scale_parity(spark, duck01, name):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck01, name, SF01)

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

    return sorted(registry.oracle_sql())


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

"""Fast oracle syntax gate: every registered oracle must EXPLAIN in
DuckDB against the test views — catches SQL typos in seconds,
without running a single Spark job (the full value comparison runs
in the per-operator parity tests and the driver)."""

from tests.conftest import SF_DIR, TABLES


def test_every_oracle_explains(duck):
    from global_superstore_data_warehouse_spark import registry

    oracles = registry.oracle_sql()
    assert len(oracles) >= 150
    bad = []
    for name, sql in oracles.items():
        try:
            duck.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 - report every failure
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad

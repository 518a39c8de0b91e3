"""Property-based SCD2 tests (hypothesis): the merge invariants must
hold for ARBITRARY dim states and source loads, not just the modular
scenario in plans/scd.py.

Generated model: keys are small ints; each key may have closed
history versions, at most one open version, and may or may not appear
in the incoming source with a (possibly changed) attribute value.
"""

from datetime import date

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.operators.merge import scd2_merge

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# per-key state: (has_history, has_open, open_attr, src_attr or None)
key_state = st.tuples(
    st.booleans(),
    st.booleans(),
    st.sampled_from(["a", "b", "c"]),
    st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d"])),
)
scenario = st.dictionaries(st.integers(min_value=0, max_value=12), key_state, min_size=1, max_size=8)


def _build(spark, scen):
    dim_rows, src_rows = [], []
    for k, (has_hist, has_open, open_attr, src_attr) in scen.items():
        if has_hist:
            dim_rows.append((k, "h", date(2019, 1, 1), date(2020, 1, 1), False))
        if has_open:
            dim_rows.append((k, open_attr, date(2020, 1, 1), date(9999, 12, 31), True))
        if src_attr is not None:
            src_rows.append((k, src_attr))
    dim = spark.createDataFrame(
        dim_rows or [(99, "x", date(2020, 1, 1), date(9999, 12, 31), True)],
        "k long, attr string, start_dt date, end_dt date, is_active boolean",
    )
    src = spark.createDataFrame(src_rows or [(98, "y")], "k long, attr string")
    return dim, src


@pytest.mark.usefixtures("spark")
class TestSCD2Properties:
    @given(scen=scenario)
    @settings(**SETTINGS)
    def test_exactly_one_open_row_per_live_key(self, spark, scen):
        dim, src = _build(spark, scen)
        merged = scd2_merge(dim, src, keys=["k"], attrs=["attr"], effective_date="2024-06-15")
        rows = merged.collect()
        open_keys = [r.k for r in rows if r.is_active]
        # uniqueness
        assert len(open_keys) == len(set(open_keys))
        # every key that is open in dim or present in source stays/becomes open
        expected_open = {r.k for r in dim.filter("is_active").collect()} | {
            r.k for r in src.collect()
        }
        assert set(open_keys) == expected_open
        # closed rows never carry the sentinel end date
        assert all(
            r.end_dt != date(9999, 12, 31) for r in rows if not r.is_active
        )

    @given(scen=scenario)
    @settings(**SETTINGS)
    def test_idempotent_under_same_source(self, spark, scen):
        dim, src = _build(spark, scen)
        once = scd2_merge(dim, src, keys=["k"], attrs=["attr"], effective_date="2024-06-15")
        twice = scd2_merge(once, src, keys=["k"], attrs=["attr"], effective_date="2024-07-01")
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    @given(scen=scenario)
    @settings(**SETTINGS)
    def test_history_is_append_only(self, spark, scen):
        """No merge may rewrite or lose closed-history rows."""
        dim, src = _build(spark, scen)
        merged = scd2_merge(dim, src, keys=["k"], attrs=["attr"], effective_date="2024-06-15")
        hist_before = sorted(map(tuple, dim.filter(~F.col("is_active")).collect()))
        hist_after = sorted(
            map(tuple, merged.filter(~F.col("is_active")).collect())
        )
        # old history is a subset of new history (new closures may add)
        assert set(hist_before) <= set(hist_after)


scd1_scenario = st.dictionaries(
    st.integers(min_value=0, max_value=10),
    st.tuples(st.one_of(st.none(), st.sampled_from(["a", "b"])),
              st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))),
    min_size=1, max_size=8,
)


@pytest.mark.usefixtures("spark")
class TestSCD1Properties:
    @given(scen=scd1_scenario)
    @settings(**SETTINGS)
    def test_upsert_source_wins_and_idempotent(self, spark, scen):
        from global_superstore_data_warehouse_spark.operators.merge import scd1_upsert

        tgt_rows = [(k, t) for k, (t, _) in scen.items() if t is not None]
        src_rows = [(k, s) for k, (_, s) in scen.items() if s is not None]
        tgt = spark.createDataFrame(tgt_rows or [(99, "x")], "k long, attr string")
        src = spark.createDataFrame(src_rows or [(98, "y")], "k long, attr string")
        once = scd1_upsert(tgt, src, keys=["k"], attrs=["attr"])
        got = {r.k: (r.attr, r.is_updated) for r in once.collect()}
        # key set = union; source attr wins on overlap
        for k, v in got.items():
            pair = scen.get(k, (None, None)) if k not in (98, 99) else (None, None)
            t, s = pair
            if k == 99: t = "x"
            if k == 98: s = "y"
            assert v[0] == (s if s is not None else t)
            assert v[1] == (s is not None and t is not None)
        # idempotent: re-upserting the same source changes nothing
        twice = scd1_upsert(once.drop("is_updated"), src, keys=["k"], attrs=["attr"])
        assert sorted((r.k, r.attr) for r in twice.collect()) == sorted(
            (k, a) for k, (a, _) in got.items()
        )

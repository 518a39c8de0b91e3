"""Property test for the generic interval-union operator: for
ARBITRARY interval sets — duplicated, nested, touching, point-dense,
multi-key — the sweep-line plan's islands must equal a brute-force
union computed in Python. Half-open semantics: [s, e), touching
intervals merge."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from global_superstore_data_warehouse_spark.operators.intervals import (
    interval_union_coverage,
    interval_union_islands,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

interval = st.tuples(
    st.integers(min_value=-50, max_value=200),
    st.integers(min_value=1, max_value=60),  # length >= 1: [s, e), e > s
)
scenario = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), interval),  # (key, iv)
    min_size=1,
    max_size=25,
)


def _brute_union(ivs):
    ivs = sorted(ivs)
    merged = []
    for s, e in ivs:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged


@pytest.mark.usefixtures("spark")
class TestIntervalUnion:
    @given(scen=scenario)
    @settings(**SETTINGS)
    def test_islands_match_bruteforce(self, spark, scen):
        rows = [
            (key, i, s, s + ln) for i, (key, (s, ln)) in enumerate(scen)
        ]
        df = spark.createDataFrame(rows, "k int, id long, s long, e long")
        got = {}
        for r in interval_union_islands(df, ["k"], "s", "e", ["id"]).collect():
            got.setdefault(r["k"], []).append(
                (r["i_start"], r["i_end"], r["n_intervals"])
            )
        by_key = {}
        for key, i, s, e in rows:
            by_key.setdefault(key, []).append((s, e))
        for key, ivs in by_key.items():
            merged = _brute_union(ivs)
            got_islands = sorted(got[key])
            assert [(a, b) for a, b, _ in got_islands] == merged
            # interval counts per island tile the key's interval set
            assert sum(n for _, _, n in got_islands) == len(ivs)

    @given(scen=scenario)
    @settings(**SETTINGS)
    def test_coverage_summary_consistent(self, spark, scen):
        rows = [
            (key, i, s, s + ln) for i, (key, (s, ln)) in enumerate(scen)
        ]
        df = spark.createDataFrame(rows, "k int, id long, s long, e long")
        out = {
            r["k"]: r
            for r in interval_union_coverage(df, ["k"], "s", "e", ["id"]).collect()
        }
        by_key = {}
        for key, i, s, e in rows:
            by_key.setdefault(key, []).append((s, e))
        for key, ivs in by_key.items():
            merged = _brute_union(ivs)
            r = out[key]
            assert r["n_events"] == len(ivs)
            assert r["n_islands"] == len(merged)
            assert r["covered_s"] == sum(e - s for s, e in merged)
            assert r["span_s"] == merged[-1][1] - merged[0][0]

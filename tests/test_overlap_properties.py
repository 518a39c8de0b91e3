"""Property-based interval-overlap-join test (hypothesis): the
bucket-blocked responsibility-condition join must be EXACTLY
equivalent to the naive inequality overlap join for arbitrary
interval sets — nested, touching, instant, negative-epoch, and
multi-bucket-spanning intervals — with every pair emitted exactly
once."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.operators.rangejoin import (
    interval_overlap_join,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# (start_offset, length): spans 0..10 buckets at width 60; negative
# offsets exercise floor-division below zero
interval = st.tuples(
    st.integers(min_value=-300, max_value=1200),
    st.integers(min_value=0, max_value=600),
)
scenario = st.tuples(
    st.lists(interval, min_size=1, max_size=6),
    st.lists(interval, min_size=0, max_size=6),
    st.sampled_from([7, 60, 3600]),
)


@pytest.mark.usefixtures("spark")
class TestOverlapJoinEquivalence:
    @given(scen=scenario)
    @settings(**SETTINGS)
    def test_matches_naive_overlap_join(self, spark, scen):
        lhs, rhs, width = scen
        left = spark.createDataFrame(
            [(i, s, s + ln) for i, (s, ln) in enumerate(lhs)],
            "lid long, l_start long, l_end long",
        )
        right = spark.createDataFrame(
            [(i, s, s + ln) for i, (s, ln) in enumerate(rhs)],
            "rid long, r_start long, r_end long",
        ) if rhs else spark.createDataFrame([], "rid long, r_start long, r_end long")

        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                left, right, "l_start", "l_end", "r_start", "r_end", width
            ).collect()
        )
        naive = sorted(
            (r["lid"], r["rid"])
            for r in left.join(
                right,
                (F.col("l_start") < F.col("r_end"))
                & (F.col("r_start") < F.col("l_end")),
            ).collect()
        )
        assert got == naive
        assert len(got) == len(set(got))  # exactly-once per pair

"""Property-based range-join test (hypothesis): the bucket-blocked
equi-join must be EXACTLY equivalent to the naive inequality join
for arbitrary interval/point sets — including intervals shorter,
longer, and much longer than the bucket width, zero-length
intervals, points on boundaries, and empty matches."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.operators.rangejoin import (
    bucketed_interval_join,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

BASE = 1_700_000_000  # fixed epoch anchor, far from any tz edge
WIDTH = 60  # 1-minute buckets so multi-bucket spans are cheap to hit

# intervals as (start_offset_s, length_s): lengths from 0 to 10
# buckets; points as offsets over the same span
interval = st.tuples(
    st.integers(min_value=0, max_value=1200),
    st.integers(min_value=0, max_value=600),
)
scenario = st.tuples(
    st.lists(interval, min_size=1, max_size=6),
    st.lists(st.integers(min_value=-60, max_value=1400), min_size=0, max_size=20),
)


@pytest.mark.usefixtures("spark")
class TestRangeJoinEquivalence:
    @given(scen=scenario)
    @settings(**SETTINGS)
    def test_matches_naive_inequality_join(self, spark, scen):
        ivs, pts = scen
        intervals = spark.createDataFrame(
            [
                (i, BASE + s, BASE + s + ln)
                for i, (s, ln) in enumerate(ivs)
            ],
            "iv_id long, start_s long, end_s long",
        ).select(
            "iv_id",
            F.timestamp_seconds("start_s").alias("start_ts"),
            F.timestamp_seconds("end_s").alias("end_ts"),
        )
        points = spark.createDataFrame(
            [(j, BASE + off) for j, off in enumerate(pts)] or [(0, 0)],
            "pt_id long, ts_s long",
        ).select("pt_id", F.timestamp_seconds("ts_s").alias("pt_ts"))
        if not pts:
            points = points.filter(F.lit(False))

        got = (
            bucketed_interval_join(
                intervals, points, "start_ts", "end_ts", "pt_ts",
                width_seconds=WIDTH, how="inner",
            )
            .select("iv_id", "pt_id")
            .collect()
        )
        naive = (
            intervals.join(
                points,
                (points.pt_ts >= intervals.start_ts)
                & (points.pt_ts < intervals.end_ts),
                "inner",
            )
            .select("iv_id", "pt_id")
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, naive))

    @given(scen=scenario)
    @settings(**SETTINGS)
    def test_left_join_matches_naive_left_join(self, spark, scen):
        """how='left' must emit exactly one NULL-point row per
        fully-empty interval (the naive LEFT JOIN contract), so both
        row-level output and count aggregates agree with the naive
        inequality join."""
        ivs, pts = scen
        intervals = spark.createDataFrame(
            [(i, BASE + s, BASE + s + ln) for i, (s, ln) in enumerate(ivs)],
            "iv_id long, start_s long, end_s long",
        ).select(
            "iv_id",
            F.timestamp_seconds("start_s").alias("start_ts"),
            F.timestamp_seconds("end_s").alias("end_ts"),
        )
        points = spark.createDataFrame(
            [(j, BASE + off) for j, off in enumerate(pts)] or [(0, 0)],
            "pt_id long, ts_s long",
        ).select("pt_id", F.timestamp_seconds("ts_s").alias("pt_ts"))
        if not pts:
            points = points.filter(F.lit(False))

        got = bucketed_interval_join(
            intervals, points, "start_ts", "end_ts", "pt_ts",
            width_seconds=WIDTH, how="left",
        )
        naive = intervals.join(
            points,
            (points.pt_ts >= intervals.start_ts)
            & (points.pt_ts < intervals.end_ts),
            "left",
        )
        assert sorted(
            map(tuple, got.select("iv_id", "pt_id").collect())
        ) == sorted(map(tuple, naive.select("iv_id", "pt_id").collect()))
        agg = lambda df: sorted(  # noqa: E731
            map(
                tuple,
                df.groupBy("iv_id")
                .agg(F.count("pt_id").alias("n"))
                .collect(),
            )
        )
        assert agg(got) == agg(naive)

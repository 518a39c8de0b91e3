"""Event analytics (batch oracle parity) + Structured Streaming
equivalence tests."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

EVENT_QUERIES = [
    "events_hourly",
    "events_sliding",
    "events_sessionize",
    "top_events_per_user",
]


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_matches_oracle(spark, duck, name, sf_dir):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_stream_hourly_equals_batch(spark, sf_dir, tmp_path):
    """The streaming job (availableNow drain) must produce exactly
    the batch result — same logic, same windows."""
    from global_superstore_data_warehouse_spark.plans.events import events_hourly
    from global_superstore_data_warehouse_spark.streaming.events import (
        hourly_counts_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = hourly_counts_stream(read_events_stream(spark, sf_dir))
    run_stream_to_memory(stream, spark, "hourly_test", str(tmp_path / "ckpt"))
    got = spark.sql("SELECT * FROM hourly_test").orderBy("hour_start", "event_type")
    want = events_hourly(spark, sf_dir)
    assert got.collect() == want.collect()


def test_stream_incremental_staging(spark, sf_dir, tmp_path):
    from global_superstore_data_warehouse_spark.streaming.events import (
        stream_incremental_staging,
    )

    target = str(tmp_path / "staged_events")
    stream_incremental_staging(spark, sf_dir, target, str(tmp_path / "ckpt2"))
    staged = spark.read.parquet(target)
    assert "load_id" in staged.columns and "insert_date" in staged.columns
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert staged.count() == n_events

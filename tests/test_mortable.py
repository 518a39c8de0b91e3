"""Merge-on-read table (sources/mortable.py): lifecycle equivalence
vs the logical SCD1 upsert and vs the COW twin, the Iceberg v2
sequence rule (a delete never kills rows from its own commit),
compaction folding, time travel, read-plan shape (broadcast
anti-join, no data-side shuffle), and the no-rewrite contract."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.sources import cowtable, mortable


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="mortable-test-")
    path = os.path.join(d, "tbl")
    yield path
    shutil.rmtree(d, ignore_errors=True)


def _customers(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )


def _norm(df):
    return sorted(map(tuple, df.collect()))


def _upsert_source(spark, df):
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    cut = int(lo) + (int(hi) - int(lo)) // 5
    inserts = spark.range(1, 4).select(
        (F.lit(int(hi)) + F.col("id")).alias("c_custkey"),
        F.concat(F.lit("new "), F.col("id")).alias("c_name"),
        F.col("id").cast("double").alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
    )
    return (
        df.filter(F.col("c_custkey") <= cut)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2))
        .unionByName(inserts)
    )


def test_mor_merge_matches_logical_upsert_and_cow_twin(spark, sf_dir, root):
    df = _customers(spark, sf_dir)
    src = _upsert_source(spark, df)
    mortable.create(spark, root, df, key="c_custkey", nbuckets=8)
    report = mortable.merge_upsert(spark, root, src, key="c_custkey")
    assert report["files_rewritten"] == 0
    assert report["delete_files_added"] >= 1
    got = _norm(mortable.read_version(spark, root))
    # logical SCD1 upsert
    expected = _norm(
        src.unionByName(df.join(src.select("c_custkey"), "c_custkey", "left_anti"))
    )
    assert got == expected
    # the COW twin computes the identical state
    cow_root = root + "-cow"
    cowtable.create(spark, cow_root, df, key="c_custkey", nbuckets=8)
    cowtable.merge_scd1(
        spark, cow_root, src,
        keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
    )
    assert got == _norm(cowtable.read_version(spark, cow_root))


def test_mor_merge_rewrites_nothing(spark, sf_dir, root):
    """The defining property: every pre-merge data file survives the
    merge byte-identically (same inode, same mtime)."""
    df = _customers(spark, sf_dir)
    mortable.create(spark, root, df, key="c_custkey", nbuckets=8)
    data_dir = os.path.join(root, mortable.DATA_DIR)
    before = {
        n: (os.stat(os.path.join(data_dir, n)).st_ino,
            os.stat(os.path.join(data_dir, n)).st_mtime_ns)
        for n in os.listdir(data_dir)
    }
    mortable.merge_upsert(
        spark, root, _upsert_source(spark, df), key="c_custkey"
    )
    after = {
        n: (os.stat(os.path.join(data_dir, n)).st_ino,
            os.stat(os.path.join(data_dir, n)).st_mtime_ns)
        for n in os.listdir(data_dir)
        if n in before
    }
    assert after == before  # untouched, not rewritten-in-place


def test_mor_sequence_rule_spares_same_commit_rows(spark, sf_dir, root):
    """The equality delete and the replacement rows land in ONE
    commit with the same sequence; the strict `_seq < del_seq` rule
    must kill the OLD row and spare the NEW one — and a later merge
    of the same key must kill the round-2 row too (two stacked
    deletes, each applying to its past only)."""
    df = _customers(spark, sf_dir).limit(20).localCheckpoint(eager=True)
    key = int(df.agg(F.min("c_custkey")).first()[0])
    mortable.create(spark, root, df, key="c_custkey", nbuckets=4)
    one = df.filter(F.col("c_custkey") == key)
    mortable.merge_upsert(
        spark, root, one.withColumn("c_name", F.lit("v2")), key="c_custkey"
    )
    mortable.merge_upsert(
        spark, root, one.withColumn("c_name", F.lit("v3")), key="c_custkey"
    )
    rows = (
        mortable.read_version(spark, root)
        .filter(F.col("c_custkey") == key)
        .collect()
    )
    assert len(rows) == 1 and rows[0]["c_name"] == "v3"
    # stats see both delete files still live
    st = mortable.stats(root)
    assert st["delete_files"] == 2 and st["delete_rows"] == 2


def test_mor_compact_folds_deletes_and_preserves_state(spark, sf_dir, root):
    df = _customers(spark, sf_dir)
    mortable.create(spark, root, df, key="c_custkey", nbuckets=8)
    mortable.merge_upsert(
        spark, root, _upsert_source(spark, df), key="c_custkey"
    )
    before = _norm(mortable.read_version(spark, root))
    assert mortable.stats(root)["delete_rows"] > 0
    rep = mortable.compact(spark, root)
    assert rep["delete_files_folded"] >= 1
    st = mortable.stats(root)
    assert st["delete_files"] == 0 and st["delete_rows"] == 0
    assert _norm(mortable.read_version(spark, root)) == before
    # merges keep working after compaction
    mortable.merge_upsert(
        spark, root, df.limit(1).withColumn("c_name", F.lit("post")),
        key="c_custkey",
    )
    assert mortable.stats(root)["delete_files"] == 1


def test_mor_time_travel(spark, sf_dir, root):
    df = _customers(spark, sf_dir)
    mortable.create(spark, root, df, key="c_custkey", nbuckets=8)
    v1 = _norm(mortable.read_version(spark, root, version=1))
    mortable.merge_upsert(
        spark, root, _upsert_source(spark, df), key="c_custkey"
    )
    assert _norm(mortable.read_version(spark, root, version=1)) == v1
    assert v1 == _norm(df)


def test_mor_read_plan_broadcasts_deletes_no_data_shuffle(spark, sf_dir, root):
    """The snapshot read must be scan + BroadcastHashJoin(LeftAnti):
    the data side is never hash-partitioned (the delete set rides the
    manifest-rowcount broadcast gate)."""
    df = _customers(spark, sf_dir)
    mortable.create(spark, root, df, key="c_custkey", nbuckets=8)
    mortable.merge_upsert(
        spark, root, _upsert_source(spark, df), key="c_custkey"
    )
    plan = (
        mortable.read_version(spark, root)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "hashpartitioning(c_custkey" not in plan
    assert "CartesianProduct" not in plan


def test_mor_key_mismatch_rejected(spark, sf_dir, root):
    df = _customers(spark, sf_dir)
    mortable.create(spark, root, df, key="c_custkey", nbuckets=4)
    with pytest.raises(ValueError, match="keyed on"):
        mortable.merge_upsert(spark, root, df, key="c_name")


def test_mor_delete_keys(spark, sf_dir, root):
    """Pure DELETE commit (no data files): matching rows vanish,
    everything else survives, compact reclaims."""
    df = _customers(spark, sf_dir)
    mortable.create(spark, root, df, key="c_custkey", nbuckets=8)
    victims = df.filter(F.col("c_custkey") % 7 == 0)
    rep = mortable.delete_keys(
        spark, root, victims.select("c_custkey"), key="c_custkey"
    )
    assert rep["files_rewritten"] == 0 and rep["delete_rows"] > 0
    got = _norm(mortable.read_version(spark, root))
    assert got == _norm(df.filter(F.col("c_custkey") % 7 != 0))
    mortable.compact(spark, root)
    assert _norm(mortable.read_version(spark, root)) == got
    assert mortable.stats(root)["delete_rows"] == 0


def test_mor_stream_exactly_once(spark, sf_dir, root, tmp_path):
    """The MOR streaming sink twin: three drained batches equal the
    sequential merges; a replayed batch_id no-ops; commit latency
    stays O(batch) — nothing rewritten (ledgered in the reports)."""
    from global_superstore_data_warehouse_spark.streaming.mor import (
        apply_stream_batch,
        mor_upsert_stream,
    )

    cust = _customers(spark, sf_dir)
    b1 = cust.filter(F.col("c_custkey") % 3 == 0)
    b2 = cust.filter(F.col("c_custkey") % 3 == 1).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 10.0, 2)
    )
    b3 = cust.filter(F.col("c_custkey") % 6 == 0).withColumn(
        "c_mktsegment", F.lit("STREAMED")
    )
    # unit ledger behavior first
    assert apply_stream_batch(spark, root, b1.limit(0), 0, "c_custkey") == "empty_noop"
    assert apply_stream_batch(spark, root, b1, 0, "c_custkey") == "created"
    assert apply_stream_batch(spark, root, b2, 1, "c_custkey") == "merged"
    assert apply_stream_batch(spark, root, b2, 1, "c_custkey") == "replay_noop"
    assert apply_stream_batch(spark, root, b3, 2, "c_custkey") == "merged"
    expected = _norm(
        b3.unionByName(
            b2.join(b3.select("c_custkey"), "c_custkey", "left_anti")
        ).unionByName(
            b1.join(
                b2.unionByName(b3).select("c_custkey").distinct(),
                "c_custkey",
                "left_anti",
            )
        )
    )
    assert _norm(mortable.read_version(spark, root)) == expected

    # full drain through the real foreachBatch harness
    src = str(tmp_path / "src")
    for i, b in enumerate([b1, b2, b3]):
        b.coalesce(1).write.mode("append").parquet(src)
    root2 = str(tmp_path / "tbl2")
    mor_upsert_stream(
        spark, src, root2, str(tmp_path / "ckpt"), key="c_custkey"
    )
    # drained content equals the same logical state modulo batch
    # ORDER (file-stream order is not pinned across the 3 files), so
    # compare the key SETS and that every row came from some batch
    drained = mortable.read_version(spark, root2)
    assert drained.count() == len(expected)
    assert _norm(drained.select("c_custkey")) == _norm(
        b1.select("c_custkey")
        .unionByName(b2.select("c_custkey"))
        .unionByName(b3.select("c_custkey"))
        .distinct()
    )


def test_mor_random_op_sequences_equal_logical_state(spark, sf_dir, root):
    """Property: an arbitrary interleaving of upserts, pure deletes,
    and compactions leaves the MOR table exactly at the logical fold
    of those operations (a plain dict), for every hypothesis-drawn
    sequence."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    op_st = st.tuples(
        st.sampled_from(["upsert", "delete", "compact"]),
        st.sets(st.integers(0, 9), min_size=1, max_size=4),
        st.sampled_from(["a", "b", "c"]),
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ops=st.lists(op_st, min_size=1, max_size=5))
    def prop(ops):
        import shutil as _sh
        import tempfile as _tf

        d = _tf.mkdtemp(prefix="mor-prop-")
        try:
            r = os.path.join(d, "tbl")
            base = spark.createDataFrame(
                [(k, "base") for k in range(10)], "k long, attr string"
            )
            mortable.create(spark, r, base, key="k", nbuckets=4)
            state = {k: "base" for k in range(10)}
            for kind, keys, attr in ops:
                if kind == "upsert":
                    src = spark.createDataFrame(
                        [(k, attr) for k in sorted(keys)], "k long, attr string"
                    )
                    mortable.merge_upsert(spark, r, src, key="k")
                    for k in keys:
                        state[k] = attr
                elif kind == "delete":
                    src = spark.createDataFrame(
                        [(k,) for k in sorted(keys)], "k long"
                    )
                    mortable.delete_keys(spark, r, src, key="k")
                    for k in keys:
                        state.pop(k, None)
                else:
                    mortable.compact(spark, r)
            got = sorted(map(tuple, mortable.read_version(spark, r).collect()))
            assert got == sorted(state.items())
        finally:
            _sh.rmtree(d, ignore_errors=True)

    prop()


def test_mor_compact_of_fully_deleted_table_stays_readable(spark, sf_dir, root):
    base = spark.createDataFrame(
        [(k, "x") for k in range(6)], "k long, attr string"
    )
    mortable.create(spark, root, base, key="k", nbuckets=4)
    mortable.delete_keys(
        spark, root, base.select("k"), key="k"
    )
    assert mortable.read_version(spark, root).count() == 0
    mortable.compact(spark, root)
    snap = mortable.read_version(spark, root)
    assert snap.count() == 0
    assert set(snap.columns) == {"k", "attr"}
    # and the table accepts new merges afterwards
    mortable.merge_upsert(
        spark, root,
        spark.createDataFrame([(3, "back")], "k long, attr string"),
        key="k",
    )
    assert sorted(map(tuple, mortable.read_version(spark, root).collect())) == [
        (3, "back")
    ]


def test_mor_change_feed_all_change_types(spark, tmp_path):
    """MOR CDF from commit-local files: upsert (update + insert) then
    pure delete; compact commits must contribute nothing."""
    import pyspark.sql.functions as F

    from global_superstore_data_warehouse_spark.sources import mortable

    root = str(tmp_path / "t")
    df = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, df, key="k", nbuckets=2, bounds=(1, 20))
    src = spark.createDataFrame(
        [(1, 11), (2, 21), (21, 210)], "k long, v long"
    )
    mortable.merge_upsert(spark, root, src, key="k")            # v2
    mortable.delete_keys(
        spark, root, spark.createDataFrame([(2,), (5,)], "k long"), key="k"
    )                                                            # v3
    mortable.compact(spark, root)                                # v4
    rows = {
        (r.k, r._change_type, r._commit_version, r.v)
        for r in mortable.change_feed(spark, root, 1).collect()
    }
    assert rows == {
        (1, "update_preimage", 2, 10), (1, "update_postimage", 2, 11),
        (2, "update_preimage", 2, 20), (2, "update_postimage", 2, 21),
        (21, "insert", 2, 210),
        (2, "delete", 3, 21),
        (5, "delete", 3, 50),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad change_feed range"):
        mortable.change_feed(spark, root, 0)
    with _pytest.raises(ValueError, match="no row-level commits"):
        mortable.change_feed(spark, root, 3, 4)  # only the compact


def test_mor_change_feed_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "mor_change_feed", sf_dir)


def test_mor_change_feed_over_none_keyed_compact_entry(spark, tmp_path):
    """Regression (round-11 advice): compact() of a fully-deleted
    table writes a zero-row data entry with min_key/max_key = None;
    a later merge's change_feed preimage pruning must skip it, not
    raise TypeError comparing None with int."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    base = spark.range(1, 7).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 6))
    mortable.delete_keys(spark, root, base.select("k"), key="k")   # v2
    mortable.compact(spark, root)                                   # v3: None-keyed entry
    src = spark.createDataFrame([(3, 33), (9, 90)], "k long, v long")
    mortable.merge_upsert(spark, root, src, key="k")                # v4
    rows = {
        (r.k, r._change_type, r._commit_version, r.v)
        for r in mortable.change_feed(spark, root, 1).collect()
    }
    assert {(3, "insert", 4, 33), (9, "insert", 4, 90)} <= rows
    deletes = {(r[0], r[3]) for r in rows if r[1] == "delete"}
    assert deletes == {(k, k * 10) for k in range(1, 7)}


def test_mor_change_feed_delete_broadcast_is_gated(spark, tmp_path, monkeypatch):
    """The touched-key probe in change_feed must follow the module's
    manifest-gated broadcast policy: with the gate forced to zero the
    same plan runs as a shuffle join (no broadcast exchange on the
    preimage probe) and produces identical changes."""
    import pyspark.sql.functions as F

    from global_superstore_data_warehouse_spark.operators import hints

    root = str(tmp_path / "t")
    base = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 20))
    src = spark.createDataFrame([(1, 11), (21, 210)], "k long, v long")
    mortable.merge_upsert(spark, root, src, key="k")
    expected = {
        (r.k, r._change_type, r._commit_version, r.v)
        for r in mortable.change_feed(spark, root, 1).collect()
    }
    monkeypatch.setattr(hints, "BROADCAST_MAX_ROWS", 0)
    got_df = mortable.change_feed(spark, root, 1)
    got = {
        (r.k, r._change_type, r._commit_version, r.v)
        for r in got_df.collect()
    }
    assert got == expected


def test_mor_compact_buckets_threshold_sweep(spark, tmp_path):
    """Round-11 table service: compact_buckets folds ONLY the buckets
    whose delete ratio exceeds the threshold, preserves snapshot
    equality exactly, never moves non-victim files (inode check), and
    shrinks the delete side to the surviving buckets' keys with their
    ORIGINAL _del_seq."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    # 4 buckets over keys 1..40 -> bucket = (k-1)//10
    base = spark.range(1, 41).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=4, bounds=(1, 40))
    # v2: upsert keys 1..6 (bucket 0 ratio 6/10) + key 11 (bucket 1 1/10)
    mortable.merge_upsert(
        spark, root,
        spark.createDataFrame(
            [(k, k * 100) for k in [1, 2, 3, 4, 5, 6, 11]], "k long, v long"
        ),
        key="k",
    )
    # v3: delete keys 12, 21 (bucket 1 -> 2/20 incl. its new data row; bucket 2 -> 1/10)
    mortable.delete_keys(
        spark, root, spark.createDataFrame([(12,), (21,)], "k long"), key="k"
    )
    before = sorted(map(tuple, mortable.read_version(spark, root).collect()))
    ratios = mortable.bucket_delete_ratios(spark, root)
    # bucket 0: 6 delete keys / (10 base + 6 new) ; bucket 1: 2 / 11; bucket 2: 1/10
    assert ratios[0] == 6 / 16 and ratios[3] == 0.0
    inode_of = {
        e["file"]: os.stat(os.path.join(root, e["file"])).st_ino
        for e in mortable._live(root)[0]
    }
    report = mortable.compact_buckets(spark, root, max_delete_ratio=0.2)
    assert report["buckets_compacted"] == [0]
    assert report["delete_rows_before"] == 9
    # survivors: bucket1 keys {11,12}, bucket2 {21} -> 3 delete rows
    assert report["delete_rows_after"] == 3
    after = sorted(map(tuple, mortable.read_version(spark, root).collect()))
    assert after == before
    # non-victim data files carried by reference (same inode)
    data_after, dels_after = mortable._live(root)
    for e in data_after:
        if e["bucket"] != 0:
            assert os.stat(os.path.join(root, e["file"])).st_ino == inode_of[e["file"]]
        else:
            assert e["file"] not in inode_of  # rewritten fresh
    # surviving deletes keep their ORIGINAL _del_seq (2 for k=11, 3 for 12/21)
    surv = {
        (r.k, r._del_seq)
        for r in spark.read.parquet(
            *[os.path.join(root, e["file"]) for e in dels_after]
        ).collect()
    }
    assert surv == {(11, 2), (12, 3), (21, 3)}
    # change feed skips the compact commit; below-threshold rerun is a no-op
    vers = {r._commit_version for r in mortable.change_feed(spark, root, 1).collect()}
    assert report["version"] not in vers
    rerun = mortable.compact_buckets(spark, root, max_delete_ratio=0.2)
    assert rerun["buckets_compacted"] == [] and rerun["version"] is None


def test_mor_compact_buckets_all_victims_delegates(spark, tmp_path):
    """A sweep whose victims cover every live data file folds the
    whole table (including the fully-deleted placeholder edge)."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    base = spark.range(1, 9).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 8))
    mortable.delete_keys(spark, root, base.select("k"), key="k")
    report = mortable.compact_buckets(spark, root, max_delete_ratio=0.1)
    assert report["buckets_compacted"] == [0, 1]
    assert report["delete_rows_after"] == 0
    assert mortable.read_version(spark, root).count() == 0


def test_mor_compact_buckets_delete_only_bucket_reclaimed(spark, tmp_path):
    """Round-12 fix (ADVICE): delete keys landing in a bucket with NO
    live data rows report ratio inf — not silently absent — so the
    threshold sweep reclaims their dead delete files instead of
    carrying them until a full compact()."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    # bounds (1,20), 2 buckets -> keys 1..10 = bucket 0; 11..20 = bucket 1
    base = spark.range(1, 11).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 20))
    # delete keys in bucket 1, where no data row has ever lived
    mortable.delete_keys(
        spark, root, spark.createDataFrame([(15,), (16,)], "k long"), key="k"
    )
    ratios = mortable.bucket_delete_ratios(spark, root)
    assert ratios[0] == 0.0 and ratios[1] == float("inf")
    before = sorted(map(tuple, mortable.read_version(spark, root).collect()))
    report = mortable.compact_buckets(spark, root, max_delete_ratio=0.9)
    # the delete-only bucket is the sole victim: no data rewrite, the
    # dead delete file is dropped, snapshot unchanged
    assert report["buckets_compacted"] == [1]
    assert report["data_files_rewritten"] == 0
    assert report["delete_rows_before"] == 2
    assert report["delete_rows_after"] == 0
    assert mortable._live(root)[1] == []
    after = sorted(map(tuple, mortable.read_version(spark, root).collect()))
    assert after == before
    # the report is scheduling evidence for service logs: it must be
    # STRICT-JSON serializable (the inf ratio is reported as "inf")
    import json as _json

    rt = _json.loads(_json.dumps(report, allow_nan=False))
    assert rt["ratios"]["1"] == "inf" and rt["ratios"]["0"] == 0.0


def test_mor_compact_buckets_loses_race_to_interleaved_merge(
    spark, tmp_path, monkeypatch
):
    """Round-12 fix (ADVICE): compact_buckets pins its version BEFORE
    reading live state, so a merge that commits inside the sweep's
    read window takes the pinned version and the sweep's commit LOSES
    the create-exclusive race (ConcurrentWriteError) — it can no
    longer rewrite victim rows from the stale snapshot with a _seq
    newer than the merge's _del_seq (silent row resurrection)."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    base = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 20))
    # v2: make bucket 0 a victim (ratio 5/10 > threshold)
    mortable.delete_keys(
        spark, root,
        spark.createDataFrame([(k,) for k in range(1, 6)], "k long"),
        key="k",
    )

    real_ratios = mortable.bucket_delete_ratios

    def interleaving_ratios(spark_, root_, version=None, _entries=None):
        # a concurrent writer lands between the sweep's version pin
        # and its commit: update k=7 (v 70 -> 7000)
        mortable.merge_upsert(
            spark_, root_,
            spark_.createDataFrame([(7, 7000)], "k long, v long"),
            key="k",
        )
        return real_ratios(spark_, root_, version, _entries)

    monkeypatch.setattr(mortable, "bucket_delete_ratios", interleaving_ratios)
    with pytest.raises(mortable.ConcurrentWriteError):
        mortable.compact_buckets(spark, root, max_delete_ratio=0.2)
    # the interleaved merge's write survives — no resurrection of the
    # pre-merge k=7 row by a stale-snapshot rewrite
    state = {r.k: r.v for r in mortable.read_version(spark, root).collect()}
    assert state[7] == 7000
    assert 1 not in state
    # and the sweep still works once the table is quiescent
    monkeypatch.setattr(mortable, "bucket_delete_ratios", real_ratios)
    report = mortable.compact_buckets(spark, root, max_delete_ratio=0.2)
    assert 0 in report["buckets_compacted"]
    state2 = {r.k: r.v for r in mortable.read_version(spark, root).collect()}
    assert state2 == state


def test_mor_compact_buckets_all_victims_race_still_loses(
    spark, tmp_path, monkeypatch
):
    """The ALL-VICTIMS path delegates to compact(); the sweep's pin
    must carry through that delegation, or an interleaved merge is
    silently folded at a fresh head while the report's ratios and
    delete_rows_before describe the pre-merge snapshot."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    base = spark.range(1, 9).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 8))
    # deletes in EVERY bucket -> both buckets exceed the threshold
    mortable.delete_keys(
        spark, root,
        spark.createDataFrame([(1,), (2,), (5,), (6,)], "k long"),
        key="k",
    )

    real_ratios = mortable.bucket_delete_ratios

    def interleaving_ratios(spark_, root_, version=None, _entries=None):
        mortable.merge_upsert(
            spark_, root_,
            spark_.createDataFrame([(3, 3000)], "k long, v long"),
            key="k",
        )
        return real_ratios(spark_, root_, version, _entries)

    monkeypatch.setattr(mortable, "bucket_delete_ratios", interleaving_ratios)
    with pytest.raises(mortable.ConcurrentWriteError):
        mortable.compact_buckets(spark, root, max_delete_ratio=0.1)
    state = {r.k: r.v for r in mortable.read_version(spark, root).collect()}
    assert state[3] == 3000 and 1 not in state


def test_mor_compact_buckets_property_random_histories(spark, tmp_path):
    """Property: for random upsert/delete histories and thresholds,
    the sweep preserves the logical state exactly and leaves zero
    delete keys mapping to compacted buckets."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyspark.sql.functions as F

    counter = [0]

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        ops=st.lists(
            st.tuples(
                st.sampled_from(["upsert", "delete"]),
                st.sets(st.integers(1, 30), min_size=1, max_size=8),
            ),
            min_size=1, max_size=4,
        ),
        thresh=st.sampled_from([0.0, 0.15, 0.5]),
    )
    def check(ops, thresh):
        counter[0] += 1
        root = str(tmp_path / f"t{counter[0]}")
        base = spark.range(1, 31).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        mortable.create(spark, root, base, key="k", nbuckets=3, bounds=(1, 30))
        for kind, keys in ops:
            if kind == "upsert":
                mortable.merge_upsert(
                    spark, root,
                    spark.createDataFrame(
                        [(k, k * 7) for k in sorted(keys)], "k long, v long"
                    ),
                    key="k",
                )
            else:
                mortable.delete_keys(
                    spark, root,
                    spark.createDataFrame([(k,) for k in sorted(keys)], "k long"),
                    key="k",
                )
        before = sorted(map(tuple, mortable.read_version(spark, root).collect()))
        report = mortable.compact_buckets(spark, root, max_delete_ratio=thresh)
        after = sorted(map(tuple, mortable.read_version(spark, root).collect()))
        assert after == before
        meta = mortable._read_meta(root)
        _d, dels_after = mortable._live(root)
        if dels_after and report["buckets_compacted"]:
            left = spark.read.parquet(
                *[os.path.join(root, e["file"]) for e in dels_after]
            ).select(
                mortable._bucket_col(F.col("k"), meta).alias("b")
            )
            got = {r.b for r in left.collect()}
            assert not (got & set(report["buckets_compacted"]))

    check()


def test_mor_compaction_policy_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "mor_compaction_policy", sf_dir)


def test_mor_compaction_policy_splits_on_threshold(spark, sf_dir):
    """The scripted history must actually exercise BOTH sides of the
    threshold: some buckets compacted (delete keys drop to zero),
    some with surviving delete keys — otherwise the sweep is not
    being tested, only run."""
    from global_superstore_data_warehouse_spark.plans.lakehouse import (
        mor_compaction_policy,
    )

    rows = mor_compaction_policy(spark, sf_dir).collect()
    compacted = [r for r in rows if r.compacted == 1]
    kept = [r for r in rows if r.compacted == 0 and r.delete_keys_before > 0]
    untouched = [r for r in rows if r.delete_keys_before == 0]
    assert compacted and kept and untouched
    for r in compacted:
        assert r.delete_keys_after == 0
    for r in kept:
        assert r.delete_keys_after == r.delete_keys_before


def test_mor_vacuum_reclaims_both_sides(spark, tmp_path):
    """mortable.vacuum folds BOTH manifest sides: after merges, a
    bucket-scoped compaction, and vacuum(retain=1, age=0), every
    superseded data AND delete file is gone from disk, every live
    file remains, and the snapshot still reads exactly."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    base = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 20))
    mortable.merge_upsert(
        spark, root,
        spark.createDataFrame([(k, k * 100) for k in (1, 2, 3)], "k long, v long"),
        key="k",
    )                                                            # v2
    mortable.delete_keys(
        spark, root, spark.createDataFrame([(15,)], "k long"), key="k"
    )                                                            # v3
    before = sorted(map(tuple, mortable.read_version(spark, root).collect()))
    mortable.compact_buckets(spark, root, max_delete_ratio=0.05)  # v4: all victims? no — ratios: b0 3/13, b1 1/10 -> both > 0.05 -> full fold
    report = mortable.vacuum(root, retain_versions=1, min_age_seconds=0)
    assert report["files_deleted"] > 0
    # every on-disk file in data/ and deletes/ is referenced by the
    # retained (latest) snapshot
    data_entries, del_entries = mortable._live(root)
    live = {e["file"] for e in data_entries} | {e["file"] for e in del_entries}
    on_disk = set()
    for d in (mortable.DATA_DIR, mortable.DELETE_DIR):
        full = os.path.join(root, d)
        if os.path.isdir(full):
            on_disk |= {f"{d}/{n}" for n in os.listdir(full)}
    assert on_disk == live
    after = sorted(map(tuple, mortable.read_version(spark, root).collect()))
    assert after == before


def test_bucket_delete_ratios_expired_pin_raises_clearly(spark, tmp_path):
    """Round-12 ADVICE: a PUBLIC-API caller may pin a historical
    version whose delete files a later vacuum reclaimed. That must
    surface as a descriptive SnapshotExpiredError before any Spark
    job runs, not a deep FileNotFoundException."""
    root = str(tmp_path / "t")
    base = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 20))
    mortable.delete_keys(
        spark, root,
        spark.createDataFrame([(k,) for k in range(1, 6)], "k long"),
        key="k",
    )
    # v2's ratios work while its delete file is live
    assert mortable.bucket_delete_ratios(spark, root, version=2)
    # fold the deletes (v3) then reclaim v2's now-dead delete file
    mortable.compact(spark, root)
    mortable.vacuum(root, retain_versions=1, min_age_seconds=0)
    with pytest.raises(mortable.SnapshotExpiredError, match="version 2"):
        mortable.bucket_delete_ratios(spark, root, version=2)
    # head-pinned reads are unaffected
    assert mortable.bucket_delete_ratios(spark, root) == {0: 0.0, 1: 0.0}


def test_bucket_delete_ratios_toctou_vacuum_maps_to_snapshot_expired(
    spark, tmp_path, monkeypatch
):
    """The exists() pre-check is TOCTOU: a vacuum landing between it
    and the Spark read still reclaims delete files. Simulate that
    interleaving (pre-check passes, file is gone at read time) and
    require the SAME SnapshotExpiredError contract, not a raw
    Spark path error."""
    root = str(tmp_path / "t")
    base = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    mortable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 20))
    mortable.delete_keys(
        spark, root,
        spark.createDataFrame([(k,) for k in range(1, 6)], "k long"),
        key="k",
    )
    mortable.compact(spark, root)
    mortable.vacuum(root, retain_versions=1, min_age_seconds=0)
    # blind the pre-check for this table's paths only: they all
    # "exist" — exactly the window where a concurrent vacuum wins
    # the race (paths outside the table keep real semantics so
    # nothing else in the process is perturbed)
    import os as _os

    real_exists = _os.path.exists
    monkeypatch.setattr(
        mortable.os.path, "exists",
        lambda p: True if str(p).startswith(root) else real_exists(p),
    )
    with pytest.raises(
        mortable.SnapshotExpiredError, match="version 2.*vacuumed"
    ):
        mortable.bucket_delete_ratios(spark, root, version=2)

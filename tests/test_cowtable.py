"""Copy-on-write table (sources/cowtable.py): the executed file-level
MERGE path. Equality vs the full-rewrite merges on arbitrary
hypothesis scenarios, pruning proofs (untouched files never touched —
verified by inode mtime), time travel, footer-stats audit, and the
optimistic-concurrency commit conflict."""

import json
import os
import shutil
import tempfile
from datetime import date

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.operators.merge import (
    scd1_upsert,
    scd2_merge,
)
from global_superstore_data_warehouse_spark.sources import cowtable


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="cowtable-test-")
    path = os.path.join(d, "tbl")
    yield path
    shutil.rmtree(d, ignore_errors=True)


def _norm(df):
    return sorted(map(tuple, df.collect()))


def _customers(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )


def test_create_read_roundtrip(spark, sf_dir, root):
    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=8)
    assert _norm(cowtable.read_version(spark, root)) == _norm(df)
    # one file per non-empty bucket, all buckets in range
    files = cowtable.live_files(root)
    assert 1 <= len(files) <= 8
    assert len({e["bucket"] for e in files}) == len(files)


def test_footer_stats_match_contents(spark, sf_dir, root):
    cowtable.create(
        spark, root, _customers(spark, sf_dir), key="c_custkey", nbuckets=8
    )
    meta = cowtable._read_meta(root)
    for e in cowtable.live_files(root):
        f = spark.read.parquet(os.path.join(root, e["file"]))
        lo, hi, n = f.agg(
            F.min("c_custkey"), F.max("c_custkey"), F.count(F.lit(1))
        ).first()
        assert (e["min_key"], e["max_key"], e["rows"]) == (lo, hi, n)
        # every key in the file maps to the file's logged bucket
        buckets = (
            f.select(
                cowtable._bucket_col(F.col("c_custkey"), meta).alias("b")
            )
            .distinct()
            .collect()
        )
        assert {r.b for r in buckets} == {e["bucket"]}


def test_scd1_merge_equals_full_rewrite_and_prunes(spark, sf_dir, root):
    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=8)
    before = {
        e["file"]: os.stat(os.path.join(root, e["file"])).st_mtime_ns
        for e in cowtable.live_files(root)
    }
    # a narrow key slice (first ~quarter of the key range) + inserts
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    cut = lo + (hi - lo) // 4
    source = (
        df.filter(F.col("c_custkey") <= cut)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2))
        .unionByName(
            spark.createDataFrame(
                [(hi + 1, "new customer", 1.0, "BUILDING")],
                "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
            )
        )
    )
    report = cowtable.merge_scd1(
        spark, root, source,
        keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
    )
    # pruning: the slice + one insert at the top touches SOME but not
    # all buckets, and carried files were not rewritten
    assert 0 < report["files_rewritten"] < len(before)
    assert report["files_carried"] > 0
    for e in cowtable.live_files(root):
        if e["file"] in before:  # carried over by reference
            assert (
                os.stat(os.path.join(root, e["file"])).st_mtime_ns
                == before[e["file"]]
            )
    expected = scd1_upsert(
        df, source, keys=["c_custkey"],
        attrs=["c_name", "c_acctbal", "c_mktsegment"],
    ).drop("is_updated")
    got = cowtable.read_version(spark, root).select(*expected.columns)
    assert _norm(got) == _norm(expected)
    # time travel: version 1 is still the pre-merge state
    assert _norm(
        cowtable.read_version(spark, root, version=1).select(*df.columns)
    ) == _norm(df)
    assert [h["op"] for h in cowtable.history(root)] == [
        "create", "merge_scd1",
    ]


def test_commit_conflict_raises(spark, sf_dir, root):
    cowtable.create(
        spark, root, _customers(spark, sf_dir), key="c_custkey", nbuckets=4
    )
    with pytest.raises(cowtable.ConcurrentWriteError):
        cowtable._commit(root, 1, {"op": "dup", "adds": [], "removes": []})
    # the losing writer leaves no stray staging file behind
    strays = [n for n in os.listdir(cowtable._log_path(root)) if ".tmp" in n]
    assert strays == []


def test_commit_log_is_valid_json_chain(spark, sf_dir, root):
    cowtable.create(
        spark, root, _customers(spark, sf_dir), key="c_custkey", nbuckets=4
    )
    for v in range(1, cowtable.current_version(root) + 1):
        with open(cowtable._commit_path(root, v)) as f:
            c = json.load(f)
        assert {"op", "adds", "removes"} <= set(c)
        assert set(c) <= {"op", "adds", "removes", "batch_id"}


# --- hypothesis: COW SCD2 merge == full-rewrite SCD2 merge ------------

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

key_state = st.tuples(
    st.booleans(),
    st.booleans(),
    st.sampled_from(["a", "b", "c"]),
    st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d"])),
)
scenario = st.dictionaries(
    st.integers(min_value=0, max_value=12), key_state, min_size=1, max_size=8
)


def _build(spark, scen):
    dim_rows, src_rows = [], []
    for k, (has_hist, has_open, open_attr, src_attr) in scen.items():
        if has_hist:
            dim_rows.append((k, "h", date(2019, 1, 1), date(2020, 1, 1), False))
        if has_open:
            dim_rows.append(
                (k, open_attr, date(2020, 1, 1), date(9999, 12, 31), True)
            )
        if src_attr is not None:
            src_rows.append((k, src_attr))
    dim = spark.createDataFrame(
        dim_rows or [(99, "x", date(2020, 1, 1), date(9999, 12, 31), True)],
        "k long, attr string, start_dt date, end_dt date, is_active boolean",
    )
    src = spark.createDataFrame(src_rows or [(98, "y")], "k long, attr string")
    return dim, src


@pytest.mark.usefixtures("spark")
class TestCowScd2EqualsFullRewrite:
    @given(scen=scenario)
    @settings(**SETTINGS)
    def test_equality(self, spark, scen):
        dim, src = _build(spark, scen)
        d = tempfile.mkdtemp(prefix="cowtable-prop-")
        try:
            root = os.path.join(d, "tbl")
            cowtable.create(spark, root, dim, key="k", nbuckets=4)
            cowtable.merge_scd2(
                spark, root, src, keys=["k"], attrs=["attr"],
                effective_date="2024-06-15",
            )
            expected = scd2_merge(
                dim, src, keys=["k"], attrs=["attr"],
                effective_date="2024-06-15",
            )
            got = cowtable.read_version(spark, root).select(*expected.columns)
            assert _norm(got) == _norm(expected)
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_cow_merge_upsert_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "cow_merge_upsert", sf_dir)


def test_cow_merge_upsert_prunes_some_buckets(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.lakehouse import (
        cow_merge_upsert,
    )

    rows = cow_merge_upsert(spark, sf_dir).collect()
    rewritten = [r.bucket for r in rows if r.rewritten == 1]
    carried = [r.bucket for r in rows if r.rewritten == 0]
    # the fifth-of-range update + top inserts touch SOME buckets only
    assert rewritten and carried
    # inserted rows land in the top bucket, which must be rewritten
    top = max(r.bucket for r in rows)
    assert top in rewritten
    assert sum(r.n_inserted for r in rows) == 3


def test_append_then_compact_preserves_state(spark, sf_dir, root):
    """OPTIMIZE semantics: appends fragment buckets into many files;
    compact rewrites multi-file buckets to one file each WITHOUT
    changing a single row, and old versions stay readable."""
    df = _customers(spark, sf_dir)
    half1 = df.filter(F.col("c_custkey") % 2 == 0)
    half2 = df.filter(F.col("c_custkey") % 2 == 1)
    cowtable.create(spark, root, half1, key="c_custkey", nbuckets=4)
    cowtable.append(spark, root, half2)
    files_before = cowtable.live_files(root)
    # appends created multi-file buckets
    buckets = [e["bucket"] for e in files_before]
    assert len(buckets) > len(set(buckets))
    pre = _norm(cowtable.read_version(spark, root))
    report = cowtable.compact(spark, root)
    assert report["buckets_compacted"] > 0
    assert report["files_after"] < report["files_before"]
    files_after = cowtable.live_files(root)
    # one file per bucket now
    assert len(files_after) == len({e["bucket"] for e in files_after})
    # rows identical; history readable at every version
    assert _norm(cowtable.read_version(spark, root)) == pre
    assert _norm(cowtable.read_version(spark, root, version=2)) == pre
    assert [h["op"] for h in cowtable.history(root)] == [
        "create", "append", "compact",
    ]
    # idempotent: nothing left to compact
    again = cowtable.compact(spark, root)
    assert again["buckets_compacted"] == 0


def test_vacuum_deletes_unreachable_and_orphans(spark, sf_dir, root):
    """After a merge, vacuum(retain_versions=1) removes the files the
    merge replaced plus never-committed orphans; the current snapshot
    is untouched; time travel to the vacuumed version breaks (the
    documented VACUUM contract)."""
    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=8)
    pre = _norm(cowtable.read_version(spark, root))
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    source = df.filter(F.col("c_custkey") <= lo + (hi - lo) // 4).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 1.0, 2)
    )
    cowtable.merge_scd1(
        spark, root, source, keys=["c_custkey"],
        attrs=["c_name", "c_acctbal", "c_mktsegment"],
    )
    # plant an orphan (a crashed writer's staged file)
    orphan = os.path.join(root, cowtable.DATA_DIR, "v99-b00000-0.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    # ...and a crashed writer's whole staging tree at the table root
    # (staging lives under the root since round 8; nothing but vacuum
    # reclaims it — the round-8 advisor's finding)
    stage_orphan = os.path.join(root, "_stage-v99-crashed")
    os.makedirs(os.path.join(stage_orphan, "_bucket=0"))
    with open(os.path.join(stage_orphan, "_bucket=0", "part-0.parquet"), "wb") as f:
        f.write(b"staged but never committed")
    snap = _norm(cowtable.read_version(spark, root))
    # Default vacuum honors the min-age floor (Delta's retention-hours
    # miniature): every file here is seconds old, so nothing may be
    # deleted — this is what makes vacuum safe against an in-flight
    # writer whose files land in data/ before its commit links.
    aged = cowtable.vacuum(root, retain_versions=1)
    assert aged["files_deleted"] == 0
    assert os.path.exists(orphan)
    assert os.path.isdir(stage_orphan)
    # min_age_seconds=0 = the single-process admin stance: delete
    # everything unreachable, deterministically.
    report = cowtable.vacuum(root, retain_versions=1, min_age_seconds=0)
    assert report["files_deleted"] > 0
    assert report["bytes_deleted"] > 0
    assert not os.path.exists(orphan)
    assert not os.path.exists(stage_orphan)
    # current snapshot intact
    assert _norm(cowtable.read_version(spark, root)) == snap
    assert snap != pre
    # vacuumed version no longer readable
    with pytest.raises(Exception):
        cowtable.read_version(spark, root, version=1).collect()


def test_changes_cdf_matches_merge_effects(spark, sf_dir, root):
    """The change feed between create and merge must be exactly the
    merge's effects: inserts = brand-new keys, update_pre/post pairs
    = keys whose attrs changed (with correct old/new values), no
    deletes from an upsert, and rows whose attrs didn't change never
    appear."""
    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=8)
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    cut = lo + (hi - lo) // 4
    changed = df.filter(F.col("c_custkey") <= cut).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2)
    )
    # include a NO-OP source row (same attrs) — must not appear in CDF
    noop = df.filter(F.col("c_custkey") == hi)
    inserts = spark.createDataFrame(
        [(hi + 1, "new customer", 1.0, "BUILDING")],
        "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
    )
    cowtable.merge_scd1(
        spark, root, changed.unionByName(noop).unionByName(inserts),
        keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
    )
    feed = cowtable.changes(spark, root, 1, 2).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert sorted(by_type) == ["insert", "update_post", "update_pre"]
    assert [r.c_custkey for r in by_type["insert"]] == [hi + 1]
    changed_keys = {r.c_custkey for r in changed.collect()}
    assert {r.c_custkey for r in by_type["update_pre"]} == changed_keys
    assert {r.c_custkey for r in by_type["update_post"]} == changed_keys
    # the no-op key appears nowhere
    assert all(r.c_custkey != hi for r in feed)
    # pre/post values straddle the +100
    pre = {r.c_custkey: r.c_acctbal for r in by_type["update_pre"]}
    post = {r.c_custkey: r.c_acctbal for r in by_type["update_post"]}
    for k in changed_keys:
        assert abs(post[k] - pre[k] - 100.0) < 0.01


def test_scan_key_range_prunes_losslessly(spark, sf_dir, root):
    """The stats-pruned scan returns exactly the rows a full-scan
    filter returns, for narrow, wide, empty, and boundary ranges —
    and actually prunes files for narrow ranges."""
    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=8)
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    n_files = len(cowtable.live_files(root))
    cases = [
        (lo, lo),  # single bottom key
        (lo, lo + (hi - lo) // 8),  # narrow
        (lo, hi),  # everything
        (hi + 10, hi + 20),  # empty above range
    ]
    for a, b in cases:
        got = _norm(
            cowtable.scan_key_range(spark, root, a, b).select(*df.columns)
        )
        want = _norm(
            df.filter((F.col("c_custkey") >= a) & (F.col("c_custkey") <= b))
        )
        assert got == want, (a, b)
    # the narrow range must open strictly fewer files than exist
    narrow = [
        e
        for e in cowtable.live_files(root)
        if e["min_key"] <= lo + (hi - lo) // 8 and e["max_key"] >= lo
    ]
    assert 0 < len(narrow) < n_files


def test_cow_stream_upsert_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "cow_stream_upsert", sf_dir)


def test_append_evolves_schema_additively(spark, sf_dir, root):
    """A later append may carry a NEW column: snapshots spanning the
    evolution null-fill the old files (Delta's additive evolution);
    time travel to the pre-evolution version shows the old schema."""
    df = _customers(spark, sf_dir)
    half1 = df.filter(F.col("c_custkey") % 2 == 0)
    half2 = df.filter(F.col("c_custkey") % 2 == 1).withColumn(
        "loyalty_tier", F.lit("GOLD")
    )
    cowtable.create(spark, root, half1, key="c_custkey", nbuckets=4)
    cowtable.append(spark, root, half2)
    snap = cowtable.read_version(spark, root)
    assert "loyalty_tier" in snap.columns
    rows = {r.c_custkey: r.loyalty_tier for r in snap.collect()}
    for k, tier in rows.items():
        assert tier == ("GOLD" if k % 2 == 1 else None)
    v1 = cowtable.read_version(spark, root, version=1)
    assert "loyalty_tier" not in v1.columns


def test_mv_apply_cdf_equals_recompute(spark, sf_dir, root):
    """Folding the change feed into the persisted per-segment MV must
    equal recomputing the MV from the new snapshot — including
    updates that MOVE rows between segments."""
    from global_superstore_data_warehouse_spark.plans.lakehouse import (
        mv_apply_cdf,
    )

    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=8)

    def mv(snapshot):
        return (
            snapshot.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.round(F.col("c_acctbal") * 100).cast("long")
                ).alias("sum_cents"),
            )
        )

    state_v1 = mv(cowtable.read_version(spark, root, 1))
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    source = (
        df.filter(F.col("c_custkey") % 5 == 0)
        .withColumn("c_mktsegment", F.lit("MOVED"))  # group-moving update
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 7.0, 2))
        .unionByName(
            spark.createDataFrame(
                [(hi + 1, "cdf customer", 42.0, "BUILDING")],
                "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
            )
        )
    )
    cowtable.merge_scd1(
        spark, root, source,
        keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
    )
    feed = cowtable.changes(spark, root, 1, 2)
    got = mv_apply_cdf(state_v1, feed, "c_mktsegment", "c_acctbal")
    want = mv(cowtable.read_version(spark, root, 2))
    assert _norm(got) == _norm(want)


def test_changes_cdf_spans_schema_evolution(spark, sf_dir, root):
    """A change feed spanning an additive-schema append must read the
    old side with mergeSchema semantics (null-filled new column), not
    throw — and report the appended rows as inserts whose new column
    is populated. Pre-fix this raised on the old files' missing
    column, making schema evolution and CDF (both supported alone)
    inconsistent in combination."""
    df = _customers(spark, sf_dir)
    half1 = df.filter(F.col("c_custkey") % 2 == 0)
    half2 = df.filter(F.col("c_custkey") % 2 == 1).withColumn(
        "loyalty_tier", F.lit("GOLD")
    )
    cowtable.create(spark, root, half1, key="c_custkey", nbuckets=4)
    cowtable.append(spark, root, half2)
    feed = cowtable.changes(spark, root, 1, 2)
    assert "loyalty_tier" in feed.columns
    rows = feed.collect()
    # appends touch every bucket, so the diff covers the whole table:
    # old rows re-diff as unchanged (absent), new rows are inserts
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert {r.c_custkey % 2 for r in rows} == {1}
    assert all(r.loyalty_tier == "GOLD" for r in rows)
    assert len(rows) == half2.count()


def test_merge_retries_after_losing_commit_race(spark, sf_dir, root, monkeypatch):
    """Optimistic-concurrency RETRY (Delta's conflict loop): a merge
    that loses the create-exclusive commit race must re-read the
    winner's snapshot, replay itself on top, and succeed — the final
    state is exactly the two merges applied serially. Simulated
    deterministically: the first _commit call from the loser is
    interposed to run a REAL competing merge first (a genuine second
    writer winning the version), then proceed."""
    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=4)
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()

    winner_src = df.filter(F.col("c_custkey") == lo).withColumn(
        "c_name", F.lit("winner wrote this")
    )
    loser_src = df.filter(F.col("c_custkey") == hi).withColumn(
        "c_name", F.lit("loser wrote this")
    )

    real_commit = cowtable._commit
    fired = {"done": False}

    def racing_commit(r, version, payload):
        if not fired["done"]:
            fired["done"] = True
            # the competing writer lands the SAME version first
            monkeypatch.setattr(cowtable, "_commit", real_commit)
            cowtable.merge_scd1(
                spark, r, winner_src,
                keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
            )
            monkeypatch.setattr(cowtable, "_commit", racing_commit)
        return real_commit(r, version, payload)

    monkeypatch.setattr(cowtable, "_commit", racing_commit)
    report = cowtable.merge_scd1(
        spark, root, loser_src,
        keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
    )
    monkeypatch.setattr(cowtable, "_commit", real_commit)
    assert report["commit_attempts"] == 2

    final = {r["c_custkey"]: r["c_name"] for r in cowtable.read_version(spark, root).collect()}
    assert final[lo] == "winner wrote this"   # winner's effect survives
    assert final[hi] == "loser wrote this"    # loser replayed on top
    # history shows BOTH merges as separate serialized commits
    assert [h["op"] for h in cowtable.history(root)] == [
        "create", "merge_scd1", "merge_scd1",
    ]


def test_merge_race_same_bucket_no_clobber(spark, sf_dir, root, monkeypatch):
    """SAME-BUCKET commit race: the loser's pre-retry write attempt
    stages files for the very bucket the winner just committed.
    Data-file names carry a per-attempt uuid token, so the loser's
    attempt-1 rename lands beside — never on top of — the winner's
    committed file. Pre-fix the deterministic v{N+1}-b{B}-{i} name
    collided and os.rename REPLACED the winner's committed file with
    the loser's attempt-1 content (built from the OLD snapshot), so
    the loser's retry replayed against silently-corrupted data and
    the winner's update was lost despite both commits landing.

    Asserts both the serialized end state AND — the direct clobber
    check — that time-traveling to the winner's version still shows
    exactly the winner's effect."""
    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=4)
    meta = cowtable._read_meta(root)
    # two DISTINCT keys hashed to the SAME bucket
    pair = (
        df.select(
            "c_custkey",
            cowtable._bucket_col(F.col("c_custkey"), meta).alias("b"),
        )
        .orderBy("c_custkey")
        .limit(50)
        .collect()
    )
    by_bucket = {}
    k1 = k2 = None
    for r in pair:
        if r["b"] in by_bucket and by_bucket[r["b"]] != r["c_custkey"]:
            k1, k2 = by_bucket[r["b"]], r["c_custkey"]
            break
        by_bucket[r["b"]] = r["c_custkey"]
    assert k1 is not None, "no same-bucket key pair in first 50 keys"

    winner_src = df.filter(F.col("c_custkey") == k1).withColumn(
        "c_name", F.lit("winner wrote this")
    )
    loser_src = df.filter(F.col("c_custkey") == k2).withColumn(
        "c_name", F.lit("loser wrote this")
    )

    # Interpose on _write_bucketed, NOT _commit: the dangerous
    # interleaving is loser-reads-snapshot -> winner COMMITS ->
    # loser WRITES (post-commit, so a name collision would replace
    # the winner's committed file) -> loser's commit loses -> retry.
    real_write = cowtable._write_bucketed
    fired = {"done": False}

    def racing_write(r, version, d, key, meta_):
        if not fired["done"]:
            fired["done"] = True  # re-entrancy: winner uses real path
            cowtable.merge_scd1(
                spark, r, winner_src,
                keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
            )
        return real_write(r, version, d, key, meta_)

    monkeypatch.setattr(cowtable, "_write_bucketed", racing_write)
    report = cowtable.merge_scd1(
        spark, root, loser_src,
        keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
    )
    monkeypatch.setattr(cowtable, "_write_bucketed", real_write)
    assert report["commit_attempts"] == 2

    final = {
        r["c_custkey"]: r["c_name"]
        for r in cowtable.read_version(spark, root).collect()
        if r["c_custkey"] in (k1, k2)
    }
    assert final[k1] == "winner wrote this"  # NOT lost to the clobber
    assert final[k2] == "loser wrote this"
    # direct no-clobber proof: the winner's v2 snapshot is byte-intact
    v2 = {
        r["c_custkey"]: r["c_name"]
        for r in cowtable.read_version(spark, root, version=2).collect()
        if r["c_custkey"] in (k1, k2)
    }
    assert v2[k1] == "winner wrote this"
    assert v2[k2] != "loser wrote this"  # loser's attempt-1 never visible


def test_merge_negative_retries_rejected(spark, sf_dir, root):
    """retries < 0 must raise immediately — range(retries+1) is empty,
    so pre-fix the merge silently did NOTHING and returned None."""
    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=4)
    with pytest.raises(ValueError, match="retries"):
        cowtable.merge_scd1(
            spark, root, df.limit(1),
            keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
            retries=-1,
        )


def test_merge_retries_zero_fails_fast(spark, sf_dir, root, monkeypatch):
    """retries=0 restores fail-fast (the exactly-once streaming sink
    contract: a conflict means a zombie raced the same batch — it
    must surface, not replay past the batch_id dedupe check)."""
    df = _customers(spark, sf_dir)
    cowtable.create(spark, root, df, key="c_custkey", nbuckets=4)

    real_commit = cowtable._commit

    def racing_commit(r, version, payload):
        # a competitor claims the version between the merge's
        # snapshot read and its commit
        if not os.path.exists(cowtable._commit_path(r, version)):
            real_commit(r, version, {"op": "txn", "adds": [], "removes": []})
        return real_commit(r, version, payload)

    monkeypatch.setattr(cowtable, "_commit", racing_commit)
    with pytest.raises(cowtable.ConcurrentWriteError):
        cowtable.merge_scd1(
            spark, root, df.limit(1),
            keys=["c_custkey"], attrs=["c_name", "c_acctbal", "c_mktsegment"],
            retries=0,
        )


def test_cow_merge_delete_prunes_and_deletes(spark, tmp_path):
    """merge_delete rewrites only the buckets the key set maps to and
    removes exactly those keys."""
    import pyspark.sql.functions as F

    from global_superstore_data_warehouse_spark.sources import cowtable

    root = str(tmp_path / "t")
    df = spark.range(1, 101).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    cowtable.create(spark, root, df, key="k", nbuckets=4, bounds=(1, 100))
    report = cowtable.merge_delete(
        spark, root, spark.range(10, 20).select(F.col("id").alias("k"))
    )
    assert report["touched_buckets"] == [0]
    assert report["files_carried"] >= 3
    got = {r.k for r in cowtable.read_version(spark, root).collect()}
    assert got == set(range(1, 101)) - set(range(10, 20))


def test_cow_change_feed_all_change_types(spark, tmp_path):
    """CDF over create -> upsert -> delete reports exactly the four
    change kinds with correct pre/post images and versions."""
    import pyspark.sql.functions as F

    from global_superstore_data_warehouse_spark.sources import cowtable

    root = str(tmp_path / "t")
    df = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    cowtable.create(spark, root, df, key="k", nbuckets=2, bounds=(1, 20))
    # v2: update k in {1,2} (+1), insert k=21
    src = spark.createDataFrame(
        [(1, 11), (2, 21), (21, 210)], "k long, v long"
    )
    cowtable.merge_scd1(spark, root, src, keys=["k"], attrs=["v"])
    # v3: delete k in {2, 5}
    cowtable.merge_delete(
        spark, root, spark.createDataFrame([(2,), (5,)], "k long")
    )
    rows = {
        (r.k, r._change_type, r._commit_version, r.v)
        for r in cowtable.change_feed(spark, root, 1).collect()
    }
    assert rows == {
        (1, "update_preimage", 2, 10), (1, "update_postimage", 2, 11),
        (2, "update_preimage", 2, 20), (2, "update_postimage", 2, 21),
        (21, "insert", 2, 210),
        (2, "delete", 3, 21),   # post-update value, not the original
        (5, "delete", 3, 50),
    }
    # range validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad change_feed range"):
        cowtable.change_feed(spark, root, 0)
    with _pytest.raises(ValueError, match="bad change_feed range"):
        cowtable.change_feed(spark, root, 2, 9)


def test_cow_change_feed_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "cow_change_feed", sf_dir)


def test_change_feed_property_random_histories(spark, tmp_path):
    """Property: for random upsert/delete commit sequences, BOTH
    engines' change feeds equal a pure-python simulation of the
    row-level history (the same state machine, no Spark). Seeds are
    fixed for determinism; keys collide across commits on purpose."""
    import random

    import pyspark.sql.functions as F

    from global_superstore_data_warehouse_spark.sources import (
        cowtable,
        mortable,
    )

    for seed in (7, 23):
        rng = random.Random(seed)
        base = {k: k * 10 for k in range(1, 13)}
        ops = []
        for _v in range(3):  # 3 commits after create
            if rng.random() < 0.4:
                ops.append(("delete", sorted(rng.sample(range(1, 16), 3))))
            else:
                ops.append((
                    "upsert",
                    {k: rng.randrange(1000) for k in rng.sample(range(1, 16), 4)},
                ))

        # pure-python simulation of the expected feed
        state = dict(base)
        expect = set()
        for i, (kind, arg) in enumerate(ops):
            v = i + 2
            if kind == "delete":
                for k in arg:
                    if k in state:
                        expect.add((k, "delete", v, state.pop(k)))
            else:
                for k, val in sorted(arg.items()):
                    if k in state:
                        if state[k] != val:
                            expect.add((k, "update_preimage", v, state[k]))
                            expect.add((k, "update_postimage", v, val))
                    else:
                        expect.add((k, "insert", v, val))
                    state[k] = val

        for engine, mod in (("cow", cowtable), ("mor", mortable)):
            root = str(tmp_path / f"{engine}-{seed}")
            df = spark.createDataFrame(
                sorted(base.items()), "k long, v long"
            )
            mod.create(spark, root, df, key="k", nbuckets=3, bounds=(1, 15))
            for kind, arg in ops:
                if kind == "delete":
                    keys = spark.createDataFrame(
                        [(k,) for k in arg], "k long"
                    )
                    if engine == "cow":
                        mod.merge_delete(spark, root, keys)
                    else:
                        mod.delete_keys(spark, root, keys, key="k")
                else:
                    src = spark.createDataFrame(
                        sorted(arg.items()), "k long, v long"
                    )
                    if engine == "cow":
                        mod.merge_scd1(spark, root, src, keys=["k"], attrs=["v"])
                    else:
                        mod.merge_upsert(spark, root, src, key="k")
            got = {
                (r.k, r._change_type, r._commit_version, r.v)
                for r in mod.change_feed(spark, root, 1).collect()
            }
            assert got == expect, (engine, seed)


def test_cow_merge_delete_gate_shuffle_path(spark, tmp_path, monkeypatch):
    """Round-11 advice: merge_delete's anti-join broadcast is gated,
    not assumed. With the gate forced to zero, the same call runs the
    shuffle anti-join and deletes identically."""
    import pyspark.sql.functions as F

    from global_superstore_data_warehouse_spark.operators import hints
    from global_superstore_data_warehouse_spark.sources import cowtable

    root = str(tmp_path / "t")
    df = spark.range(1, 101).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    cowtable.create(spark, root, df, key="k", nbuckets=4, bounds=(1, 100))
    monkeypatch.setattr(hints, "BROADCAST_MAX_ROWS", 0)
    cowtable.merge_delete(
        spark, root, spark.range(10, 20).select(F.col("id").alias("k"))
    )
    got = {r.k for r in cowtable.read_version(spark, root).collect()}
    assert got == set(range(1, 101)) - set(range(10, 20))


def test_cow_change_feed_folds_log_once(spark, tmp_path, monkeypatch):
    """Round-11 advice: change_feed must fold the commit log
    incrementally (O(V) driver-side log reads), never by calling
    live_files per version (O(V^2)). Proven by making live_files
    explode: the feed must still plan and collect correctly."""
    import pyspark.sql.functions as F

    from global_superstore_data_warehouse_spark.sources import cowtable

    root = str(tmp_path / "t")
    df = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    cowtable.create(spark, root, df, key="k", nbuckets=2, bounds=(1, 20))
    for step in range(2, 6):  # v2..v5: four single-key upserts
        cowtable.merge_scd1(
            spark, root,
            spark.createDataFrame([(1, step * 100)], "k long, v long"),
            keys=["k"], attrs=["v"],
        )

    def boom(*a, **k):
        raise AssertionError("change_feed must not call live_files")

    monkeypatch.setattr(cowtable, "live_files", boom)
    rows = {
        (r.k, r._change_type, r._commit_version, r.v)
        for r in cowtable.change_feed(spark, root, 1).collect()
    }
    assert (1, "update_postimage", 5, 500) in rows
    assert len([r for r in rows if r[1] == "update_postimage"]) == 4


def test_cow_compact_loses_race_to_interleaved_merge(
    spark, tmp_path, monkeypatch
):
    """Round-13 twin of test_mortable's compact race test (the r12
    verdict's directive #6): compact pins ``version`` BEFORE reading
    live files and commits at version+1, so a merge that commits
    inside compact's read window must win — compact's `_commit`
    create-exclusive collision fires (ConcurrentWriteError) instead
    of compact silently re-publishing pre-merge rows from its stale
    snapshot."""
    root = str(tmp_path / "t")
    base = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    half1 = base.filter(F.col("k") % 2 == 0)
    half2 = base.filter(F.col("k") % 2 == 1)
    cowtable.create(spark, root, half1, key="k", nbuckets=2, bounds=(1, 20))
    cowtable.append(spark, root, half2)  # multi-file buckets -> victims

    real_live_files = cowtable.live_files
    fired = [False]

    def interleaving_live_files(root_, version=None):
        # A concurrent writer lands between compact's version pin and
        # its commit: update k=7 (v 70 -> 7000). Guard with a flag —
        # the interleaved merge itself calls live_files, and so does
        # the post-race verification read.
        if not fired[0]:
            fired[0] = True
            entries = real_live_files(root_, version)
            cowtable.merge_scd1(
                spark, root_,
                spark.createDataFrame([(7, 7000)], "k long, v long"),
                keys=["k"], attrs=["v"],
            )
            return entries  # compact's (now stale) pinned snapshot
        return real_live_files(root_, version)

    monkeypatch.setattr(cowtable, "live_files", interleaving_live_files)
    with pytest.raises(cowtable.ConcurrentWriteError):
        cowtable.compact(spark, root)
    # the interleaved merge's write survives — the stale compact
    # snapshot (which still holds k=7 -> 70) was never committed
    state = {r.k: r.v for r in cowtable.read_version(spark, root).collect()}
    assert state[7] == 7000
    assert [h["op"] for h in cowtable.history(root)] == [
        "create", "append", "merge_scd1",
    ]
    # and compact still works once the table is quiescent
    monkeypatch.setattr(cowtable, "live_files", real_live_files)
    report = cowtable.compact(spark, root)
    assert report["buckets_compacted"] > 0
    state2 = {r.k: r.v for r in cowtable.read_version(spark, root).collect()}
    assert state2 == state


def test_cow_vacuum_interleaved_commit_loses_no_files(
    spark, tmp_path, monkeypatch
):
    """A merge that commits while vacuum scans must not lose data:
    the merge's freshly staged files are younger than the age floor,
    so even though vacuum's pinned keep-set predates them they are
    kept, and the post-merge snapshot reads intact."""
    root = str(tmp_path / "t")
    base = spark.range(1, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    cowtable.create(spark, root, base, key="k", nbuckets=2, bounds=(1, 20))

    real_live_files = cowtable.live_files
    fired = [False]

    def interleaving_live_files(root_, version=None):
        if not fired[0]:
            fired[0] = True
            entries = real_live_files(root_, version)
            cowtable.merge_scd1(
                spark, root_,
                spark.createDataFrame([(3, 3000)], "k long, v long"),
                keys=["k"], attrs=["v"],
            )
            return entries  # vacuum's pre-merge keep-set
        return real_live_files(root_, version)

    monkeypatch.setattr(cowtable, "live_files", interleaving_live_files)
    report = cowtable.vacuum(root, retain_versions=1)
    monkeypatch.setattr(cowtable, "live_files", real_live_files)
    # nothing deleted: every file not in the stale keep-set is
    # younger than the age floor (the documented in-flight-writer
    # contract), so the interleaved merge's state is fully readable
    assert report["files_deleted"] == 0
    state = {r.k: r.v for r in cowtable.read_version(spark, root).collect()}
    assert state[3] == 3000 and len(state) == 20

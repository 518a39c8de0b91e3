"""Lakehouse-layer registered queries: the COW transaction-log
table's MERGE exercised end-to-end under the driver's oracle gate.

``sources/cowtable.py`` holds the mechanism (commit log, bucketed
files, footer stats, pruned MERGE); this plan runs a full
create → upsert-batch → merge → snapshot-read lifecycle against the
driver's customer table and reports a per-bucket audit the DuckDB
oracle reproduces from pure SQL — so the HASH check proves the
file-pruned merge computed exactly the logical upsert, and the
``rewritten`` column proves the pruning decision itself (bucket ∈
source buckets) is the one the log-level merge made.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.sources import cowtable

NBUCKETS = 16
N_INSERTS = 3


def cow_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 upsert through the copy-on-write transaction-log table,
    verified at the VALUE level by the driver's oracle: CREATE the
    customer table range-bucketed 16 ways on c_custkey, merge a
    deterministic update batch (the first fifth of the key range
    gets +100.00 on c_acctbal, plus {N_INSERTS} brand-new keys above
    the range), then snapshot-read the result and fold it to a
    per-bucket audit: row count, how many rows the batch updated /
    inserted, the balance total in exact integer cents, and whether
    the MERGE rewrote that bucket's file (it must rewrite exactly
    the buckets the source keys map to — 4 of 16 here — and carry
    the rest by reference; tests/test_cowtable.py proves the carried
    files' inodes never move).

    Scale shape: the merge reads only touched buckets' files
    (file-level pruning via the commit log — Delta's MERGE shape);
    the audit is one scan of the snapshot with a 16-group
    aggregation. The tempdir table is demonstration plumbing; at
    100 TB the same log sits next to the data on object storage.
    """
    df = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    lo, hi = int(lo), int(hi)
    cut = lo + (hi - lo) // 5

    work = tempfile.mkdtemp(prefix="cow-upsert-")
    root = work + "/tbl"
    try:
        cowtable.create(
            spark, root, df, key="c_custkey", nbuckets=NBUCKETS, bounds=(lo, hi)
        )

        inserts = spark.range(1, N_INSERTS + 1).select(
            (F.lit(hi) + F.col("id")).alias("c_custkey"),
            F.concat(F.lit("new customer "), F.col("id")).alias("c_name"),
            F.col("id").cast("double").alias("c_acctbal"),
            F.lit("BUILDING").alias("c_mktsegment"),
        )
        source = (
            df.filter(F.col("c_custkey") <= cut)
            .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2))
            .unionByName(inserts)
        )
        report = cowtable.merge_scd1(
            spark,
            root,
            source,
            keys=["c_custkey"],
            attrs=["c_name", "c_acctbal", "c_mktsegment"],
        )
        touched = report["touched_buckets"]

        meta = cowtable._read_meta(root)
        snap = cowtable.read_version(spark, root)
        out = (
            snap.withColumn(
                "bucket", cowtable._bucket_col(F.col("c_custkey"), meta)
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    (F.col("c_custkey") <= cut).cast("long")
                ).alias("n_updated"),
                F.sum((F.col("c_custkey") > hi).cast("long")).alias("n_inserted"),
                F.sum(
                    F.round(F.col("c_acctbal") * 100).cast("long")
                ).alias("sum_acctbal_cents"),
            )
            .withColumn(
                "rewritten",
                F.col("bucket").isin([int(b) for b in touched]).cast("int"),
            )
            .select(
                F.col("bucket").cast("int").alias("bucket"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_updated").cast("bigint").alias("n_updated"),
                F.col("n_inserted").cast("bigint").alias("n_inserted"),
                "sum_acctbal_cents",
                "rewritten",
            )
        )
        # Eager materialization of the NBUCKETS-row audit severs the
        # lineage to the temp table so the finally can reclaim it —
        # repeated bench/driver runs used to accumulate full customer
        # copies in the temp dir (one per invocation, never removed).
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# The oracle rebuilds the identical upsert + bucket audit from pure
# SQL: bucket = GREATEST(0, LEAST(15, ((k - lo) * 16) // (hi - lo + 1)))
# over the post-merge state (source wins on key match, unmatched
# target passes through, inserts append); rewritten = bucket is one a
# source key maps to. A hash match therefore proves the COW-pruned
# merge produced exactly the logical upsert AND pruned exactly the
# right buckets.
COW_MERGE_UPSERT_ORACLE = f"""
    WITH bounds AS (
        SELECT MIN(c_custkey) AS lo, MAX(c_custkey) AS hi,
               MIN(c_custkey) + (MAX(c_custkey) - MIN(c_custkey)) // 5 AS cut
        FROM customer
    ), source AS (
        SELECT c.c_custkey, c.c_name,
               ROUND(c.c_acctbal + 100.0, 2) AS c_acctbal, c.c_mktsegment
        FROM customer c, bounds b WHERE c.c_custkey <= b.cut
        UNION ALL
        SELECT b.hi + i.i, 'new customer ' || i.i,
               CAST(i.i AS DOUBLE), 'BUILDING'
        FROM bounds b, (SELECT UNNEST(range(1, {N_INSERTS + 1})) AS i) i
    ), merged AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM source
        UNION ALL
        SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment
        FROM customer c
        WHERE c.c_custkey NOT IN (SELECT c_custkey FROM source)
    ), bucketed AS (
        SELECT m.*,
               GREATEST(0, LEAST({NBUCKETS - 1},
                   CAST(((m.c_custkey - b.lo) * {NBUCKETS})
                        // (b.hi - b.lo + 1) AS INT))) AS bucket,
               b.cut, b.hi AS hi0
        FROM merged m, bounds b
    ), touched AS (
        SELECT DISTINCT GREATEST(0, LEAST({NBUCKETS - 1},
                   CAST(((s.c_custkey - b.lo) * {NBUCKETS})
                        // (b.hi - b.lo + 1) AS INT))) AS bucket
        FROM source s, bounds b
    )
    SELECT CAST(bk.bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN bk.c_custkey <= bk.cut THEN 1 ELSE 0 END)
               AS BIGINT) AS n_updated,
           CAST(SUM(CASE WHEN bk.c_custkey > bk.hi0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_inserted,
           CAST(SUM(CAST(ROUND(bk.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS sum_acctbal_cents,
           CAST(CASE WHEN bk.bucket IN (SELECT bucket FROM touched)
                THEN 1 ELSE 0 END AS INTEGER) AS rewritten
    FROM bucketed bk
    GROUP BY bk.bucket
"""


# --- merge-on-read twin --------------------------------------------------


def mor_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE-ON-READ twin of ``cow_merge_upsert`` (round 10,
    ``sources/mortable.py``): the IDENTICAL logical upsert — first
    fifth of the customer key range gets +100.00, {N_INSERTS} new
    keys appended — but executed by writing one equality-delete file
    plus the source rows, REWRITING NOTHING. The snapshot read
    resolves deletes at scan time (broadcast anti-join on key with
    the Iceberg v2 sequence rule _seq < del_seq), and the audit
    folds the result per bucket exactly like the COW twin, adding
    ``delete_keys`` — the live equality-delete keys landing in each
    bucket, read back from the ACTUAL delete files so the hash also
    proves the delete-side bookkeeping. ``rewritten`` is identically
    0 for every bucket: the defining property of the format (the COW
    twin's column is 1 exactly on the touched buckets).

    Scale shape: merge cost O(source) regardless of table size; read
    adds one broadcast hash anti-probe per row (delete rowcounts come
    from the manifest, so the broadcast decision is metadata-only);
    compact() — exercised in pytest, not here — folds the deletes
    back into bucket files when read amplification crosses the
    table-service threshold.
    """
    from global_superstore_data_warehouse_spark.sources import mortable

    df = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    lo, hi = int(lo), int(hi)
    cut = lo + (hi - lo) // 5

    work = tempfile.mkdtemp(prefix="mor-upsert-")
    root = work + "/tbl"
    try:
        mortable.create(
            spark, root, df, key="c_custkey", nbuckets=NBUCKETS, bounds=(lo, hi)
        )
        inserts = spark.range(1, N_INSERTS + 1).select(
            (F.lit(hi) + F.col("id")).alias("c_custkey"),
            F.concat(F.lit("new customer "), F.col("id")).alias("c_name"),
            F.col("id").cast("double").alias("c_acctbal"),
            F.lit("BUILDING").alias("c_mktsegment"),
        )
        source = (
            df.filter(F.col("c_custkey") <= cut)
            .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2))
            .unionByName(inserts)
        )
        report = mortable.merge_upsert(spark, root, source, key="c_custkey")
        assert report["files_rewritten"] == 0  # the format's contract

        meta = mortable._read_meta(root)
        # live delete keys per bucket, from the REAL delete files
        _data, dels = mortable._live(root)
        del_keys = spark.read.parquet(
            *[f"{root}/{e['file']}" for e in dels]
        ).select("c_custkey")
        del_per_bucket = (
            del_keys.withColumn(
                "bucket", mortable._bucket_col(F.col("c_custkey"), meta)
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("delete_keys"))
        )
        snap = mortable.read_version(spark, root)
        out = (
            snap.withColumn(
                "bucket", mortable._bucket_col(F.col("c_custkey"), meta)
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    (F.col("c_custkey") <= cut).cast("long")
                ).alias("n_updated"),
                F.sum((F.col("c_custkey") > hi).cast("long")).alias("n_inserted"),
                F.sum(
                    F.round(F.col("c_acctbal") * 100).cast("long")
                ).alias("sum_acctbal_cents"),
            )
            .join(F.broadcast(del_per_bucket), "bucket", "left")
            .select(
                F.col("bucket").cast("int").alias("bucket"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_updated").cast("bigint").alias("n_updated"),
                F.col("n_inserted").cast("bigint").alias("n_inserted"),
                "sum_acctbal_cents",
                F.coalesce(F.col("delete_keys"), F.lit(0))
                .cast("bigint")
                .alias("delete_keys"),
                F.lit(0).cast("int").alias("rewritten"),
            )
        )
        # sever lineage to the temp table before reclaiming it (same
        # discipline as cow_merge_upsert)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


MOR_MERGE_UPSERT_ORACLE = f"""
    WITH bounds AS (
        SELECT MIN(c_custkey) AS lo, MAX(c_custkey) AS hi,
               MIN(c_custkey) + (MAX(c_custkey) - MIN(c_custkey)) // 5 AS cut
        FROM customer
    ), source AS (
        SELECT c.c_custkey, c.c_name,
               ROUND(c.c_acctbal + 100.0, 2) AS c_acctbal, c.c_mktsegment
        FROM customer c, bounds b WHERE c.c_custkey <= b.cut
        UNION ALL
        SELECT b.hi + i.i, 'new customer ' || i.i,
               CAST(i.i AS DOUBLE), 'BUILDING'
        FROM bounds b, (SELECT UNNEST(range(1, {N_INSERTS + 1})) AS i) i
    ), merged AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM source
        UNION ALL
        SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment
        FROM customer c
        WHERE c.c_custkey NOT IN (SELECT c_custkey FROM source)
    ), bucketed AS (
        SELECT m.*,
               GREATEST(0, LEAST({NBUCKETS - 1},
                   CAST(((m.c_custkey - b.lo) * {NBUCKETS})
                        // (b.hi - b.lo + 1) AS INT))) AS bucket,
               b.cut, b.hi AS hi0
        FROM merged m, bounds b
    ), delkeys AS (
        SELECT GREATEST(0, LEAST({NBUCKETS - 1},
                   CAST(((s.c_custkey - b.lo) * {NBUCKETS})
                        // (b.hi - b.lo + 1) AS INT))) AS bucket,
               COUNT(DISTINCT s.c_custkey) AS delete_keys
        FROM source s, bounds b
        GROUP BY 1
    )
    SELECT CAST(bk.bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN bk.c_custkey <= bk.cut THEN 1 ELSE 0 END)
               AS BIGINT) AS n_updated,
           CAST(SUM(CASE WHEN bk.c_custkey > bk.hi0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_inserted,
           CAST(SUM(CAST(ROUND(bk.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS sum_acctbal_cents,
           CAST(COALESCE(MAX(dk.delete_keys), 0) AS BIGINT) AS delete_keys,
           CAST(0 AS INTEGER) AS rewritten
    FROM bucketed bk LEFT JOIN delkeys dk ON bk.bucket = dk.bucket
    GROUP BY bk.bucket
"""


# --- streamed COW upsert lifecycle --------------------------------------


def cow_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING ingestion path, driver-oracle-proven end to end:
    three deterministic customer batches arrive as files and drain
    through ``streaming/cow.py``'s foreachBatch sink (availableNow,
    one run per arrival so apply order is pinned), each an SCD1
    upsert commit carrying its batch_id in the transaction log; the
    final snapshot folds to a per-segment audit the oracle rebuilds
    from pure SQL. A hash match proves the streamed, log-ledgered,
    file-pruned merge chain computed exactly the sequential upserts.

    Batches: (1) custkey % 3 == 0 (base load); (2) % 3 == 1 with
    +10.00 balance (disjoint insert); (3) % 6 == 0 re-labeled
    segment 'STREAMED' (updates half of batch 1).
    """
    from global_superstore_data_warehouse_spark.streaming.cow import (
        cow_upsert_stream,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    batches = [
        cust.filter(F.col("c_custkey") % 3 == 0),
        cust.filter(F.col("c_custkey") % 3 == 1).withColumn(
            "c_acctbal", F.round(F.col("c_acctbal") + 10.0, 2)
        ),
        cust.filter(F.col("c_custkey") % 6 == 0).withColumn(
            "c_mktsegment", F.lit("STREAMED")
        ),
    ]
    work = tempfile.mkdtemp(prefix="cow-stream-q-")
    src = f"{work}/src"
    root = f"{work}/tbl"
    ckpt = f"{work}/ckpt"
    try:
        for b in batches:  # one drain per arrival: apply order is pinned
            b.coalesce(1).write.mode("append").parquet(src)
            cow_upsert_stream(
                spark,
                src_dir=src,
                root=root,
                checkpoint=ckpt,
                key="c_custkey",
                keys=["c_custkey"],
                attrs=["c_name", "c_acctbal", "c_mktsegment"],
            )
        snap = cowtable.read_version(spark, root)
        out = (
            snap.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.round(F.col("c_acctbal") * 100).cast("long")
                ).alias("sum_acctbal_cents"),
            )
            .select(
                "c_mktsegment",
                F.col("n_rows").cast("bigint").alias("n_rows"),
                "sum_acctbal_cents",
            )
        )
        # segments-sized result: eager-checkpoint, then reclaim the
        # temp table/checkpoint tree (see cow_merge_upsert note)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


COW_STREAM_UPSERT_ORACLE = """
    WITH final AS (
        -- batch 1 survivors: % 3 = 0 but not re-labeled by batch 3
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 6 <> 0
        UNION ALL
        -- batch 3: % 6 = 0 re-labeled
        SELECT c_custkey, c_name, c_acctbal, 'STREAMED'
        FROM customer WHERE c_custkey % 6 = 0
        UNION ALL
        -- batch 2: disjoint inserts with +10.00
        SELECT c_custkey, c_name, ROUND(c_acctbal + 10.0, 2), c_mktsegment
        FROM customer WHERE c_custkey % 3 = 1
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS sum_acctbal_cents
    FROM final
    GROUP BY c_mktsegment
"""


# --- CDF-driven incremental MV maintenance ------------------------------


def mv_apply_cdf(
    state: DataFrame,
    feed: DataFrame,
    group_col: str,
    cents_col: str,
) -> DataFrame:
    """Incremental view maintenance driven by the COW change feed:
    fold ``cowtable.changes(...)`` into a persisted (group → n_rows,
    sum_cents) aggregate WITHOUT touching the base table. Each feed
    row becomes a signed delta — insert/update_post add, delete/
    update_pre subtract — so an update that MOVES a row between
    groups maintains both groups correctly (the pre row debits the
    old group, the post row credits the new one). Cost scales with
    the change feed, not the table; groups with zero rows after the
    fold are dropped (exactly what recompute would produce).
    """
    sign = F.when(
        F.col("_change_type").isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        feed.select(
            F.col(group_col),
            sign.alias("sgn"),
            F.round(F.col(cents_col) * 100).cast("long").alias("cents"),
        )
        .groupBy(group_col)
        .agg(
            F.sum("sgn").alias("n_rows"),
            F.sum(F.col("sgn") * F.col("cents")).alias("sum_cents"),
        )
    )
    return (
        state.unionByName(delta)
        .groupBy(group_col)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_cents").alias("sum_cents"),
        )
        .filter(F.col("n_rows") > 0)
    )


# --- change data feed ----------------------------------------------------

CDF_N_INSERTS = 7


def cow_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED read over the COW table (Delta's
    ``table_changes``): create the customer table (v1), run an SCD1
    merge that bumps the first fifth of the key range by +100.00 and
    inserts ``CDF_N_INSERTS`` new keys (v2), then a file-pruned
    DELETE of a key band that deliberately STRADDLES the update
    boundary (v3) — so the feed must report the deleted rows' POST-
    update balances on one side of the band and original balances on
    the other. Returns every row-level change in (v1, v3]:
    insert / delete / update_preimage / update_postimage rows tagged
    with their commit version, balances in exact integer cents.

    Scale shape (see ``cowtable.change_feed``): per-commit diffs read
    only the buckets that commit touched, decided from commit-log
    metadata alone; unchanged buckets are never scanned. The oracle
    reproduces the full feed from the generator formulas — update
    band, insert ids, delete band with the straddle-aware preimage —
    so a wrong preimage, a missed bucket, or a phantom change row
    breaks the hash."""
    df = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    lo, hi = int(lo), int(hi)
    cut = lo + (hi - lo) // 5          # update band: [lo, cut)
    half = (hi - lo) // 20             # delete band: [cut-half, cut+half)

    work = tempfile.mkdtemp(prefix="cow-cdf-")
    root = work + "/tbl"
    try:
        cowtable.create(
            spark, root, df, key="c_custkey", nbuckets=NBUCKETS,
            bounds=(lo, hi),
        )
        inserts = spark.range(1, CDF_N_INSERTS + 1).select(
            (F.lit(hi) + F.col("id")).alias("c_custkey"),
            F.concat(F.lit("cdf customer "), F.col("id")).alias("c_name"),
            F.col("id").cast("double").alias("c_acctbal"),
            F.lit("MACHINERY").alias("c_mktsegment"),
        )
        updates = df.where(F.col("c_custkey") < cut).select(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
            "c_mktsegment",
        )
        cowtable.merge_scd1(
            spark, root, updates.unionByName(inserts),
            keys=["c_custkey"],
            attrs=["c_name", "c_acctbal", "c_mktsegment"],
        )
        del_keys = df.where(
            (F.col("c_custkey") >= cut - half)
            & (F.col("c_custkey") < cut + half)
        ).select("c_custkey")
        cowtable.merge_delete(spark, root, del_keys)

        feed = cowtable.change_feed(spark, root, 1, 3).select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("_change_type").alias("change_type"),
            F.col("_commit_version").alias("commit_version"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
            F.col("c_mktsegment").alias("segment"),
        )
        # eager materialization severs lineage to the temp table so
        # the finally can reclaim it (same idiom as cow_merge_upsert)
        return feed.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


COW_CHANGE_FEED_ORACLE = f"""
    WITH b AS (
        SELECT min(c_custkey) AS lo, max(c_custkey) AS hi FROM customer
    ),
    p AS (
        SELECT lo, hi,
               lo + (hi - lo) // 5 AS cut,
               (hi - lo) // 20 AS half
        FROM b
    ),
    upd AS (
        SELECT c.c_custkey,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS pre_cents,
               c.c_mktsegment
        FROM customer c, p
        WHERE c.c_custkey < p.cut
    )
    -- v2: update pre/post images over the first fifth
    SELECT c_custkey, 'update_preimage' AS change_type,
           2 AS commit_version, pre_cents AS bal_cents,
           c_mktsegment AS segment
    FROM upd
    UNION ALL
    SELECT c_custkey, 'update_postimage', 2, pre_cents + 10000,
           c_mktsegment
    FROM upd
    UNION ALL
    -- v2: the brand-new keys
    SELECT p.hi + t.i, 'insert', 2, t.i * 100, 'MACHINERY'
    FROM p, LATERAL (
        SELECT unnest(range(1, {CDF_N_INSERTS} + 1)) AS i
    ) t
    UNION ALL
    -- v3: deletes straddling the update boundary — preimage carries
    -- the +100 on the updated side only
    SELECT c.c_custkey, 'delete', 3,
           CAST(round(c.c_acctbal * 100) AS BIGINT)
               + CASE WHEN c.c_custkey < p.cut THEN 10000 ELSE 0 END,
           c.c_mktsegment
    FROM customer c, p
    WHERE c.c_custkey >= p.cut - p.half AND c.c_custkey < p.cut + p.half
"""


def mor_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME logical change feed as ``cow_change_feed`` — same
    update band, same inserts, same straddling delete band, same
    output schema, SAME ORACLE — produced by the merge-on-read
    engine: the feed derives from each commit's own equality-delete
    and data files (``mortable.change_feed``), with the preimage
    lookup pruned to manifest-envelope-overlapping files, instead of
    COW's snapshot diffs over rewritten buckets. A hash match against
    the shared oracle proves the two storage engines report
    IDENTICAL row-level history for the identical logical workload —
    the CDC-consumer-facing contract that makes the formats
    interchangeable."""
    from global_superstore_data_warehouse_spark.sources import mortable

    df = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    lo, hi = int(lo), int(hi)
    cut = lo + (hi - lo) // 5
    half = (hi - lo) // 20

    work = tempfile.mkdtemp(prefix="mor-cdf-")
    root = work + "/tbl"
    try:
        mortable.create(
            spark, root, df, key="c_custkey", nbuckets=NBUCKETS,
            bounds=(lo, hi),
        )
        inserts = spark.range(1, CDF_N_INSERTS + 1).select(
            (F.lit(hi) + F.col("id")).alias("c_custkey"),
            F.concat(F.lit("cdf customer "), F.col("id")).alias("c_name"),
            F.col("id").cast("double").alias("c_acctbal"),
            F.lit("MACHINERY").alias("c_mktsegment"),
        )
        updates = df.where(F.col("c_custkey") < cut).select(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
            "c_mktsegment",
        )
        mortable.merge_upsert(
            spark, root, updates.unionByName(inserts), key="c_custkey"
        )
        del_keys = df.where(
            (F.col("c_custkey") >= cut - half)
            & (F.col("c_custkey") < cut + half)
        ).select("c_custkey")
        mortable.delete_keys(spark, root, del_keys, key="c_custkey")

        feed = mortable.change_feed(spark, root, 1, 3).select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("_change_type").alias("change_type"),
            F.col("_commit_version").alias("commit_version"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
            F.col("c_mktsegment").alias("segment"),
        )
        return feed.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the whole point: byte-identical history from both engines
MOR_CHANGE_FEED_ORACLE = COW_CHANGE_FEED_ORACLE


# --- threshold-driven compaction scheduling (table service) ------------

COMPACT_RATIO = 0.4  # sweep buckets whose delete ratio exceeds this


def mor_compaction_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MOR table service end-to-end under the driver's oracle
    gate (round 11, ``mortable.compact_buckets``): build read
    amplification unevenly across buckets, sweep with a threshold,
    and audit per bucket that (a) exactly the over-threshold buckets
    were folded, (b) their delete keys vanished from the REAL delete
    files while under-threshold buckets kept theirs, and (c) the
    merged state is exactly the logical upsert+delete — all from
    oracle-expressible arithmetic (range buckets, counts, cents).

    Scripted history on the customer table (16 range buckets):
      v2 UPSERT  keys <= cut (first fifth of the key range, +100.00)
                 -> buckets ~0-3 accumulate deletes AND new rows;
      v3 DELETE  a disjoint middle slice [mid, mid + range/8)
                 -> ~2 buckets where most physical rows are dead;
      sweep at {COMPACT_RATIO}: the update buckets sit near ratio
      0.5 (n deletes / 2n physical rows) and the slice buckets near
      1.0 — both above; the cut-boundary bucket (~0.17) and untouched
      buckets stay below and keep their delete keys.

    The audit reads delete_keys_before/after from the ACTUAL live
    delete files at each point (bookkeeping proof, same discipline
    as ``mor_merge_upsert``); ``compacted`` comes from the sweep
    report. Scale shape: the sweep's scheduling signal is
    delete-file-sized + manifest-only; the fold reads only victim
    buckets' files."""
    from global_superstore_data_warehouse_spark.sources import mortable

    df = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    lo, hi = df.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    lo, hi = int(lo), int(hi)
    cut = lo + (hi - lo) // 5
    slice_lo = lo + (hi - lo) // 2
    slice_hi = slice_lo + (hi - lo) // 8  # exclusive

    work = tempfile.mkdtemp(prefix="mor-policy-")
    root = work + "/tbl"
    try:
        mortable.create(
            spark, root, df, key="c_custkey", nbuckets=NBUCKETS,
            bounds=(lo, hi),
        )
        updates = df.filter(F.col("c_custkey") <= cut).withColumn(
            "c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2)
        )
        mortable.merge_upsert(spark, root, updates, key="c_custkey")
        mortable.delete_keys(
            spark, root,
            df.where(
                (F.col("c_custkey") >= slice_lo)
                & (F.col("c_custkey") < slice_hi)
            ).select("c_custkey"),
            key="c_custkey",
        )
        meta = mortable._read_meta(root)

        def del_per_bucket(alias: str) -> DataFrame:
            _d, dels = mortable._live(root)
            if not dels:
                return (
                    spark.range(0).select(
                        F.col("id").cast("int").alias("bucket"),
                        F.lit(0).cast("bigint").alias(alias),
                    )
                )
            return (
                spark.read.parquet(*[f"{root}/{e['file']}" for e in dels])
                .select(
                    mortable._bucket_col(F.col("c_custkey"), meta).alias(
                        "bucket"
                    )
                )
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
                .localCheckpoint(eager=True)  # pin before the sweep mutates
            )

        before = del_per_bucket("delete_keys_before")
        report = mortable.compact_buckets(
            spark, root, max_delete_ratio=COMPACT_RATIO
        )
        after = del_per_bucket("delete_keys_after")
        victims = [int(b) for b in report["buckets_compacted"]]

        snap = mortable.read_version(spark, root)
        out = (
            snap.withColumn(
                "bucket", mortable._bucket_col(F.col("c_custkey"), meta)
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.round(F.col("c_acctbal") * 100).cast("long")
                ).alias("sum_acctbal_cents"),
            )
            .join(F.broadcast(before), "bucket", "left")
            .join(F.broadcast(after), "bucket", "left")
            .select(
                F.col("bucket").cast("int").alias("bucket"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                "sum_acctbal_cents",
                F.coalesce("delete_keys_before", F.lit(0))
                .cast("bigint")
                .alias("delete_keys_before"),
                F.coalesce("delete_keys_after", F.lit(0))
                .cast("bigint")
                .alias("delete_keys_after"),
                F.col("bucket").isin(victims).cast("int").alias("compacted"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


mor_compaction_policy.__doc__ = mor_compaction_policy.__doc__.format(
    COMPACT_RATIO=COMPACT_RATIO
)

_BUCKET_SQL = (
    f"GREATEST(0, LEAST({NBUCKETS - 1}, "
    f"CAST(((c_custkey - b.lo) * {NBUCKETS}) // (b.hi - b.lo + 1) AS INT)))"
)

MOR_COMPACTION_POLICY_ORACLE = f"""
    WITH bounds AS (
        SELECT MIN(c_custkey) AS lo, MAX(c_custkey) AS hi,
               MIN(c_custkey) + (MAX(c_custkey) - MIN(c_custkey)) // 5
                   AS cut,
               MIN(c_custkey) + (MAX(c_custkey) - MIN(c_custkey)) // 2
                   AS slice_lo,
               MIN(c_custkey) + (MAX(c_custkey) - MIN(c_custkey)) // 2
                   + (MAX(c_custkey) - MIN(c_custkey)) // 8 AS slice_hi
        FROM customer
    ), phys AS (
        -- physical data rows at sweep time: base rows + the upsert's
        -- source rows (MOR rewrites nothing, so both remain on disk)
        SELECT {_BUCKET_SQL} AS bucket, COUNT(*) AS n
        FROM customer, bounds b GROUP BY 1
    ), upd AS (
        SELECT {_BUCKET_SQL} AS bucket, COUNT(*) AS n
        FROM customer, bounds b WHERE c_custkey <= b.cut GROUP BY 1
    ), sliced AS (
        SELECT {_BUCKET_SQL} AS bucket, COUNT(*) AS n
        FROM customer, bounds b
        WHERE c_custkey >= b.slice_lo AND c_custkey < b.slice_hi
        GROUP BY 1
    ), dels AS (
        -- delete-file rows per bucket before the sweep: the upsert's
        -- key set plus the (disjoint) delete slice
        SELECT COALESCE(u.bucket, s.bucket) AS bucket,
               COALESCE(u.n, 0) + COALESCE(s.n, 0) AS delete_keys_before
        FROM upd u FULL OUTER JOIN sliced s ON u.bucket = s.bucket
    ), sched AS (
        SELECT p.bucket,
               COALESCE(d.delete_keys_before, 0) AS delete_keys_before,
               CASE WHEN COALESCE(d.delete_keys_before, 0) * 1.0
                         / (p.n + COALESCE(u.n, 0)) > {COMPACT_RATIO}
                    THEN 1 ELSE 0 END AS compacted
        FROM phys p
        LEFT JOIN dels d ON d.bucket = p.bucket
        LEFT JOIN upd u ON u.bucket = p.bucket
    ), live AS (
        SELECT {_BUCKET_SQL} AS bucket,
               CASE WHEN c_custkey <= b.cut
                    THEN ROUND(c_acctbal + 100.0, 2) ELSE c_acctbal
               END AS c_acctbal
        FROM customer, bounds b
        WHERE NOT (c_custkey >= b.slice_lo AND c_custkey < b.slice_hi)
    )
    SELECT CAST(l.bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS sum_acctbal_cents,
           CAST(MAX(s.delete_keys_before) AS BIGINT) AS delete_keys_before,
           CAST(MAX(CASE WHEN s.compacted = 1 THEN 0
                    ELSE s.delete_keys_before END) AS BIGINT)
               AS delete_keys_after,
           CAST(MAX(s.compacted) AS INTEGER) AS compacted
    FROM live l JOIN sched s ON s.bucket = l.bucket
    GROUP BY l.bucket
"""

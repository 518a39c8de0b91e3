"""Merge-on-read (MOR) table — the write-cheap twin of the
copy-on-write table in ``sources/cowtable.py`` (round 10).

Where the COW table's MERGE rewrites every touched bucket file, the
MOR table writes two SMALL artifacts per merge and rewrites nothing:

  * an EQUALITY-DELETE file — just the merge keys — under
    ``deletes/``, stamped with the commit's sequence number, and
  * ordinary bucketed data files holding the source rows, whose
    embedded ``_seq`` column carries the same sequence number.

A delete applies to every data row whose ``_seq`` is STRICTLY LESS
than the delete's sequence — Iceberg v2's rule (spec §"Row-level
deletes": "equality delete files applied to data files from the same
commit or an earlier one"), which is exactly what lets one commit
carry both the delete of a key's old row and its replacement row:
the replacement shares the delete's sequence, so the strict
inequality spares it.

Snapshot read = ONE scan of the live data files, anti-joined against
ONE scan of the live delete files on (key equal AND _seq < del_seq).
The delete side is broadcast below the catalog gate (delete-file
rowcounts ride in the manifest, so the decision is metadata-only,
the same statistics-first discipline as ``operators/hints``) — at
scale the merge costs one map-side hash probe per row, no shuffle of
the data side at all. ``compact()`` folds the accumulated deletes
back into rewritten bucket files (the COW path), resetting read
amplification; the trade the two formats embody is write
amplification (COW) vs read amplification (MOR), and ``stats()``
reports the live delete-row count so a table service can schedule
compaction on a threshold.

Shares the commit-log mechanics with cowtable: the same
create-exclusive ``_commit`` (losers surface ConcurrentWriteError),
the same staged-write-then-rename discipline with per-attempt uuid
file names (a commit-race loser can never clobber a winner's file),
the same vacuum/time-travel manifest folding. Reference lineage: the
reference's MERGE/ON-CONFLICT loaders (bl_cl.sql:806-875) are the
semantics; the storage strategy choice is the beyond-reference part.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.sources import cowtable
from global_superstore_data_warehouse_spark.sources.cowtable import (
    ConcurrentWriteError,  # noqa: F401  (part of this module's API too)
    _bucket_col,
    _commit,
    _commit_path,
    _log_path,
    _meta_path,
    _read_meta,
    _write_bucketed,
)

DATA_DIR = cowtable.DATA_DIR
DELETE_DIR = "deletes"


class SnapshotExpiredError(RuntimeError):
    """A version-pinned read referenced files that vacuum has since
    reclaimed — the pinned snapshot is expired (Delta's
    VersionNotFoundError-after-VACUUM contract). Re-pin at the
    current head or raise the table's retention window."""


def _stage_delete_parts(
    root: str, version: int, df: DataFrame, *, skip_empty: bool
) -> list[dict]:
    """Shared delete-side writer: stage ``df`` UNDER THE TABLE ROOT
    (same one-filesystem rename guarantee as data files), rename the
    parquet parts into deletes/ under per-attempt uuid names (the
    no-clobber discipline — see ``_write_bucketed``), and return the
    manifest add-entries. ``skip_empty`` drops zero-row parts:
    ``_rewrite_deletes`` wants the delete side to simply disappear
    when no keys survive, while ``_write_delete`` must keep an empty
    file — an empty-source merge still commits a readable delete
    file the change feed's touched-key scan opens."""
    import pyarrow.parquet as pq

    token = uuid.uuid4().hex[:12]
    staging = tempfile.mkdtemp(dir=root, prefix=f"_stage-d{version}-")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        out_dir = os.path.join(root, DELETE_DIR)
        os.makedirs(out_dir, exist_ok=True)
        adds: list[dict] = []
        parts = sorted(
            p for p in os.listdir(staging) if p.endswith(".parquet")
        )
        for i, part in enumerate(parts):
            src = os.path.join(staging, part)
            n = pq.ParquetFile(src).metadata.num_rows
            if skip_empty and n == 0:
                continue
            name = f"d{version}-{i}-{token}.parquet"
            dst = os.path.join(out_dir, name)
            try:
                os.rename(src, dst)
            except OSError:
                shutil.move(src, dst)
            adds.append(
                {"file": f"{DELETE_DIR}/{name}", "rows": n, "seq": version}
            )
        return adds
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _write_delete(root: str, version: int, keys: DataFrame, key: str) -> list[dict]:
    """Write an equality-delete file set: the distinct ``key`` values
    of ``keys`` plus the constant ``_del_seq`` column."""
    return _stage_delete_parts(
        root,
        version,
        keys.select(F.col(key))
        .dropDuplicates([key])
        .withColumn("_del_seq", F.lit(version).cast("long")),
        skip_empty=False,
    )


def create(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    key: str,
    nbuckets: int = 16,
    bounds: tuple[int, int] | None = None,
) -> None:
    """CREATE at ``root``: bucketed base data files carrying
    ``_seq = 1``, empty delete set, commit version 1."""
    os.makedirs(_log_path(root), exist_ok=False)
    lo, hi = bounds if bounds is not None else df.agg(F.min(key), F.max(key)).first()
    meta = {"key": key, "lo": int(lo), "hi": int(hi), "nbuckets": nbuckets}
    with open(_meta_path(root), "w") as f:
        json.dump(meta, f)
    adds = _write_bucketed(
        root, 1, df.withColumn("_seq", F.lit(1).cast("long")), key, meta
    )
    _commit(
        root, 1,
        {"op": "create", "adds": adds, "removes": [],
         "delete_adds": [], "delete_removes": []},
    )


def current_version(root: str) -> int:
    return cowtable.current_version(root)


def _live(root: str, version: int | None = None) -> tuple[list[dict], list[dict]]:
    """Fold the commit log to (live data entries, live delete
    entries) at ``version`` — manifest-only, no data reads."""
    top = current_version(root) if version is None else version
    data: dict[str, dict] = {}
    dels: dict[str, dict] = {}
    for v in range(1, top + 1):
        with open(_commit_path(root, v)) as f:
            c = json.load(f)
        for rel in c.get("removes", []):
            data.pop(rel, None)
        for add in c.get("adds", []):
            data[add["file"]] = add
        for rel in c.get("delete_removes", []):
            dels.pop(rel, None)
        for add in c.get("delete_adds", []):
            dels[add["file"]] = add
    return list(data.values()), list(dels.values())


def merge_upsert(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    key: str,
    extra: dict | None = None,
) -> dict:
    """Row-level UPSERT, merge-on-read style: one commit adds an
    equality-delete file for the source keys (killing any older
    versions of those rows on read) and bucketed data files holding
    the source rows at the same sequence — NOTHING existing is
    rewritten. Write cost is O(source), independent of table size;
    the bill is paid at read time until ``compact()``. Conflicts
    surface as ConcurrentWriteError (create-exclusive commit).
    ``extra`` fields ride in the commit payload (e.g. a streaming
    ``batch_id`` for the exactly-once ledger, read back via
    ``cowtable.last_batch_id`` — the log format is shared)."""
    meta = _read_meta(root)
    if key != meta["key"]:
        raise ValueError(f"table is keyed on {meta['key']!r}, not {key!r}")
    version = current_version(root) + 1
    delete_adds = _write_delete(root, version, source, key)
    adds = _write_bucketed(
        root, version,
        source.withColumn("_seq", F.lit(version).cast("long")), key, meta,
    )
    payload = {"op": "merge", "adds": adds, "removes": [],
               "delete_adds": delete_adds, "delete_removes": []}
    if extra:
        payload.update(extra)
    _commit(root, version, payload)
    return {
        "version": version,
        "data_files_added": len(adds),
        "delete_files_added": len(delete_adds),
        "delete_rows": sum(e["rows"] for e in delete_adds),
        "files_rewritten": 0,  # the point of MOR
    }


def delete_keys(
    spark: SparkSession,
    root: str,
    keys: DataFrame,
    key: str,
    extra: dict | None = None,
) -> dict:
    """Row-level DELETE: one commit adding ONLY an equality-delete
    file — no data files at all (Iceberg's DELETE FROM). Every live
    row whose key matches and whose ``_seq`` predates this commit
    vanishes from subsequent reads; ``compact()`` reclaims the bytes."""
    meta = _read_meta(root)
    if key != meta["key"]:
        raise ValueError(f"table is keyed on {meta['key']!r}, not {key!r}")
    version = current_version(root) + 1
    delete_adds = _write_delete(root, version, keys, key)
    payload = {"op": "delete", "adds": [], "removes": [],
               "delete_adds": delete_adds, "delete_removes": []}
    if extra:
        payload.update(extra)
    _commit(root, version, payload)
    return {
        "version": version,
        "delete_files_added": len(delete_adds),
        "delete_rows": sum(e["rows"] for e in delete_adds),
        "files_rewritten": 0,
    }


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: one scan of live data files anti-joined against
    the live equality deletes on (key equal AND _seq < del_seq). The
    delete side is broadcast below the 5M-row gate using MANIFEST
    rowcounts (no job, no footer read — they were harvested at write
    time); past the gate the same plan degrades to a shuffled
    anti-join, and a table whose delete set grew that large is
    overdue for compact()."""
    from global_superstore_data_warehouse_spark.operators.hints import maybe_broadcast

    data_entries, del_entries = _live(root, version)
    if not data_entries:
        raise ValueError(f"no data files live at {root}")
    data = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(root, e["file"]) for e in data_entries]
    )
    if not del_entries:
        return data.drop("_seq")
    key = _read_meta(root)["key"]
    dels = spark.read.parquet(
        *[os.path.join(root, e["file"]) for e in del_entries]
    )
    n_del = sum(e["rows"] for e in del_entries)
    merged = data.join(
        maybe_broadcast(dels, n_rows=n_del),
        (data[key] == dels[key]) & (data["_seq"] < dels["_del_seq"]),
        "left_anti",
    )
    return merged.drop("_seq")


def compact(spark: SparkSession, root: str, _pinned_version: int | None = None) -> dict:
    """Fold the delete files away: materialize the merged snapshot,
    rewrite it as fresh bucketed data files, and commit a version
    that removes every prior data and delete file. Read
    amplification resets to zero; this IS the COW write the merge
    deferred, run once for many merges (the economics of a table
    service's scheduled compaction).

    ``_pinned_version`` lets a caller that already pinned its commit
    version (compact_buckets' all-victims delegation) carry that pin
    through, so a commit interleaving since THE CALLER's pin still
    loses the create-exclusive race instead of being silently folded
    at a fresh head with scheduling evidence from the older snapshot."""
    meta = _read_meta(root)
    version = (
        _pinned_version if _pinned_version is not None
        else current_version(root) + 1
    )
    # Fold at the pinned base (version-1), not the call-time head: the
    # materialize below includes Spark jobs, and a commit interleaving
    # in that window must lose the create-exclusive _commit race with
    # our read state still describing the snapshot we actually folded.
    data_entries, del_entries = _live(root, version - 1)
    snapshot = read_version(spark, root, version - 1)
    adds = _write_bucketed(
        root, version,
        snapshot.withColumn("_seq", F.lit(version).cast("long")),
        meta["key"], meta,
    )
    if not adds:
        # fully-deleted table: partitionBy writes nothing for an empty
        # frame, but the fold must leave a schema-bearing data file or
        # the table stops being readable — persist one empty part
        token = uuid.uuid4().hex[:12]
        staging = tempfile.mkdtemp(dir=root, prefix=f"_stage-v{version}-")
        try:
            (
                snapshot.withColumn("_seq", F.lit(version).cast("long"))
                .limit(0)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(staging)
            )
            part = next(
                p for p in sorted(os.listdir(staging)) if p.endswith(".parquet")
            )
            name = f"v{version}-empty-{token}.parquet"
            dst = os.path.join(root, DATA_DIR, name)
            try:
                os.rename(os.path.join(staging, part), dst)
            except OSError:
                shutil.move(os.path.join(staging, part), dst)
            adds = [
                {"file": f"{DATA_DIR}/{name}", "bucket": 0, "rows": 0,
                 "min_key": None, "max_key": None}
            ]
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    _commit(
        root, version,
        {"op": "compact", "adds": adds,
         "removes": [e["file"] for e in data_entries],
         "delete_adds": [],
         "delete_removes": [e["file"] for e in del_entries]},
    )
    return {
        "version": version,
        "data_files_rewritten": len(adds),
        "delete_files_folded": len(del_entries),
    }


def stats(root: str, version: int | None = None) -> dict:
    """Manifest-only health report: live file/row counts for the
    data and delete sides — the compaction-scheduling signal."""
    data_entries, del_entries = _live(root, version)
    return {
        "data_files": len(data_entries),
        "data_rows": sum(e["rows"] for e in data_entries),
        "delete_files": len(del_entries),
        "delete_rows": sum(e["rows"] for e in del_entries),
    }


def vacuum(
    root: str, retain_versions: int = 1, min_age_seconds: float = 600.0
) -> dict:
    """MOR VACUUM — same retention/age-floor contract as
    ``cowtable.vacuum`` (whose docstring holds the full rationale),
    but the live set folds BOTH manifest sides (data adds/removes
    AND delete_adds/delete_removes) and the sweep covers ``deletes/``
    as well as ``data/``: superseded equality-delete files — e.g.
    the old delete side after ``compact_buckets`` rewrites it — are
    reclaimed once no retained snapshot references them. (Round-11
    fix: ``cowtable.vacuum`` run against a MOR root ignored
    ``deletes/`` entirely, so compaction's storage-reclaim claim
    only held for the data side.)"""
    top = current_version(root)
    keep: set[str] = set()
    for v in range(max(1, top - retain_versions + 1), top + 1):
        data_entries, del_entries = _live(root, v)
        keep |= {e["file"] for e in data_entries}
        keep |= {e["file"] for e in del_entries}
    return cowtable._vacuum_dirs(
        root, keep, [DATA_DIR, DELETE_DIR], min_age_seconds
    )


def bucket_delete_ratios(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    _entries: tuple[list[dict], list[dict]] | None = None,
) -> dict[int, float]:
    """Per-bucket read-amplification signal for the table service:
    live delete keys landing in each bucket / physical data rows in
    that bucket. Data rows come from the manifest (metadata only);
    delete keys need one Spark job over the DELETE files alone —
    delete-file-sized, never table-sized (at 100 TB the delete side
    is the small artifact by construction).

    Buckets that carry live delete keys but NO live data rows (the
    data side was fully deleted, or never written there) report
    ``inf`` — their delete files are pure dead weight and the
    threshold sweep should always reclaim them; a map keyed only on
    data-manifest buckets would hide them forever (round-12 fix).
    ``version`` pins the snapshot the signal is computed from
    (defaults to the current head); ``_entries`` lets a caller that
    already folded the manifest at that version (compact_buckets)
    pass the (data, delete) entry lists in rather than re-parsing
    every commit file."""
    meta = _read_meta(root)
    data_entries, del_entries = (
        _entries if _entries is not None else _live(root, version)
    )
    data_rows: dict[int, int] = {}
    for e in data_entries:
        data_rows[e["bucket"]] = data_rows.get(e["bucket"], 0) + e["rows"]
    if not del_entries:
        return {b: 0.0 for b in data_rows}
    # ``version`` is public API, so a caller may pin a HISTORICAL
    # snapshot whose delete files a later vacuum already reclaimed
    # (internal callers pin head-at-call, where the age floor makes
    # this impossible). Check the manifest's paths before handing
    # them to Spark: a missing file must surface as a clear
    # snapshot-expired error, not a deep-in-job FileNotFoundException
    # (round-12 ADVICE).
    del_paths = [os.path.join(root, e["file"]) for e in del_entries]
    pin = "head" if version is None else version
    gone = [p for p in del_paths if not os.path.exists(p)]
    if gone:
        raise SnapshotExpiredError(
            f"pinned version {pin} references "
            f"{len(gone)} vacuumed delete file(s), e.g. {gone[0]!r}; "
            "pinned reads are only valid inside the vacuum retention "
            "window — re-pin at the current head"
        )
    # The exists() sweep is a fast pre-check, not a guarantee: a
    # vacuum landing between it and the Spark read (or mid-job) still
    # reclaims files, so the missing-path failure from Spark itself
    # must surface as the same snapshot-expired contract.
    try:
        dels = spark.read.parquet(*del_paths)
        counts = {
            r["b"]: r["n"]
            for r in dels.select(
                _bucket_col(F.col(meta["key"]), meta).alias("b")
            )
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    except Exception as exc:
        msg = str(exc)
        if (
            "PATH_NOT_FOUND" in msg
            or "FileNotFound" in msg
            or "does not exist" in msg
        ):
            raise SnapshotExpiredError(
                f"pinned version {pin}: delete file(s) vacuumed while "
                "reading; pinned reads are only valid inside the "
                "vacuum retention window — re-pin at the current head"
            ) from exc
        raise
    ratios = {
        b: (counts.get(b, 0) / rows) if rows
        else (float("inf") if counts.get(b, 0) else 0.0)
        for b, rows in data_rows.items()
    }
    for b, n in counts.items():
        if b not in ratios and n:
            ratios[b] = float("inf")
    return ratios


def compact_buckets(
    spark: SparkSession, root: str, max_delete_ratio: float
) -> dict:
    """Threshold-driven TABLE SERVICE sweep: compact exactly the
    buckets whose delete ratio (``bucket_delete_ratios``) exceeds
    ``max_delete_ratio``, leaving every other bucket's files — data
    and bytes — untouched (carried by reference, inodes never move).

    Per victim bucket the sweep folds the deletes the COW way: read
    that bucket's data files, anti-join the live delete set, rewrite
    as fresh files stamped ``_seq = new version``. The new sequence
    exceeds every live ``_del_seq``, so remaining delete files can
    never re-kill the rewritten rows (the same Iceberg v2 strict
    inequality the read path applies). The delete side is then
    REWRITTEN WITHOUT the victim buckets' keys — each surviving key
    keeps its ORIGINAL ``_del_seq`` (required: its relation to
    non-victim data rows' sequences must not change) — so read
    amplification for the hot buckets drops to zero and the delete
    probe shrinks for everyone else.

    Commits as ``op=compact``: row-level state is provably unchanged
    (tests assert snapshot equality), so change feeds skip it.
    Returns the scheduling evidence: per-bucket ratios, the victims,
    and delete rows before/after."""
    meta = _read_meta(root)
    key = meta["key"]
    # Pin the target version BEFORE any read of live state (the same
    # ordering _merge_files and compact() use): ratio computation and
    # the live fold below include a Spark collect, and a merge that
    # commits inside that window would otherwise advance the head so
    # our create-exclusive _commit lands on a fresh version — silently
    # resurrecting rows the interleaved merge deleted (its _del_seq
    # would be below our rewritten _seq). Pinning first makes any such
    # interleave LOSE the _commit race and surface ConcurrentWriteError
    # instead of corrupting the table (round-12 fix).
    version = current_version(root) + 1
    data_entries, del_entries = _live(root, version - 1)
    ratios = bucket_delete_ratios(
        spark, root, version=version - 1, _entries=(data_entries, del_entries)
    )
    victims = sorted(b for b, r in ratios.items() if r > max_delete_ratio)
    rows_before = sum(e["rows"] for e in del_entries)
    report = {
        # inf (delete-only bucket) is not valid strict JSON — report
        # it as the string "inf" so the scheduling evidence survives
        # json.dumps into service logs; the float API stays on
        # bucket_delete_ratios itself
        "ratios": {
            b: ("inf" if r == float("inf") else r) for b, r in ratios.items()
        },
        "buckets_compacted": victims,
        "delete_rows_before": rows_before,
    }
    if not victims:
        report.update(
            version=None, data_files_rewritten=0,
            delete_rows_after=rows_before,
        )
        return report
    victim_files = [e for e in data_entries if e["bucket"] in victims]
    if len(victim_files) == len(data_entries):
        # every live data file is a victim: identical outcome to the
        # whole-table fold, which also owns the fully-deleted-table
        # placeholder edge — delegate, carrying OUR pin so an
        # interleaved commit still loses the race (a re-pin inside
        # compact would silently fold the newer head while this
        # report's ratios/rows_before describe the older snapshot)
        full = compact(spark, root, _pinned_version=version)
        report.update(
            version=full["version"],
            data_files_rewritten=full["data_files_rewritten"],
            delete_rows_after=0,
        )
        return report

    from global_superstore_data_warehouse_spark.operators.hints import maybe_broadcast

    dels = None
    if del_entries:
        dels = spark.read.parquet(
            *[os.path.join(root, e["file"]) for e in del_entries]
        )
    adds: list[dict] = []
    if victim_files:
        victim_data = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(root, e["file"]) for e in victim_files]
        )
        if dels is not None:
            n_del = sum(e["rows"] for e in del_entries)
            victim_data = victim_data.join(
                maybe_broadcast(dels, n_rows=n_del),
                (victim_data[key] == dels[key])
                & (victim_data["_seq"] < dels["_del_seq"]),
                "left_anti",
            )
        adds = _write_bucketed(
            root, version,
            victim_data.drop("_seq").withColumn(
                "_seq", F.lit(version).cast("long")
            ),
            key, meta,
        )
    # else: every victim is a delete-only bucket (ratio inf, no live
    # data files) — nothing to rewrite on the data side; the sweep
    # below still drops their dead delete keys, which is safe because
    # an equality delete only kills rows with _seq < _del_seq and any
    # future write takes a strictly larger _seq.
    delete_adds: list[dict] = []
    if dels is not None:
        survivors = dels.where(
            ~_bucket_col(F.col(key), meta).isin(victims)
        )
        delete_adds = _rewrite_deletes(root, version, survivors)
    _commit(
        root, version,
        {"op": "compact", "adds": adds,
         "removes": [e["file"] for e in victim_files],
         "delete_adds": delete_adds,
         "delete_removes": [e["file"] for e in del_entries]},
    )
    report.update(
        version=version,
        data_files_rewritten=len(adds),
        delete_rows_after=sum(e["rows"] for e in delete_adds),
    )
    return report


def _rewrite_deletes(
    root: str, version: int, dels: DataFrame
) -> list[dict]:
    """Rewrite a (key, _del_seq) delete frame into fresh delete
    files, PRESERVING each key's original ``_del_seq`` (unlike
    ``_write_delete``, which stamps a new constant sequence — wrong
    here: a surviving delete's ordering against old data rows must
    not change). Empty input yields no entries (the delete side
    simply disappears)."""
    return _stage_delete_parts(root, version, dels, skip_empty=True)


def _key_envelope(root: str, commit: dict, key: str) -> tuple[int, int]:
    """Metadata-only [lo, hi] envelope of the keys a commit touches:
    data adds carry min_key/max_key in the manifest; delete files
    (which don't) contribute their parquet row-group statistics — one
    footer read per delete file, never a Spark job (the same
    statistics-first discipline as catalog.table_rows)."""
    import pyarrow.parquet as pq

    lo, hi = None, None

    def fold(a, b):
        nonlocal lo, hi
        lo = a if lo is None else min(lo, a)
        hi = b if hi is None else max(hi, b)

    for add in commit.get("adds", []):
        if add["min_key"] is not None:  # zero-row placeholder entries
            fold(add["min_key"], add["max_key"])
    for add in commit.get("delete_adds", []):
        md = pq.ParquetFile(os.path.join(root, add["file"])).metadata
        idx = md.schema.to_arrow_schema().get_field_index(key)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                fold(st.min, st.max)
    if lo is None:
        raise ValueError("commit touches no keys")
    return int(lo), int(hi)


def _snapshot_pruned(
    spark: SparkSession, root: str, version: int, lo: int, hi: int
) -> DataFrame:
    """``read_version`` restricted to data files whose manifest
    [min_key, max_key] envelope overlaps [lo, hi] — the preimage
    lookup for the change feed opens only the files that can hold a
    touched key (plus the delete side, applied as usual)."""
    from global_superstore_data_warehouse_spark.operators.hints import maybe_broadcast

    key = _read_meta(root)["key"]
    data_entries, del_entries = _live(root, version)
    hit = [
        e for e in data_entries
        # zero-row entries (a compact of a fully-deleted table writes
        # one with min_key/max_key = None to keep the table readable)
        # can never overlap any key envelope — skip before comparing
        if e["min_key"] is not None
        and not (e["max_key"] < lo or e["min_key"] > hi)
    ]
    if not hit:
        first = os.path.join(root, data_entries[0]["file"])
        return spark.read.parquet(first).limit(0).drop("_seq")
    data = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(root, e["file"]) for e in hit]
    )
    if del_entries:
        dels = spark.read.parquet(
            *[os.path.join(root, e["file"]) for e in del_entries]
        )
        n_del = sum(e["rows"] for e in del_entries)
        data = data.join(
            maybe_broadcast(dels, n_rows=n_del),
            (data[key] == dels[key]) & (data["_seq"] < dels["_del_seq"]),
            "left_anti",
        )
    return data.drop("_seq")


def change_feed(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CHANGE DATA FEED over the merge-on-read table — same contract
    as ``cowtable.change_feed`` (rows tagged ``_change_type`` in
    insert / delete / update_preimage / update_postimage plus
    ``_commit_version``), derived the MOR-NATIVE way: each commit's
    changes come from its OWN files (the data files it added = new
    images, its equality-delete file = the touched key set), never a
    full snapshot diff. The only read of older data is the preimage
    lookup, and that scan is pruned to the data files whose manifest
    key envelope overlaps the commit's touched-key envelope
    (metadata-only decision). ``compact`` commits rewrite bytes but
    change no rows and are correctly skipped — the op field in the
    log says so without reading anything."""
    from global_superstore_data_warehouse_spark.operators.hints import maybe_broadcast

    meta = _read_meta(root)
    key = meta["key"]
    top = current_version(root)
    if to_version is None:
        to_version = top
    if not 1 <= from_version <= to_version <= top:
        raise ValueError(
            f"bad change_feed range [{from_version}, {to_version}] "
            f"(table at version {top})"
        )
    feed = None
    for v in range(from_version + 1, to_version + 1):
        with open(_commit_path(root, v)) as f:
            commit = json.load(f)
        if commit.get("op") not in ("merge", "delete"):
            continue  # create/compact/vacuum: no row-level changes
        lo, hi = _key_envelope(root, commit, key)
        prev = _snapshot_pruned(spark, root, v - 1, lo, hi)
        attrs = [c for c in prev.columns if c != key]

        if commit.get("adds"):
            new_df = spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(root, e["file"]) for e in commit["adds"]]
            ).drop("_seq")
        else:
            new_df = prev.limit(0)
        touched = spark.read.parquet(
            *[os.path.join(root, e["file"]) for e in commit["delete_adds"]]
        ).select(key).dropDuplicates([key])
        n_touched = sum(e["rows"] for e in commit["delete_adds"])

        # Same manifest-gated broadcast discipline as read_version: a
        # huge delete commit must not be broadcast unconditionally.
        o = prev.join(
            maybe_broadcast(touched, n_rows=n_touched), key, "inner"
        ).select(
            key, F.struct(*attrs).alias("_pre")
        )
        n = new_df.select(key, F.struct(*attrs).alias("_post"))
        j = o.join(n, key, "full_outer").where(
            ~F.col("_pre").eqNullSafe(F.col("_post"))
        )
        parts = []
        for side, ctype, cond in (
            ("_post", "insert", F.col("_pre").isNull()),
            ("_pre", "delete", F.col("_post").isNull()),
            ("_pre", "update_preimage",
             F.col("_pre").isNotNull() & F.col("_post").isNotNull()),
            ("_post", "update_postimage",
             F.col("_pre").isNotNull() & F.col("_post").isNotNull()),
        ):
            parts.append(
                j.where(cond).select(
                    key,
                    *[F.col(f"{side}.{a}").alias(a) for a in attrs],
                    F.lit(ctype).alias("_change_type"),
                    F.lit(v).cast("int").alias("_commit_version"),
                )
            )
        step = parts[0]
        for p in parts[1:]:
            step = step.unionByName(p)
        feed = step if feed is None else feed.unionByName(step)
    if feed is None:
        raise ValueError("change_feed range contains no row-level commits")
    return feed

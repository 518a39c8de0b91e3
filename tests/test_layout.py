"""Storage-layout optimization: Z-order clustering, range-sorted
writes, file-skipping index, compaction (sources/layout.py)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.sources.layout import (
    ZBITS,
    compact_files,
    file_skipping_stats,
    morton_key,
    prune_files,
    read_pruned,
    write_range_sorted,
    write_zordered,
)


def _py_morton(a: int, b: int) -> int:
    out = 0
    for i in range(ZBITS):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_reference_bit_interleave(spark):
    pts = [(a, b) for a in (0, 1, 5, 255, 4095, 65535) for b in (0, 2, 7, 1024, 65535)]
    df = spark.createDataFrame(pts, ["a", "b"]).withColumn(
        "z", morton_key(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r["z"] == _py_morton(r["a"], r["b"]), (r["a"], r["b"])


def test_morton_locality_quadrants(spark):
    """Points in the same (top-bit) quadrant must occupy one
    contiguous quarter of the curve key space."""
    h = 1 << (ZBITS - 1)
    pts = [(a, b) for a in (0, h - 1, h, (1 << ZBITS) - 1) for b in (0, h - 1, h, (1 << ZBITS) - 1)]
    df = spark.createDataFrame(pts, ["a", "b"]).withColumn(
        "z", morton_key(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        quadrant = ((r["b"] >= h) << 1) | (r["a"] >= h)
        assert r["z"] >> (2 * ZBITS - 2) == quadrant


def test_range_sorted_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "li_sorted")
    write_range_sorted(li, path, ["l_orderkey"], num_files=4)
    stats = file_skipping_stats(spark, path, ["l_orderkey"]).collect()
    assert len(stats) == 4
    spans = sorted((r["min_l_orderkey"], r["max_l_orderkey"]) for r in stats)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # disjoint (boundary key may touch)


def test_zorder_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordering on (orderkey, partkey) must give strictly better
    per-file range coverage on the SECOND dimension than sorting by
    the first alone (the whole point of the curve)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    n_files = 8

    p_sorted = str(tmp_path / "li_1d")
    write_range_sorted(li, p_sorted, ["l_orderkey"], num_files=n_files)
    p_z = str(tmp_path / "li_z")
    write_zordered(li, p_z, "l_orderkey", "l_partkey", num_files=n_files)

    def avg_span(path: str, col: str) -> float:
        st = file_skipping_stats(spark, path, [col]).collect()
        return sum(r[f"max_{col}"] - r[f"min_{col}"] for r in st) / len(st)

    # same row count, same file count, narrower partkey envelopes
    assert spark.read.parquet(p_z).count() == li.count()
    assert avg_span(p_z, "l_partkey") < avg_span(p_sorted, "l_partkey")


def test_skipping_index_prunes_and_preserves_results(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "li_prune")
    write_range_sorted(li, path, ["l_orderkey"], num_files=6)
    stats = file_skipping_stats(spark, path, ["l_orderkey"])

    lo_b, hi_b = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    lo = lo_b + (hi_b - lo_b) // 3
    hi = lo_b + (hi_b - lo_b) // 2
    files = prune_files(stats, "l_orderkey", lo, hi)
    assert 0 < len(files) < 6  # genuinely pruned

    pred = (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
    got = read_pruned(spark, files).filter(pred)
    want = spark.read.parquet(path).filter(pred)
    assert got.count() == want.count() > 0
    assert got.agg(F.sum("l_quantity")).first()[0] == want.agg(
        F.sum("l_quantity")
    ).first()[0]


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "li_small")
    li.repartition(16).write.parquet(path)
    n_before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n_before == 16
    rows = spark.read.parquet(path).count()

    compact_files(spark, path, target_files=2, sort_cols=["l_orderkey"])
    n_after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n_after == 2
    assert spark.read.parquet(path).count() == rows

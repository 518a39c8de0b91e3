"""Training-data curation operators — oracle parity + plan shape."""

import pytest

from tests.conftest import assert_matches_oracle

CURATION_QUERIES = [
    "repetition_stats",
    "pack_chunks",
    "asof_click_attribution",
    "quality_filter",
    "pii_pseudonymize_customers",
    "curation_pipeline",
    "decontaminate_ngrams",
    "domain_quota_sample",
    "chunk_overlap",
]


@pytest.mark.parametrize("name", CURATION_QUERIES)
def test_curation_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_decontaminate_excludes_eval_split_and_flags_only_overlap(spark, sf_dir):
    """No eval doc appears in the output, and contaminated == shared
    count > 0 everywhere."""
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.plans.curation import (
        EVAL_MOD,
        decontaminate_ngrams,
    )

    out = decontaminate_ngrams(spark, sf_dir)
    assert out.filter(F.col("doc_id") % EVAL_MOD == 0).count() == 0
    assert (
        out.filter(
            F.col("contaminated") != (F.col("n_shared_ngrams") > 0)
        ).count()
        == 0
    )


def test_domain_quota_cap_holds_per_source(spark, sf_dir):
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.plans.curation import (
        QUOTA_PER_SOURCE,
        domain_quota_sample,
    )

    out = domain_quota_sample(spark, sf_dir)
    per_source = out.groupBy("source").count()
    assert per_source.filter(F.col("count") > QUOTA_PER_SOURCE).count() == 0
    # ranks within a source are exactly 1..min(quota, n_source)
    assert out.filter(F.col("sample_rank") > QUOTA_PER_SOURCE).count() == 0
    # deterministic: two evaluations agree exactly
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, domain_quota_sample(spark, sf_dir).collect()))
    assert a == b


def test_repetition_stats_is_shuffle_free(spark, sf_dir):
    """Repetition ratios are per-row array math — the plan must not
    contain an Exchange (the explode+groupBy formulation is the
    documented alternative for book-length docs, not the default)."""
    from global_superstore_data_warehouse_spark.plans.curation import repetition_stats

    plan = repetition_stats(spark, sf_dir)._jdf.queryExecution().toString()
    assert "Exchange" not in plan


def test_pack_chunks_single_shard_shuffle(spark, sf_dir):
    """Packing must shuffle exactly once, on the shard key — a global
    cumsum (single-partition window) would serialize at scale."""
    from global_superstore_data_warehouse_spark.plans.curation import pack_chunks

    plan = pack_chunks(spark, sf_dir)._jdf.queryExecution().toString()
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    assert len(exchanges) == 1, exchanges
    assert "source" in exchanges[0]
    # no single-partition window: the partition expression must be
    # hash, not SinglePartition
    assert "SinglePartition" not in plan


def test_asof_attribution_no_inequality_join(spark, sf_dir):
    """The as-of must be the union-window shape: no join operator at
    all in the plan (an inequality purchase x click join explodes
    quadratically in events-per-user)."""
    from global_superstore_data_warehouse_spark.plans.curation import (
        asof_click_attribution,
    )

    plan = asof_click_attribution(spark, sf_dir)._jdf.queryExecution().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_quality_filter_splits_corpus(spark, sf_dir):
    """Thresholds must actually discriminate: both kept and dropped
    documents exist (a filter that keeps or drops everything is a
    configuration bug, not a filter)."""
    from global_superstore_data_warehouse_spark.plans.curation import quality_filter

    rows = quality_filter(spark, sf_dir).collect()
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)


def test_pii_tokens_are_consistent_and_opaque(spark, sf_dir):
    """Pseudonymization contract: same name -> same token (joins
    survive), and no raw name substring leaks into the output."""
    from global_superstore_data_warehouse_spark.plans.curation import (
        pii_pseudonymize_customers,
    )

    rows = pii_pseudonymize_customers(spark, sf_dir).collect()
    by_token = {}
    for r in rows:
        assert "Customer#" not in r.name_token
        assert len(r.name_token) == 32
        by_token.setdefault(r.name_token, set()).add(r.c_custkey)
    # distinct names (names embed custkey) -> distinct tokens
    assert len(by_token) == len(rows)


def test_pack_offsets_contiguous(spark, sf_dir):
    """Within a shard, start offsets must tile the token stream: each
    document starts exactly where the previous one ended."""
    from global_superstore_data_warehouse_spark.plans.curation import pack_chunks

    rows = pack_chunks(spark, sf_dir).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, docs in by_source.items():
        docs.sort(key=lambda r: r.start_offset)
        expect = 0
        for r in docs:
            assert r.start_offset == expect, (src, r)
            expect += r.n_tokens


def test_decontaminate_bloom_equals_exact_plan(spark, duck, sf_dir):
    """Bloom prefilter must be lossless: identical output to the
    exact broadcast-join plan (false positives die in the confirm
    join; false negatives are impossible by Bloom construction)."""
    from global_superstore_data_warehouse_spark.plans.curation import (
        decontaminate_bloom,
        decontaminate_ngrams,
    )

    a = sorted(map(tuple, decontaminate_bloom(spark, sf_dir).collect()))
    b = sorted(map(tuple, decontaminate_ngrams(spark, sf_dir).collect()))
    assert a == b
    assert_matches_oracle(spark, duck, "decontaminate_bloom", sf_dir)


def test_bloom_probe_stays_jvm_side(spark, sf_dir):
    """The training-side Bloom probe must not spawn Python workers:
    no Arrow/Python eval nodes in the plan (the only driver-side
    Python is the bounded eval-bitmap build)."""
    from global_superstore_data_warehouse_spark.plans.curation import (
        decontaminate_bloom,
    )

    plan = decontaminate_bloom(spark, sf_dir)._jdf.queryExecution().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_twophase_quota_equals_single_window(spark, duck, sf_dir):
    """Two-phase top-K must reproduce the single-window quota rows
    exactly (per-shard top-K is a superset of the global top-K)."""
    from global_superstore_data_warehouse_spark.plans.curation import (
        domain_quota_sample,
        domain_quota_sample_twophase,
    )

    a = sorted(map(tuple, domain_quota_sample_twophase(spark, sf_dir).collect()))
    b = sorted(map(tuple, domain_quota_sample(spark, sf_dir).collect()))
    assert a == b
    assert_matches_oracle(spark, duck, "domain_quota_sample_twophase", sf_dir)


def test_chunk_overlap_covers_every_token_with_exact_overlap(spark, sf_dir):
    """Chunk layout invariants: chunk 0 starts at token 1; successive
    chunks advance by exactly CHUNK_STRIDE; the union of chunks
    covers every token (last chunk reaches n_tokens); every chunk is
    non-empty and at most CHUNK_TOKENS long."""
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.functions import text as T
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.curation import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_overlap,
    )

    out = chunk_overlap(spark, sf_dir)
    assert out.filter((F.col("n_chunk_tokens") <= 0) | (F.col("n_chunk_tokens") > CHUNK_TOKENS)).count() == 0
    assert out.filter(F.col("start_token") != F.col("chunk_idx") * CHUNK_STRIDE + 1).count() == 0
    # last chunk must reach the document's final token, first must be idx 0
    per_doc = out.groupBy("doc_id").agg(
        F.min("chunk_idx").alias("first_idx"),
        F.max_by(F.col("start_token") + F.col("n_chunk_tokens") - 1, "chunk_idx").alias("covered_to"),
    )
    n_tok = load(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").alias("n_tokens")
    )
    bad = per_doc.join(n_tok, "doc_id").filter(
        (F.col("first_idx") != 0) | (F.col("covered_to") != F.col("n_tokens"))
    )
    assert bad.count() == 0

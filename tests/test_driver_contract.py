"""Driver-contract tests: the surfaces the harness consumes —
__spark_entry__'s three functions and bench.py's single JSON line —
must keep their exact shape."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_contract():
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 70
    # every oracle key names a registered query; callables are callable
    assert set(oracles) <= set(qs)
    for fn in qs.values():
        assert callable(fn)
    # oracle values are non-empty SQL strings
    for sql in oracles.values():
        assert isinstance(sql, str) and "SELECT" in sql.upper()


def test_bench_emits_one_json_line():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payloads = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert len(payloads) == 1, out.stdout
    doc = json.loads(payloads[0])
    assert set(doc) == {
        "metric", "value", "unit", "queries", "extra_queries",
        "extra_passes", "canary", "sf",
    }
    assert doc["unit"] == "sec" and doc["sf"] == 0.001
    assert doc["value"] >= 0 and doc["queries"]
    # host-speed canary: frozen CPU loop + frozen Spark probe, so the
    # judge can normalize the headline total against machine drift
    canary = doc["canary"]
    assert canary["cpu_s"] > 0 and canary["spark_probe_s"] > 0
    assert canary["cpu_s_max"] >= canary["cpu_s"]
    # every timed extra reports how many passes its minimum came from
    assert set(doc["extra_passes"]) == set(doc["extra_queries"])
    assert all(1 <= n <= 3 for n in doc["extra_passes"].values())


def test_correctness_window_is_the_intended_fifty():
    """The driver hashes only the FIRST 50 registered queries; pin the
    window so a refactor can't silently push a rotation target past
    it. Update this list deliberately, together with queries.py's
    rotation notes."""
    sys.path.insert(0, REPO)
    from global_superstore_data_warehouse_spark import registry

    window = list(registry.queries())[:50]
    assert len(set(window)) == 50
    # round-6 AND round-7 rotation targets must be inside the window
    # (no CORRECTNESS_r06 was recorded, so the round-6 fourteen stay
    # in until they get their first driver row)
    rotated_in = {
        # round 6
        "part_skyline", "entity_resolution_customers",
        "unigram_logprob_scores", "bigram_surprisal_scores",
        "user_activity_coverage", "dedup_savings_report",
        "cluster_balanced_sample", "copurchase_bfs_layers",
        "daily_revenue_ewma", "benford_order_totals",
        "market_budget_allocation", "split_near_dup_leakage",
        "schema_evolution_union", "daily_user_sketch_rollup",
        # round 7
        "countmin_heavy_hitters", "join_size_estimate",
        "expectations_report", "audio_decode_stats",
        "daily_users_kmv", "simhash_recall_eval",
        "quantile_sketch_rollup", "ann_int8_rerank",
        "segment_revenue_trend", "profile_columns",
        "fk_discovery", "partition_advisor",
        "temperature_mixture_sample", "leakage_safe_splits",
    }
    assert rotated_in <= set(window), sorted(rotated_in - set(window))
    # ...and the rotated-out entries must stay registered (pytest
    # parity retained) but outside it
    rotated_out = {
        # round 6
        "dim_date", "scd2_customers", "scd2_snapshot_diff",
        "dedup_incremental", "ann_ivf_topk", "event_funnel",
        "events_hourly_approx_users", "quality_filter",
        "pii_pseudonymize_customers", "golden_record_customers",
        "session_maintenance_overlap", "events_gapfill",
        "semantic_dedup", "minhash_recall_eval",
        # round 7
        "pricing_summary", "dim_address", "order_details_wide",
        "text_quality", "tfidf_topk_terms", "priority_price_quantiles",
        "ann_recall", "kmeans_assign", "events_sessionize",
        "nearest_purchase_to_error", "copurchase_triangles",
        "domain_quota_sample", "market_basket_pairs",
        "multimodal_features",
    }
    all_names = set(registry.queries())
    assert rotated_out <= all_names - set(window), sorted(
        rotated_out & set(window)
    )
    # exactly one rows-only (no-oracle) entry rides in the window
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    no_oracle = [n for n in window if n not in e.oracle_sql()]
    assert no_oracle == ["daily_user_sketch_rollup"], no_oracle

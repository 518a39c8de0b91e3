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
    # COMPACT stdout contract (round-8 fix): the driver parses the
    # JSON line out of a ~2000-char stdout tail, so the line carries
    # only the headline timings + an extras SUMMARY; full per-extra
    # detail goes to BENCH_DETAIL.json. Round 7's full line overgrew
    # the tail and was recorded unparsed — pin the budget here.
    assert set(doc) == {
        "metric", "value", "unit", "queries", "extras", "canary", "sf",
    }
    assert len(payloads[0]) <= 1800
    assert doc["unit"] == "sec" and doc["sf"] == 0.001
    assert doc["value"] >= 0 and doc["queries"]
    # host-speed canary: frozen CPU loop + frozen Spark probe, so the
    # judge can normalize the headline total against machine drift
    canary = doc["canary"]
    assert canary["cpu_s"] > 0 and canary["spark_probe_s"] > 0
    assert canary["cpu_s_max"] >= canary["cpu_s"]
    assert doc["extras"]["detail"] == "BENCH_DETAIL.json"
    assert doc["extras"]["n"] >= 60 and doc["extras"]["total"] > 0
    # the detail file holds the full maps the compact line summarizes
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        detail = json.load(f)
    assert set(detail) == {
        "metric", "value", "unit", "queries", "extra_queries",
        "extra_passes", "canary", "sf",
    }
    assert detail["value"] == doc["value"]
    assert detail["queries"] == doc["queries"]
    assert len(detail["extra_queries"]) == doc["extras"]["n"]
    # every timed extra reports how many passes its minimum came from
    assert set(detail["extra_passes"]) == set(detail["extra_queries"])
    assert all(1 <= n <= 3 for n in detail["extra_passes"].values())
    # round-9 guarantee: the 10 slowest extras are exempt from the
    # budget gate — graded deltas need min-of-2, never min-of-1
    slowest10 = sorted(
        detail["extra_queries"], key=lambda n: -detail["extra_queries"][n]
    )[:10]
    assert all(detail["extra_passes"][n] >= 2 for n in slowest10), {
        n: detail["extra_passes"][n] for n in slowest10
    }


def test_correctness_window_is_the_intended_fifty():
    """The driver hashes only the FIRST 50 registered queries; pin the
    window so a refactor can't silently push a rotation target past
    it. Update this list deliberately, together with queries.py's
    rotation notes."""
    sys.path.insert(0, REPO)
    from global_superstore_data_warehouse_spark import registry

    from global_superstore_data_warehouse_spark.queries import ROUND9_WINDOW

    window = list(registry.queries())[:50]
    assert len(set(window)) == 50
    # since round 8 the window is DECLARED: registry.promote reorders
    # the registry to put ROUND9_WINDOW first, so the driver's first
    # 50 must be exactly that list, in order
    assert window == list(ROUND9_WINDOW)
    # round-9 composition per the round-8 verdict: exactly 10
    # repeat-green representatives, 40 first-timers (never had a
    # driver CORRECTNESS row before round 9)
    repeats = {
        "yearly_sales_profit", "surrogate_keys_customers",
        "conform_two_sources", "scd2_two_load_lifecycle", "fact_orders",
        "incremental_mv_refresh", "secured_customers_analyst",
        "minhash_lsh_candidates", "dedup_clusters", "cow_merge_upsert",
    }
    assert repeats <= set(window)
    first_timers = set(window) - repeats
    assert len(first_timers) == 40
    # every first-timer must come from the round-8 never-checked
    # backlog (spot-pin the heads of each backlog family)
    must_be_in = {
        "stream_interval_join_attribution", "stream_dedup_exactly_once",
        "dedup_bcubed_agreement", "exact_percentile_twopass",
        "bootstrap_revenue_ci", "clustering_coefficients",
        "kcore_membership", "winnowing_matches",
        "sorted_neighborhood_pairs", "kcenter_coreset",
        "tpch_avg_yearly", "tpch_custdist", "multimodal_decode_stats",
        "dedup_clusters_smallstar", "corpus_report", "training_shards",
    }
    assert must_be_in <= first_timers, sorted(must_be_in - first_timers)
    # ...and the round-9 rotated-out entries (all r08 hash-green)
    # must stay registered (pytest parity retained) but outside it
    rotated_out = {
        "sales_employees_regions", "seasonality_segment",
        "cdc_apply_orders", "jaccard_prefix_pairs", "fuzzy_match_fastss",
        "sales_cube", "events_in_maintenance_windows",
        "asof_click_attribution", "curation_pipeline",
        "decontaminate_bloom", "part_pagerank", "cow_stream_upsert",
        "layout_skipping_eval", "bpe_learn_merges",
        "bpe_vocab_compression", "ann_pq_adc", "multitouch_attribution",
        "dsir_importance_weights", "superset_containment", "ann_ivf_pq",
        "bitext_margin_mining", "k_anonymity_audit", "compaction_plan",
        "temporal_split_audit", "bm25_topk", "measure_correlations",
        "ab_test_report", "mutual_information",
        "ccnet_perplexity_buckets", "daily_revenue_anomalies",
        "event_trigrams", "order_day_islands", "cumulative_new_users",
        "events_session_window", "events_value_outliers",
        "weighted_sample_topk", "revenue_cohorts",
        "winsorized_segment_balances", "secured_orders_slice",
        "simhash_near_dup_pairs",
    }
    all_names = set(registry.queries())
    assert rotated_out <= all_names - set(window), sorted(
        rotated_out & set(window)
    )
    # the round-9 window is fully oracle-backed — every slot can go
    # hash-green (verified: all 57 backlog entries carry oracles)
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    no_oracle = [n for n in window if n not in e.oracle_sql()]
    assert no_oracle == [], no_oracle

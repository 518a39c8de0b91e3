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
    assert set(doc) == {"metric", "value", "unit", "queries", "extra_queries", "sf"}
    assert doc["unit"] == "sec" and doc["sf"] == 0.001
    assert doc["value"] >= 0 and doc["queries"]


def test_correctness_window_is_the_intended_fifty():
    """The driver hashes only the FIRST 50 registered queries; pin the
    window so a refactor can't silently push a rotation target past
    it. Update this list deliberately, together with queries.py's
    rotation notes."""
    sys.path.insert(0, REPO)
    from global_superstore_data_warehouse_spark import registry

    window = list(registry.queries())[:50]
    assert len(set(window)) == 50
    # round-5 rotation targets must be inside the window...
    rotated_in = {
        "jaccard_prefix_pairs", "sales_cube", "cdc_apply_orders",
        "fuzzy_match_fastss", "kmeans_assign", "incremental_mv_refresh",
        "scd2_snapshot_diff", "market_basket_pairs",
        "copurchase_triangles", "nearest_purchase_to_error",
        "decontaminate_bloom",
    }
    assert rotated_in <= set(window), sorted(rotated_in - set(window))
    # ...and the rotated-out entries must stay registered (pytest
    # parity retained) but outside it
    rotated_out = {
        "dim_geography", "dm_scd2_propagation", "cohort_retention",
        "events_sliding", "top_events_per_user", "event_transitions",
        "chunk_overlap", "span_dup_stats", "cluster_representatives",
        "sales_rollup", "decontaminate_ngrams",
    }
    all_names = set(registry.queries())
    assert rotated_out <= all_names - set(window), sorted(
        rotated_out & set(window)
    )
